package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-centroid assignment against a DRIVER-SIDE codebook, as a
  * native codegen'd expression — the large-k path of
  * [[graft.similarity.Ann.ivfAssignVectors]].
  *
  * Why not literals: inlining k centroid vectors as k struct literals
  * (the small-k path) puts k×dims values IN THE PLAN — at a
  * production IVF scale (k in the 10⁴–10⁵ range) that is a tens-of-MB
  * expression tree re-analyzed per query and re-shipped per plan.
  * Here the codebook rides the expression as three primitive-array
  * reference objects, so it is serialized ONCE into the task binary —
  * which Spark already broadcasts per stage (TorrentBroadcast) — and
  * the generated code loops over `float[][]` directly: no plan growth,
  * no per-row boxing, no struct array materialization per row.
  *
  * Semantics are IDENTICAL to the literal path (cross-checked in
  * IvfCompactSpec): argmin over cells of ||c||² − 2·v·c (the per-row
  * ||v||² constant cannot change the argmin), double accumulation in
  * ascending-index order, ties going to the LOWEST cell id — callers
  * pass `cells` sorted ascending, mirroring array_min's
  * (dist, cell) lexicographic tie-break.
  *
  * Null vector → null cell (UnaryExpression null-safety); a vector
  * shorter than a centroid scores over the common prefix, matching
  * [[VecOps.FloatVecDot]].
  */
case class CodebookArgmin(
    child: Expression,
    cells: Array[Long],
    vecs: Array[Array[Float]],
    normSq: Array[Double]
) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "codebook_argmin"

  // keep the plan string flat: never print the codebook contents
  override def toString: String = s"codebook_argmin(${child}, k=${cells.length})"

  // The synthesized case-class equals/hashCode would compare the Array
  // params by REFERENCE, so two expressions built from equal codebooks
  // would never compare equal — defeating Catalyst canonicalization /
  // common-subexpression elimination / exchange reuse for plans that
  // assign against the same codebook twice. Compare contents instead
  // (k×dims bounded — cheap next to the plan work it enables).
  override def equals(other: Any): Boolean = other match {
    case that: CodebookArgmin =>
      child == that.child &&
        java.util.Arrays.equals(cells, that.cells) &&
        vecs.length == that.vecs.length &&
        vecs.indices.forall(i => java.util.Arrays.equals(vecs(i), that.vecs(i))) &&
        java.util.Arrays.equals(normSq, that.normSq)
    case _ => false
  }

  override def hashCode(): Int = {
    // normSq is derived from vecs — contents already covered
    var h = child.hashCode()
    h = 31 * h + java.util.Arrays.hashCode(cells)
    vecs.foreach(v => h = 31 * h + java.util.Arrays.hashCode(v))
    h
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var best = Double.PositiveInfinity
    var bestCell = cells(0)
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      val m = math.min(n, cv.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        acc += x.getFloat(i).toDouble * cv(i).toDouble
        i += 1
      }
      val d = normSq(c) - 2.0 * acc
      if (d < best) { best = d; bestCell = cells(c) }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val vecsRef = ctx.addReferenceObj("cbVecs", vecs, "float[][]")
        val cellsRef = ctx.addReferenceObj("cbCells", cells, "long[]")
        val nsqRef = ctx.addReferenceObj("cbNormSq", normSq, "double[]")
        val n = ctx.freshName("n")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val m = ctx.freshName("m")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val cv = ctx.freshName("cv")
        val best = ctx.freshName("best")
        val bestCell = ctx.freshName("bestCell")
        s"""
           |int $n = $a.numElements();
           |double $best = Double.POSITIVE_INFINITY;
           |long $bestCell = $cellsRef[0];
           |for (int $c = 0; $c < $vecsRef.length; $c++) {
           |  float[] $cv = $vecsRef[$c];
           |  int $m = java.lang.Math.min($n, $cv.length);
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $m; $i++) {
           |    $acc += ((double) $a.getFloat($i)) * ((double) $cv[$i]);
           |  }
           |  double $d = $nsqRef[$c] - 2.0 * $acc;
           |  if ($d < $best) { $best = $d; $bestCell = $cellsRef[$c]; }
           |}
           |${ev.value} = $bestCell;
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodebookArgmin {

  /** Wrap a codebook as a Column over `vec`, via the direct
    * Expression→Column shim ([[org.apache.spark.sql.GraftExprColumn]]).
    * Earlier drafts registered a content-addressed temp function
    * instead (the VecOps pattern), but a DATA-CARRYING expression must
    * not live in session registry state: every distinct codebook would
    * be retained for the session lifetime (a 20-iteration training
    * run at production k pins GBs), and a name-hash collision would
    * silently resolve a plan against the wrong codebook. The shim has
    * neither problem — the codebook lives only in this plan's
    * expression tree. */
  def assign(
      vec: Column,
      cents: Seq[(Long, Seq[Float])]
  ): Column = {
    require(cents.nonEmpty, "empty codebook")
    val sorted = cents.sortBy(_._1)
    val cells = sorted.map(_._1).toArray
    val vecs = sorted.map(_._2.toArray).toArray
    val normSq = sorted.map(_._2.map(v => v.toDouble * v.toDouble).sum).toArray
    org.apache.spark.sql.GraftExprColumn.column(
      CodebookArgmin(
        org.apache.spark.sql.GraftExprColumn.expression(vec),
        cells, vecs, normSq))
  }
}
