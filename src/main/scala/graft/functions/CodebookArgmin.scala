package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
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

  /** Wrap a codebook as a Column over `vec`. Column construction from
    * a raw Expression is private[sql] in Spark 4, so this registers a
    * content-addressed temp function and calls it — same plan, same
    * codegen as a direct wrap. The name hashes the codebook contents:
    * re-registering the same codebook is a no-op replace, and two
    * different codebooks in one session never share a name (64-bit
    * content hash), so lazy analysis can never resolve to the wrong
    * codebook. */
  def assign(
      spark: SparkSession,
      vec: Column,
      cents: Seq[(Long, Seq[Float])]
  ): Column = {
    require(cents.nonEmpty, "empty codebook")
    val sorted = cents.sortBy(_._1)
    val cells = sorted.map(_._1).toArray
    val vecs = sorted.map(_._2.toArray).toArray
    val normSq = sorted.map(_._2.map(v => v.toDouble * v.toDouble).sum).toArray
    val h1 = java.util.Arrays.hashCode(cells)
    val h2 = java.util.Arrays.deepHashCode(vecs.asInstanceOf[Array[AnyRef]])
    val name = f"ivf_argmin_${h1}%08x${h2}%08x"
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(
        name,
        exprs => CodebookArgmin(exprs.head, cells, vecs, normSq),
        "built-in"
      )
    call_function(name, vec)
  }
}
