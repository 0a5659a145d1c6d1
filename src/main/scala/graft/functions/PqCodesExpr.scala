package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoding against DRIVER-SIDE sub-codebooks,
  * as a native codegen'd expression — the large-(m×ksub) path of
  * [[graft.similarity.Quantize.pqEncode]], same escape hatch as
  * [[CodebookArgmin]] for the coarse assign.
  *
  * Why not literals: the composed tier inlines m×ksub struct literals
  * (each a dsub-float array) — at production PQ scale (m=16,
  * ksub=256) that is 4096 sub-centroids IN THE PLAN, re-analyzed per
  * query. Here the books ride as one `float[][][]` reference object
  * (serialized once into the task binary) and the generated code is
  * three tight primitive loops emitting all m codes in ONE pass over
  * the residual.
  *
  * Semantics are IDENTICAL to the literal path (spec-pinned in
  * PqSpec): per subspace, squared L2 distance accumulated in double
  * in ascending dim order, argmin with ties to the LOWEST code. Null
  * residual → null codes (UnaryExpression null-safety).
  */
case class PqCodes(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  // keep the plan string flat: never print the codebook contents
  override def toString: String =
    s"pq_codes(${child}, m=${books.length}, ksub=${books.head.length})"

  // content-based equals/hashCode: the synthesized case-class versions
  // compare the Array param by REFERENCE, defeating canonicalization /
  // CSE / exchange reuse for plans encoding against equal books
  override def equals(other: Any): Boolean = other match {
    case that: PqCodes =>
      child == that.child &&
        books.length == that.books.length &&
        books.indices.forall { m =>
          books(m).length == that.books(m).length &&
            books(m).indices.forall(j =>
              java.util.Arrays.equals(books(m)(j), that.books(m)(j)))
        }
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    books.foreach(_.foreach(v => h = 31 * h + java.util.Arrays.hashCode(v)))
    h
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  /** Public for the generated code path. */
  def compute(x: ArrayData): ArrayData = {
    val m = books.length
    val dsub = books(0)(0).length
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val base = sub * dsub
      val bs = books(sub)
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < bs.length) {
        val b = bs(j)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = x.getFloat(base + i).toDouble - b(i).toDouble
          acc += d * d
          i += 1
        }
        if (acc < best) { best = acc; bestJ = j }
        j += 1
      }
      out(sub) = bestJ
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // per-row work is the triple primitive loop in [[compute]];
      // calling it via a reference object keeps the enclosing stage in
      // WholeStageCodegen (the ShingleExpr convention)
      val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {

  /** Wrap books as a Column over the residual — the direct
    * Expression→Column shim, NOT the session registry: a data-carrying
    * expression in the registry would pin every distinct codebook for
    * the session lifetime (see [[CodebookArgmin.assign]]). */
  def encode(residual: Column, books: Seq[Seq[Seq[Float]]]): Column = {
    require(books.nonEmpty && books.head.nonEmpty, "empty PQ books")
    val arr = books.map(_.map(_.toArray).toArray).toArray
    org.apache.spark.sql.GraftExprColumn.column(
      PqCodes(org.apache.spark.sql.GraftExprColumn.expression(residual), arr))
  }
}
