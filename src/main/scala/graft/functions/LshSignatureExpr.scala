package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature in ONE fused loop: array<float> →
  * packed BIGINT, bit p = sign of dot(vec, plane_p) — the narrow twin
  * of [[graft.similarity.Ann.lshSignature]]'s composed form, which
  * evaluates `bits` separate `aggregate(zip_with(...))` higher-order
  * expressions per row (interpreted, one intermediate array per
  * plane per row).
  *
  * The planes are NOT shipped: they are the same deterministic
  * md5-derived constants ([[planeComponent]] ==
  * `Ann.planeComponent`, the value the DuckDB oracle recomputes in
  * SQL), materialized once per executor from (bits, dims) — the
  * expression carries two ints. Accumulation order per plane is the
  * composed form's left-to-right fold over vector elements, so the
  * dot products are bit-identical doubles and the sign bits cannot
  * diverge (spec-pinned in AnnIndexSpec). Mismatched vector length vs
  * `dims` pairs positionally like `zip_with` — the shorter side stops
  * the fold. Null vector → null. */
case class LshSignatureExpr(child: Expression, bits: Int, dims: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 63, s"bits must be in [1, 63] (got $bits)")
  require(dims > 0, s"dims must be > 0 (got $dims)")

  override def dataType: DataType = LongType

  override def prettyName: String = "lsh_signature"

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(bits, dims)((p, d) => LshSignatureExpr.planeComponent(p, d))

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else signature(v.asInstanceOf[ArrayData])
  }

  /** Public for the generated code path. */
  def signature(vec: ArrayData): Long = {
    val n = math.min(vec.numElements(), dims)
    var sig = 0L
    var p = 0
    while (p < bits) {
      val plane = planes(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += vec.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("lshSigExpr", this,
      classOf[LshSignatureExpr].getName)
    ev.copy(
      code = code"""
        |${childGen.code}
        |long ${ev.value} = ${childGen.isNull} ? 0L :
        |  $ref.signature(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatureExpr {
  /** == [[graft.similarity.Ann.planeComponent]]: md5-derived
    * pseudo-random component in [-0.5, 0.5), bit-identical to the
    * oracle's `('0x'||substr(md5('plane:p:d'),1,8))::BIGINT /
    * 4294967296.0 - 0.5`. Duplicated arithmetic is pinned by
    * AnnIndexSpec's native==composed assertion (Ann.planeComponent is
    * private to similarity; inlining avoids a visibility widening). */
  private[functions] def planeComponent(p: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$d".getBytes("UTF-8"))
    val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    v.toDouble / 4294967296.0 - 0.5
  }

  def column(vec: Column, bits: Int, dims: Int): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      LshSignatureExpr(
        org.apache.spark.sql.GraftExprColumn.expression(vec), bits, dims))
}
