package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Catalyst expressions over SERIALIZED Roaring64 bitmaps
  * (the `(addr, bitmap)` column [[graft.multilog.BitmapIndex]]
  * materializes; reference: multilog/roaring/sublog.go:19-55) —
  * replacing the former plain UDFs, the last interpreted per-row site
  * on an oracled path. The per-row work (deserialize + select/card/
  * contains on the opaque format) is library code generated Java
  * cannot improve, but a real `doGenCode` (calling [[BitmapExpr]]
  * helpers via a reference object) keeps the ENCLOSING stage in
  * WholeStageCodegen, where a UDF/CodegenFallback would demote the
  * whole consuming projection to interpreted row processing — the
  * same rationale as every native expression in this package.
  */
object BitmapExpr {

  /** Shared deserialize — public for the generated code path. */
  def bitmap(bytes: Array[Byte]): org.roaringbitmap.longlong.Roaring64NavigableMap =
    graft.multilog.BitmapIndex.deserialize(bytes)

  /** Rank → member (bitmap Select); null when `rank` is out of range
    * (matching the reference's rank addressing contract). */
  case class BitmapSelect(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    // out-of-range rank yields null even for non-null inputs
    override def nullable: Boolean = true

    /** Public for the generated code path. */
    def compute(bytes: Array[Byte], rank: Long): java.lang.Long = {
      val b = bitmap(bytes)
      if (rank < 0 || rank >= b.getLongCardinality) null
      else java.lang.Long.valueOf(b.select(rank))
    }

    override def nullSafeEval(bytes: Any, rank: Any): Any =
      compute(bytes.asInstanceOf[Array[Byte]], rank.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, r) => {
        val ref = ctx.addReferenceObj("bitmapSelect", this,
          classOf[BitmapSelect].getName)
        val tmp = ctx.freshName("sel")
        s"""
           |java.lang.Long $tmp = $ref.compute($b, $r);
           |if ($tmp == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $tmp.longValue();
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Cardinality of a serialized bitmap. */
  case class BitmapCardinality(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType

    /** Public for the generated code path. */
    def compute(bytes: Array[Byte]): Long = bitmap(bytes).getLongCardinality

    override def nullSafeEval(bytes: Any): Any =
      compute(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => {
        val ref = ctx.addReferenceObj("bitmapCard", this,
          classOf[BitmapCardinality].getName)
        s"${ev.value} = $ref.compute($b);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Membership test on a serialized bitmap. */
  case class BitmapContains(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = BooleanType

    /** Public for the generated code path. */
    def compute(bytes: Array[Byte], seq: Long): Boolean =
      bitmap(bytes).contains(seq)

    override def nullSafeEval(bytes: Any, seq: Any): Any =
      compute(bytes.asInstanceOf[Array[Byte]], seq.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, s) => {
        val ref = ctx.addReferenceObj("bitmapContains", this,
          classOf[BitmapContains].getName)
        s"${ev.value} = $ref.compute($b, $s);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
