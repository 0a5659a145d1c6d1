package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is codegen'd but materializes an intermediate array per row-pair
  * and dispatches through lambda-variable plumbing; for O(n²)
  * near-dup scoring that allocation is the dominant cost. These
  * expressions walk the two ArrayData buffers directly — a tight
  * primitive loop in both interpreted and generated code. This is the
  * "custom Expression beats composition" tier of the extension
  * ladder; semantics (including float→double widening) are identical
  * to the built-in form, which remains the cross-checked baseline.
  */
object VecOps {

  /** dot(a, b) over two array<float> columns, in double precision.
    * Null if either side is null; mismatched lengths use the shorter
    * (callers use fixed-dim embeddings). */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        (a, b) => {
          val n = ctx.freshName("n")
          val i = ctx.freshName("i")
          val acc = ctx.freshName("acc")
          s"""
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
             |}
             |${ev.value} = $acc;
           """.stripMargin
        }
      )

    override protected def withNewChildrenInternal(
        newLeft: Expression,
        newRight: Expression
    ): Expression = copy(left = newLeft, right = newRight)
  }

  /** L2 norm of an array<float> column, in double precision. */
  case class FloatVecNorm(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      nullSafeCodeGen(
        ctx,
        ev,
        a => {
          val n = ctx.freshName("n")
          val i = ctx.freshName("i")
          val acc = ctx.freshName("acc")
          val v = ctx.freshName("v")
          s"""
             |int $n = $a.numElements();
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $v = (double) $a.getFloat($i);
             |  $acc += $v * $v;
             |}
             |${ev.value} = java.lang.Math.sqrt($acc);
           """.stripMargin
        }
      )

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Register the native expressions in the session's function
    * registry (idempotent). Column construction from a raw Expression
    * is private[sql] in Spark 4, so the public path is registry +
    * `call_function` — same plan, same codegen. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // no-op when already registered: operators call this per-invocation
    // and a replace would log a warning each time
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot_f")))
      return
    reg.createOrReplaceTempFunction(
      "vec_dot_f",
      exprs => FloatVecDot(exprs(0), exprs(1)),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "vec_norm_f",
      exprs => FloatVecNorm(exprs.head),
      "built-in"
    )
  }

  def dotF(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("vec_dot_f", a, b)
  }

  def normF(spark: SparkSession, a: Column): Column = {
    register(spark)
    call_function("vec_norm_f", a)
  }
}
