package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal package-private-interface shim (the GraftVectorizedRange
  * pattern): `Column` construction from a raw Catalyst `Expression` —
  * and the reverse — is `private[sql]` in Spark 4, so custom
  * expressions built outside Spark's namespace either go through the
  * function registry (global session state a data-carrying expression
  * like `graft.functions.CodebookArgmin` must not live in: unbounded
  * growth, name-collision hazard) or through this two-method shim.
  * Exposes exactly `classic.ExpressionUtils.column/expression`,
  * nothing else. */
object GraftExprColumn {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
