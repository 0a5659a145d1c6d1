package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.QueryPlan

/** Lowers a folded [[graft.core.QueryPlan]] onto a DataFrame pipeline.
  *
  * The reference applies its specs imperatively per-`Next`
  * (offset2/qry.go:101-189); here each spec becomes a declarative
  * relational operator and Catalyst does the physical work:
  *
  *   - seq bounds → `filter` → parquet row-group pruning (the pushed
  *     predicates show up in the scan's `PushedFilters`), same effect
  *     as the reference's cursor seek (offset2/qry.go:35-69)
  *   - limit → `LocalLimit`/`GlobalLimit` short-circuit
  *     (offset2/qry.go:105-108)
  *   - reverse+limit → `TakeOrderedAndProjectExec` top-k, no full sort
  *     (offset2/qry.go:86-99); note we implement the CORRECT
  *     reverse-with-bounds composition (the reference has a known bug
  *     here, test/simple.go:198-213 / issue #6)
  *   - seqWrap → projection: keep `(seq, value)` vs `value` only
  *     (seqwrap.go:8-34)
  *
  * Nulled entries flow through queries as rows with
  * `nulled = true, value = null` — the reference's "error as a value"
  * stream semantics (offset2/qry.go:159-162) without poisoning the
  * stream.
  */
object QueryBuilder {

  def build(df: DataFrame, plan: QueryPlan): DataFrame = {
    var out = bounded(df, plan)
    out =
      if (plan.reverse) out.orderBy(col("seq").desc)
      else out.orderBy(col("seq").asc)
    if (plan.limit >= 0) out = out.limit(clampLimit(plan.limit))
    project(out, plan)
  }

  /** Streaming variant: no orderBy/limit (Spark disallows them on
    * unaggregated streams); ordering is by seq within the micro-batch
    * sink, limit is enforced by the push-mode adapter
    * ([[graft.live.LiveTail]]). */
  def buildStreaming(df: DataFrame, plan: QueryPlan): DataFrame =
    project(bounded(df, plan), plan)

  private def bounded(df: DataFrame, plan: QueryPlan): DataFrame = {
    var out = df
    plan.lower.foreach(l => out = out.where(col("seq") >= l))
    plan.upper.foreach(u => out = out.where(col("seq") < u))
    out
  }

  private def project(df: DataFrame, plan: QueryPlan): DataFrame =
    if (plan.seqWrap) df.select("seq", "value", "nulled")
    else df.select("value", "nulled")

  private def clampLimit(n: Long): Int =
    if (n > Int.MaxValue) Int.MaxValue else n.toInt
}
