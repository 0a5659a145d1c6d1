package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-correctness primitive of
  * training pipelines: each left row picks up the LATEST right row
  * with `right.ts <= left.ts` for its key (no future leakage). Spark
  * has no native ASOF JOIN; the naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + max) explodes to one row per
  * (left, earlier-right) pair before aggregating.
  *
  * This implementation is the single-shuffle formulation: tag both
  * sides, union, and carry right payloads forward with
  * `last(_, ignoreNulls)` over `(key ORDER BY ts, side)` — right rows
  * sort before left rows at equal ts, so a same-timestamp update IS
  * visible (standard as-of tie semantics). One hash shuffle on key +
  * one in-partition sort, linear in |L| + |R| at any scale; skewed
  * keys fall to AQE like any window. The DuckDB oracle recomputes the
  * identical union+window (q65).
  */
object AsOf {

  /** Left-join semantics: every left row survives; unmatched payloads
    * are null. `payload` columns from `right` are emitted with
    * `suffix` appended. Both inputs must contain `key` and `ts`.
    * `rightOrder` names a unique (long-castable) right column that
    * breaks ties between right rows sharing (key, ts) — without it,
    * same-timestamp updates would be picked nondeterministically
    * across runs/engines. Left rows sort after all rights at their
    * ts (side + a MaxValue sentinel, never a null — null-ordering
    * defaults differ between engines). */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      rightOrder: Option[String] = None,
      suffix: String = "_asof"
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_rseq", lit(Long.MaxValue))
      .select(
        Seq(col(key), col(ts), col("_side"), col("_rseq")) ++
          leftCols.filterNot(c => c == key || c == ts).map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(p + suffix)): _*
      )
    val r = right
      .withColumn("_side", lit(0))
      .withColumn(
        "_rseq",
        rightOrder.map(c => col(c).cast("long")).getOrElse(lit(0L))
      )
      .select(
        Seq(col(key), col(ts), col("_side"), col("_rseq")) ++
          leftCols.filterNot(c => c == key || c == ts)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(p => col(p).as(p + suffix)): _*
      )
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc, col("_rseq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p + suffix, last(col(p + suffix), ignoreNulls = true).over(w))
    }
    carried
      .where(col("_side") === 1)
      .drop("_side", "_rseq")
      .select(
        (leftCols.map(col) ++ payload.map(p => col(p + suffix))): _*
      )
  }
}
