package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Point-in-time (as-of) join — the feature-correctness primitive of
  * training pipelines: each left row picks up the LATEST right row
  * with `right.ts <= left.ts` for its key (no future leakage). Spark
  * has no native ASOF JOIN; the naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + max) explodes to one row per
  * (left, earlier-right) pair before aggregating.
  *
  * This implementation is the single-shuffle formulation: tag both
  * sides, union, and carry the right payload forward with
  * `last(_, ignoreNulls)` over `(key ORDER BY ts, side)` — right rows
  * sort before left rows at equal ts, so a same-timestamp update IS
  * visible (standard as-of tie semantics). One hash shuffle on key +
  * one in-partition sort, linear in |L| + |R| at any scale; skewed
  * keys fall to AQE like any window. The DuckDB oracle recomputes the
  * identical union+window (q65).
  *
  * All payload columns travel as ONE non-null struct per right row
  * (left rows carry a null struct), and the window carries that
  * single struct. Carrying each column independently would let a
  * genuinely-NULL field in the latest right row be back-filled from
  * an OLDER right row — stitching the output from different right
  * rows. Standard as-of semantics return the whole latest row, nulls
  * included.
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
    val pType = StructType(
      payload.map(p => StructField(p, right.schema(p).dataType, nullable = true)))
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_rseq", lit(Long.MaxValue))
      .select(
        Seq(col(key), col(ts), col("_side"), col("_rseq")) ++
          leftCols.filterNot(c => c == key || c == ts).map(col) :+
          lit(null).cast(pType).as("_p"): _*
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
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(p => col(p).as(p)): _*).as("_p"): _*
      )
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc, col("_rseq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(
        (leftCols.map(col) ++
          payload.map(p => col("_p").getField(p).as(p + suffix))): _*
      )
  }
}
