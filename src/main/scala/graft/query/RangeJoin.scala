package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless interval (range) join — `point ∈ [lo, hi]` with no equi
  * key. Spark plans the naive formulation as BroadcastNestedLoopJoin
  * (or a cartesian product): every point against every interval.
  *
  * The scale formulation buckets time: each interval explodes to the
  * `len/width + 1` buckets it covers, each point maps to exactly ONE
  * bucket, and the join becomes an equi-join on the bucket id followed
  * by the exact containment filter. Cost is |P| + Σ(interval spans)
  * shuffled rows — linear for intervals bounded by a few buckets —
  * and every matched pair appears exactly once (a point lives in one
  * bucket). Pick `bucketWidth` near the typical interval length:
  * wider = fewer exploded rows, narrower = fewer false candidates
  * per bucket.
  */
object RangeJoin {

  /** All (point, interval) pairs with `lo <= pt <= hi`, as an inner
    * join of `points` × `intervals` columns. Column names must not
    * collide (prefix beforehand). All three bound columns are
    * long-valued (epoch millis/micros, seqs, …). */
  /** Per-interval bucket-span ceiling. An interval wider than this
    * many buckets (a `hi = Long.MaxValue` open-ended sentinel being
    * the classic case) would ask `sequence()` for billions of
    * elements — killing the job with an opaque array-size error, or
    * OOMing a task first. Refused loudly with actionable advice
    * instead: widen `bucketWidth`, cap the sentinel, or route the
    * handful of oversized intervals through a nested-loop join. */
  val MaxBucketsPerInterval: Long = 4096L

  /** All (point, interval) pairs with `lo <= pt <= hi`, as an inner
    * join of `points` × `intervals` columns. Column names must not
    * collide (prefix beforehand). All three bound columns are
    * long-valued (epoch millis/micros, seqs, …). */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_b", expr(s"$ptCol div $bucketWidth"))
    val spanGuard = raise_error(concat(
      lit(s"interval spans more than $MaxBucketsPerInterval buckets " +
        s"(bucketWidth=$bucketWidth, lo="), col(loCol),
      lit(", hi="), col(hiCol),
      lit(") — widen bucketWidth, cap open-ended intervals, or join " +
        "oversized intervals separately")))
    val loB = expr(s"$loCol div $bucketWidth")
    val hiB = expr(s"$hiCol div $bucketWidth")
    // span in overflow-safe arithmetic: a plain `-` on (hiB - loB)
    // wraps (or throws under ANSI) for extreme sentinel bounds like
    // (Long.MinValue, Long.MaxValue), silently BYPASSING this guard —
    // try_subtract yields NULL on overflow, which here means the span
    // is definitely oversized. NULL lo/hi rows keep their old
    // behavior (sequence -> NULL -> explode drops the row).
    val span = try_subtract(hiB, loB)
    val iv = intervals.withColumn(
      "_b",
      explode(
        // INVERTED intervals (hi < lo) first: `point ∈ [lo, hi]` is
        // EMPTY, so they contribute no pairs — and they must never
        // reach sequence(), which generates DESCENDING for
        // start > stop: an interval inverted by a data bug (end
        // before start) would otherwise explode into up to
        // |span| buckets, sailing past the `span >= max` guard on a
        // negative span — the exact blow-up the guard exists to stop
        when(
          col(loCol).isNotNull && col(hiCol).isNotNull &&
            col(hiCol) < col(loCol),
          lit(null).cast("array<long>") // explode drops the row
        ).when(
          col(loCol).isNotNull && col(hiCol).isNotNull &&
            (span.isNull || span >= MaxBucketsPerInterval),
          spanGuard.cast("array<long>")
        ).otherwise(sequence(loB, hiB)))
    )
    p.join(iv, Seq("_b"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_b")
  }
}
