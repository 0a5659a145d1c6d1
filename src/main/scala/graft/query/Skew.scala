package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys — the manual fallback when
  * AQE's runtime skew handling isn't enough (e.g. a groupBy where one
  * addr holds 20% of a 100 TB multilog, or LSH mega-buckets from
  * boilerplate documents).
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on
    * (key, salt ∈ 0..salts-1), then merge per key. Correct for any
    * aggregate with a merge form — pass the partial and the merge
    * expressions. Example (count + sum):
    * {{{
    *   Skew.saltedAgg(df, col("addr"), 16,
    *     partial = Seq(count(lit(1)).as("n"), sum("v").as("s")),
    *     merge   = Seq(sum("n").as("n"), sum("s").as("s")))
    * }}}
    * The first shuffle spreads each hot key over `salts` reducers;
    * the second is tiny (one row per key per salt).
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partial: Seq[Column],
      merge: Seq[Column]
  ): DataFrame = {
    val salted = df.withColumn(
      "_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts))
    )
    salted
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("_key"))
      .agg(merge.head, merge.tail: _*)
      .withColumnRenamed("_key", "key")
  }

  /** Cap per-bucket cardinality for self-join candidate generation:
    * drop buckets larger than `maxBucket` (returning them separately
    * so callers can handle mega-buckets out of band — in dedup they
    * are near-certain duplicate clusters and can be collapsed without
    * pairwise verification). Returns (withinCap, oversized buckets). */
  def capBuckets(
      df: DataFrame,
      bucketCols: Seq[String],
      maxBucket: Long
  ): (DataFrame, DataFrame) = {
    val counts = df
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val small = counts.where(col("_n") <= maxBucket).drop("_n")
    val big = counts.where(col("_n") > maxBucket)
    (df.join(small, bucketCols, "left_semi"), big)
  }
}
