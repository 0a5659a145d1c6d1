package graft.storage

import org.apache.spark.sql.DataFrame

/** Co-located joins via Spark bucketing — the "pre-shuffle once,
  * join forever" layout a 100 TB warehouse uses for its recurring
  * join keys. Writing both sides bucketed (same key, same bucket
  * count) lets every subsequent equi-join on that key run with ZERO
  * exchange: each task reads bucket i of both tables and joins
  * locally. `sortBy` additionally pre-sorts each bucket file so the
  * sort-merge join skips its sort.
  *
  * This is the persistent-table counterpart of `repartition()` hints:
  * the shuffle is paid once at write time and amortized over every
  * downstream join/aggregation on the bucket key.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted external parquet table registered
    * under `table` (required — bucket metadata lives in the catalog,
    * plain parquet paths can't carry it). */
  def write(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      path: String
  ): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
