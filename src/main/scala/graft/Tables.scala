package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access shared by SparkEntry / Verify / Bench / Demo.
  *
  * The driver's `events` table carries `timestamp[ns]`, which Spark 4
  * rejects by default (PARQUET_TYPE_ILLEGAL) — `nanosAsLong` reads it
  * as a BIGINT of epoch-nanos, which also keeps the DuckDB oracle
  * comparable (we compare on integer nanos, never on raw timestamps).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
