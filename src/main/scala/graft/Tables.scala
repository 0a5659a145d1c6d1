package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table access shared by SparkEntry / Verify / Bench / Demo.
  *
  * The driver's `events.parquet` carries a physical timestamp `ts`
  * whose parquet type has varied across testdata generations:
  * `timestamp[ns]` (Spark 4 rejects it unless the `nanosAsLong`
  * legacy conf maps it to BIGINT epoch-nanos) and `timestamp[us]`
  * (reads natively as TIMESTAMP_NTZ). Every consumer — the engine
  * fixtures, q01-q05's `ts_ns div 1000` projection, the sessionize /
  * as-of / range-join queries — is written against ONE stable
  * contract: `ts` is a BIGINT of epoch-nanos. `load` enforces it for
  * either generation: a LongType `ts` (nanos file + legacy conf)
  * passes through; a timestamp `ts` is converted via
  * `unix_micros * 1000` (exact — micros precision carries into the
  * nanos integer, and the session timezone is pinned UTC first so the
  * NTZ→instant cast can never shift). The DuckDB oracle reads the
  * same file as a real timestamp and compares on `epoch_us(ts)` =
  * `ts div 1000` — integers on both sides for any generation.
  */
object Tables {
  /** NOTE — session-wide contract, not a scoped setting: `load` pins
    * `nanosAsLong` and a UTC session timezone on the GIVEN session
    * (graft's entry points — Bench/Verify/Demo and the test harness —
    * already construct their sessions with both; this set is the
    * defensive choke point for driver-OWNED sessions handed to
    * `SparkEntry.entry`). UTC-at-load is load-bearing for the NTZ→
    * instant cast below: the Cast captures the session timezone at
    * analysis, so it must be UTC BEFORE the projection is built.
    * Callers embedding graft in a session that deliberately runs a
    * non-UTC `spark.sql.session.timeZone` should load graft tables
    * through a separate session. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df // LongType nanos (legacy generation) or no ts column
    }
  }
}
