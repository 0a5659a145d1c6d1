package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.indexes.{KVIndex, MultiLogSink, SinkIndex}
import graft.multilog.MultiLog
import graft.storage.ParquetLog

/** Shared engine-backed fixtures for SparkEntry's correctness queries:
  * the `events` table ingested once per scale factor into a real
  * [[ParquetLog]] (seq == event_id: the table is dense 0-based in
  * event_id order), plus the derived multilog (fan-out by event_type)
  * and KV index (latest props per user) built through the sink layer.
  *
  * Queries q01..q11 run THROUGH the engine against these, so the
  * DuckDB oracle over the raw parquet checks the whole storage/query
  * stack, not just DataFrame plumbing.
  */
object EngineFixtures {

  /** Bump when ParquetLog/MultiLog/KVIndex storage schemas change OR
    * the driver regenerates testdata in a way that changes what the
    * fixture stores (a DONE-marked cache can't see either). */
  val Version = "v4" // v4: ts normalized to epoch-nanos BIGINT in
  // Tables.load after the testdata generation moved events.ts from
  // timestamp[ns] to timestamp[us] (a v3 cache built in the us window
  // holds a poisoned TIMESTAMP-typed ts_ns struct)

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, (ParquetLog, MultiLog, KVIndex)]

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files
        .walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator()
        .asScala
        .foreach(Files.deleteIfExists(_))
    }

  /** Log value struct: ts kept as epoch-nanos BIGINT (ts_ns) so the
    * oracle compares integers, never timestamps (see Tables). */
  def eventValue(events: DataFrame): DataFrame =
    events
      .orderBy("event_id")
      .select(
        struct(
          col("event_id"),
          col("ts").as("ts_ns"),
          col("user_id"),
          col("event_type"),
          col("value").as("amount"),
          col("props")
        ).as("value")
      )

  def open(spark: SparkSession, sfDir: String): (ParquetLog, MultiLog, KVIndex) =
    cache.getOrElseUpdate(
      sfDir, {
        val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
        // version-stamped so a cached fixture from an older engine
        // schema (e.g. pre-bucket multilog) can never be picked up —
        // bump when storage schemas change
        val base =
          s"${sys.props("java.io.tmpdir")}/graft-fixtures/${EngineFixtures.Version}/$tag"
        val events = Tables.load(spark, sfDir, "events")
        val logDir = s"$base/log"
        val done = Paths.get(base, "DONE")
        val log =
          if (Files.exists(done)) {
            ParquetLog.open(spark, logDir)
          } else {
            deleteRecursively(Paths.get(base))
            Files.createDirectories(Paths.get(base))
            val l = ParquetLog.open(
              spark,
              logDir,
              eventValue(events).schema.head.dataType
            )
            l.append(eventValue(events))
            l
          }
        val mlog = MultiLog.open(spark, s"$base/mlog")
        val mlogCursor = KVIndex.open(spark, s"$base/mlog-cursor")
        val kv = KVIndex.open(spark, s"$base/kv")
        if (!Files.exists(done)) {
          // multilog: route each entry into its event_type sublog
          MultiLogSink.pump(
            log,
            mlog,
            mlogCursor,
            batch =>
              batch.select(col("value.event_type").as("addr"), col("seq"))
          )
          // KV index: latest props JSON per user, ordered by log seq
          SinkIndex.pump(
            log,
            kv,
            batch =>
              batch.select(
                col("value.user_id").as("addr"),
                col("value.props").as("value"),
                col("seq").as("useq")
              )
          )
          Files.writeString(done, "ok")
        }
        (log, mlog, kv)
      }
    )
}
