package graft.live

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core._
import graft.storage.ParquetLog

/** Live (push-mode) queries over a [[ParquetLog]] — the reference's
  * `Live(true)` pull loop (offset2/qry.go:124-158) and push pipeline
  * (offset2/qry.go:191-320) on Structured Streaming:
  *
  *   - catch-up phase = the initial micro-batches over the backlog
  *   - live phase = subsequent file discoveries (every append lands new
  *     immutable parquet files, which ARE the broadcast — Spark gives
  *     multi-reader fan-out natively, one independent stream per
  *     consumer, no LockSink needed: foreachBatch is serialized per
  *     query by contract)
  *   - ordering: each micro-batch is sorted by seq before delivery, and
  *     file discovery follows append order, so delivery is in seq order
  *     like the reference's cursor walk
  *   - limit: enforced by per-query accounting in the sink
  *     (offset2/qry.go:105-108's countdown, here across batches)
  *
  * Latency is trigger-granularity, not same-append wakeup — parity
  * tests assert delivery + order, not sub-ms latency (SURVEY §7.4).
  */
object LiveTail {

  /** Start a push-mode query: `sink` is called with each delivered
    * `(seq, value, nulled)` row in seq order. Returns the running
    * StreamingQuery; stop it to cancel (the reference's ctx-done). */
  def push(
      log: ParquetLog,
      specs: Seq[QuerySpec],
      checkpoint: String,
      sink: Row => Unit
  ): StreamingQuery = {
    val plan = QueryPlan.of(specs: _*)
    require(plan.live, "push requires Live(true)")
    val remaining = new AtomicLong(if (plan.limit < 0) Long.MaxValue else plan.limit)
    val stream = log.liveQuery(specs: _*)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ordered = batch.orderBy(col("seq").asc).collect()
        ordered.foreach { r =>
          if (remaining.getAndDecrement() > 0) sink(r)
        }
        (): Unit
      }
      .start()
  }

  /** The `Changes()` observable (offset2/log.go:352-354): invoke
    * `onSeq` with the latest appended seq after each micro-batch. */
  def changes(
      log: ParquetLog,
      checkpoint: String,
      onSeq: Long => Unit
  ): StreamingQuery = {
    val stream = log.liveQuery(QuerySpec.Live(true), QuerySpec.SeqWrap(true))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val m = batch.agg(max("seq")).collect().head
        if (!m.isNullAt(0)) onSeq(m.getLong(0))
        (): Unit
      }
      .start()
  }
}
