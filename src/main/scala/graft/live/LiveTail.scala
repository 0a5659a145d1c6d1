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
    * `(seq, value, nulled)` row in strict seq order. Returns the
    * running StreamingQuery; stop it to cancel (the reference's
    * ctx-done).
    *
    * Ordering: a multi-file append can be discovered across several
    * micro-batches in file-mtime order, so rows may arrive ahead of
    * the cursor. A reorder buffer holds them and releases only the
    * contiguous run from the expected seq — dense seqs make "next"
    * well-defined (the same guarantee the reference gets from its
    * single cursor walk, offset2/qry.go:101-189). The buffer holds at
    * most the in-flight discovery window. */
  def push(
      log: ParquetLog,
      specs: Seq[QuerySpec],
      checkpoint: String,
      sink: Row => Unit
  ): StreamingQuery = {
    val plan = QueryPlan.of(specs: _*)
    require(plan.live, "push requires Live(true)")
    val remaining = new AtomicLong(if (plan.limit < 0) Long.MaxValue else plan.limit)
    // internal stream always carries seq (the cursor); the user-facing
    // row shape is (seq, value, nulled) regardless of SeqWrap
    val internalSpecs = specs.filterNot(_.isInstanceOf[QuerySpec.SeqWrap]) :+
      QuerySpec.SeqWrap(true)
    val expected = new AtomicLong(plan.lower.getOrElse(0L))
    val pending = new java.util.concurrent.ConcurrentSkipListMap[Long, Row]()
    val stream = log.liveQuery(internalSpecs: _*)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r => pending.put(r.getLong(0), r))
        var head = pending.firstEntry()
        while (head != null && head.getKey == expected.get()) {
          if (remaining.getAndDecrement() > 0) sink(head.getValue)
          pending.remove(head.getKey)
          expected.incrementAndGet()
          head = pending.firstEntry()
        }
        (): Unit
      }
      .start()
  }

  /** The `Changes()` observable (offset2/log.go:352-354): invoke
    * `onSeq` with the latest appended seq after each micro-batch.
    * Monotonic: a late-discovered file with lower seqs (multi-file
    * append split across triggers) never moves the observable
    * backwards. */
  def changes(
      log: ParquetLog,
      checkpoint: String,
      onSeq: Long => Unit
  ): StreamingQuery = {
    val highWater = new AtomicLong(Long.MinValue)
    val stream = log.liveQuery(QuerySpec.Live(true), QuerySpec.SeqWrap(true))
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val m = batch.agg(max("seq")).collect().head
        if (!m.isNullAt(0)) {
          val v = m.getLong(0)
          val prev = highWater.getAndUpdate(cur => math.max(cur, v))
          if (v > prev) onSeq(v)
        }
        (): Unit
      }
      .start()
  }
}
