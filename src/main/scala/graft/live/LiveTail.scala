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
/** Self-termination machinery shared by bounded push queries
  * ([[LiveTail.push]], [[SublogTail.push]]): once complete() fires, the
  * StreamingQuery is stopped from a daemon thread — stop() must not be
  * called from the micro-batch thread (it joins that thread) — and a
  * completion that races the query-handle publication still stops it. */
private[live] final class Completion {
  private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val ref =
    new java.util.concurrent.atomic.AtomicReference[StreamingQuery]()

  def isDone: Boolean = done.get()

  private def stopAsync(q: StreamingQuery): Unit = {
    val t = new Thread(() => try q.stop() catch { case _: Throwable => () })
    t.setName("graft-live-push-stop")
    t.setDaemon(true)
    t.start()
  }

  def complete(): Unit =
    if (done.compareAndSet(false, true)) {
      val q = ref.get()
      if (q != null) stopAsync(q)
    }

  def attach(q: StreamingQuery): Unit = {
    ref.set(q)
    if (done.get()) stopAsync(q)
  }
}

object LiveTail {

  /** Start a push-mode query: `sink` is called with each delivered
    * row in strict seq order — `(seq, value, nulled)` under
    * `SeqWrap(true)`, bare `(value, nulled)` when unwrapped, the same
    * projection as the pull side and the reference's push pour
    * (offset2/qry.go:184-188). Returns the running StreamingQuery;
    * stop it to cancel (the reference's ctx-done). When a `Limit(n)`
    * or upper bound is exhausted the query STOPS ITSELF — the
    * reference's push queries complete when their countdown hits zero
    * / the cursor passes the bound (offset2/qry.go:283-319); a bounded
    * live consumer must not leak a running stream.
    *
    * Ordering comes from the transport: the seq-offset connector
    * stream delivers each micro-batch as a CONTIGUOUS `(start, end]`
    * seq range, exactly once, rewrite-immune — so a per-batch sort is
    * total order, with no reorder buffer and no re-delivery purge
    * (the machinery a raw file tail would need). Each batch drains
    * through a sorted `toLocalIterator`, so catch-up over an
    * arbitrarily large backlog never materializes a whole micro-batch
    * on the driver.
    *
    * SCALE STEER: this is the driver-funnel delivery path — the right
    * one for a single-process consumer wanting strict total order
    * (the reference's `luigi.Sink` contract). A cluster-scale
    * consumer should use [[pushDistributed]] (sink on executors,
    * per-partition order) or `SinkIndex.pump` (log→index, fully
    * distributed). */
  def push(
      log: ParquetLog,
      specs: Seq[QuerySpec],
      checkpoint: String,
      sink: Row => Unit
  ): StreamingQuery = {
    val plan = QueryPlan.of(specs: _*)
    require(plan.live, "push requires Live(true)")
    val remaining = new AtomicLong(if (plan.limit < 0) Long.MaxValue else plan.limit)
    // internal stream always carries seq (the cursor for the upper-
    // bound check); the SeqWrap projection is applied at delivery
    val internalSpecs = specs.filterNot(_.isInstanceOf[QuerySpec.SeqWrap]) :+
      QuerySpec.SeqWrap(true)
    val completion = new Completion

    // Degenerate bounds complete IMMEDIATELY: an empty range
    // (upper <= lower) or Limit(0) delivers nothing, and the batch-side
    // check below ("a delivered row reached upper-1") would otherwise
    // wait for a row that can never arrive — leaking a running stream,
    // the invariant a bounded live consumer must not break.
    val emptyRange =
      plan.upper.exists(u => u <= plan.lower.getOrElse(0L)) ||
        plan.limit == 0L

    val stream = log.liveQuery(internalSpecs: _*)
    val query = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (emptyRange) completion.complete()
        else if (!completion.isDone) {
          var last = Long.MinValue
          val it = batch.sort("seq").toLocalIterator()
          while (it.hasNext && !completion.isDone) {
            val r = it.next()
            last = r.getLong(0)
            if (remaining.get() > 0) {
              sink(if (plan.seqWrap) r
                else Row.fromSeq(r.toSeq.drop(1)))
              if (remaining.decrementAndGet() == 0) completion.complete()
            }
          }
          if (plan.upper.exists(u => last >= u - 1)) completion.complete()
        }
        (): Unit
      }
      .start()
    if (emptyRange) completion.complete()
    completion.attach(query)
    query
  }

  /** Partition-PARALLEL push — the cluster-scale delivery path for
    * live queries. [[push]] drains every micro-batch through one
    * sorted driver-side iterator, faithful to the reference's
    * single-process sink contract (offset2/qry.go:191-320) — but a
    * 1000-executor consumer must not funnel through the driver.
    * Here `sink` runs ON EXECUTORS, once per partition per
    * micro-batch, via `foreachPartition`.
    *
    * Contract differences from [[push]], both inherent to
    * distribution:
    *   - Ordering is PER PARTITION: with `partitions > 0` each
    *     micro-batch is range-partitioned on seq (contiguous seq
    *     span per partition) and sorted within, so every sink call
    *     sees an ascending contiguous slice; calls themselves run
    *     concurrently. Global total order requires the driver funnel
    *     — that is [[push]].
    *   - The sink closure is serialized to executors; deliveries on
    *     a failed-then-retried task can repeat (foreachBatch is
    *     at-least-once per batch, same as [[push]]'s replay story).
    *   - The sink is never invoked on an empty slice: empty shuffle
    *     partitions and batches a limit cut filters to zero rows are
    *     skipped before the call, so per-call side effects (e.g. a
    *     transaction per invocation) fire only for real deliveries.
    *
    * Limit/upper accounting never needs executor coordination: seqs
    * are DENSE and each micro-batch is a contiguous range, so the
    * remaining-count cut is pure seq arithmetic on the driver — the
    * batch is filtered to `seq < cut` BEFORE fan-out and no
    * over-delivery can happen. Self-termination matches [[push]]
    * (exhausted limit / reached upper bound / degenerate range stop
    * the query).
    *
    * Per-batch cost: the UNBOUNDED tail (no limit, no upper bound)
    * with `partitions = 0` is one pass — straight to delivery on the
    * connector's own seq-contiguous partitions. A limit/upper bound
    * adds one min/max agg pass (the cut arithmetic needs the batch's
    * span); `partitions > 0` adds repartitionByRange's sampling pass
    * plus the shuffle — opt in only when the connector's partition
    * grain doesn't fit the consumer. */
  def pushDistributed(
      log: ParquetLog,
      specs: Seq[QuerySpec],
      checkpoint: String,
      sink: Iterator[Row] => Unit,
      partitions: Int = 0,
      sourceOptions: Map[String, String] = Map.empty
  ): StreamingQuery = {
    val plan = QueryPlan.of(specs: _*)
    require(plan.live, "push requires Live(true)")
    val remaining =
      new AtomicLong(if (plan.limit < 0) Long.MaxValue else plan.limit)
    val internalSpecs = specs.filterNot(_.isInstanceOf[QuerySpec.SeqWrap]) :+
      QuerySpec.SeqWrap(true)
    val completion = new Completion
    val emptyRange =
      plan.upper.exists(u => u <= plan.lower.getOrElse(0L)) ||
        plan.limit == 0L

    val stream = log.liveQueryWith(sourceOptions, internalSpecs: _*)
    val query = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        def deliver(df: DataFrame): Unit = {
          val parted =
            if (partitions > 0) df.repartitionByRange(partitions, col("seq"))
            else df
          val ordered = parted.sortWithinPartitions("seq")
          val projected = if (plan.seqWrap) ordered else ordered.drop("seq")
          // empty shuffle partitions (and limit cuts that filter a
          // batch to zero rows) never reach the sink — matching
          // push's per-row invocation discipline, so sinks with
          // per-call side effects see only non-empty slices
          projected.foreachPartition { (it: Iterator[Row]) =>
            if (it.hasNext) sink(it)
          }
        }
        val bounded = plan.limit >= 0 || plan.upper.nonEmpty
        if (emptyRange) completion.complete()
        else if (!completion.isDone) {
          if (!bounded) deliver(batch) // unbounded tail: ONE pass
          else {
            // one driver-side agg per batch: the batch's seq span,
            // needed only when a cut or bound check exists
            val mm = batch.agg(min("seq"), max("seq")).collect().head
            if (!mm.isNullAt(0)) {
              val mn = mm.getLong(0)
              val mx = mm.getLong(1)
              // exclusive cut: the seq threshold the remaining count
              // buys (dense seqs ⇒ rows in [mn, cut) number cut − mn)
              val cut =
                if (remaining.get() >= mx - mn + 1) mx + 1
                else mn + remaining.get()
              deliver(if (cut > mx) batch else batch.where(col("seq") < cut))
              remaining.addAndGet(-(math.min(cut, mx + 1) - mn))
              if (remaining.get() <= 0) completion.complete()
              if (plan.upper.exists(u => mx >= u - 1)) completion.complete()
            }
          }
        }
        (): Unit
      }
      .start()
    if (emptyRange) completion.complete()
    completion.attach(query)
    query
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

  /** Block until the log's seq reaches at least `n` — the reference's
    * seq-observable wait (internal/seqobsv/seqobsv.go:69-83, used by
    * go-ssb to await replication progress). Fast path: if the log is
    * already there, no stream is started at all. Returns true when
    * reached, false on timeout; the underlying changes() stream is
    * stopped either way. */
  def waitFor(
      log: ParquetLog,
      n: Long,
      checkpoint: String,
      timeoutMs: Long
  ): Boolean = {
    if (log.seq >= n) return true
    val latch = new java.util.concurrent.CountDownLatch(1)
    val q = changes(log, checkpoint, s => if (s >= n) latch.countDown())
    try {
      // the subscription races the append: re-check committed state
      if (log.seq >= n) return true
      latch.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    } finally q.stop()
  }
}
