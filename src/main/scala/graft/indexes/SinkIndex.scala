package graft.indexes

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.QuerySpec._
import graft.multilog.MultiLogApi
import graft.storage.ParquetLog

/** Derived-view builders: replay the log from a persisted cursor
  * through a user transform into an index — the reference's
  * `SinkIndex` (indexes/sinkindex.go:15-69) and multilog `Sink`
  * (multilog/sink.go:20-82) contract:
  *
  *   - resume: query the log with `Gt(savedSeq) + SeqWrap(true)`
  *     (indexes/sinkindex.go:29-37) — re-running after a stop
  *     processes only new entries (the "WithBreak" test contract,
  *     indexes/test/sinkindex.go:82-115)
  *   - nulled entries are skipped (indexes/sinkindex.go:51-55)
  *   - cursor saved after apply + idempotent upsert = exactly-once,
  *     strictly stronger than the reference's at-least-once
  *
  * The transform is set-oriented: it receives the whole new-entries
  * batch `(seq, value)` as a DataFrame and returns the update rows —
  * Spark's scale-out answer to the reference's per-entry
  * `StreamProcFunc`. For continuous operation the same transform runs
  * under Structured Streaming via [[graft.live.LiveTail]]; this batch
  * runner gives the synchronous replay/resume semantics the
  * conformance tests exercise.
  */
object SinkIndex {

  /** Pump new log entries through `proc` into a KV index.
    * `proc` maps a batch of `(seq, value, nulled)` rows to upsert rows
    * `(addr, value[, tombstone])`. Returns the number of log entries
    * consumed. */
  def pump(
      log: ParquetLog,
      idx: KV,
      proc: DataFrame => DataFrame
  ): Long = {
    val from = idx.getSeq
    val top = log.seq
    if (top <= from) return 0L
    // Lte(top) pins the batch to EXACTLY (from, top]: the connector
    // plans from the CURRENT manifest, so without the upper bound an
    // append racing the pump would be applied now but re-processed
    // next pump (idempotent, just wasted work) — bounded, the cursor
    // math and the batch agree by construction
    val batch = log
      .query(Gt(from), Lte(top), SeqWrap(true))
      .where(!col("nulled")) // skip redacted entries
    val updates = proc(batch)
    graft.storage.FaultPoints.reach("sink.pump.preApply")
    if (!updates.isEmpty) idx.applyBatch(updates)
    // CURSOR-AFTER discipline (the reference's SinkIndex,
    // indexes/sinkindex.go:39-50): a crash here re-processes (from,
    // top] next pump — exactly-once EFFECT via the idempotent upsert
    // (same updates, same per-addr winners), never a gap
    graft.storage.FaultPoints.reach("sink.pump.applied")
    idx.setSeq(top)
    top - from
  }
}

/** The multilog fan-out sink (multilog/sink.go:20-82): route each log
  * entry into zero or more sublogs. `fanout` maps the new-entries batch
  * `(seq, value, nulled)` to `(addr, seq)` index rows (the set-oriented
  * form of `multilog.Func`'s generator shape). */
object MultiLogSink {

  def pump(
      log: ParquetLog,
      mlog: MultiLogApi,
      cursorOwner: KV,
      fanout: DataFrame => DataFrame
  ): Long = {
    val from = cursorOwner.getSeq
    val top = log.seq
    if (top <= from) return 0L
    val batch = log
      .query(Gt(from), Lte(top), SeqWrap(true)) // exactly (from, top]
      .where(!col("nulled"))
    val rows = fanout(batch)
    graft.storage.FaultPoints.reach("mlogsink.pump.preAppend")
    if (!rows.isEmpty) mlog.appendBatch(rows)
    // cursor-after: a crash here replays the batch next pump; the
    // multilog dedups (addr, seq) on read, so the replayed rows are
    // invisible — the reference instead saves its cursor FIRST and
    // accepts losing the batch (multilog/sink.go:50-57); ours is the
    // strictly stronger side of that trade
    graft.storage.FaultPoints.reach("mlogsink.pump.appended")
    cursorOwner.setSeq(top)
    top - from
  }
}
