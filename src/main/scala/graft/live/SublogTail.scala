package graft.live

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core._
import graft.multilog.MultiLog

/** Live RANK-SPACE queries over one sublog — the reference's full
  * QuerySpec algebra on live multilog queries
  * (multilog/roaring/qry.go:86-179, where bounds/limit address ranks
  * within the sublog, not parent seqs), on Structured Streaming.
  *
  * Rank accounting: each newly observed (addr, seq) row is assigned the
  * next rank in sublog order (a running counter — exactly the
  * reference's cursor walk over the bitmap). Bounds select a rank
  * window: rows below the lower bound consume ranks but are not
  * delivered; the query SELF-TERMINATES once the upper bound or Limit
  * is exhausted, like [[LiveTail.push]].
  *
  * Re-delivery guard: fan-out batches for one sublog are monotone in
  * parent seq (the sink replays the parent log cursor in order), so a
  * delivered-seq high-water mark drops BOTH idempotent re-appends and
  * whole-history re-discoveries after `delete`/`compact` rewrites —
  * the raw [[MultiLog.liveSublog]] stream has no such guard (its
  * scaladoc says so) and this is the tail consumers should use.
  */
object SublogTail {

  /** Start a push-mode rank query on `mlog`'s sublog `addr`: `sink`
    * receives `(rank, parentSeq)` pairs in rank order. Bounds / Limit /
    * SeqWrap follow the QuerySpec algebra over RANKS. Returns the
    * running StreamingQuery; bounded queries stop themselves. */
  def push(
      mlog: MultiLog,
      addr: String,
      specs: Seq[QuerySpec],
      checkpoint: String,
      sink: (Long, Long) => Unit
  ): StreamingQuery = {
    val plan = QueryPlan.of(specs: _*)
    require(plan.live, "push requires Live(true)")
    val lower = plan.lower.getOrElse(0L)
    val remaining =
      new AtomicLong(if (plan.limit < 0) Long.MaxValue else plan.limit)
    val nextRank = new AtomicLong(0L)
    val highWater = new AtomicLong(Long.MinValue)
    val completion = new Completion

    val query = mlog
      .liveSublog(addr)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!completion.isDone) {
          // sorted chunked pull (see LiveTail.push): driver memory is
          // bounded by one partition, not one micro-batch
          val it = batch.sort("seq").toLocalIterator()
          while (it.hasNext && !completion.isDone) {
            val s = it.next().getLong(1) // (addr, seq)
            // high-water guard: duplicates and rewrite re-discoveries
            // arrive with seq <= already-ranked maximum — skip them so
            // they neither re-deliver nor burn a rank
            if (s > highWater.get()) {
              highWater.set(s)
              val rank = nextRank.getAndIncrement()
              if (rank >= lower && plan.upper.forall(rank < _) &&
                remaining.get() > 0) {
                sink(rank, s)
                if (remaining.decrementAndGet() == 0) completion.complete()
              }
              if (plan.upper.exists(u => nextRank.get() >= u))
                completion.complete()
            }
          }
        }
        (): Unit
      }
      .start()
    completion.attach(query)
    query
  }
}
