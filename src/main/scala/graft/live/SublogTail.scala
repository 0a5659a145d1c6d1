package graft.live

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

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
  * The counters are CHECKPOINT-PERSISTENT: rank/high-water/remaining
  * are snapshotted into a sidecar file under the checkpoint dir at
  * each micro-batch boundary (pre-state at batch start, post-state at
  * completion), so a push restarted against an existing checkpoint
  * resumes with the exact ranks the stream's committed offset implies
  * — a driver-local counter would silently restart ranks at 0 while
  * the source skips already-delivered rows. A batch replayed across a
  * restart (crash between foreachBatch completing and the offset
  * commit) restores its PRE-state, so the replay re-delivers the same
  * rows with the same ranks (at-least-once, matching
  * [[LiveTail.push]]'s replay story).
  *
  * Re-delivery guard: fan-out batches for one sublog are monotone in
  * parent seq (the sink replays the parent log cursor in order), so a
  * delivered-seq high-water mark drops BOTH idempotent re-appends and
  * whole-history re-discoveries after `delete`/`compact` rewrites —
  * the raw [[MultiLog.liveSublog]] stream has no such guard (its
  * scaladoc says so) and this is the tail consumers should use.
  */
object SublogTail {

  /** Counter snapshot persisted beside the checkpoint: the pre-state
    * of batch `batchId` plus, once it completed, its post-state. */
  private final case class RankState(
      batchId: Long,
      preRank: Long,
      preHigh: Long,
      preRemaining: Long,
      post: Option[(Long, Long, Long)]
  )

  // The sidecar lives UNDER the stream's checkpointLocation, which is
  // a Hadoop path (file:/, hdfs://, s3a://, …) — so all state I/O goes
  // through the checkpoint filesystem, not java.nio: a local-path
  // sidecar beside an hdfs:// checkpoint would land in the driver's
  // cwd and silently restore nothing after a driver move.
  private def stateFile(checkpoint: String) =
    new HPath(checkpoint, "graft-sublog-rank-state")

  private def writeState(conf: Configuration, checkpoint: String,
      s: RankState): Unit = {
    val p = stateFile(checkpoint)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p.getParent)
    val tmp = new HPath(p.getParent, p.getName + ".tmp")
    val post = s.post.map { case (a, b, c) => s"1,$a,$b,$c" }.getOrElse("0,0,0,0")
    val out = fs.create(tmp, true)
    try out.write(
      s"${s.batchId},${s.preRank},${s.preHigh},${s.preRemaining},$post"
        .getBytes(UTF_8))
    finally out.close()
    // rename-into-place; HDFS/local rename won't overwrite, so drop
    // the old snapshot first (the tmp file is complete at this point —
    // a crash between delete and rename loses only the PREVIOUS
    // snapshot, and the .tmp still holds the current one)
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  private def readState(conf: Configuration, checkpoint: String):
      Option[RankState] = {
    val p = stateFile(checkpoint)
    val fs = p.getFileSystem(conf)
    val target =
      if (fs.exists(p)) Some(p)
      else { // crash window above: fall back to the completed .tmp
        val tmp = new HPath(p.getParent, p.getName + ".tmp")
        if (fs.exists(tmp)) Some(tmp) else None
      }
    target.flatMap { q =>
      try {
        val in = fs.open(q)
        val bytes =
          try org.apache.commons.io.IOUtils.toByteArray(in)
          finally in.close()
        val f = new String(bytes, UTF_8).trim.split(",")
        Some(RankState(f(0).toLong, f(1).toLong, f(2).toLong, f(3).toLong,
          if (f(4) == "1") Some((f(5).toLong, f(6).toLong, f(7).toLong))
          else None))
      } catch { case _: Exception => None }
    }
  }

  /** Start a push-mode rank query on `mlog`'s sublog `addr`: `sink`
    * receives `(rank, parentSeq)` pairs in rank order. Bounds / Limit /
    * SeqWrap follow the QuerySpec algebra over RANKS. Returns the
    * running StreamingQuery; bounded queries stop themselves
    * (including degenerate bounds — Limit(0) or an empty rank window
    * never waits for a row that cannot arrive). */
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
    // degenerate bounds complete IMMEDIATELY (LiveTail.push's rule): an
    // empty rank window or Limit(0) delivers nothing, and waiting for a
    // row that can never arrive would leak a running stream
    val emptyRange =
      plan.upper.exists(u => u <= lower) || plan.limit == 0L

    // resume: restore the persisted counters (post-state of the last
    // completed batch, or pre-state of an interrupted one)
    val hconf = mlog.spark.sessionState.newHadoopConf()
    val persisted = readState(hconf, checkpoint)
    persisted.foreach { s =>
      val (r, h, rem) = s.post.getOrElse((s.preRank, s.preHigh, s.preRemaining))
      nextRank.set(r); highWater.set(h); remaining.set(rem)
    }
    // volatile view of the last persisted record for replay detection
    val lastState = new java.util.concurrent.atomic.AtomicReference[Option[RankState]](persisted)

    val query = mlog
      .liveSublog(addr)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (emptyRange) completion.complete()
        else if (!completion.isDone) {
          lastState.get() match {
            case Some(s) if s.batchId == bid =>
              // cross-restart replay of this batch: rank it exactly as
              // the original run did
              nextRank.set(s.preRank)
              highWater.set(s.preHigh)
              remaining.set(s.preRemaining)
            case _ =>
              val pre = RankState(bid, nextRank.get(), highWater.get(),
                remaining.get(), None)
              writeState(hconf, checkpoint, pre)
              lastState.set(Some(pre))
          }
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
          lastState.get().foreach { s =>
            val done = s.copy(post =
              Some((nextRank.get(), highWater.get(), remaining.get())))
            writeState(hconf, checkpoint, done)
            lastState.set(Some(done))
          }
        }
        (): Unit
      }
      .start()
    // a restored bounded query may already be exhausted: without this,
    // the delivery gate just skips rows forever and the stream leaks
    if (emptyRange || remaining.get() == 0L ||
      plan.upper.exists(u => nextRank.get() >= u))
      completion.complete()
    completion.attach(query)
    query
  }
}
