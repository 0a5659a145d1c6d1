package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.IntegerType

import graft.core.QuerySpec._
import graft.live.LiveTail
import graft.storage.ParquetLog

/** Live-query contracts (reference: offset2/test/pumplive.go:23-166,
  * test/concurrent.go, internal/seqobsv): backlog catch-up then
  * append-after-subscribe delivery, in seq order; Changes() observable
  * reflects the latest seq. Parity asserts delivery + order, not
  * sub-trigger latency (SURVEY §7.4 item 2).
  */
class LiveSpec extends SparkSpec {

  test("push: catch-up backlog then live appends, in order") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("live"), IntegerType)
    log.appendValues(Seq(1, 2, 3))
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = LiveTail.push(
      log,
      Seq(Live(true), SeqWrap(true)),
      tmpDir("ckpt"),
      r => { seen.add(r.getLong(0)); () }
    )
    try {
      q.processAllAvailable() // backlog drained
      assert(seen.asScala.toList == Seq(0L, 1L, 2L))
      log.appendValues(Seq(4, 5))
      q.processAllAvailable() // live delivery
      assert(seen.asScala.toList == Seq(0L, 1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("push honors bounds and limit across batches") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("livelim"), IntegerType)
    log.appendValues(Seq(10, 20, 30, 40, 50))
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = LiveTail.push(
      log,
      Seq(Gt(0), Limit(3), Live(true), SeqWrap(true)),
      tmpDir("ckpt2"),
      r => { seen.add(r.getLong(0)); () }
    )
    try {
      q.processAllAvailable()
      log.appendValues(Seq(60, 70))
      q.processAllAvailable()
      // Gt(0) skips seq 0; Limit(3) stops after 3 deliveries
      assert(seen.asScala.toList == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("push self-terminates when Limit is exhausted (qry.go:283-319)") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("livedone"), IntegerType)
    log.appendValues(Seq(10, 20, 30, 40, 50))
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = LiveTail.push(
      log,
      Seq(Limit(2), Live(true), SeqWrap(true)),
      tmpDir("ckptdone"),
      r => { seen.add(r.getLong(0)); () }
    )
    try {
      // the query must stop ITSELF once 2 rows are delivered — no leak
      assert(q.awaitTermination(60000), "query did not self-terminate")
      assert(seen.asScala.toList == Seq(0L, 1L))
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()
  }

  test("push self-terminates when the upper bound is reached") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("liveub"), IntegerType)
    log.appendValues(Seq(10, 20, 30, 40))
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = LiveTail.push(
      log,
      Seq(Lt(3), Live(true), SeqWrap(true)),
      tmpDir("ckptub"),
      r => { seen.add(r.getLong(0)); () }
    )
    try {
      assert(q.awaitTermination(60000), "query did not self-terminate")
      assert(seen.asScala.toList == Seq(0L, 1L, 2L))
    } finally if (q.isActive) q.stop()
  }

  test("push with a degenerate range completes immediately, delivering nothing") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("liveempty"), IntegerType)
    log.appendValues(Seq(10, 20, 30))
    val seen = new ConcurrentLinkedQueue[Long]()
    // upper <= lower: the plan filters every row, and the "last
    // delivered seq reached upper-1" check can never fire — the
    // stream must not leak (the bounded-live-consumer invariant)
    val q = LiveTail.push(
      log,
      Seq(Gte(200), Lt(150), Live(true), SeqWrap(true)),
      tmpDir("ckptempty"),
      r => { seen.add(r.getLong(0)); () }
    )
    try {
      assert(q.awaitTermination(60000), "empty-range push did not terminate")
      assert(seen.isEmpty)
    } finally if (q.isActive) q.stop()
    // Limit(0) is the same degenerate contract
    val q0 = LiveTail.push(
      log,
      Seq(Limit(0), Live(true), SeqWrap(true)),
      tmpDir("ckptzero"),
      r => { seen.add(r.getLong(0)); () }
    )
    try {
      assert(q0.awaitTermination(60000), "Limit(0) push did not terminate")
      assert(seen.isEmpty)
    } finally if (q0.isActive) q0.stop()
  }

  test("pushDistributed: executor-side delivery, per-partition order, " +
      "exact set; limit self-terminates via the driver-side seq cut") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("livedist"), IntegerType)
    log.appendValues((0 until 150).map(_ * 10))
    DistCollector.reset()
    val q = LiveTail.pushDistributed(
      log,
      Seq(Live(true), SeqWrap(true)),
      tmpDir("ckptdist"),
      DistCollector.sink,
      partitions = 4
    )
    try {
      q.processAllAvailable()
      val calls = DistCollector.calls.asScala.toList
      // every row delivered exactly once, values intact
      val all = calls.flatten
      assert(all.map(_._1).sorted == (0L until 150L).toList)
      assert(all.forall { case (seq, v) => v == seq * 10 })
      // the sink is NEVER invoked on an empty slice (empty shuffle
      // partitions are skipped before the call — contract in scaladoc)
      assert(calls.forall(_.nonEmpty), "sink invoked with an empty slice")
      // each sink call saw an ascending CONTIGUOUS seq slice
      calls.foreach { c =>
        val seqs = c.map(_._1)
        assert(seqs == (seqs.head to seqs.last).toList,
          s"partition slice not contiguous-ascending: $seqs")
      }
      // live appends flow too
      log.appendValues(Seq(9990))
      q.processAllAvailable()
      assert(DistCollector.calls.asScala.toList.flatten.map(_._1).sorted
        == (0L to 150L).toList)
      // the 1-row batch fanned out to 4 partitions: the 3 empty ones
      // must have been skipped, not delivered as empty iterators
      assert(DistCollector.calls.asScala.forall(_.nonEmpty))
    } finally q.stop()

    // Limit: the dense-seq cut bounds delivery EXACTLY, before fan-out,
    // and the query stops itself
    DistCollector.reset()
    val q2 = LiveTail.pushDistributed(
      log,
      Seq(Limit(60), Live(true), SeqWrap(true)),
      tmpDir("ckptdistlim"),
      DistCollector.sink,
      partitions = 4
    )
    try {
      assert(q2.awaitTermination(60000), "limited push did not self-terminate")
      assert(DistCollector.calls.asScala.toList.flatten.map(_._1).sorted
        == (0L until 60L).toList)
    } finally if (q2.isActive) q2.stop()

    // unwrapped projection delivers bare values on executors
    DistCollector.reset()
    val q3 = LiveTail.pushDistributed(
      log,
      Seq(Lt(3), Live(true)),
      tmpDir("ckptdistuw"),
      DistCollector.sinkBare,
      partitions = 2
    )
    try {
      assert(q3.awaitTermination(60000), "bounded push did not self-terminate")
      assert(DistCollector.bare.asScala.toList.sorted == List(0, 10, 20))
    } finally if (q3.isActive) q3.stop()
  }

  test("pushDistributed: limit cut lands MID-backlog under " +
      "maxSeqsPerTrigger admission control") {
    import spark.implicits._
    // 1000-row backlog paced into ~100-seq micro-batches: the Limit(250)
    // cut lands inside the third batch (seqs 200..299 → cut at 250),
    // exercising the cross-batch remaining accounting, not just the
    // single-batch cut the earlier vector covers
    val log = ParquetLog.open(spark, tmpDir("livedistcut"), IntegerType)
    log.appendValues((0 until 1000).map(_ * 3))
    DistCollector.reset()
    val q = LiveTail.pushDistributed(
      log,
      Seq(Limit(250), Live(true), SeqWrap(true)),
      tmpDir("ckptdistcut"),
      DistCollector.sink,
      partitions = 4,
      sourceOptions = Map("maxSeqsPerTrigger" -> "100")
    )
    try {
      assert(q.awaitTermination(120000), "paced limited push did not self-terminate")
      val calls = DistCollector.calls.asScala.toList
      // exact limit accounting: exactly seqs 0..249, each once
      val all = calls.flatten
      assert(all.map(_._1).sorted == (0L until 250L).toList)
      assert(all.forall { case (seq, v) => v == seq * 3 })
      // admission control actually paced: more than one sink call span
      // (each micro-batch fans out to ≤4 slices of ≤100 seqs)
      assert(calls.size > 4, s"expected paced multi-batch fan-out, got ${calls.size} calls")
      // every slice non-empty, ascending, contiguous
      assert(calls.forall(_.nonEmpty), "sink invoked with an empty slice")
      calls.foreach { c =>
        val seqs = c.map(_._1)
        assert(seqs == (seqs.head to seqs.last).toList,
          s"partition slice not contiguous-ascending: $seqs")
      }
    } finally if (q.isActive) q.stop()
  }

  test("segment rewrite during an active push does not wedge delivery") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("livenull"), IntegerType)
    log.appendValues(Seq(1, 2, 3))
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = LiveTail.push(
      log,
      Seq(Live(true), SeqWrap(true)),
      tmpDir("ckptnull"),
      r => { seen.add(r.getLong(0)); () }
    )
    try {
      q.processAllAvailable()
      assert(seen.asScala.toList == Seq(0L, 1L, 2L))
      // rewrite an already-delivered segment: the file stream will
      // re-discover the rewritten file and re-deliver seqs < cursor —
      // those must be dropped, and NEW appends must still flow
      log.nullAt(1)
      q.processAllAvailable()
      log.appendValues(Seq(4, 5))
      q.processAllAvailable()
      assert(seen.asScala.toList == Seq(0L, 1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("push pours bare values when unwrapped (qry.go:184-188)") {
    // SeqWrap(false) — or simply not asking for SeqWrap — delivers
    // the same projection as the pull side: (value, nulled), no seq
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("livebare"), IntegerType)
    log.appendValues(Seq(10, 20, 30))
    val seen = new ConcurrentLinkedQueue[(Int, Boolean)]()
    val q = LiveTail.push(
      log,
      Seq(Live(true)),
      tmpDir("ckptbare"),
      r => {
        assert(r.length == 2, s"expected bare (value, nulled) row, got $r")
        seen.add((r.getInt(0), r.getBoolean(1)))
        ()
      }
    )
    try {
      q.processAllAvailable()
      assert(seen.asScala.toList == List((10, false), (20, false), (30, false)))
      log.appendValues(Seq(40))
      q.processAllAvailable()
      assert(seen.asScala.toList ==
        List((10, false), (20, false), (30, false), (40, false)))
    } finally q.stop()
  }

  test("changes observable tracks the latest seq") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("chg"), IntegerType)
    log.appendValues(Seq(1))
    @volatile var last = -1L
    val q = LiveTail.changes(log, tmpDir("ckpt3"), s => last = s)
    try {
      q.processAllAvailable()
      assert(last == 0L)
      log.appendValues(Seq(2, 3))
      q.processAllAvailable()
      assert(last == 2L)
    } finally q.stop()
  }

  test("live sublog tailing delivers new fan-out rows for one addr") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val mlog = graft.multilog.MultiLog.open(spark, tmpDir("livesub"))
    mlog.appendBatch(Seq(("a", 0L), ("b", 1L), ("a", 2L)).toDF("addr", "seq"))
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = mlog
      .liveSublog("a")
      .writeStream
      .option("checkpointLocation", tmpDir("lsckpt"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.orderBy("seq").collect().foreach(r => seen.add(r.getLong(1)))
        (): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.asScala.toList == Seq(0L, 2L)) // addr-filtered backlog
      mlog.appendBatch(Seq(("a", 5L), ("b", 6L)).toDF("addr", "seq"))
      q.processAllAvailable()
      assert(seen.asScala.toList == Seq(0L, 2L, 5L)) // only addr 'a'
    } finally q.stop()
  }

  test("waitFor blocks until the log reaches the target seq") {
    // reference: internal/seqobsv WaitFor (seqobsv.go:69-83)
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("wf"), IntegerType)
    log.appendValues(Seq(1, 2))
    // already reached: immediate, no stream
    assert(LiveTail.waitFor(log, 1L, tmpDir("wfck1"), timeoutMs = 1000))
    // not yet reached: a delayed appender satisfies it
    val appender = new Thread(() => {
      Thread.sleep(300)
      log.appendValues(Seq(3, 4, 5))
      (): Unit
    })
    appender.start()
    try assert(LiveTail.waitFor(log, 4L, tmpDir("wfck2"), timeoutMs = 30000))
    finally appender.join()
    // unreachable target times out false
    assert(!LiveTail.waitFor(log, 99L, tmpDir("wfck3"), timeoutMs = 1500))
  }

  test("liveSublog(dedup) survives delete/compact rewrites without re-delivery") {
    // ADVICE round-2: store.rewrite emits new files covering all
    // history and the file stream re-discovers them; the stateful
    // dedup variant must deliver each (addr, seq) exactly once anyway.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val mlog = graft.multilog.MultiLog.open(spark, tmpDir("ddsub"))
    mlog.appendBatch(Seq(("a", 0L), ("b", 1L), ("a", 2L)).toDF("addr", "seq"))
    val seen = new ConcurrentLinkedQueue[Long]()
    val q = mlog
      .liveSublog("a", dedup = true)
      .writeStream
      .option("checkpointLocation", tmpDir("ddckpt"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.orderBy("seq").collect().foreach(r => seen.add(r.getLong(1)))
        (): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.asScala.toList.sorted == Seq(0L, 2L))
      // rewrite all segments mid-tail (delete another addr + compact):
      // the raw stream would re-deliver 0 and 2 here
      mlog.delete("b")
      mlog.compact()
      q.processAllAvailable()
      assert(seen.asScala.toList.sorted == Seq(0L, 2L)) // no re-delivery
      mlog.appendBatch(Seq(("a", 7L)).toDF("addr", "seq"))
      q.processAllAvailable()
      assert(seen.asScala.toList.sorted == Seq(0L, 2L, 7L))
    } finally q.stop()
  }

  test("live rank-space sublog query: bounds+limit over ranks, self-stop") {
    // twin of multilog/test/multilog_live.go:21-112: live sublog query
    // with rank bounds keeps its algebra across appends
    import spark.implicits._
    val mlog = graft.multilog.MultiLog.open(spark, tmpDir("ranksub"))
    // sublog 'a' gets parent seqs 10, 20 (ranks 0, 1)
    mlog.appendBatch(Seq(("a", 10L), ("b", 11L), ("a", 20L)).toDF("addr", "seq"))
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    // rank window [1, 4): skip rank 0, deliver ranks 1..3, then stop
    val q = graft.live.SublogTail.push(
      mlog,
      "a",
      Seq(Gte(1), Lt(4), Live(true)),
      tmpDir("rsckpt"),
      (rank, seq) => { seen.add((rank, seq)); () }
    )
    try {
      q.processAllAvailable()
      assert(seen.asScala.toList == List((1L, 20L)))
      // live appends extend the rank space; 'b' rows don't rank in 'a'
      mlog.appendBatch(Seq(("a", 30L), ("b", 31L)).toDF("addr", "seq"))
      q.processAllAvailable()
      assert(seen.asScala.toList == List((1L, 20L), (2L, 30L)))
      mlog.appendBatch(Seq(("a", 40L), ("a", 50L)).toDF("addr", "seq"))
      // rank 3 delivered, rank 4 is past the upper bound → self-stop
      assert(q.awaitTermination(60000), "rank query did not self-terminate")
      assert(seen.asScala.toList == List((1L, 20L), (2L, 30L), (3L, 40L)))
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()
  }

  test("sublog rank tail: degenerate bounds self-terminate immediately") {
    import spark.implicits._
    val mlog = graft.multilog.MultiLog.open(spark, tmpDir("degsub"))
    mlog.appendBatch(Seq(("a", 0L), ("a", 1L)).toDF("addr", "seq"))
    // Limit(0): nothing to deliver — must not leak a running stream
    val q0 = graft.live.SublogTail.push(
      mlog, "a", Seq(Limit(0), Live(true)), tmpDir("degck0"),
      (_, _) => fail("Limit(0) must deliver nothing"))
    try assert(q0.awaitTermination(60000), "Limit(0) push did not self-stop")
    finally if (q0.isActive) q0.stop()
    // empty rank window (upper <= lower): same rule
    val q1 = graft.live.SublogTail.push(
      mlog, "a", Seq(Gte(5), Lt(5), Live(true)), tmpDir("degck1"),
      (_, _) => fail("empty window must deliver nothing"))
    try assert(q1.awaitTermination(60000), "empty-window push did not self-stop")
    finally if (q1.isActive) q1.stop()
  }

  test("sublog rank tail resumes from its checkpoint with correct ranks") {
    import spark.implicits._
    val mlog = graft.multilog.MultiLog.open(spark, tmpDir("ressub"))
    val ckpt = tmpDir("resck")
    mlog.appendBatch(Seq(("a", 10L), ("a", 20L), ("a", 30L)).toDF("addr", "seq"))
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val q = graft.live.SublogTail.push(
      mlog, "a", Seq(Live(true)), ckpt,
      (rank, seq) => { seen.add((rank, seq)); () })
    try {
      q.processAllAvailable()
      assert(seen.asScala.toList == List((0L, 10L), (1L, 20L), (2L, 30L)))
    } finally q.stop()
    // restart against the SAME checkpoint: the source skips the three
    // committed rows, and the persisted counter state must make the
    // next row rank 3 — a driver-local counter would restart at 0
    mlog.appendBatch(Seq(("a", 40L)).toDF("addr", "seq"))
    val seen2 = new ConcurrentLinkedQueue[(Long, Long)]()
    val q2 = graft.live.SublogTail.push(
      mlog, "a", Seq(Live(true)), ckpt,
      (rank, seq) => { seen2.add((rank, seq)); () })
    try {
      q2.processAllAvailable()
      assert(seen2.asScala.toList == List((3L, 40L)),
        s"resumed tail mis-ranked: ${seen2.asScala.toList}")
    } finally q2.stop()
    // a rank-WINDOW resume: only ranks >= 4 still owed
    mlog.appendBatch(Seq(("a", 50L)).toDF("addr", "seq"))
    val seen3 = new ConcurrentLinkedQueue[(Long, Long)]()
    val q3 = graft.live.SublogTail.push(
      mlog, "a", Seq(Gte(4), Lt(5), Live(true)), ckpt,
      (rank, seq) => { seen3.add((rank, seq)); () })
    try {
      assert(q3.awaitTermination(60000), "bounded resumed push did not self-stop")
      assert(seen3.asScala.toList == List((4L, 50L)))
    } finally if (q3.isActive) q3.stop()
  }

  test("sublog tail survives delete/compact rewrites without re-delivery") {
    import spark.implicits._
    val mlog = graft.multilog.MultiLog.open(spark, tmpDir("rwsub"))
    mlog.appendBatch(Seq(("a", 0L), ("b", 1L), ("a", 2L)).toDF("addr", "seq"))
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val q = graft.live.SublogTail.push(
      mlog,
      "a",
      Seq(Live(true)),
      tmpDir("rwckpt"),
      (rank, seq) => { seen.add((rank, seq)); () }
    )
    try {
      q.processAllAvailable()
      assert(seen.asScala.toList == List((0L, 0L), (1L, 2L)))
      // delete another addr + compact: both rewrite the index files and
      // the stream re-discovers the whole surviving history — the
      // high-water guard must drop it all
      mlog.delete("b")
      q.processAllAvailable()
      mlog.compact()
      q.processAllAvailable()
      assert(seen.asScala.toList == List((0L, 0L), (1L, 2L)))
      // idempotent re-append of an existing (addr, seq) is also dropped
      mlog.appendBatch(Seq(("a", 2L)).toDF("addr", "seq"))
      q.processAllAvailable()
      assert(seen.asScala.toList == List((0L, 0L), (1L, 2L)))
      // and NEW rows still flow with the next ranks
      mlog.appendBatch(Seq(("a", 7L)).toDF("addr", "seq"))
      q.processAllAvailable()
      assert(seen.asScala.toList == List((0L, 0L), (1L, 2L), (2L, 7L)))
    } finally q.stop()
  }

  test("reverse+live rejected on the live path too") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("rl"), IntegerType)
    log.appendValues(Seq(1))
    intercept[graft.core.GraftErrors.InvalidQuery] {
      log.liveQuery(Live(true), Reverse(true))
    }
  }
}

/** Executor-side sink collector for the pushDistributed vectors: a JVM
  * singleton — local-mode executors share the JVM, so the serialized
  * sink closure's module reference resolves back to this same object
  * (on a real cluster the sink would talk to an external system). */
object DistCollector {
  val calls = new ConcurrentLinkedQueue[List[(Long, Int)]]()
  val bare = new ConcurrentLinkedQueue[Int]()
  def reset(): Unit = { calls.clear(); bare.clear() }
  val sink: Iterator[org.apache.spark.sql.Row] => Unit = it => {
    calls.add(it.map(r => (r.getLong(0), r.getInt(1))).toList); ()
  }
  val sinkBare: Iterator[org.apache.spark.sql.Row] => Unit = it => {
    it.foreach(r => bare.add(r.getInt(0))); ()
  }
}
