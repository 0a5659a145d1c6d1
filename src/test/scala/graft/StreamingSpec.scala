package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreamOps
import graft.streaming.EventStreamOps.{SessionIn, SessionOut}

/** Structured-Streaming operator tests: watermarked windowed aggs and
  * stateful sessionization driven by MemoryStream, plus batch/stream
  * agreement for the sessionizer.
  */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem
      .toDF()
      .toDF("ts", "event_type", "value")
    val agg = EventStreamOps.windowedCounts(df, "5 minutes", "10 minutes")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        (ts(0), "click", 1.0),
        (ts(1), "click", 2.0),
        (ts(6), "view", 3.0)
      )
      q.processAllAvailable()
      val rows = spark
        .table("win_out")
        .orderBy("win_start", "event_type")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("event_type") == "click")
      assert(rows(0).getAs[Long]("n") == 2)
      assert(rows(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("streaming content dedup keeps one doc per fingerprint across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    val out = EventStreamOps
      .streamingContentDedup(df, "text", "ts", "10 minutes")
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: an exact dup pair (whitespace/case-normalized) + one
      // unique; batch 2: a re-ingest of batch 1 content + one new
      mem.addData(
        (ts(0), 1L, "The quick  brown fox"),
        (ts(1), 2L, "the quick brown FOX"), // same fingerprint as 1
        (ts(2), 3L, "something else entirely")
      )
      q.processAllAvailable()
      mem.addData(
        (ts(3), 4L, "the quick brown fox"), // dup of surviving fp
        (ts(4), 5L, "genuinely new content")
      )
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // one survivor per fingerprint: {fox family}, {something}, {new}
      assert(rows.length == 3, s"got ${rows.toSeq}")
      val fps = rows.map(_._2.toLowerCase.replaceAll("\\s+", " ")).toSet
      assert(fps.size == 3)
      // the cross-batch re-ingest (doc 4) must NOT survive: its
      // fingerprint is still inside the watermark horizon
      assert(!rows.map(_._1).contains(4L))
      // survivors keep their full original rows (ts/id/text intact)
      assert(rows.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L, 5L)))
    } finally q.stop()
  }

  test("watermark dedup second geometry: 50s spacing / 30s delay straddles batches") {
    // q95 pins one spacing/delay pair (100s/30s: every re-arrival finds
    // state evicted except one boundary batch). This geometry pins the
    // OTHER regime: spacing (50s) > delay (30s) yet consecutive
    // re-arrivals still dedup, because the watermark lags arrivals by
    // the delay — state is evicted by the WATERMARK passing
    // first_ts + delay, not by event-time spacing. Plus an engineered
    // exact-equality boundary (wm == first_ts + delay).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def tsSec(s: Int): Timestamp = new Timestamp(1704103200000L + s * 1000L)
    val A = "content alpha"; val B = "content beta"
    val C = "pacer gamma"; val E = "content epsilon"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = EventStreamOps.streamingContentDedup(
      mem.toDF().toDF("ts", "doc_id", "text"), "text", "ts", "30 seconds")
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_geo2")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1 — first arrivals: E@40 (expiry 70), A@50 (expiry 80),
      // B@60 (expiry 90); wm after = 60 - 30 = 30
      mem.addData((tsSec(40), 3L, E), (tsSec(50), 1L, A), (tsSec(60), 2L, B))
      q.processAllAvailable()
      // batch 2 — A re-arrives 50s later: wm at start 30 < 80 → state
      // live → dropped; wm after = 100 - 30 = 70 == E's expiry
      mem.addData((tsSec(100), 4L, A))
      q.processAllAvailable()
      // batch 3 — A re-arrives ANOTHER 50s later: wm 70 < 80 → STILL
      // dropped (two straddled batches on one state generation);
      // E re-arrives at the EXACT boundary wm == first_ts + delay
      // (70 == 40 + 30) → expiry is INCLUSIVE: the state is already
      // evicted at equality, so E RE-EMITS (the boundary rule q95's
      // strict-inequality batches never reach);
      // pacer C first-arrives (emitted); wm after = 150 - 30 = 120
      mem.addData((tsSec(150), 5L, A), (tsSec(145), 7L, E), (tsSec(120), 6L, C))
      q.processAllAvailable()
      // batch 4 — wm 120 has passed A's 80 and B's 90: both re-emit
      mem.addData((tsSec(125), 8L, B), (tsSec(200), 9L, A))
      q.processAllAvailable()
      val ids = spark.table("dedup_geo2")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 6L, 7L, 8L, 9L), s"got $ids")
    } finally q.stop()
  }

  test("stateful sessionize over a memory stream closes on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionIn]
    val sessions = EventStreamOps.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sess_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // burst at minute 0-2, then a 30-minute gap: the gap event closes
      // the first session in state; it EMITS once the watermark (driven
      // by the next batch's max event time) passes the session close
      mem.addData(
        SessionIn(1L, ts(0), "a"),
        SessionIn(1L, ts(1), "b"),
        SessionIn(1L, ts(2), "c")
      )
      q.processAllAvailable()
      mem.addData(SessionIn(1L, ts(32), "d"))
      q.processAllAvailable()
      mem.addData(SessionIn(2L, ts(60), "e")) // advances the watermark
      q.processAllAvailable()
      val rows = spark
        .table("sess_out")
        .as[SessionOut]
        .collect()
        .sortBy(_.start_ms)
      // user 1's burst closed by the 30-min gap; the minute-32 session
      // also closes once the watermark reaches minute 60
      assert(rows.length == 2)
      assert(rows(0).n_events == 3 && rows(0).closed_by == "gap")
      assert(rows(0).start_ms == ts(0).getTime && rows(0).end_ms == ts(2).getTime)
      assert(rows(1).n_events == 1 && rows(1).start_ms == ts(32).getTime)
    } finally q.stop()
  }

  test("sessionize state is per-session, not per-user event buffers") {
    import spark.implicits._
    // one hot user with 50k events in a single batch: the old
    // flatMapGroups+toSeq.sortBy path buffered the whole list per task;
    // session_window aggregates incrementally. Assert the plan shape
    // (no MapGroups/FlatMapGroups operator) and the folded result.
    val hot = (0 until 50000).map { i =>
      // events every minute, with a > 10-minute gap every 1000 events
      (1L, new Timestamp(ts(0).getTime + i.toLong * 60000 + (i / 1000) * 700000), "e")
    }
    val df = hot.toDF("user_id", "ts", "event_type")
    val got = EventStreamOps.sessionizeBatch(spark, df, gapMs = 10 * 60 * 1000)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("MapGroups"), s"per-group buffering operator in:\n$plan")
    val rows = got.orderBy("start_ms").collect()
    assert(rows.length == 50)
    assert(rows.forall(_.getAs[Int]("n_events") == 1000))
  }

  test("streaming curation gates docs and dedups across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good =
      "the cat sat on the mat and it was a fine day for sitting " * 3
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.DocStreamOps.curateStream(
      mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", minTokens = 5)
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("curate_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(
        (1L, good),
        (2L, "der die das und ist nicht ein zu " * 8), // wrong lang
        (3L, "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890" * 3) // digits
      )
      q.processAllAvailable()
      // second batch: an exact duplicate of doc 1 (different id) and a
      // fresh admissible doc — only the fresh one passes
      mem.addData((4L, good), (5L, good + " extra closing words here"))
      q.processAllAvailable()
      val ids = spark.table("curate_out")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 5L), s"got ${ids.toSeq}")
      // gate columns ride along
      assert(spark.table("curate_out").columns.toSet
        .contains("quality"))
    } finally q.stop()
  }

  test("streaming curation with watermark bounds dedup state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good =
      "the cat sat on the mat and it was a fine day for sitting " * 3
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = graft.streaming.DocStreamOps.curateStream(
      mem.toDF().toDF("doc_id", "ts", "text"),
      "text", "doc_id", minTokens = 5,
      tsCol = Some("ts"), dedupWatermark = Some("10 minutes"))
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("curate_wm_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData((1L, ts(0), good))
      q.processAllAvailable()
      // duplicate INSIDE the watermark horizon: suppressed
      mem.addData((2L, ts(5), good))
      q.processAllAvailable()
      val ids = spark.table("curate_wm_out")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("batch sessionize matches a hand-computed fixture") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(40), "c"),
      (2L, ts(0), "x")
    ).toDF("user_id", "ts", "event_type")
    val got = EventStreamOps
      .sessionizeBatch(spark, events, gapMs = 10 * 60 * 1000)
      .orderBy("user_id", "start_ms")
      .collect()
    // user 1: [0,5] then [40]; user 2: [0]
    assert(got.length == 3)
    assert(got(0).getAs[Int]("n_events") == 2)
    assert(got(1).getAs[Int]("n_events") == 1)
    assert(got(2).getAs[Long]("user_id") == 2L)
  }

  test("curateStream refuses a half-configured dedup window loudly") {
    import graft.streaming.DocStreamOps
    val stream = spark.readStream.format("rate").load()
      .selectExpr("value AS doc_id", "'hello world text here' AS text",
        "timestamp AS ts")
    val e = intercept[IllegalArgumentException] {
      DocStreamOps.curateStream(stream, "text", "doc_id",
        lang = "en", minQuality = 0.0, minTokens = 1, maxTokens = 1000,
        tsCol = Some("ts"), dedupWatermark = None)
    }
    assert(e.getMessage.contains("BOTH"), e.getMessage)
  }
}
