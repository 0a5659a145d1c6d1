package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sketch.{Kmv, ProfileIndex}
import graft.storage.FaultPoints

/** The managed corpus-profile artifact: rolling ingests equal the
  * whole-corpus profile (merge law through the store round-trip),
  * replays and crash windows are exactly-once, compaction preserves
  * the profile, parameters are pinned, and the streaming leg
  * resumes. */
class ProfileIndexSpec extends SparkSpec {

  private lazy val docs = Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text", "lang")

  private val K = 32

  private def profRows(df: DataFrame): Map[String, (Long, Long, Seq[Long], Seq[Long])] =
    df.collect().map { r =>
      r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          r.getSeq[Long](3).toSeq, r.getSeq[Long](4).toSeq))
    }.toMap

  private def assertSameProfile(got: DataFrame, want: DataFrame): Unit = {
    val g = profRows(got.select("lang", "docs", "tokens", "kmv", "vkmv"))
    val w = profRows(want.select("lang", "docs", "tokens", "kmv", "vkmv"))
    assert(g.keySet == w.keySet, s"strata diverge: ${g.keySet} vs ${w.keySet}")
    g.keySet.foreach { s =>
      assert(g(s) == w(s), s"profile diverges at stratum $s")
    }
  }

  test("rolling ingests equal the whole-corpus profile; replay is exactly-once") {
    val dir = tmpDir("profidx-")
    val idx = ProfileIndex.open(spark, dir, K, "lang", "text")
    val b1 = docs.where(col("doc_id") % 3 === 0)
    val b2 = docs.where(col("doc_id") % 3 === 1)
    val b3 = docs.where(col("doc_id") % 3 === 2)
    val v1 = idx.ingest("b1", b1)
    idx.ingest("b2", b2)
    idx.ingest("b3", b3)
    assertSameProfile(idx.profile, Kmv.profileSketch(docs, "text", "lang", K))
    // replay: same version back, nothing appended, profile unchanged
    val rows = idx.profile.count()
    assert(idx.ingest("b1", b1) == v1)
    assert(idx.profile.count() == rows)
    assertSameProfile(idx.profile, Kmv.profileSketch(docs, "text", "lang", K))
    // estimates ride the same frame
    val est = idx.profileEstimates
      .select("lang", "est_distinct_docs").collect()
    assert(est.nonEmpty && est.forall(_.getDouble(1) > 0))
  }

  test("kill inside the append commit: rerun applies exactly once") {
    val dir = tmpDir("profidx-kill-")
    val idx = ProfileIndex.open(spark, dir, K, "lang", "text")
    idx.ingest("b1", docs.where(col("doc_id") < 100))
    val count = new AtomicInteger
    FaultPoints.install { p =>
      if (p == "table.append.preCommit" && count.incrementAndGet() == 1)
        throw new RuntimeException("injected fault")
    }
    try {
      intercept[RuntimeException](
        idx.ingest("b2", docs.where(col("doc_id") >= 100)))
    } finally FaultPoints.clear()
    // crash model: a FRESH handle from disk retries the batch
    val idx2 = ProfileIndex.open(spark, dir)
    assert(idx2.appliedVersion("b2").isEmpty, "half-applied batch visible")
    idx2.ingest("b2", docs.where(col("doc_id") >= 100))
    assertSameProfile(idx2.profile, Kmv.profileSketch(docs, "text", "lang", K))
  }

  test("compact folds history; profile, estimates and replays unchanged") {
    val dir = tmpDir("profidx-compact-")
    val idx = ProfileIndex.open(spark, dir, K, "lang", "text")
    val v1 = idx.ingest("b1", docs.where(col("doc_id") % 2 === 0))
    idx.ingest("b2", docs.where(col("doc_id") % 2 === 1))
    // materialize BEFORE compaction: the fold rewrites the segments
    // this lazy frame would read
    val before = profRows(
      idx.profile.select("lang", "docs", "tokens", "kmv", "vkmv"))
    idx.compact()
    val after = profRows(
      idx.profile.select("lang", "docs", "tokens", "kmv", "vkmv"))
    assert(after == before, "compaction changed the profile")
    // applied batches still skip after the fold
    val vReplay = idx.ingest("b1", docs.where(col("doc_id") % 2 === 0))
    assert(vReplay >= v1 && idx.appliedVersion("b1").isDefined)
    // new work keeps merging into the folded state
    val extra = docs.limit(0) // empty batch: counters must not move
    idx.ingest("b4", extra)
    assert(profRows(idx.profile
      .select("lang", "docs", "tokens", "kmv", "vkmv")) == before)
  }

  test("profileAsOf pins the profile at a commit across later ingest") {
    val dir = tmpDir("profidx-asof-")
    val idx = ProfileIndex.open(spark, dir, K, "lang", "text")
    val v1 = idx.ingest("b1", docs.where(col("doc_id") < 250))
    val pinned = profRows(idx.profile
      .select("lang", "docs", "tokens", "kmv", "vkmv"))
    idx.ingest("b2", docs.where(col("doc_id") >= 250))
    val got = profRows(idx.profileAsOf(v1)
      .select("lang", "docs", "tokens", "kmv", "vkmv"))
    assert(got == pinned, "snapshot drifted under later ingest")
    assert(profRows(idx.profile.select("lang", "docs", "tokens", "kmv",
      "vkmv")) != pinned, "fixture vacuous — later batch changed nothing")
    idx.compact()
    intercept[Exception](idx.profileAsOf(v1).collect())
  }

  test("value tier: rolling sample equals the whole-corpus sketch; " +
      "estimates and compact ride along; valueCol is pinned") {
    import graft.sketch.SampleSketch
    import graft.text.TextFunctions
    val dir = tmpDir("profidx-val-")
    val idx = ProfileIndex.open(spark, dir, K, "lang", "text",
      valueCol = Some("n_chars"))
    val withN = docs.withColumn("n_chars", length(col("text")).cast("long"))
    idx.ingest("b1", withN.where(col("doc_id") % 2 === 0))
    idx.ingest("b2", withN.where(col("doc_id") % 2 =!= 0))
    def valRows(df: DataFrame): Map[String, (Seq[Long], Seq[Double])] =
      df.select("lang", "vs_hashes", "vs_values").collect().map { r =>
        r.getString(0) ->
          ((r.getSeq[Long](1).toSeq, r.getSeq[Double](2).toSeq))
      }.toMap
    val whole = valRows(SampleSketch.valueSketch(
      withN, Seq("lang"),
      TextFunctions.fingerprint(col("text")), col("n_chars"), K))
    assert(valRows(idx.profile) == whole,
      "rolling value sample diverges from the whole-corpus sketch")
    // the distribution estimates ride profileEstimates
    val est = idx.profileEstimates
      .select("lang", "n_chars_p50", "n_chars_p90", "n_chars_mean")
      .collect()
    assert(est.nonEmpty && est.forall(r =>
      r.getDouble(1) <= r.getDouble(2) && r.getDouble(3) > 0))
    // compact folds value samples without changing the profile
    idx.compact()
    assert(valRows(idx.profile) == whole, "compact changed the sample")
    // the counter/KMV tiers are untouched by the value tier
    assertSameProfile(idx.profile,
      Kmv.profileSketch(withN, "text", "lang", K))
    // valueCol is part of the pin
    intercept[IllegalArgumentException](
      ProfileIndex.open(spark, dir, K, "lang", "text"))
    intercept[IllegalArgumentException](
      ProfileIndex.open(spark, dir, K, "lang", "text", Some("tokens")))
    assert(ProfileIndex.open(spark, dir).valueCol == Some("n_chars"))
  }

  test("parameters are pinned; a mismatched reopen is refused") {
    val dir = tmpDir("profidx-pin-")
    ProfileIndex.open(spark, dir, K, "lang", "text").ingest("b1", docs)
    // same params: fine (and the param-free reopen loads them)
    assert(ProfileIndex.open(spark, dir).k == K)
    intercept[IllegalArgumentException](
      ProfileIndex.open(spark, dir, K + 1, "lang", "text"))
    intercept[IllegalArgumentException](
      ProfileIndex.open(spark, dir, K, "source", "text"))
  }

  test("streaming leg: kill/restart equals the batch profile") {
    import org.apache.spark.sql.types._
    val srcDir = tmpDir("profidx-src-") + "/log"
    val ckpt = tmpDir("profidx-ck-")
    val dir = tmpDir("profidx-stream-")
    val log = graft.storage.ParquetLog.open(spark, srcDir, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType))))
    def appendWave(w: DataFrame): Unit =
      log.append(w.select(
        struct(col("doc_id"), col("text"), col("lang")).as("value")))
    def stream() = spark.readStream.format("graft-log").load(srcDir)
      .select(col("value.doc_id").as("doc_id"),
        col("value.text").as("text"), col("value.lang").as("lang"))
    val idx = ProfileIndex.open(spark, dir, K, "lang", "text")
    appendWave(docs.where(col("doc_id") < 150))
    val q1 = idx.start(stream(), ckpt)
    try q1.processAllAvailable() finally q1.stop()
    // the rest arrives while the loop is DOWN; resume on the same
    // checkpoint must profile each doc exactly once
    appendWave(docs.where(col("doc_id") >= 150))
    val idx2 = ProfileIndex.open(spark, dir)
    val q2 = idx2.start(stream(), ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assertSameProfile(idx2.profile, Kmv.profileSketch(docs, "text", "lang", K))
  }
}
