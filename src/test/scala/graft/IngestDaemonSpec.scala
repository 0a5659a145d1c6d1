package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.dedup.{Dedup, DedupParams}
import graft.pipeline.Curation
import graft.storage.ParquetLog
import graft.streaming.{IngestConfig, IngestDaemon}

/** End-to-end vectors for the streaming ingest-curation daemon: the
  * checkpointed readStream → gate → incremental-dedup → survivor-
  * append loop must survive a kill/restart without losing, duplicating
  * or re-deciding a document, and its corpus must equal both a
  * one-shot daemon run and an INDEPENDENT batch composition of the
  * same operators.
  */
class IngestDaemonSpec extends SparkSpec {

  private val cfg = IngestConfig(
    minQuality = 0.0, minTokens = 1, // gates open: dedup is under test
    threshold = 0.35,
    params = DedupParams(numHashes = 8, bands = 4))

  private lazy val docs = Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  private val logSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def appendWave(log: ParquetLog, wave: DataFrame): Unit =
    log.append(wave.select(struct(col("doc_id"), col("text")).as("value")))

  private def streamOf(srcDir: String): DataFrame =
    spark.readStream.format("graft-log").load(srcDir)
      .select(col("value.doc_id").as("doc_id"),
        col("value.text").as("text"))

  private def corpusIds(d: IngestDaemon): Seq[Long] =
    d.corpus.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("daemon: kill/restart loses nothing, corpus equals one-shot and " +
      "independent batch composition") {
    val srcDir = tmpDir("daemon-src-") + "/log"
    val ckpt = tmpDir("daemon-ck-")
    val dDir = tmpDir("daemon-state-")
    val log = ParquetLog.open(spark, srcDir, logSchema)
    val w1 = docs.where(col("doc_id") < 200)
    val w2 = docs.where(col("doc_id") >= 200 && col("doc_id") < 350)
    val w3 = docs.where(col("doc_id") >= 350)

    // ── run 1: two waves, then a clean stop ──────────────────────────
    appendWave(log, w1)
    val d1 = IngestDaemon.open(spark, dDir, cfg)
    val q1 = d1.start(streamOf(srcDir), ckpt, Trigger.ProcessingTime(0))
    try {
      q1.processAllAvailable()
      appendWave(log, w2)
      q1.processAllAvailable()
    } finally q1.stop()
    val afterRun1 = corpusIds(d1)
    assert(afterRun1.nonEmpty, "run 1 admitted nothing — vacuous")

    // ── data arrives while the daemon is DOWN ────────────────────────
    appendWave(log, w3)

    // ── run 2: fresh handle, same checkpoint — must resume, not replay
    val d2 = IngestDaemon.open(spark, dDir, cfg)
    val q2 = d2.start(streamOf(srcDir), ckpt, Trigger.ProcessingTime(0))
    try q2.processAllAvailable() finally q2.stop()

    val ids = corpusIds(d2)
    assert(ids.distinct == ids, "duplicate survivors after restart")
    assert(afterRun1.toSet.subsetOf(ids.toSet),
      "restart lost already-admitted docs")

    // one-shot daemon on the full corpus: batch boundaries and the
    // restart must not change a single admit/drop decision
    val oneshotDir = tmpDir("daemon-oneshot-")
    val one = IngestDaemon.open(spark, oneshotDir, cfg)
    one.processBatch("all", docs)
    assert(ids == corpusIds(one),
      "streamed corpus != one-shot corpus")

    // index agreement: same band keys and fingerprints either way
    // (the standing index holds every exact survivor exactly once)
    def bandSet(d: IngestDaemon) = d.index.bands
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    def fpSet(d: IngestDaemon) = d.index.fingerprints
      .collect().map(_.getString(0)).toSet
    assert(bandSet(d2) == bandSet(one), "band indexes diverge")
    assert(fpSet(d2) == fpSet(one), "fingerprint indexes diverge")

    // independent composition of the batch operators (gate → exact
    // dedup → LSH pairs → min-id cluster survivors): streamed ids
    // increase monotonically, so the rolling corpus-wins rule and the
    // one-shot min-id rule elect the same survivors
    val gated = Curation.gate(docs, "text", cfg.lang, cfg.minQuality,
      cfg.minTokens, cfg.maxTokens)
    val exact = Dedup.exactDedup(gated, "text", "doc_id")
    val pairs = Dedup.minhashLshPairs(exact, "text", "doc_id",
      cfg.params.numHashes, cfg.params.bands, cfg.params.shingleWidth,
      cfg.threshold, cfg.maxBucket)
    val independent = Dedup
      .clusterSurvivors(exact.select("doc_id"), "doc_id",
        pairs.select("id_a", "id_b"))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == independent,
      "daemon corpus != independent batch composition")
  }

  test("daemon: redelivered and half-applied batches commit exactly once") {
    val w1 = docs.where(col("doc_id") < 250)
    val w2 = docs.where(col("doc_id") >= 250)

    // clean two-batch reference run
    val ref = IngestDaemon.open(spark, tmpDir("daemon-ref-"), cfg)
    ref.processBatch("b0", w1)
    ref.processBatch("b1", w2)

    val d = IngestDaemon.open(spark, tmpDir("daemon-replay-"), cfg)
    val first = d.processBatch("b0", w1)
    assert(first.isDefined, "fresh batch must surface its IngestResult")
    assert(first.get.capped.isEmpty,
      "fixture floods no bucket — diag must be empty")
    val v0 = d.appliedVersion("b0")
    // fully-applied redelivery (restart before the streaming commit
    // log recorded the batch): must be a pure no-op
    assert(d.processBatch("b0", w1).isEmpty, "redelivery not skipped")
    assert(d.appliedVersion("b0") == v0, "redelivery re-committed seen")
    assert(d.index.appliedVersion("b0").isDefined)

    // half-applied crash window: the INDEX commit landed, the seen
    // commit did not (simulated by driving the index directly with
    // exactly the gated frame the daemon would build)
    val gatedW2 = Curation.gate(w2.select("doc_id", "text"), "text",
      cfg.lang, cfg.minQuality, cfg.minTokens, cfg.maxTokens)
    d.index.ingest("b1", gatedW2, "text", "doc_id",
      corpusTexts = d.seenTexts, threshold = cfg.threshold,
      maxBucket = cfg.maxBucket)
    assert(d.appliedVersion("b1").isEmpty, "window setup broken")
    // the rerun must FINISH the batch: replay the probe against the
    // pre-batch snapshot, commit seen once, admit/drop identically
    d.processBatch("b1", w2)
    assert(d.appliedVersion("b1").isDefined, "seen journal not written")
    val ids = corpusIds(d)
    assert(ids.distinct == ids, "duplicate survivors after replay")
    assert(ids == corpusIds(ref),
      "replayed corpus != clean-run corpus")
    assert(d.index.bands.count() == ref.index.bands.count(),
      "replay appended index rows twice")
  }

  test("daemon: half-applied replay gates with the knobs OF RECORD") {
    // the crash window: index commit landed under the ORIGINAL gate
    // knobs, seen commit did not, and the restart arrives with a
    // TIGHTENED config. Gating the replay with the new knobs would
    // shrink the survivor set below the band rows already indexed —
    // breaking "seen covers every indexed doc" — so processBatch must
    // replay under the per-batch record instead.
    val w1 = docs.where(col("doc_id") < 250)
    val w2 = docs.where(col("doc_id") >= 250)
    val ref = IngestDaemon.open(spark, tmpDir("daemon-gref-"), cfg)
    ref.processBatch("b0", w1)
    ref.processBatch("b1", w2)
    val dir = tmpDir("daemon-gates-")
    val d1 = IngestDaemon.open(spark, dir, cfg)
    d1.processBatch("b0", w1)
    // simulate the window exactly as processBatch produces it: record
    // the knobs, commit the index, crash before the seen commit
    val gatedW2 = Curation.gate(w2.select("doc_id", "text"), "text",
      cfg.lang, cfg.minQuality, cfg.minTokens, cfg.maxTokens)
    d1.index.ingest("b1", gatedW2, "text", "doc_id",
      corpusTexts = d1.seenTexts, threshold = cfg.threshold,
      maxBucket = cfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(d1.config)))
    assert(d1.appliedVersion("b1").isEmpty, "window setup broken")
    // restart under tightened gates — which must NOT apply to b1
    val tightened = cfg.copy(minTokens = 40)
    val gatedTight = Curation.gate(w2.select("doc_id", "text"), "text",
      tightened.lang, tightened.minQuality, tightened.minTokens,
      tightened.maxTokens)
    assert(gatedTight.count() < gatedW2.count(),
      "tightened gate excludes nothing — vacuous")
    val d2 = IngestDaemon.open(spark, dir, tightened)
    d2.processBatch("b1", w2)
    assert(d2.appliedVersion("b1").isDefined, "replay did not finish b1")
    // the fetch invariant the record protects: every indexed doc has
    // its text in the seen store
    val seenIds = d2.seenTexts.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val indexedIds = d2.index.bands.select("id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(indexedIds.subsetOf(seenIds),
      s"indexed docs missing from seen: ${indexedIds -- seenIds}")
    // and the corpus equals the clean run under the original knobs
    assert(corpusIds(d2) == corpusIds(ref),
      "replayed corpus != clean original-knob run")
    // the record rides the index journal row itself: present exactly
    // when the commit is, never a side file to clean up
    assert(d2.index.recordedGates("b1").isDefined,
      "knobs of record missing from the index journal row")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "gates")),
      "side-channel gates dir should no longer exist")
  }

  test("daemon: composed vector tier — atomic advance, independent " +
      "composition twin, crash windows replay clean") {
    import graft.dedup.VecDedupIndex
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val mm = docs.join(emb, Seq("doc_id")) // the multimodal ingest frame
    val vcfg = cfg.copy(vecCol = Some("embedding"),
      vecThreshold = 0.3, vecMaxBucket = 1000L)
    val w1 = mm.where(col("doc_id") < 250)
    val w2 = mm.where(col("doc_id") >= 250)

    // clean composed run: both indexes advance atomically per batch
    val ref = IngestDaemon.open(spark, tmpDir("daemon-vref-"), vcfg)
    val r0 = ref.processBatch("b0", w1)
    val r1 = ref.processBatch("b1", w2)
    assert(r0.isDefined && r1.isDefined)
    for (b <- Seq("b0", "b1")) {
      assert(ref.index.appliedVersion(b).isDefined, s"text index missed $b")
      assert(ref.vecIndex.get.appliedVersion(b).isDefined,
        s"vec index missed $b")
      assert(ref.appliedVersion(b).isDefined, s"seen missed $b")
    }
    val composed = corpusIds(ref)

    // independent composition twin: a TEXT-ONLY daemon plus a
    // hand-rolled VecDedupIndex over its per-batch admitted sets must
    // produce the identical corpus
    val tcfg = vcfg.copy(vecCol = None)
    val tref = IngestDaemon.open(spark, tmpDir("daemon-tref-"), tcfg)
    val vi = VecDedupIndex.open(spark, tmpDir("daemon-vi-"),
      bits = vcfg.vecBits)
    def vecAdmit(b: String, w: org.apache.spark.sql.DataFrame): Set[Long] = {
      val ta = tref.processBatch(b, w).get.admitted
      vi.ingest(b, ta.join(emb, Seq("doc_id")), "embedding", "doc_id",
          threshold = vcfg.vecThreshold, maxBucket = vcfg.vecMaxBucket)
        .admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val want = vecAdmit("b0", w1) ++ vecAdmit("b1", w2)
    assert(composed.toSet == want, s"composed daemon != independent " +
      s"composition: extra=${composed.toSet -- want}, " +
      s"missing=${want -- composed.toSet}")
    // the vector tier actually dropped something on top of the text
    // tier, or the composition is vacuous
    assert(composed.size < corpusIds(tref).size,
      "vector tier dropped nothing — vacuous")

    // crash window A: text index committed, vec + seen did not
    val dA = IngestDaemon.open(spark, tmpDir("daemon-vwA-"), vcfg)
    dA.processBatch("b0", w1)
    val gatedW2 = Curation.gate(w2.select("doc_id", "text"), "text",
      vcfg.lang, vcfg.minQuality, vcfg.minTokens, vcfg.maxTokens)
    dA.index.ingest("b1", gatedW2, "text", "doc_id",
      corpusTexts = dA.seenTexts, threshold = vcfg.threshold,
      maxBucket = vcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dA.config)))
    assert(dA.appliedVersion("b1").isEmpty &&
      dA.vecIndex.get.appliedVersion("b1").isEmpty, "window A setup broken")
    dA.processBatch("b1", w2)
    assert(corpusIds(dA) == composed, "window A replay diverged")

    // crash window B: text AND vec committed, seen did not
    val dB = IngestDaemon.open(spark, tmpDir("daemon-vwB-"), vcfg)
    dB.processBatch("b0", w1)
    val tRes = dB.index.ingest("b1", gatedW2, "text", "doc_id",
      corpusTexts = dB.seenTexts, threshold = vcfg.threshold,
      maxBucket = vcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dB.config)))
    dB.vecIndex.get.ingest("b1",
      tRes.admitted.join(emb, Seq("doc_id")), "embedding", "doc_id",
      threshold = vcfg.vecThreshold, maxBucket = vcfg.vecMaxBucket)
    assert(dB.appliedVersion("b1").isEmpty &&
      dB.vecIndex.get.appliedVersion("b1").isDefined, "window B setup broken")
    dB.processBatch("b1", w2)
    assert(corpusIds(dB) == composed, "window B replay diverged")
    // exactly-once: no store grew twice
    assert(dB.vecIndex.get.buckets.count() ==
      ref.vecIndex.get.buckets.count(), "vec index rows duplicated")
    // fully-applied redelivery is a pure no-op
    assert(dB.processBatch("b1", w2).isEmpty, "redelivery not skipped")
  }

  test("daemon: composed SemDeDup tier and the tri-tier chain replay clean") {
    import graft.dedup.SemanticIndex
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val mm = docs.join(emb, Seq("doc_id"))
    val cents = emb.where(col("doc_id") < 8)
      .select(col("doc_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    val scfg = cfg.copy(semCol = Some("embedding"), semCents = cents,
      semThreshold = 0.3)
    val w1 = mm.where(col("doc_id") < 250)
    val w2 = mm.where(col("doc_id") >= 250)

    // clean composed run (text + SemDeDup)
    val ref = IngestDaemon.open(spark, tmpDir("daemon-sref-"), scfg)
    ref.processBatch("b0", w1)
    ref.processBatch("b1", w2)
    for (b <- Seq("b0", "b1"))
      assert(ref.semIndex.get.appliedVersion(b).isDefined,
        s"sem index missed $b")
    val composed = corpusIds(ref)

    // independent composition twin: text-only daemon + hand-rolled
    // SemanticIndex over its per-batch admitted sets
    val tref = IngestDaemon.open(spark, tmpDir("daemon-stref-"),
      scfg.copy(semCol = None))
    val si = SemanticIndex.open(spark, tmpDir("daemon-si-"), cents)
    def semAdmit(b: String, w: org.apache.spark.sql.DataFrame): Set[Long] = {
      val ta = tref.processBatch(b, w).get.admitted
      si.ingest(b, ta.select("doc_id").join(emb, Seq("doc_id")),
          "embedding", "doc_id", threshold = scfg.semThreshold)
        .admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val want = semAdmit("b0", w1) ++ semAdmit("b1", w2)
    assert(composed.toSet == want, s"composed SemDeDup daemon != " +
      s"independent composition: extra=${composed.toSet -- want}, " +
      s"missing=${want -- composed.toSet}")
    assert(composed.size < corpusIds(tref).size,
      "SemDeDup tier dropped nothing — vacuous")

    // crash window: text + sem committed, seen did not — the deepest
    // window of the chain; the replay must finish under the recorded
    // knobs and reach the identical corpus
    val d = IngestDaemon.open(spark, tmpDir("daemon-swin-"), scfg)
    d.processBatch("b0", w1)
    val gatedW2 = Curation.gate(w2.select("doc_id", "text"), "text",
      scfg.lang, scfg.minQuality, scfg.minTokens, scfg.maxTokens)
    val tRes = d.index.ingest("b1", gatedW2, "text", "doc_id",
      corpusTexts = d.seenTexts, threshold = scfg.threshold,
      maxBucket = scfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(d.config)))
    d.semIndex.get.ingest("b1",
      tRes.admitted.select("doc_id").join(emb, Seq("doc_id")),
      "embedding", "doc_id", threshold = scfg.semThreshold)
    assert(d.appliedVersion("b1").isEmpty &&
      d.semIndex.get.appliedVersion("b1").isDefined, "window setup broken")
    d.processBatch("b1", w2)
    assert(corpusIds(d) == composed, "deep-window replay diverged")
    assert(d.semIndex.get.cells.count() ==
      ref.semIndex.get.cells.count(), "sem index rows duplicated")

    // tri-tier smoke: near-dup AND SemDeDup both composed — all four
    // stores advance atomically on one batch
    val tri = IngestDaemon.open(spark, tmpDir("daemon-tri-"),
      scfg.copy(vecCol = Some("embedding"), vecThreshold = 0.3,
        vecMaxBucket = 1000L))
    val r = tri.processBatch("b0", w1)
    assert(r.isDefined)
    assert(tri.index.appliedVersion("b0").isDefined &&
      tri.vecIndex.get.appliedVersion("b0").isDefined &&
      tri.semIndex.get.appliedVersion("b0").isDefined &&
      tri.appliedVersion("b0").isDefined, "tri-tier batch not atomic")
    // the chain is ordered: SemDeDup saw only near-dup survivors
    assert(tri.semIndex.get.cells.count() ==
      tri.vecIndex.get.corpus.count(),
      "sem tier must ingest exactly the near-dup tier's admitted set")
  }

  test("daemon: composed decontamination drops eval overlap under the knobs of record") {
    import graft.pipeline.Decontaminate
    // the eval set is the TEXT of every 10th doc: those docs must
    // never reach any index or the corpus
    val evalDir = tmpDir("daemon-eval-")
    docs.where(col("doc_id") % 10 === 0).select("text")
      .write.mode("overwrite").parquet(evalDir)
    val evalSet = spark.read.parquet(evalDir).select("text")
    val dcfg = cfg.copy(decontaminateDir = Some(evalDir))

    val d = IngestDaemon.open(spark, tmpDir("daemon-decon-"), dcfg)
    assert(d.processBatch("b0", docs).isDefined)
    val ids = corpusIds(d)
    assert(ids.nonEmpty && ids.forall(_ % 10 != 0),
      "contaminated docs reached the corpus")
    // composition twin: gate → decontaminate → plain text daemon
    val gatedAll = Curation.gate(docs, "text", cfg.lang, cfg.minQuality,
      cfg.minTokens, cfg.maxTokens)
    val cleaned = Decontaminate.decontaminate(
      gatedAll, evalSet, "text", "doc_id")
    val ref = IngestDaemon.open(spark, tmpDir("daemon-decon-ref-"), cfg)
    ref.processBatch("b0", cleaned.select("doc_id", "text"))
    assert(ids == corpusIds(ref),
      "composed decontamination != independent composition")

    // knobs of record: the index commit lands WITH decontamination,
    // then the config loses it before the replay — the half-applied
    // window must still decontaminate (record wins), or the seen
    // store would cover docs the index never saw
    val wDir = tmpDir("daemon-decon-w-")
    val dW = IngestDaemon.open(spark, wDir, dcfg)
    dW.index.ingest("b0", cleaned.select("doc_id", "text"), "text",
      "doc_id", corpusTexts = dW.seenTexts, threshold = dcfg.threshold,
      maxBucket = dcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dW.config)))
    val dW2 = IngestDaemon.open(spark, wDir, cfg) // decon GONE from config
    dW2.processBatch("b0", docs)
    assert(corpusIds(dW2) == ids,
      "half-applied replay ignored the decontamination knobs of record")
  }

  test("daemon: corpusAsOf pins a reproducible snapshot across later ingest") {
    val d = IngestDaemon.open(spark, tmpDir("daemon-asof-"), cfg)
    d.processBatch("b0", docs.where(col("doc_id") < 250))
    val v0 = d.version
    val pinned = corpusIds(d)
    d.processBatch("b1", docs.where(col("doc_id") >= 250))
    // the snapshot is immune to the later batch: same ids, admit
    // flags of record, while the live corpus moved on
    val got = d.corpusAsOf(v0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == pinned, "snapshot drifted under later ingest")
    assert(corpusIds(d).size > pinned.size, "fixture vacuous")
    // a compact folds that history away LOUDLY, never approximately
    d.compact()
    intercept[Exception](d.corpusAsOf(v0).collect())
  }

  test("daemon: profile value leg — the standing quantile sample " +
      "tracks the corpus and rides the knobs of record") {
    import graft.sketch.SampleSketch
    import graft.text.TextFunctions
    val K = 32
    val full = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "n_chars")
    val pcfg = cfg.copy(profileStrataCol = Some("lang"), profileK = K,
      profileValueCol = Some("n_chars"))
    val d = IngestDaemon.open(spark, tmpDir("daemon-pval-"), pcfg)
    assert(d.processBatch("b0", full.where(col("doc_id") < 250)).isDefined)
    assert(d.processBatch("b1", full.where(col("doc_id") >= 250)).isDefined)
    def valRows(df: DataFrame) = df
      .select("lang", "vs_hashes", "vs_values").collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[Long](1).toSeq, r.getSeq[Double](2).toSeq))).toMap
    // standing sample == one-shot sample of the daemon's OWN corpus
    val corpusDocs = d.corpus.select("doc_id").join(full, Seq("doc_id"))
    val want = valRows(SampleSketch.valueSketch(corpusDocs, Seq("lang"),
      TextFunctions.fingerprint(col("text")), col("n_chars"), K))
    assert(valRows(d.profileIndex.get.profile) == want,
      "standing value sample != corpus sample")
    // the distribution estimates are exposed on the standing profile
    val est = d.profileIndex.get.profileEstimates
      .select("lang", "n_chars_p50", "n_chars_p90", "n_chars_mean")
      .collect()
    assert(est.nonEmpty && est.forall(r => r.getDouble(1) <= r.getDouble(2)))
    // the value leg is part of the knobs of record
    val parsed = IngestDaemon.parseGates(cfg, IngestDaemon.gatesString(pcfg))
    assert(parsed.profileValueCol == Some("n_chars"))
    assert(IngestDaemon.parseGates(pcfg,
      IngestDaemon.gatesString(cfg)).profileValueCol.isEmpty)
  }

  test("daemon: composed profile tier — standing profile equals the " +
      "corpus profile, crash windows replay clean") {
    import graft.sketch.Kmv
    val K = 32
    val full = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val pcfg = cfg.copy(profileStrataCol = Some("lang"), profileK = K)
    val w1 = full.where(col("doc_id") < 250)
    val w2 = full.where(col("doc_id") >= 250)
    def profRows(df: DataFrame) = df
      .select("lang", "docs", "tokens", "kmv", "vkmv")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          r.getSeq[Long](3).toSeq, r.getSeq[Long](4).toSeq))).toMap

    val ref = IngestDaemon.open(spark, tmpDir("daemon-pref-"), pcfg)
    assert(ref.processBatch("b0", w1).isDefined)
    assert(ref.processBatch("b1", w2).isDefined)
    // the profile advanced atomically with the other stores
    for (b <- Seq("b0", "b1"))
      assert(ref.profileIndex.get.appliedVersion(b).isDefined,
        s"profile missed $b")
    // the standing profile IS the one-shot profile of the corpus
    // (merge law over the per-batch admitted sets)
    val corpusDocs = ref.corpus.select("doc_id").join(full, Seq("doc_id"))
      .select("doc_id", "text", "lang")
    val want = profRows(Kmv.profileSketch(corpusDocs, "text", "lang", K))
    assert(profRows(ref.profileIndex.get.profile) == want,
      "standing profile != corpus profile")
    // the profile counted the CORPUS, not the raw stream
    val profDocs = ref.profileIndex.get.profile
      .agg(sum("docs")).collect()(0).getLong(0)
    assert(profDocs == ref.corpus.count() && profDocs < full.count(),
      "profile counted dropped docs")

    // crash window: text index AND profile committed, seen did not —
    // the replay must finish the batch without double-profiling
    val dC = IngestDaemon.open(spark, tmpDir("daemon-pwC-"), pcfg)
    dC.processBatch("b0", w1)
    val gatedW2 = Curation.gate(w2.select("doc_id", "text"), "text",
      pcfg.lang, pcfg.minQuality, pcfg.minTokens, pcfg.maxTokens)
    val tRes = dC.index.ingest("b1", gatedW2, "text", "doc_id",
      corpusTexts = dC.seenTexts, threshold = pcfg.threshold,
      maxBucket = pcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dC.config)))
    dC.profileIndex.get.ingest("b1",
      tRes.admitted.select("doc_id")
        .join(full, Seq("doc_id")).select("doc_id", "text", "lang"))
    assert(dC.appliedVersion("b1").isEmpty &&
      dC.profileIndex.get.appliedVersion("b1").isDefined,
      "window setup broken")
    dC.processBatch("b1", w2)
    assert(profRows(dC.profileIndex.get.profile) == want,
      "crash-window replay diverged or double-profiled")
    assert(corpusIds(dC) == corpusIds(ref), "corpus diverged")
    // fully-applied redelivery is a pure no-op for the profile too
    val v = dC.profileIndex.get.version
    assert(dC.processBatch("b1", w2).isEmpty)
    assert(dC.profileIndex.get.version == v, "redelivery advanced profile")

    // knobs-of-record cover the PROFILE tier too: index committed with
    // the profile composed, then the config loses it before the
    // restart — the half-applied replay must still profile (the
    // record wins; the handle reopens from the artifact's own pinned
    // parameters), or the standing profile silently undercounts the
    // corpus it claims to describe
    val wDir = tmpDir("daemon-pwT-")
    val dT = IngestDaemon.open(spark, wDir, pcfg)
    dT.processBatch("b0", w1)
    val gatedT = Curation.gate(w2.select("doc_id", "text"), "text",
      pcfg.lang, pcfg.minQuality, pcfg.minTokens, pcfg.maxTokens)
    dT.index.ingest("b1", gatedT, "text", "doc_id",
      corpusTexts = dT.seenTexts, threshold = pcfg.threshold,
      maxBucket = pcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dT.config)))
    // restart WITHOUT the profile tier in the config
    val dT2 = IngestDaemon.open(spark, wDir, cfg)
    assert(dT2.profileIndex.isEmpty, "setup: profile tier must be off")
    dT2.processBatch("b1", w2)
    val standing = graft.sketch.ProfileIndex
      .open(spark, graft.storage.FileIO.join(wDir, "profile"))
    assert(standing.appliedVersion("b1").isDefined,
      "replay under the knobs of record skipped the profile tier")
    assert(profRows(standing.profile) == profRows(dC.profileIndex.get.profile),
      "toggled-off replay diverged from the always-on run")
  }

  test("daemon: composed fingerprint + boilerplate tiers — six-store " +
      "step, independent composition twin, crash window replays clean") {
    import graft.dedup.FingerprintIndex
    import graft.pipeline.BoilerplateIndex
    // hash-derived 64-bit fingerprints; a planted 10% of w2 carries a
    // hamming-1 variant of a w1 doc's fingerprint (text-unique, so
    // only the Hamming tier can drop it)
    val mm = docs.withColumn("fph",
      when(pmod(col("doc_id"), lit(50)) === 25 && col("doc_id") >= 250,
        xxhash64(col("doc_id") - 250 + 2, lit("fp"))
          .bitwiseXOR(lit(1L)))
        .otherwise(xxhash64(col("doc_id"), lit("fp"))))
    val fcfg = cfg.copy(fpCol = Some("fph"), fpMaxHamming = 2,
      fpBands = 4, fpBits = 64, boilerplate = true, boilerplateWidth = 3)
    val w1 = mm.where(col("doc_id") < 250)
    val w2 = mm.where(col("doc_id") >= 250)

    // clean composed run: text + fp + boilerplate + seen advance
    // atomically per batch
    val ref = IngestDaemon.open(spark, tmpDir("daemon-fref-"), fcfg)
    assert(ref.processBatch("b0", w1).isDefined)
    assert(ref.processBatch("b1", w2).isDefined)
    for (b <- Seq("b0", "b1")) {
      assert(ref.index.appliedVersion(b).isDefined, s"text index missed $b")
      assert(ref.fpIndex.get.appliedVersion(b).isDefined,
        s"fp index missed $b")
      assert(ref.boilIndex.get.appliedVersion(b).isDefined,
        s"boilerplate index missed $b")
      assert(ref.appliedVersion(b).isDefined, s"seen missed $b")
    }
    val composed = corpusIds(ref)

    // independent composition twin: text-only daemon + hand-rolled
    // FingerprintIndex + BoilerplateIndex over its per-batch admitted
    // sets must reach the identical corpus and dictionary
    val tref = IngestDaemon.open(spark, tmpDir("daemon-ftref-"),
      fcfg.copy(fpCol = None, boilerplate = false))
    val fi = FingerprintIndex.open(spark, tmpDir("daemon-fi-"),
      bands = 4, bits = 64)
    val bi = BoilerplateIndex.open(spark, tmpDir("daemon-bi-"), width = 3)
    def fpAdmit(b: String, w: org.apache.spark.sql.DataFrame): Set[Long] = {
      val ta = tref.processBatch(b, w).get.admitted
      val adm = fi.ingest(b,
        ta.select("doc_id").join(mm.select("doc_id", "fph"), Seq("doc_id")),
        "fph", "doc_id", maxHamming = fcfg.fpMaxHamming)
        .admitted.select("doc_id").collect().map(_.getLong(0)).toSet
      bi.ingest(b, mm.where(col("doc_id").isin(adm.toSeq: _*))
        .select("doc_id", "text"), "text", "doc_id")
      adm
    }
    val want = fpAdmit("b0", w1) ++ fpAdmit("b1", w2)
    assert(composed.toSet == want, s"composed daemon != independent " +
      s"composition: extra=${composed.toSet -- want}, " +
      s"missing=${want -- composed.toSet}")
    assert(composed.size < corpusIds(tref).size,
      "fingerprint tier dropped nothing — vacuous")
    // the standing dictionaries agree gram for gram
    def dict(x: BoilerplateIndex) = x.boilerplateGrams(3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dict(ref.boilIndex.get) == dict(bi),
      "composed boilerplate dictionary != independent composition")

    // crash window: text + fp committed, seen not — then the config
    // LOSES both tiers before the restart; the knobs of record must
    // still finish the batch through them
    val wDir = tmpDir("daemon-fwin-")
    val dW = IngestDaemon.open(spark, wDir, fcfg)
    dW.processBatch("b0", w1)
    val gatedW2 = Curation.gate(w2.select("doc_id", "text"), "text",
      fcfg.lang, fcfg.minQuality, fcfg.minTokens, fcfg.maxTokens)
    val tRes = dW.index.ingest("b1", gatedW2, "text", "doc_id",
      corpusTexts = dW.seenTexts, threshold = fcfg.threshold,
      maxBucket = fcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dW.config)))
    dW.fpIndex.get.ingest("b1",
      tRes.admitted.select("doc_id")
        .join(mm.select("doc_id", "fph"), Seq("doc_id")),
      "fph", "doc_id", maxHamming = fcfg.fpMaxHamming)
    assert(dW.appliedVersion("b1").isEmpty &&
      dW.fpIndex.get.appliedVersion("b1").isDefined, "window setup broken")
    val dW2 = IngestDaemon.open(spark, wDir,
      fcfg.copy(fpCol = None, boilerplate = false)) // tiers GONE
    dW2.processBatch("b1", w2)
    assert(corpusIds(dW2) == composed,
      "crash-window replay with toggled-off tiers diverged")
    val standingBoil = BoilerplateIndex.open(spark,
      graft.storage.FileIO.join(wDir, "boilerplate"))
    assert(standingBoil.appliedVersion("b1").isDefined,
      "replay under the knobs of record skipped the boilerplate tier")
    assert(dict(standingBoil) == dict(bi),
      "replayed boilerplate dictionary diverged")
  }

  test("daemon: flooded buckets surface in the returned diag") {
    // near-identical-but-distinct docs (the exact tier must NOT
    // collapse them) split across two batches: the combined bucket
    // population crosses maxBucket only when the standing index side
    // counts — the drop must be REPORTED, not silent
    import spark.implicits._
    def wave(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, s"the same boilerplate text repeated again and again tok$i"))
      .toDF("doc_id", "text")
    val d = IngestDaemon.open(spark, tmpDir("daemon-cap-"),
      cfg.copy(maxBucket = 10L))
    d.processBatch("b0", wave(0L, 30L))
    val r = d.processBatch("b1", wave(30L, 60L))
    assert(r.isDefined)
    val capped = r.get.capped.collect()
    assert(capped.nonEmpty, "flooded bucket missing from the diag")
    assert(capped.forall(_.getAs[Long]("_n") > 10L))
  }

  test("daemon: compact mid-stream preserves the rolling identity") {
    // folding both stores between batches changes layout and history,
    // never decisions: the post-compact batch must probe the same
    // standing state, and the journals must survive the fold
    val w1 = docs.where(col("doc_id") < 250)
    val w2 = docs.where(col("doc_id") >= 250)
    val ref = IngestDaemon.open(spark, tmpDir("daemon-nocompact-"), cfg)
    ref.processBatch("b0", w1)
    ref.processBatch("b1", w2)
    val d = IngestDaemon.open(spark, tmpDir("daemon-compact-"), cfg)
    d.processBatch("b0", w1)
    d.compact(targetPartitions = 2)
    assert(d.appliedVersion("b0").isDefined,
      "seen journal lost in the fold")
    assert(d.index.appliedVersion("b0").isDefined,
      "index journal lost in the fold")
    d.processBatch("b1", w2)
    assert(corpusIds(d) == corpusIds(ref),
      "compaction changed admit/drop decisions")
    assert(d.index.bands.count() == ref.index.bands.count(),
      "compaction changed the standing index")
  }

  test("daemon: composed repetition gate + standing DSIR tier — " +
      "independent composition twin, crash windows replay clean") {
    import graft.pipeline.{Curation => C, DsirIndex}
    val target = docs.where(col("doc_id") % 3 === 0)
    val raw = docs.where(col("doc_id") % 3 =!= 0)
    val w1 = raw.where(col("doc_id") < 250)
    val w2 = raw.where(col("doc_id") >= 250)
    // tight repetition thresholds so the gate provably drops docs on
    // this fixture (the paper's cut-offs pass most synthetic text)
    val reps = cfg.copy(repetition = true,
      repMaxDupLineFrac = 0.05, repMaxDupLineCharFrac = 0.05,
      repMaxTopNgramCharFrac = Seq(0.08, 0.06, 0.05),
      repMaxDupNgramCharFrac = Seq(0.10, 0.09, 0.08, 0.07, 0.06, 0.05))
    val dcfg = reps.copy(dsir = true, dsirBuckets = 64, dsirAlpha = 0.5)

    def gateOf(c: graft.streaming.IngestConfig, w: DataFrame) =
      C.repetitionGate(
        C.gate(w.select("doc_id", "text"), "text", c.lang, c.minQuality,
          c.minTokens, c.maxTokens),
        "text", c.repMaxDupLineFrac, c.repMaxDupLineCharFrac,
        c.repMaxTopNgramCharFrac, c.repMaxDupNgramCharFrac)

    // clean composed run: target ingested once, two scored batches
    val ref = IngestDaemon.open(spark, tmpDir("daemon-dsir-ref-"), dcfg)
    ref.dsirIndex.get.ingestTarget("tgt", target, "text")
    assert(ref.processBatch("b0", w1).isDefined)
    assert(ref.processBatch("b1", w2).isDefined)
    val composed = corpusIds(ref)
    def scoresOf(d: IngestDaemon): Map[Long, Double] =
      d.corpus.select("doc_id", "dsir_logw").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val refScores = scoresOf(ref)
    assert(refScores.nonEmpty, "no admitted docs — vacuous")
    assert(refScores.keySet == composed.toSet,
      "an admitted doc is missing its importance weight")

    // the repetition gate actually dropped something on top of the
    // language/quality gate, or the composition is vacuous
    val noRep = IngestDaemon.open(spark, tmpDir("daemon-norep-"), cfg)
    noRep.processBatch("b0", w1)
    noRep.processBatch("b1", w2)
    assert(composed.size < corpusIds(noRep).size,
      "repetition gate dropped nothing — vacuous")

    // independent composition twin: a repetition-gated text daemon
    // (no dsir) plus a hand-rolled DsirIndex replaying the same
    // sequence — ingestRaw(gated batch) then score that batch's
    // admitted set — must reproduce every weight bit for bit
    val tref = IngestDaemon.open(spark, tmpDir("daemon-dsir-t-"), reps)
    val di = DsirIndex.open(spark, tmpDir("daemon-dsir-i-"),
      buckets = 64, alpha = 0.5)
    di.ingestTarget("tgt", target, "text")
    def twinScores(b: String, w: DataFrame): Map[Long, Double] = {
      val admitted = tref.processBatch(b, w).get.admitted
      di.ingestRaw(b, gateOf(reps, w), "text")
      di.score(admitted.select("doc_id").join(
          w.select("doc_id", "text"), Seq("doc_id")), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val want = twinScores("b0", w1) ++ twinScores("b1", w2)
    assert(refScores == want,
      "composed daemon scores != independent composition")

    // crash window A: index committed under the knobs of record, dsir
    // and seen did not — the replay must gate (incl. repetition),
    // accumulate and score identically even under a CHANGED config
    val wDir = tmpDir("daemon-dsir-wA-")
    val dA = IngestDaemon.open(spark, wDir, dcfg)
    dA.dsirIndex.get.ingestTarget("tgt", target, "text")
    dA.processBatch("b0", w1)
    dA.index.ingest("b1", gateOf(dcfg, w2), "text", "doc_id",
      corpusTexts = dA.seenTexts, threshold = dcfg.threshold,
      maxBucket = dcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dA.config)))
    assert(dA.appliedVersion("b1").isEmpty &&
      dA.dsirIndex.get.appliedVersion("r", "b1").isEmpty,
      "window A setup broken")
    // restart with LOOSENED repetition thresholds — must not apply
    val dA2 = IngestDaemon.open(spark, wDir, cfg.copy(dsir = true,
      dsirBuckets = 64, dsirAlpha = 0.5))
    dA2.processBatch("b1", w2)
    assert(corpusIds(dA2) == composed, "window A replay diverged")
    assert(scoresOf(dA2) == refScores, "window A scores diverged")

    // crash window B: index AND dsir committed, seen did not — the
    // replay must skip the dsir re-append and still score against the
    // identical standing dict (which already holds b1's counts)
    val wB = tmpDir("daemon-dsir-wB-")
    val dB = IngestDaemon.open(spark, wB, dcfg)
    dB.dsirIndex.get.ingestTarget("tgt", target, "text")
    dB.processBatch("b0", w1)
    dB.index.ingest("b1", gateOf(dcfg, w2), "text", "doc_id",
      corpusTexts = dB.seenTexts, threshold = dcfg.threshold,
      maxBucket = dcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(dB.config)))
    dB.dsirIndex.get.ingestRaw("b1", gateOf(dcfg, w2), "text")
    assert(dB.appliedVersion("b1").isEmpty &&
      dB.dsirIndex.get.appliedVersion("r", "b1").isDefined,
      "window B setup broken")
    dB.processBatch("b1", w2)
    assert(corpusIds(dB) == composed, "window B replay diverged")
    assert(scoresOf(dB) == refScores, "window B scores diverged")
    // exactly-once: the count store did not grow twice
    assert(dB.dsirIndex.get.version == ref.dsirIndex.get.version,
      "dsir count rows duplicated on replay")
    // fully-applied redelivery is a pure no-op
    assert(dB.processBatch("b1", w2).isEmpty, "redelivery not skipped")

    // the new knobs ride the gate record
    val parsed = IngestDaemon.parseGates(cfg, IngestDaemon.gatesString(dcfg))
    assert(parsed.repetition && parsed.dsir &&
      parsed.repMaxTopNgramCharFrac == dcfg.repMaxTopNgramCharFrac &&
      parsed.repMaxDupNgramCharFrac == dcfg.repMaxDupNgramCharFrac)
    assert(!IngestDaemon.parseGates(dcfg,
      IngestDaemon.gatesString(cfg)).repetition,
      "a record without the tier must leave it off")
  }

  test("daemon: the whole ingest plane runs on the object-store leg " +
      "(single-PUT metadata, parquet pins, zero stage-then-rename)") {
    graft.testfs.SinglePutFileSystem.install(spark)
    graft.testfs.SinglePutFileSystem.renames.clear()
    val w1 = docs.where(col("doc_id") < 250)
    val w2 = docs.where(col("doc_id") >= 250)
    // same two batches, local vs graftput: — decisions must match
    val ref = IngestDaemon.open(spark, tmpDir("daemon-os-ref-"), cfg)
    ref.processBatch("b0", w1)
    ref.processBatch("b1", w2)
    val d = IngestDaemon.open(spark, "graftput:" + tmpDir("daemon-os-"), cfg)
    d.processBatch("b0", w1)
    d.processBatch("b1", w2)
    assert(corpusIds(d) == corpusIds(ref),
      "object-store daemon corpus != local daemon corpus")
    // redelivery is still a no-op across the PUT-commit metadata plane
    assert(d.processBatch("b1", w2).isEmpty, "redelivery not skipped")
    // and no metadata commit used the stage-then-rename pattern
    import scala.jdk.CollectionConverters._
    val staged = graft.testfs.SinglePutFileSystem.renames.asScala
      .filter { case (src, dst) => src == dst + ".tmp" }
    assert(staged.isEmpty,
      s"daemon metadata stage-then-renamed on an object store: $staged")
  }

  test("daemon: dsirTargetDir auto-registers the target once, " +
      "idempotent across reopens") {
    val tDir = tmpDir("daemon-dsirtgt-")
    docs.where(col("doc_id") % 3 === 0).select("text")
      .write.mode("overwrite").parquet(tDir)
    val tcfg = cfg.copy(dsir = true, dsirBuckets = 64, dsirAlpha = 0.5,
      dsirTargetDir = Some(tDir))
    val dDir = tmpDir("daemon-dsirtgt-d-")
    val d = IngestDaemon.open(spark, dDir, tcfg)
    val v = d.dsirIndex.get.version
    assert(d.dsirIndex.get.appliedVersion("t", s"target:$tDir").isDefined,
      "target not registered at open")
    // a batch scores without any manual ingestTarget call
    d.processBatch("b0", docs.where(col("doc_id") % 3 =!= 0))
    assert(d.corpus.where(col("dsir_logw").isNull).count() == 0)
    // reopen: the journaled registration no-ops, the target is
    // scanned exactly once ever
    val d2 = IngestDaemon.open(spark, dDir, tcfg)
    assert(d2.dsirIndex.get.version == v + 1, // +1 = b0's raw commit
      "reopen re-ingested the target")
  }

  test("daemon: standing-EvalIndex decontamination — the dictionary " +
      "VERSION of record pins the replay") {
    import graft.pipeline.{Decontaminate, EvalIndex}
    val evalA = docs.where(col("doc_id") % 10 === 0)
    val evalB = docs.where(col("doc_id") % 10 === 5)
    val batch = docs.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val eDir = tmpDir("daemon-evalidx-")
    val idx = EvalIndex.open(spark, eDir, width = 3)
    idx.ingest("suite-a", evalA, "text")
    val v1 = idx.version
    // the two decontamination modes are mutually exclusive
    intercept[IllegalArgumentException] {
      IngestDaemon.open(spark, tmpDir("daemon-eexcl-"),
        cfg.copy(decontaminateDir = Some(eDir),
          decontaminateIndexDir = Some(eDir)))
    }
    val icfg = cfg.copy(decontaminateIndexDir = Some(eDir))

    // composed == independent composition (gate → standing-index
    // decontaminate → plain daemon)
    val d = IngestDaemon.open(spark, tmpDir("daemon-eidx-"), icfg)
    d.processBatch("b0", batch)
    val ids = corpusIds(d)
    assert(ids.nonEmpty && ids.size < batch.count(), "gate vacuous")
    val gatedAll = Curation.gate(batch, "text", cfg.lang, cfg.minQuality,
      cfg.minTokens, cfg.maxTokens)
    val cleaned = idx.decontaminate(gatedAll, "text", "doc_id")
    val twin = IngestDaemon.open(spark, tmpDir("daemon-eidx-t-"), cfg)
    twin.processBatch("b0", cleaned.select("doc_id", "text"))
    assert(ids == corpusIds(twin),
      "composed EvalIndex decontamination != independent composition")
    // the resolved dictionary version rides the record
    assert(d.index.recordedGates("b0").get
      .contains(s"decontaminateIndexVer=$v1"))

    // version-of-record window: index commit lands gated at v1, then
    // suite-b REGISTERS inside the crash window — the replay must
    // still gate at v1 (same corpus as a clean v1 run), not at v2
    val wDir = tmpDir("daemon-eidx-w-")
    val dW = IngestDaemon.open(spark, wDir, icfg)
    val keysV1 = idx.gramKeys(asOf = Some(v1))
    val gatedV1 = Decontaminate.decontaminateWithKeys(
      gatedAll, keysV1, "text", "doc_id", 3, 1L)
    dW.index.ingest("b0", gatedV1.select("doc_id", "text"), "text",
      "doc_id", corpusTexts = dW.seenTexts, threshold = icfg.threshold,
      maxBucket = icfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(
        icfg.copy(decontaminateIndexVer = Some(v1)))))
    idx.ingest("suite-b", evalB, "text") // the mid-window registration
    assert(idx.version > v1)
    val dW2 = IngestDaemon.open(spark, wDir, icfg)
    dW2.processBatch("b0", batch)
    assert(corpusIds(dW2) == ids,
      "replay gated against a dictionary version it did not record")

    // a FRESH batch on the live daemon now gates at v2 — suite-b's
    // grams drop additional docs
    val d2 = IngestDaemon.open(spark, tmpDir("daemon-eidx-2-"), icfg)
    d2.processBatch("b0", batch)
    val idsV2 = corpusIds(d2)
    assert(idsV2.size < ids.size,
      "the newly registered suite dropped nothing — vacuous")
    assert(d2.index.recordedGates("b0").get
      .contains(s"decontaminateIndexVer=${idx.version}"))
  }

  test("daemon: drift monitor — measured KS rides the journal row, " +
      "warn past threshold, abort refuses before any commit") {
    val full = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "n_chars")
    // the knobs refuse a daemon without the profile value leg
    intercept[IllegalArgumentException] {
      IngestDaemon.open(spark, tmpDir("daemon-driftbad-"),
        cfg.copy(driftWarnKs = Some(0.5)))
    }
    val dcfg = cfg.copy(profileStrataCol = Some("lang"), profileK = 64,
      profileValueCol = Some("n_chars"),
      driftWarnKs = Some(0.5), driftAbortKs = Some(0.9))
    val dir = tmpDir("daemon-drift-")
    val d = IngestDaemon.open(spark, dir, dcfg)
    // batch 0: no standing distribution yet — nothing to measure
    d.processBatch("b0", full.where(col("doc_id") < 250))
    assert(d.recordedDrift("b0").isEmpty,
      "drift measured against an empty standing profile")
    // batch 1, same shape: measured, recorded, under the warn bar
    d.processBatch("b1",
      full.where(col("doc_id") >= 250 && col("doc_id") < 400))
    val (ks1, warned1) = d.recordedDrift("b1").getOrElse(
      fail("no drift record on b1"))
    assert(ks1 >= 0.0 && ks1 <= 1.0)
    assert(!warned1, s"same-shape batch warned at ks=$ks1")
    // batch 2, disjoint value range (KS = 1.0): the abort knob
    // refuses it BEFORE anything commits
    val shifted = full.where(col("doc_id") >= 400)
      .withColumn("n_chars", col("n_chars") + 1000000)
    val e = intercept[IllegalStateException](d.processBatch("b2", shifted))
    assert(e.getMessage.contains("refused"))
    assert(d.index.appliedVersion("b2").isEmpty &&
      d.appliedVersion("b2").isEmpty &&
      d.profileIndex.get.appliedVersion("b2").isEmpty,
      "abort left partial state")
    // raising the knob admits the batch, with the measurement and the
    // warn flag on the record
    val d2 = IngestDaemon.open(spark, dir,
      dcfg.copy(driftAbortKs = Some(1.1)))
    d2.processBatch("b2", shifted)
    val (ks2, warned2) = d2.recordedDrift("b2").getOrElse(
      fail("no drift record on b2"))
    assert(ks2 > ks1 && ks2 >= 0.9, s"disjoint shift measured ks=$ks2")
    assert(warned2, "shifted batch not flagged past the warn bar")
    // the drift payload never confuses the knobs-of-record parser
    val rec = d2.index.recordedGates("b2").get
    assert(rec.contains("driftMaxKs="))
    val reparsed = IngestDaemon.parseGates(cfg, rec)
    assert(reparsed.profileStrataCol.contains("lang"))
  }

  test("daemon: DSIR weights score at the VERSION OF RECORD — an " +
      "ingestTarget landing mid-crash-window cannot change a replay") {
    val target = docs.where(col("doc_id") % 5 === 0)
    val lateTarget = docs.where(col("doc_id") % 5 === 1)
    val raw = docs.where(col("doc_id") % 5 > 1)
    val w0 = raw.where(col("doc_id") < 150)
    val w1 = raw.where(col("doc_id") >= 150 && col("doc_id") < 300)
    val w2 = raw.where(col("doc_id") >= 300)
    val dcfg = cfg.copy(dsir = true, dsirBuckets = 64, dsirAlpha = 0.5)
    def scoresOf(d: IngestDaemon, ws: DataFrame): Map[Long, Double] =
      d.corpus.join(ws.select("doc_id"), Seq("doc_id"))
        .select("doc_id", "dsir_logw").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // twin: never sees the late target
    val twin = IngestDaemon.open(spark, tmpDir("daemon-dvor-t-"), dcfg)
    twin.dsirIndex.get.ingestTarget("tgt", target, "text")
    twin.processBatch("b0", w0)
    twin.processBatch("b1", w1)
    twin.processBatch("b2", w2)

    // main: crash window between b1's dsir commit and its seen
    // commit; the late target registers INSIDE the window
    val dir = tmpDir("daemon-dvor-")
    val d = IngestDaemon.open(spark, dir, dcfg)
    d.dsirIndex.get.ingestTarget("tgt", target, "text")
    d.processBatch("b0", w0)
    val gatedW1 = Curation.gate(w1.select("doc_id", "text"), "text",
      dcfg.lang, dcfg.minQuality, dcfg.minTokens, dcfg.maxTokens)
    d.index.ingest("b1", gatedW1, "text", "doc_id",
      corpusTexts = d.seenTexts, threshold = dcfg.threshold,
      maxBucket = dcfg.maxBucket,
      gates = Some(IngestDaemon.gatesString(d.config)))
    d.dsirIndex.get.ingestRaw("b1", gatedW1, "text")
    assert(d.appliedVersion("b1").isEmpty &&
      d.dsirIndex.get.appliedVersion("r", "b1").isDefined,
      "window setup broken")
    d.dsirIndex.get.ingestTarget("tgt-late", lateTarget, "text")
    // the replay must score b1 under the dict AS OF its recorded raw
    // commit — bit-for-bit the no-late-target twin, NOT the current
    // dict that now includes the late target
    val d2 = IngestDaemon.open(spark, dir, dcfg)
    d2.processBatch("b1", w1)
    assert(scoresOf(d2, w1) == scoresOf(twin, w1),
      "a mid-window ingestTarget changed a replayed batch's weights")
    // ... while the NEXT fresh batch scores under the new model
    d2.processBatch("b2", w2)
    val b2Main = scoresOf(d2, w2)
    val b2Twin = scoresOf(twin, w2)
    assert(b2Main.keySet == b2Twin.keySet,
      "the dict shift changed admissions — fixture broken")
    assert(b2Main != b2Twin,
      "the late target shifted nothing — vacuous")
    // every persisted weight is reproducible from the journal alone:
    // re-derive each batch's scores at its recorded raw-commit version
    val di = d2.dsirIndex.get
    for ((b, w) <- Seq(("b0", w0), ("b1", w1), ("b2", w2))) {
      val ver = di.appliedVersion("r", b).getOrElse(fail(s"no journal: $b"))
      val redo = di.score(
        d2.corpus.join(w.select("doc_id"), Seq("doc_id"))
          .select("doc_id", "text"),
        "text", "doc_id", asOf = Some(ver))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(redo == scoresOf(d2, w),
        s"$b: persisted weights not reproducible from the recorded version")
    }
  }

  test("daemon: suites registered through ANOTHER handle gate from the " +
      "next fresh batch (the resolve refreshes from disk)") {
    import graft.pipeline.EvalIndex
    val evalA = docs.where(col("doc_id") % 10 === 0)
    val evalB = docs.where(col("doc_id") % 10 === 5)
    val batch = docs.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val w0 = batch.where(col("doc_id") < 250)
    val w1 = batch.where(col("doc_id") >= 250)
    val eDir = tmpDir("daemon-exref-")
    val idx = EvalIndex.open(spark, eDir, width = 3)
    idx.ingest("suite-a", evalA, "text")
    val v1 = idx.version
    // one LONG-LIVED daemon handle across both registrations
    val d = IngestDaemon.open(spark, tmpDir("daemon-exrefd-"),
      cfg.copy(decontaminateIndexDir = Some(eDir)))
    d.processBatch("b0", w0)
    assert(d.index.recordedGates("b0").get
      .contains(s"decontaminateIndexVer=$v1"))
    // suite-b registers through a DIFFERENT handle (another process,
    // in production) — the daemon handle is never told
    EvalIndex.open(spark, eDir).ingest("suite-b", evalB, "text")
    val v2 = EvalIndex.open(spark, eDir).version
    assert(v2 > v1)
    // the SAME daemon handle's next fresh batch must resolve v2, not
    // its cached snapshot
    d.processBatch("b1", w1)
    assert(d.index.recordedGates("b1").get
      .contains(s"decontaminateIndexVer=$v2"),
      "fresh batch gated against a stale cached dictionary version")
    // and actually dropped suite-b overlap: a twin running BOTH
    // batches pinned at v1 admits MORE (same dedup history, so the
    // only difference is the dictionary version)
    val twin = IngestDaemon.open(spark, tmpDir("daemon-exreft-"),
      cfg.copy(decontaminateIndexDir = Some(eDir),
        decontaminateIndexVer = Some(v1)))
    twin.processBatch("b0", w0)
    twin.processBatch("b1", w1)
    val admitted = corpusIds(d).toSet
    val admittedV1 = corpusIds(twin).toSet
    assert((admittedV1 -- admitted).nonEmpty,
      "suite-b grams dropped nothing — vacuous")
  }

  private def seenDataFiles(dir: String): Int =
    java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "seen", "data")).count().toInt

  test("daemon: automated maintenance folds the stores inside the " +
      "loop — admissions unchanged, crash-during-fold replays clean") {
    val waves = (0 until 5).map(i => docs.where(col("doc_id") % 5 === i))
    // twin without maintenance: every admit/drop decision must match
    val plainDir = tmpDir("daemon-acplain-")
    val plain = IngestDaemon.open(spark, plainDir, cfg)
    waves.zipWithIndex.take(4).foreach { case (w, i) =>
      plain.processBatch(s"b$i", w) }

    val acfg = cfg.copy(compactEvery = Some(2), compactTargetPartitions = 2)
    val dir = tmpDir("daemon-ac-")
    val d = IngestDaemon.open(spark, dir, acfg)
    d.processBatch("b0", waves(0))
    val v0 = d.version
    waves.zipWithIndex.slice(1, 4).foreach { case (w, i) =>
      d.processBatch(s"b$i", w) }
    assert(corpusIds(d) == corpusIds(plain),
      "auto-compaction changed an admission decision")
    // the fold ran: layout bounded (vs the un-maintained twin), the
    // journal survived it, pre-fold snapshots refuse loudly, current
    // snapshots still pin
    assert(seenDataFiles(dir) < seenDataFiles(plainDir),
      s"fold did not bound the seen layout: ${seenDataFiles(dir)} vs " +
        s"${seenDataFiles(plainDir)}")
    (0 until 4).foreach(i => assert(d.appliedVersion(s"b$i").isDefined,
      s"journal row b$i lost across the fold"))
    val foldE = intercept[Exception](d.corpusAsOf(v0).collect())
    assert(foldE.getMessage.contains("folded"), foldE.getMessage)
    assert(d.corpusAsOf(d.version).count() == corpusIds(d).size.toLong)

    // crash DURING an auto-fold: the next call re-runs maintenance
    // and the batch, nothing double-applied (the fold is pre-batch,
    // so the kill touches no batch state at all)
    @volatile var killed = false
    graft.storage.FaultPoints.install { p =>
      if (p == "table.rewrite.preCommit" && !killed) {
        killed = true; throw new RuntimeException("kill: auto-compact")
      }
    }
    try intercept[RuntimeException](d.processBatch("b4", waves(4)))
    finally graft.storage.FaultPoints.clear()
    assert(d.appliedVersion("b4").isEmpty, "killed batch left state")
    d.processBatch("b4", waves(4))
    plain.processBatch("b4", waves(4))
    assert(corpusIds(d) == corpusIds(plain),
      "crash-during-fold diverged the corpus")

    // the segment-count trigger: layout pressure stays bounded with
    // no per-handle counter (restart-robust)
    val sDir = tmpDir("daemon-acseg-")
    val s = IngestDaemon.open(spark, sDir,
      cfg.copy(compactMaxSegments = Some(3), compactTargetPartitions = 1))
    waves.zipWithIndex.foreach { case (w, i) => s.processBatch(s"b$i", w) }
    assert(corpusIds(s) == corpusIds(plain),
      "segment-trigger maintenance changed admissions")
    assert(seenDataFiles(sDir) <= 3 + 4,
      s"segment trigger never fired: ${seenDataFiles(sDir)} files")
  }

  test("daemon: MINOR maintenance — admissions unchanged, corpusAsOf " +
      "and crash replays keep working across the folds") {
    val waves = (0 until 5).map(i => docs.where(col("doc_id") % 5 === i))
    val plainDir = tmpDir("daemon-mnplain-")
    val plain = IngestDaemon.open(spark, plainDir, cfg)
    waves.zipWithIndex.foreach { case (w, i) =>
      plain.processBatch(s"b$i", w) }

    val mcfg = cfg.copy(compactEvery = Some(2),
      compactTargetPartitions = 2, compactMinor = true)
    val dir = tmpDir("daemon-mn-")
    val d = IngestDaemon.open(spark, dir, mcfg)
    d.processBatch("b0", waves(0))
    val v0 = d.version
    val corpus0 = d.corpusAsOf(v0).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    waves.zipWithIndex.slice(1, 4).foreach { case (w, i) =>
      d.processBatch(s"b$i", w) }
    val plainThroughB3 = plain.corpusAsOf(plain.appliedVersion("b3").get)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(corpusIds(d) == plainThroughB3,
      "minor maintenance changed an admission decision")
    // the folds ran AND bounded the layout
    assert(seenDataFiles(dir) < seenDataFiles(plainDir),
      s"minor fold did not bound the seen layout: ${seenDataFiles(dir)} " +
        s"vs ${seenDataFiles(plainDir)}")
    // ...but UNLIKE the full fold, every pre-fold snapshot stays
    // servable: corpusAsOf(v0) returns the identical pinned corpus
    assert(d.corpusAsOf(v0).select("doc_id").collect()
      .map(_.getLong(0)).toSet == corpus0,
      "minor fold broke a pinned pre-fold snapshot")
    (0 until 4).foreach(i => assert(d.appliedVersion(s"b$i").isDefined,
      s"journal row b$i lost across the minor fold"))

    // crash mid-batch AFTER the index commit (the classic half-applied
    // window), with a minor fold having landed earlier: the replay
    // reads its pre-batch snapshot THROUGH the folded store and
    // finishes the batch exactly
    // the batch's FIRST table.append commit is the index's own (band
    // rows + journal); the SECOND is the seen store's — kill there
    @volatile var appends = 0
    graft.storage.FaultPoints.install { p =>
      if (p == "table.append.preCommit") {
        appends += 1
        if (appends == 2) throw new RuntimeException("kill: seen commit")
      }
    }
    try intercept[RuntimeException](d.processBatch("b4", waves(4)))
    finally graft.storage.FaultPoints.clear()
    assert(d.index.appliedVersion("b4").isDefined,
      "kill landed before the index commit — wrong window")
    assert(d.appliedVersion("b4").isEmpty, "seen commit survived the kill")
    d.processBatch("b4", waves(4)) // replay finishes the half-applied batch
    assert(corpusIds(d) == corpusIds(plain),
      "half-applied replay across a minor fold diverged the corpus")
  }

  test("daemon: a pre-dsir_logw seen store reopens via the widening " +
      "migration — old rows read null, the loop continues") {
    import graft.storage.TableStore
    val dir = tmpDir("daemon-mig-")
    // hand-construct the PRE-UPGRADE layout: a seen store created by
    // a build without the dsir_logw column, one committed batch
    val oldSchema = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("id", LongType, nullable = true),
      StructField("text", StringType, nullable = true),
      StructField("n_tokens", LongType, nullable = true),
      StructField("quality", DoubleType, nullable = true),
      StructField("admitted", BooleanType, nullable = true),
      StructField("batch_id", StringType, nullable = true)))
    val old = TableStore.open(spark, dir + "/seen", oldSchema)
    val nul = (t: String) => lit(null).cast(t)
    val docRows = spark.range(2).select(
      lit("doc").as("kind"), (col("id") + 1).as("id"),
      lit("the cat sat on the mat").as("text"),
      lit(6L).as("n_tokens"), lit(0.9).as("quality"),
      lit(true).as("admitted"), nul("string").as("batch_id"))
    val journal = spark.range(1).select(
      lit("batch").as("kind"), nul("long").as("id"),
      nul("string").as("text"), nul("long").as("n_tokens"),
      nul("double").as("quality"), nul("boolean").as("admitted"),
      lit("old-b0").as("batch_id"))
    old.append(docRows.unionByName(journal))
    // the upgrade build opens the same dir: must NOT refuse (ADVICE
    // r18 — this used to brick every pre-dsir deployment)
    val d = IngestDaemon.open(spark, dir, cfg)
    assert(d.appliedVersion("old-b0").isDefined,
      "pre-migration journal row unreadable")
    val oldCorpus = d.corpus.orderBy("doc_id").collect()
    assert(oldCorpus.length == 2 &&
      oldCorpus.forall(_.isNullAt(4)),
      "pre-migration rows must read dsir_logw as null")
    // and the loop continues across the migration
    d.processBatch("b1", docs.where(col("doc_id") < 100))
    assert(corpusIds(d).size > 2, "post-migration batch admitted nothing")
    assert(d.processBatch("old-b0", docs.limit(1)).isEmpty,
      "pre-migration batch not recognized as applied")
  }

  test("daemon: checkConsistency sweeps pin staging litter, leaves " +
      "live pins and young litter alone") {
    val dir = tmpDir("daemon-pins-")
    val d = IngestDaemon.open(spark, dir,
      cfg.copy(dsir = true, dsirBuckets = 64,
        dsirTargetDir = {
          val t = tmpDir("daemon-pins-tgt-")
          docs.where(col("doc_id") % 7 === 0).write.mode("overwrite")
            .parquet(t); Some(t)
        }))
    d.processBatch("b0", docs.where(col("doc_id") % 7 =!= 0))
    val pins = java.nio.file.Paths.get(dir, "pins")
    assert(java.nio.file.Files.exists(pins.resolve("gated")),
      "the gated pin should exist after a batch")
    // plant a crashed pin publish
    val litter = pins.resolve("tmp-gated-dead")
    java.nio.file.Files.createDirectories(litter)
    java.nio.file.Files.write(litter.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    val report = d.checkConsistency()
    assert(report.exists(_.contains("tmp-gated-dead")), report.toString)
    // young litter survives the default age gate (a live writer may
    // own it)
    d.checkConsistency(repair = true)
    assert(java.nio.file.Files.exists(litter))
    // writer-known-dead repair removes it; live pins stay
    d.checkConsistency(repair = true, minAgeMs = 0)
    assert(!java.nio.file.Files.exists(litter))
    assert(java.nio.file.Files.exists(pins.resolve("gated")),
      "sweep must not delete live stage pins")
    assert(corpusIds(d).nonEmpty)
  }

  test("gate records with empty repetition threshold lists round-trip") {
    // recording skips empty lists (absence = fall back to base), and
    // the parser tolerates old records that DID write an empty value
    val c = cfg.copy(repMaxTopNgramCharFrac = Nil,
      repMaxDupNgramCharFrac = Nil)
    val s = IngestDaemon.gatesString(c)
    assert(!s.contains("repMaxTopNgramCharFrac"),
      "empty list recorded — replays would NFE")
    val parsed = IngestDaemon.parseGates(cfg, s)
    assert(parsed.repMaxTopNgramCharFrac == cfg.repMaxTopNgramCharFrac)
    assert(IngestDaemon.parseGates(cfg,
      "repMaxTopNgramCharFrac=\nrepMaxDupNgramCharFrac=")
      .repMaxTopNgramCharFrac == Nil,
      "an old empty-valued record must parse to Nil, not throw")
  }
}
