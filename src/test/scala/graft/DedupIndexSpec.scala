package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, DedupIndex, DedupParams}

/** The managed standing-dedup-index artifact: transactional ingest
  * (probe + index advance as one commit), exactly-once replay, the
  * rolling-vs-batch pair identity through the managed store, the
  * unified components survivor rule, and the parameter guard at the
  * persist/probe boundary. */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, sf, "documents")
  private val P = DedupParams(numHashes = 8, bands = 4)

  test("ingest is transactional and replay is exactly-once") {
    val corpus = docs.where(col("doc_id") < 250)
    val fresh = docs.where(col("doc_id") >= 250)
    val idx = DedupIndex.open(spark, tmpDir("graft-didx-"), P)
    // crash BEFORE the commit ≡ the ingest never ran: nothing is
    // visible until the single manifest commit, so the recovery path
    // is simply running ingest — asserted by seeding then ingesting
    // against a store whose version we can watch
    val vSeed = idx.seed("corpus", corpus, "text", "doc_id")
    assert(idx.seed("corpus", corpus, "text", "doc_id") == vSeed,
      "seed replay must not re-append")
    val r1 = idx.ingest("b1", fresh, "text", "doc_id",
      corpusTexts = corpus.select("doc_id", "text"),
      threshold = 0.35, exactTier = false)
    assert(!r1.replayed && r1.version == vSeed + 1)
    val pairs1 = r1.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val admitted1 = r1.admitted.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val nBands1 = idx.bands.count()
    // crash AFTER the commit, before the caller persisted outputs:
    // re-running the same batch id must detect the journal row,
    // recompute against the PRE-batch snapshot (not pair the batch
    // with its own indexed bands) and not advance the index again
    val r2 = idx.ingest("b1", fresh, "text", "doc_id",
      corpusTexts = corpus.select("doc_id", "text"),
      threshold = 0.35, exactTier = false)
    assert(r2.replayed && r2.version == r1.version)
    assert(idx.version == r1.version, "replay must not commit")
    assert(idx.bands.count() == nBands1, "replay must not append bands")
    val pairs2 = r2.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val admitted2 = r2.admitted.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(pairs2 == pairs1, s"replay pairs diverged: " +
      s"extra=${pairs2 -- pairs1}, missing=${pairs1 -- pairs2}")
    assert(admitted2 == admitted1)
    assert(pairs1.nonEmpty, "fixture has no batch-touching pairs — vacuous")
  }

  test("overlapping seed under a NEW batchId appends no duplicate rows") {
    val corpus = docs.where(col("doc_id") < 200)
    val overlap = docs.where(col("doc_id") < 250) // 200 already seeded
    val idx = DedupIndex.open(spark, tmpDir("graft-didx-ov-"), P)
    idx.seed("s1", corpus, "text", "doc_id")
    val bandsPerDoc = P.bands.toLong
    assert(idx.bands.count() == 200 * bandsPerDoc)
    // second seed, different batchId, 200 of 250 docs overlap: only
    // the 50 new docs' rows may land — duplicated band rows would make
    // every later ingest probe return standing candidates twice
    idx.seed("s2", overlap, "text", "doc_id")
    assert(idx.bands.count() == 250 * bandsPerDoc,
      "overlapping seed duplicated band rows")
    assert(idx.bands.select("id", "band").distinct().count() ==
      250 * bandsPerDoc)
    val fps = idx.fingerprints.collect().map(_.getString(0))
    assert(fps.length == fps.distinct.length,
      "overlapping seed duplicated fingerprints")
  }

  test("rolling 3-batch ingest equals the one-shot batch run") {
    val corpus = docs.where(col("doc_id") < 250)
    val batch1 = docs.where(col("doc_id") >= 250 && col("doc_id") < 375)
    val batch2 = docs.where(col("doc_id") >= 375)
    val idx = DedupIndex.open(spark, tmpDir("graft-didx-roll-"), P)
    idx.seed("corpus", corpus, "text", "doc_id")
    val pairs1 = idx.ingest("b1", batch1, "text", "doc_id",
        corpusTexts = corpus.select("doc_id", "text"),
        threshold = 0.35, exactTier = false)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch2 probes the index GROWN by batch1's commit
    val grown = corpus.unionByName(batch1)
    val pairs2 = idx.ingest("b2", batch2, "text", "doc_id",
        corpusTexts = grown.select("doc_id", "text"),
        threshold = 0.35, exactTier = false)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup
      .minhashLshPairs(docs, "text", "doc_id", 8, 4, 3, 0.35)
      .where(col("id_a") >= 250 || col("id_b") >= 250)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((pairs1 ++ pairs2) == want,
      s"rolling != one-shot: extra=${(pairs1 ++ pairs2) -- want}, " +
        s"missing=${want -- (pairs1 ++ pairs2)}")
    assert(pairs1.intersect(pairs2).isEmpty)
  }

  test("compact folds history; probes identical; pre-fold replay fails loudly") {
    val corpus = docs.where(col("doc_id") < 250)
    val batch1 = docs.where(col("doc_id") >= 250 && col("doc_id") < 375)
    val batch2 = docs.where(col("doc_id") >= 375)
    val dir = tmpDir("graft-didx-cpt-")
    val idx = DedupIndex.open(spark, dir, P)
    idx.seed("corpus", corpus, "text", "doc_id")
    idx.ingest("b1", batch1, "text", "doc_id",
      corpusTexts = corpus.select("doc_id", "text"),
      threshold = 0.35, exactTier = false)
    val bandsBefore = idx.bands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val segsBefore = graft.storage.Manifest
      .load(java.nio.file.Paths.get(dir, "store").toString).get.segments.length
    idx.compact(targetPartitions = 2)
    val segsAfter = graft.storage.Manifest
      .load(java.nio.file.Paths.get(dir, "store").toString).get.segments.length
    assert(segsAfter < segsBefore && segsAfter <= 2,
      s"fold should shrink to the explicit layout ($segsBefore -> $segsAfter)")
    // rows preserved exactly; journal still answers
    assert(idx.bands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet == bandsBefore)
    assert(idx.appliedVersion("b1").isDefined)
    // a NEW batch probes the folded index identically to the unfolded
    // run (rolling identity still holds through the fold)
    val grown = corpus.unionByName(batch1)
    val pairs2 = idx.ingest("b2", batch2, "text", "doc_id",
        corpusTexts = grown.select("doc_id", "text"),
        threshold = 0.35, exactTier = false)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup
      .minhashLshPairs(docs, "text", "doc_id", 8, 4, 3, 0.35)
      .where(col("id_a") >= 375 || col("id_b") >= 375)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2 == want,
      s"post-fold probe diverged: extra=${pairs2 -- want}, missing=${want -- pairs2}")
    // replaying a PRE-fold batch needs its folded-away snapshot: loud
    val e = intercept[Exception] {
      idx.ingest("b1", batch1, "text", "doc_id",
        corpusTexts = corpus.select("doc_id", "text"),
        threshold = 0.35, exactTier = false).pairs.count()
    }
    assert(e.getMessage.contains("folded"), e.getMessage)
  }

  test("compactMinor folds the small tail; pre-fold replay stays exact") {
    val corpus = docs.where(col("doc_id") < 250)
    val batch1 = docs.where(col("doc_id") >= 250 && col("doc_id") < 375)
    val batch2 = docs.where(col("doc_id") >= 375)
    val dir = tmpDir("graft-didx-minor-")
    val idx = DedupIndex.open(spark, dir, P)
    idx.seed("corpus", corpus, "text", "doc_id")
    val r1 = idx.ingest("b1", batch1, "text", "doc_id",
      corpusTexts = corpus.select("doc_id", "text"),
      threshold = 0.35, exactTier = false)
    val pairs1 = r1.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val admitted1 = r1.admitted.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val bandsBefore = idx.bands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val storeDir = java.nio.file.Paths.get(dir, "store").toString
    val segsBefore =
      graft.storage.Manifest.load(storeDir).get.segments.length
    assert(idx.compactMinor(targetPartitions = 2))
    val m = graft.storage.Manifest.load(storeDir).get
    assert(m.segments.length < segsBefore && m.segments.length <= 2)
    assert(m.foldedBelow.isEmpty, "a minor fold must not destroy history")
    assert(idx.bands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet == bandsBefore)
    // REPLAYING the pre-fold batch works and reproduces the identical
    // decision set — the property the full fold refuses loudly (its
    // pre-batch snapshot is folded away; the minor fold preserves
    // every row's commit version, so readAsOf stays exact)
    val r1b = idx.ingest("b1", batch1, "text", "doc_id",
      corpusTexts = corpus.select("doc_id", "text"),
      threshold = 0.35, exactTier = false)
    assert(r1b.replayed)
    assert(r1b.pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == pairs1)
    assert(r1b.admitted.select("doc_id").collect()
      .map(_.getLong(0)).toSet == admitted1)
    // a NEW batch probes the folded index identically to the unfolded
    // run (rolling identity holds through the minor fold too)
    val grown = corpus.unionByName(batch1)
    val pairs2 = idx.ingest("b2", batch2, "text", "doc_id",
        corpusTexts = grown.select("doc_id", "text"),
        threshold = 0.35, exactTier = false)
      .pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup
      .minhashLshPairs(docs, "text", "doc_id", 8, 4, 3, 0.35)
      .where(col("id_a") >= 375 || col("id_b") >= 375)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2 == want,
      s"post-minor-fold probe diverged: extra=${pairs2 -- want}, " +
        s"missing=${want -- pairs2}")
  }

  test("exact tier drops indexed fingerprints; admitted set is " +
    "invariant to running it") {
    val corpus = Seq((500L, "the standing corpus document")).toDF("doc_id", "text")
    val base = "the system reads the data and the index stores the " +
      "results and the pipeline writes the tables and the queries scan " +
      "the segments while the workers merge the"
    val fresh = Seq(
      (10L, "The  standing corpus DOCUMENT"), // exact dup of corpus 500
      (20L, s"$base output"),
      (21L, s"$base outputs"), // near-dups 20
      (30L, "something else entirely")
    ).toDF("doc_id", "text")
    def run(exact: Boolean): (Set[Long], Set[Long], Long) = {
      val idx = DedupIndex.open(spark, tmpDir("graft-didx-ex-"), P)
      idx.seed("corpus", corpus, "text", "doc_id")
      val r = idx.ingest("b1", fresh, "text", "doc_id",
        corpusTexts = corpus, threshold = 0.35, exactTier = exact)
      (r.exactSurvivors.select("doc_id").collect().map(_.getLong(0)).toSet,
        r.admitted.select("doc_id").collect().map(_.getLong(0)).toSet,
        idx.fingerprints.count())
    }
    val (exSurv, admitted, nFps) = run(exact = true)
    assert(exSurv == Set(20L, 21L, 30L), s"exact survivors $exSurv")
    assert(admitted == Set(20L, 30L), s"admitted $admitted")
    // the fp index advanced by the exact survivors only (3 new
    // contents) on top of the corpus's 1
    assert(nFps == 4L, s"fingerprint rows $nFps")
    // an exact dup is a jaccard-1.0 near-dup: the ADMITTED set must
    // not depend on whether the exact tier ran
    val (_, admittedNoExact, _) = run(exact = false)
    assert(admittedNoExact == admitted)
  }

  test("survivor rule: components over the batch-touching graph " +
    "(chain case), corpus wins side-aware") {
    // ids chosen so ID ORDER CONTRADICTS the sides (batch 10 < corpus
    // 500) and so a transitive chain c<a<b exercises the round-10
    // unification: pairwise min-id-partner kept BOTH a and c; the
    // components rule keeps only c.
    val mk = (suffix: String) => "the quick brown fox jumps over the " +
      "lazy dog while the eager cat watches the busy birds build " +
      s"their nest in the tall tree $suffix"
    val corpus = Seq((500L, mk("near the river bank"))).toDF("doc_id", "text")
    // chain via disjoint halves: 41 = half W, 40 = half X (no shared
    // word with W), 42 = W ++ X — so 41~42 and 40~42 at jaccard
    // ≈ 18/38 while 41 and 40 share NOTHING (the triangle cannot
    // close, whatever the threshold)
    val wHalf = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val xHalf = "crimson harbor velvet thunder willow granite meadow " +
      "copper lantern breeze marble falcon amber canyon silver orchid " +
      "ember prairie cobalt drift"
    val fresh = Seq(
      (10L, mk("near the river banks")), // near-dups corpus 500 → drops
      (41L, wHalf),
      (40L, xHalf),
      (42L, s"$wHalf $xHalf"),
      (30L, "entirely different content where the scheduler and the " +
        "executor exchange the shuffle blocks and the reducer combines " +
        "the partial sums")
    ).toDF("doc_id", "text")
    // 1-row bands: at jaccard ≈ 0.47 a 2-row band matches with prob
    // s² per band — 8 single-row bands make the candidate step
    // deterministic-in-practice for this vector
    val idx = DedupIndex.open(spark, tmpDir("graft-didx-cc-"),
      DedupParams(numHashes = 8, bands = 8))
    idx.seed("corpus", corpus, "text", "doc_id")
    val r = idx.ingest("b1", fresh, "text", "doc_id",
      corpusTexts = corpus, threshold = 0.35)
    val got = r.pairs.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // pin the graph shape this vector assumes: side pair + a chain
    // NOT closed into a triangle
    assert(got.contains((10L, 500L)) || got.contains((500L, 10L)),
      s"expected the corpus pair, got $got")
    assert(got.contains((41L, 42L)) && got.contains((40L, 42L)) &&
      !got.contains((40L, 41L)), s"expected an open chain, got $got")
    val admitted = r.admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    // 10 drops to the corpus (side-aware); the chain component
    // {40,41,42} keeps only its min (40) — pairwise would also keep 41
    assert(admitted == Set(30L, 40L), s"admitted $admitted")
  }

  test("open refuses mismatched banding parameters") {
    val dir = tmpDir("graft-didx-params-")
    DedupIndex.open(spark, dir, P)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.open(spark, dir, DedupParams(numHashes = 16, bands = 4))
    }
    assert(e.getMessage.contains("banding parameters"))
    // reopen without params recovers the stored ones
    assert(DedupIndex.open(spark, dir).params == P)
  }
}
