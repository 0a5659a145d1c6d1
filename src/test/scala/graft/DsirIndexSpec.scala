package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{DsirIndex, Importance}

/** Contract vectors for the standing DSIR artifact: the incremental
  * count accumulation must be invisible — a [[DsirIndex]] fed the same
  * corpora in any batch decomposition yields the dictionary
  * [[Importance.dsirDict]] builds one-shot, bit for bit — and the
  * journal/pinned-knob discipline must match its six artifact
  * siblings (idempotent replays, mismatch refusal, fold-safe compact).
  */
class DsirIndexSpec extends SparkSpec {

  private lazy val docs = Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")
  private lazy val target = docs.where(col("doc_id") % 3 === 0)
  private lazy val raw = docs.where(col("doc_id") % 3 =!= 0)

  private val B = 64
  private val A = 0.5

  private def openIdx(dir: String) =
    DsirIndex.open(spark, dir, buckets = B, alpha = A)

  private def dictMap(d: DataFrame): Map[Long, Double] =
    d.select("bucket", "lr").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def scoreMap(d: DataFrame): Map[Long, Double] =
    d.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("standing dict over any batch decomposition == one-shot dsirDict") {
    val oneShot = Importance
      .dsirDict(raw, target, "text", buckets = B, alpha = A).get
    val idx = openIdx(tmpDir("dsir-idx-"))
    idx.ingestTarget("tgt", target, "text")
    idx.ingestRaw("b0", raw.where(col("doc_id") % 2 === 0), "text")
    idx.ingestRaw("b1", raw.where(col("doc_id") % 2 === 1), "text")
    val standing = idx.dict.get
    assert(dictMap(standing) == dictMap(oneShot),
      "incremental counts changed the dictionary")
    // and scoring through the artifact == scoring under the one-shot
    val viaIdx = scoreMap(idx.score(raw, "text", "doc_id"))
    val viaOne = scoreMap(Importance.dsirScoreWith(
      raw, oneShot, "text", "doc_id", buckets = B))
    assert(viaIdx == viaOne)
  }

  test("replays are idempotent per (side, batchId); sides journal " +
      "independently") {
    val idx = openIdx(tmpDir("dsir-rep-"))
    idx.ingestTarget("x", target, "text")
    val v = idx.version
    idx.ingestTarget("x", target, "text") // redelivery: no-op
    assert(idx.version == v, "target redelivery re-committed")
    // the same id on the OTHER side is a fresh ingest, not a replay
    idx.ingestRaw("x", raw, "text")
    assert(idx.version > v, "raw side blocked by target's batch id")
    val v2 = idx.version
    idx.ingestRaw("x", raw, "text")
    assert(idx.version == v2, "raw redelivery re-committed")
    assert(idx.appliedVersion("t", "x").isDefined)
    assert(idx.appliedVersion("r", "x").isDefined)
  }

  test("pinned knobs: reopen restores them, mismatch refuses") {
    val dir = tmpDir("dsir-pin-")
    openIdx(dir)
    val re = DsirIndex.open(spark, dir) // knob-free reopen
    assert(re.buckets == B && re.alpha == A && re.bigrams &&
      re.seed == "dsir" && re.portable)
    val e = intercept[IllegalArgumentException] {
      DsirIndex.open(spark, dir, buckets = 128, alpha = A)
    }
    assert(e.getMessage.contains("never sum"))
  }

  test("no target side → dict is None and score refuses loudly; " +
      "empty RAW side is the documented cold start") {
    val idx = openIdx(tmpDir("dsir-cold-"))
    assert(idx.dict.isEmpty)
    val e = intercept[IllegalStateException] {
      idx.score(raw, "text", "doc_id")
    }
    assert(e.getMessage.contains("no target-side counts"))
    // target only: the raw model is uniform — every dictionary row
    // shares the raw-side smoothing floor, scores are defined
    idx.ingestTarget("tgt", target, "text")
    val d = idx.dict.get
    assert(d.count() > 0)
    val scored = idx.score(raw.limit(20), "text", "doc_id")
    assert(scored.count() > 0, "cold-start scoring returned nothing")
  }

  test("dictAsOf pins the version of record: later ingests are " +
      "invisible, scores reproduce bit-for-bit, folds refuse") {
    val idx = openIdx(tmpDir("dsir-asof-"))
    idx.ingestTarget("tgt", target.where(col("doc_id") % 2 === 0), "text")
    val b0 = raw.where(col("doc_id") < 300)
    val b1 = raw.where(col("doc_id") >= 300)
    val v0 = idx.ingestRaw("b0", b0, "text")
    val dictAtB0 = dictMap(idx.dict.get)
    val scoreAtB0 = scoreMap(idx.score(b0, "text", "doc_id"))
    // later raw AND target ingests shift the live dict...
    idx.ingestRaw("b1", b1, "text")
    idx.ingestTarget("tgt-late",
      target.where(col("doc_id") % 2 === 1), "text")
    assert(dictMap(idx.dict.get) != dictAtB0,
      "later ingests shifted nothing — vacuous")
    // ...but the pinned version reads the recorded state exactly
    assert(dictMap(idx.dictAsOf(v0).get) == dictAtB0,
      "dictAsOf != the dict observed at that commit")
    assert(scoreMap(idx.score(b0, "text", "doc_id", asOf = Some(v0)))
      == scoreAtB0,
      "as-of scores not bit-identical to the recorded-version scores")
    // the journal IS the version of record: appliedVersion round-trips
    assert(idx.appliedVersion("r", "b0").contains(v0))
    // a fold below the pin refuses loudly rather than approximating
    idx.compact()
    val e = intercept[Exception](idx.dictAsOf(v0).map(_.count()))
    assert(e.getMessage.contains("folded"), e.getMessage)
  }

  test("compact folds counts without changing the dictionary and " +
      "keeps the journal") {
    val idx = openIdx(tmpDir("dsir-cpt-"))
    idx.ingestTarget("tgt", target, "text")
    idx.ingestRaw("b0", raw.where(col("doc_id") % 2 === 0), "text")
    idx.ingestRaw("b1", raw.where(col("doc_id") % 2 === 1), "text")
    val before = dictMap(idx.dict.get)
    idx.compact()
    assert(dictMap(idx.dict.get) == before, "compact changed the dict")
    assert(idx.appliedVersion("r", "b0").isDefined,
      "compact dropped the journal")
    // a post-compact redelivery is still a no-op
    val v = idx.version
    idx.ingestRaw("b0", raw.where(col("doc_id") % 2 === 0), "text")
    assert(idx.version == v, "post-compact redelivery re-committed")
  }
}
