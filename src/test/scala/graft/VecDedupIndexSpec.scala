package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, VecDedupIndex}

/** The managed embedding near-dup artifact: rolling ingests emit the
  * one-shot batch-touching pairs, replays are exactly-once, the
  * signature width is pinned.
  */
class VecDedupIndexSpec extends SparkSpec {

  private lazy val emb = Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  test("rolling ingests equal one-shot pairs; replay is exactly-once") {
    val corpus = emb.where(col("vec_id") < 250)
    val b1 = emb.where(col("vec_id") >= 250 && col("vec_id") < 375)
    val b2 = emb.where(col("vec_id") >= 375)
    val idx = VecDedupIndex.open(spark, tmpDir("vecidx-"), bits = 8)
    idx.seed("seed", corpus, "embedding", "vec_id")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = idx.ingest("b1", b1, "embedding", "vec_id",
      threshold = 0.3, maxBucket = 1000L)
    val p1 = pairSet(r1.pairs)
    val r2 = idx.ingest("b2", b2, "embedding", "vec_id",
      threshold = 0.3, maxBucket = 1000L)
    val p2 = pairSet(r2.pairs)
    assert(!r1.replayed && !r2.replayed)
    val want = pairSet(Dedup
      .embeddingNearDupLsh(emb, "embedding", "vec_id",
        threshold = 0.3, bits = 8, maxBucket = 1000L)
      .where(col("id_a") >= 250 || col("id_b") >= 250)
      .select("id_a", "id_b"))
    assert(want.nonEmpty, "no batch-touching pairs — vacuous")
    assert((p1 ++ p2) == want, s"rolling != one-shot: " +
      s"extra=${(p1 ++ p2) -- want}, missing=${want -- (p1 ++ p2)}")
    // replay: identical pairs, same version, no new rows
    val rows = idx.buckets.count()
    val rep = idx.ingest("b1", b1, "embedding", "vec_id",
      threshold = 0.3, maxBucket = 1000L)
    assert(rep.replayed && rep.version == r1.version)
    assert(pairSet(rep.pairs) == p1, "replay diverged")
    assert(idx.buckets.count() == rows, "replay appended rows")
    assert(rows == 500L, "index must hold every seen vector once")
    // survivor rule: admitted = batch minus corpus-wins drops
    val a1 = r1.admitted.select("vec_id").collect().map(_.getLong(0)).toSet
    val drop1 = Dedup
      .incrementalDropIds(r1.pairs, b1.select(col("vec_id")), "vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(a1 == (250L until 375L).toSet -- drop1)
    // the corpus record (admitted flag rides the index commit) equals
    // seed ∪ the admitted sets
    val a2 = r2.admitted.select("vec_id").collect().map(_.getLong(0)).toSet
    val corpusIds = idx.corpus.select("id").collect().map(_.getLong(0)).toSet
    assert(corpusIds == (0L until 250L).toSet ++ a1 ++ a2,
      "corpus flag diverged from the admitted sets")
    assert(corpusIds.size < 500, "fixture drops nothing — vacuous")
  }

  test("streaming leg: kill/restart equals the uninterrupted rolling run") {
    import org.apache.spark.sql.types._
    val srcDir = tmpDir("vecidx-src-") + "/log"
    val ckpt = tmpDir("vecidx-ck-")
    val dir = tmpDir("vecidx-stream-")
    val log = graft.storage.ParquetLog.open(spark, srcDir, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    def appendWave(w: org.apache.spark.sql.DataFrame): Unit =
      log.append(w.select(struct(col("vec_id"), col("embedding")).as("value")))
    def stream() = spark.readStream.format("graft-log").load(srcDir)
      .select(col("value.vec_id").as("vec_id"),
        col("value.embedding").as("embedding"))
    val w1 = emb.where(col("vec_id") < 300)
    val w2 = emb.where(col("vec_id") >= 300)
    val idx = VecDedupIndex.open(spark, dir, bits = 8)
    appendWave(w1)
    val q1 = idx.start(stream(), "embedding", "vec_id", ckpt,
      threshold = 0.3, maxBucket = 1000L)
    try q1.processAllAvailable() finally q1.stop()
    // the rest arrives while the loop is DOWN; a fresh handle on the
    // same checkpoint resumes without re-deciding a vector
    appendWave(w2)
    val idx2 = VecDedupIndex.open(spark, dir, bits = 8)
    val q2 = idx2.start(stream(), "embedding", "vec_id", ckpt,
      threshold = 0.3, maxBucket = 1000L)
    try q2.processAllAvailable() finally q2.stop()
    assert(idx2.buckets.count() == 500L, "restart lost or duplicated vectors")
    val got = idx2.corpus.select("id").collect().map(_.getLong(0)).toSet
    // pinned against the UNINTERRUPTED rolling batch run over the same
    // waves (a global one-shot identity cannot hold for survivors: a
    // future doc may merge components retroactively — see the corpus
    // scaladoc); the pair-level one-shot identity is pinned above
    val ref = VecDedupIndex.open(spark, tmpDir("vecidx-ref-"), bits = 8)
    val ra = ref.ingest("w1", w1, "embedding", "vec_id",
      threshold = 0.3, maxBucket = 1000L)
    val rb = ref.ingest("w2", w2, "embedding", "vec_id",
      threshold = 0.3, maxBucket = 1000L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val want = ids(ra.admitted) ++ ids(rb.admitted)
    assert(got == want, s"streamed corpus != uninterrupted rolling: " +
      s"extra=${got -- want}, missing=${want -- got}")
    assert(want.size < 500, "fixture drops nothing — vacuous")
  }

  test("open refuses a mismatched signature width") {
    val dir = tmpDir("vecidx-bits-")
    VecDedupIndex.open(spark, dir, bits = 8)
    val e = intercept[IllegalArgumentException] {
      VecDedupIndex.open(spark, dir, bits = 12)
    }
    assert(e.getMessage.contains("bits"))
  }
}
