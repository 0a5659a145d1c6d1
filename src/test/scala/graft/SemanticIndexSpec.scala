package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SemanticIndex}

/** The managed SemDeDup artifact: rolling ingests equal the one-shot
  * rule, replays are exactly-once against the pre-batch snapshot, the
  * codebook is pinned, seeds are idempotent.
  */
class SemanticIndexSpec extends SparkSpec {

  private lazy val emb = Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  private lazy val cents = emb.where(col("vec_id") < 8)
    .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)

  private def admittedIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  test("rolling ingests equal the one-shot rule; replay is exactly-once") {
    val corpus = emb.where(col("vec_id") < 250)
    val b1 = emb.where(col("vec_id") >= 250 && col("vec_id") < 375)
    val b2 = emb.where(col("vec_id") >= 375)
    val dir = tmpDir("semidx-")
    val idx = SemanticIndex.open(spark, dir, cents)
    idx.seed("seed", corpus, "embedding", "vec_id")
    val r1 = idx.ingest("b1", b1, "embedding", "vec_id", threshold = 0.3)
    val a1 = admittedIds(r1.admitted)
    val r2 = idx.ingest("b2", b2, "embedding", "vec_id", threshold = 0.3)
    val a2 = admittedIds(r2.admitted)
    assert(!r1.replayed && !r2.replayed)
    // one-shot over everything, restricted to batch ids
    val want = Dedup
      .semanticDedup(emb, "embedding", "vec_id", (0L until 8L).toSeq,
        threshold = 0.3)
      .where(col("vec_id") >= 250)
      .collect().map(_.getLong(0)).toSet
    assert((a1 ++ a2) == want, s"rolling != one-shot: " +
      s"extra=${(a1 ++ a2) -- want}, missing=${want -- (a1 ++ a2)}")
    assert(want.size < 250, "fixture dominates nothing — vacuous")
    // exactly-once replay: same admitted set, same version, no new rows
    val rows = idx.cells.count()
    val rep = idx.ingest("b1", b1, "embedding", "vec_id", threshold = 0.3)
    assert(rep.replayed && rep.version == r1.version)
    assert(admittedIds(rep.admitted) == a1,
      "replay diverged from the original admitted set")
    assert(idx.cells.count() == rows, "replay appended vector rows")
    // the index holds EVERY seen doc exactly once
    assert(rows == 500L)
    // the corpus record (admitted flag rides the index commit) equals
    // seed ∪ the admitted sets
    val corpusIds = idx.corpus.select("id").collect().map(_.getLong(0)).toSet
    assert(corpusIds == (0L until 250L).toSet ++ a1 ++ a2,
      "corpus flag diverged from the admitted sets")
  }

  test("streaming leg: kill/restart equals the rolling batch run") {
    import org.apache.spark.sql.types._
    val srcDir = tmpDir("semidx-src-") + "/log"
    val ckpt = tmpDir("semidx-ck-")
    val dir = tmpDir("semidx-stream-")
    val log = graft.storage.ParquetLog.open(spark, srcDir, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    def appendWave(w: org.apache.spark.sql.DataFrame): Unit =
      log.append(w.select(struct(col("vec_id"), col("embedding")).as("value")))
    def stream() = spark.readStream.format("graft-log").load(srcDir)
      .select(col("value.vec_id").as("vec_id"),
        col("value.embedding").as("embedding"))
    val idx = SemanticIndex.open(spark, dir, cents)
    appendWave(emb.where(col("vec_id") < 300))
    val q1 = idx.start(stream(), "embedding", "vec_id", ckpt, threshold = 0.3)
    try q1.processAllAvailable() finally q1.stop()
    // the rest arrives while the loop is DOWN; a fresh handle on the
    // same checkpoint resumes without re-deciding a vector
    appendWave(emb.where(col("vec_id") >= 300))
    val idx2 = SemanticIndex.open(spark, dir) // codebook reloads
    val q2 = idx2.start(stream(), "embedding", "vec_id", ckpt, threshold = 0.3)
    try q2.processAllAvailable() finally q2.stop()
    assert(idx2.cells.count() == 500L, "restart lost or duplicated vectors")
    val got = idx2.corpus.select("id").collect().map(_.getLong(0)).toSet
    // one-shot rule over everything (the stream seeds nothing, so the
    // whole corpus is admit-ruled)
    val want = Dedup
      .semanticDedup(emb, "embedding", "vec_id", (0L until 8L).toSeq,
        threshold = 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(got == want, s"streamed corpus != one-shot: " +
      s"extra=${got -- want}, missing=${want -- got}")
  }

  test("reopen loads the pinned codebook; a different one is refused") {
    val dir = tmpDir("semidx-pin-")
    val idx = SemanticIndex.open(spark, dir, cents)
    idx.seed("s", emb.where(col("vec_id") < 100), "embedding", "vec_id")
    val re = SemanticIndex.open(spark, dir) // no-arg reopen
    assert(re.cents == cents)
    assert(re.version == idx.version)
    val other = cents.take(4)
    val e = intercept[IllegalArgumentException] {
      SemanticIndex.open(spark, dir, other)
    }
    assert(e.getMessage.contains("different codebook"))
  }

  test("overlapping seed under a new batchId appends no duplicates") {
    val dir = tmpDir("semidx-seed-")
    val idx = SemanticIndex.open(spark, dir, cents)
    idx.seed("s1", emb.where(col("vec_id") < 150), "embedding", "vec_id")
    idx.seed("s2", emb.where(col("vec_id") < 200), "embedding", "vec_id")
    assert(idx.cells.count() == 200L)
    assert(idx.cells.select("id").distinct().count() == 200L)
  }
}
