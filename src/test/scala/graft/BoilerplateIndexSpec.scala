package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Boilerplate, BoilerplateIndex}
import graft.storage.FaultPoints

/** The managed boilerplate-dictionary artifact: rolling ingests equal
  * the one-shot corpus statistic, ratios against the standing state
  * equal the batch operator, crash windows and replays are
  * exactly-once, compaction preserves every cut, the width is
  * pinned, and the streaming leg resumes. */
class BoilerplateIndexSpec extends SparkSpec {

  private lazy val docs = Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  private def dictOf(idx: BoilerplateIndex, minDocs: Long): Map[Long, Long] =
    idx.boilerplateGrams(minDocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def wantDict(corpus: DataFrame, minDocs: Long): Map[Long, Long] =
    Boilerplate.boilerplateGrams(corpus, "text", "doc_id", width = 3,
        minDocs = minDocs)
      .select(xxhash64(col("gram")).as("g"), col("df"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("rolling ingests equal the one-shot dictionary; ratios match the batch op") {
    val dir = tmpDir("boilidx-")
    val idx = BoilerplateIndex.open(spark, dir, width = 3)
    val v1 = idx.ingest("b1", docs.where(col("doc_id") % 2 === 0), "text", "doc_id")
    idx.ingest("b2", docs.where(col("doc_id") % 2 === 1), "text", "doc_id")
    assert(dictOf(idx, 2L) == wantDict(docs, 2L), "dictionary diverged")
    assert(dictOf(idx, 3L) == wantDict(docs, 3L), "minDocs cut diverged")
    // scoring the corpus against the standing state == the batch op
    def ratios(df: DataFrame): Map[Long, (Long, Long, Double)] =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val got = ratios(idx.ratio(docs, "text", "doc_id", minDocs = 2L))
    val want = ratios(Boilerplate.boilerplateRatio(docs, "text", "doc_id",
      width = 3, minDocs = 2L))
    assert(got == want, "standing-state ratio != batch operator")
    // the over-gate semi-join leg agrees too
    assert(ratios(idx.ratio(docs, "text", "doc_id", minDocs = 2L,
      maxBroadcastKeys = 0L)) == want, "join leg diverged")
    // replay: same version, dictionary unchanged
    assert(idx.ingest("b1", docs.where(col("doc_id") % 2 === 0),
      "text", "doc_id") == v1)
    assert(dictOf(idx, 2L) == wantDict(docs, 2L))
  }

  test("kill inside the append commit: rerun applies exactly once") {
    val dir = tmpDir("boilidx-kill-")
    val idx = BoilerplateIndex.open(spark, dir, width = 3)
    idx.ingest("b1", docs.where(col("doc_id") < 250), "text", "doc_id")
    val count = new AtomicInteger
    FaultPoints.install { p =>
      if (p == "table.append.preCommit" && count.incrementAndGet() == 1)
        throw new RuntimeException("injected fault")
    }
    try intercept[RuntimeException](
      idx.ingest("b2", docs.where(col("doc_id") >= 250), "text", "doc_id"))
    finally FaultPoints.clear()
    val idx2 = BoilerplateIndex.open(spark, dir)
    assert(idx2.appliedVersion("b2").isEmpty, "half-applied batch visible")
    idx2.ingest("b2", docs.where(col("doc_id") >= 250), "text", "doc_id")
    assert(dictOf(idx2, 2L) == wantDict(docs, 2L))
  }

  test("compact folds per-batch rows; every cut unchanged; width pinned") {
    val dir = tmpDir("boilidx-compact-")
    val idx = BoilerplateIndex.open(spark, dir, width = 3)
    idx.ingest("b1", docs.where(col("doc_id") % 3 === 0), "text", "doc_id")
    idx.ingest("b2", docs.where(col("doc_id") % 3 =!= 0), "text", "doc_id")
    val before2 = dictOf(idx, 2L)
    val before4 = dictOf(idx, 4L)
    idx.compact()
    assert(dictOf(idx, 2L) == before2 && dictOf(idx, 4L) == before4,
      "compaction changed a dictionary cut")
    assert(idx.appliedVersion("b1").isDefined, "journal lost in the fold")
    intercept[IllegalArgumentException](
      BoilerplateIndex.open(spark, dir, width = 5))
    assert(BoilerplateIndex.open(spark, dir).width == 3)
  }

  test("streaming leg: kill/restart equals the one-shot dictionary") {
    import org.apache.spark.sql.types._
    val srcDir = tmpDir("boilidx-src-") + "/log"
    val ckpt = tmpDir("boilidx-ck-")
    val dir = tmpDir("boilidx-stream-")
    val log = graft.storage.ParquetLog.open(spark, srcDir, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    def wave(w: DataFrame): Unit =
      log.append(w.select(struct(col("doc_id"), col("text")).as("value")))
    def stream() = spark.readStream.format("graft-log").load(srcDir)
      .select(col("value.doc_id").as("doc_id"), col("value.text").as("text"))
    val idx = BoilerplateIndex.open(spark, dir, width = 3)
    wave(docs.where(col("doc_id") < 200))
    val q1 = idx.start(stream(), "text", "doc_id", ckpt)
    try q1.processAllAvailable() finally q1.stop()
    wave(docs.where(col("doc_id") >= 200))
    val idx2 = BoilerplateIndex.open(spark, dir)
    val q2 = idx2.start(stream(), "text", "doc_id", ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(dictOf(idx2, 2L) == wantDict(docs, 2L),
      "streamed dictionary != one-shot")
  }
}
