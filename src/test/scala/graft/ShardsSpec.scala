package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.Shards

/** JSONL training-shard export: lossless round-trip, size-derived
  * shard count, per-shard size tolerance, deterministic shuffled
  * contents across re-runs. */
class ShardsSpec extends SparkSpec {

  private lazy val docs = Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text", "lang", "source")

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq

  test("round-trip is lossless and the size target derives the shard count") {
    val dir = tmpDir("shards-")
    val totalBytes = docs
      .agg(sum(octet_length(to_json(struct(col("doc_id"), col("text"),
        col("lang"), col("source")))) + lit(1L)))
      .collect().head.getLong(0)
    val target = totalBytes / 7 // want ~8 shards
    val n = Shards.writeJsonlShards(docs, "doc_id", dir, target)
    assert(n == math.ceil(totalBytes.toDouble / target).toInt,
      s"shard count $n vs bytes $totalBytes / target $target")
    val files = partFiles(dir)
    assert(files.size == n, s"${files.size} part files for $n shards")
    // every part file is within tolerance of the target (range
    // partitioning over a uniform hash key balances by rows; doc
    // sizes vary, so allow 2x)
    files.foreach(f => assert(f.length() <= 2 * target,
      s"${f.getName} is ${f.length()} bytes for target $target"))
    // lossless: same rows back, schema imposed to dodge inference
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
      "round-trip changed rows")
  }

  test("shards are shuffled and re-runs write identical contents") {
    val d1 = tmpDir("shards-a-")
    val d2 = tmpDir("shards-b-")
    assert(Shards.writeJsonlShards(docs, "doc_id", d1, numShards = 4) == 4)
    Shards.writeJsonlShards(docs, "doc_id", d2, numShards = 4)
    // deterministic: the k-th shard's bytes are identical run-to-run
    val c1 = partFiles(d1).map(f => new String(
      Files.readAllBytes(Paths.get(f.getPath)), "UTF-8"))
    val c2 = partFiles(d2).map(f => new String(
      Files.readAllBytes(Paths.get(f.getPath)), "UTF-8"))
    assert(c1 == c2, "re-run produced different shard contents")
    // shuffled: every shard draws from both halves of the id domain
    val mid = 250L
    partFiles(d1).foreach { f =>
      val ids = spark.read.schema(docs.schema).json(f.getPath)
        .select("doc_id").collect().map(_.getLong(0))
      assert(ids.exists(_ < mid) && ids.exists(_ >= mid),
        s"${f.getName} not mixed: ids span ${ids.min}..${ids.max}")
      // and within a shard the order is the hash order, not id order
      assert(ids.toSeq != ids.toSeq.sorted, s"${f.getName} is id-ordered")
    }
  }

  test("empty corpus writes one empty shard set without dividing by zero") {
    val dir = tmpDir("shards-empty-")
    val n = Shards.writeJsonlShards(docs.limit(0), "doc_id", dir, 1024L)
    assert(n == 1)
    assert(spark.read.schema(docs.schema).json(dir).count() == 0L)
  }
}
