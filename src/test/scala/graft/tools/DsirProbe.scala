package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Importance

/** Scale slope of the DSIR operators (VERDICT r17 task 4):
  * `dsir_weights` is the bench's most expensive metric with no scale
  * record — this probe separates its two very different cost shapes
  * on a replicated sf0.1 corpus:
  *
  *   1. DICT BUILD (paid once ever): two bucket-count scans over the
  *      full corpus + the ≤B-row full join — measured at growing
  *      corpus multiples, expected LINEAR in corpus size (each scan
  *      is one map-side-combined explode+groupBy).
  *   2. STEADY-STATE SCORING (paid per batch): one broadcast join
  *      over the batch's grams against the standing dict — measured
  *      per fixed-size batch as the dict ages, expected FLAT (batch
  *      cost is batch-bound; the dict is ≤B rows regardless of how
  *      much corpus fed it).
  *
  * Run manually: `Test/runMain graft.tools.DsirProbe [replicas]
  * [batches]` (defaults 10, 6). Production hash config (xxhash64
  * buckets, B=8192, plain-sum scoring). Results recorded in
  * BASELINE.md.
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(6)

    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val nDocs = docs.count()
    // id-disjoint replicas: same text bodies (hash work identical),
    // shifted ids — the gram volume is what the operators walk
    def replicated(k: Int) = docs
      .crossJoin(spark.range(k).select(col("id").as("_r")))
      .select((col("doc_id") + col("_r") * nDocs * 2).as("doc_id"),
        col("text"))
    val target = docs.where(col("doc_id") % 10 === 0)

    println(s"== dsir probe: sf0.1 x $replicas replicas " +
      s"(${nDocs * replicas} docs), B=8192, xxhash64, plain-sum")

    // leg 1: dict-build slope vs corpus size (1x, ~half, full)
    println(f"${"replicas"}%9s ${"docs"}%9s ${"dict_secs"}%10s")
    for (k <- Seq(1, math.max(2, replicas / 2), replicas).distinct) {
      val raw = replicated(k).localCheckpoint(true)
      val t0 = System.nanoTime()
      val dict = Importance.dsirDict(raw, target, "text",
        buckets = 8192, portableHash = false).get.localCheckpoint(true)
      val rows = dict.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$k%9d ${nDocs * k}%9d $secs%10.2f  ($rows dict rows)")
      raw.unpersist(blocking = false)
      dict.unpersist(blocking = false)
    }

    // leg 2: steady-state scoring — fixed-size batches against one
    // standing dict (round-tripped through parquet like a production
    // artifact); per-batch cost must stay flat
    val work =
      java.nio.file.Files.createTempDirectory("dsir-probe-").toString
    val full = replicated(replicas).localCheckpoint(true)
    Importance.dsirDict(full, target, "text", buckets = 8192,
      portableHash = false).get
      .write.mode("overwrite").parquet(s"$work/dict")
    val standing = spark.read.parquet(s"$work/dict")
    println(f"${"batch"}%6s ${"docs"}%9s ${"score_secs"}%11s")
    for (b <- 0 until batches) {
      val batch = full.where(col("doc_id") % replicas === b)
        .localCheckpoint(true)
      val n = batch.count()
      val t0 = System.nanoTime()
      Importance.dsirScoreWith(batch, standing, "text", "doc_id",
        deterministic = false, buckets = 8192, portableHash = false)
        .agg(sum("dsir_logw")).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$b%6d $n%9d $secs%11.2f")
      batch.unpersist(blocking = false)
    }
    spark.stop()
  }
}
