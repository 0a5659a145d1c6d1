package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** 10× scale probe for the 64-BIT fingerprint tier (test-scope tool):
  * the claim under test is that 16-bit band buckets (65,536 per band)
  * keep occupancy far under the mega-bucket cap at 10× the bench
  * corpus, so `hammingPairs(bits = 64)` never truncates recall — the
  * diagnostic side of [[Dedup.hammingPairsDiag]] must come back EMPTY
  * with the production cap. Replica texts are salted (a per-copy token
  * appended) so the probe measures genuine fingerprint dispersion, not
  * an engineered identical-fingerprint flood — that case is
  * [[graft.PipelineSpec]]'s cap vectors.
  * Run: sbt "Test/runMain graft.tools.FingerprintProbe [sfDir] [copies]"
  */
object FingerprintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
      r
    }

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val n = docs.count()
    val big = (0 until copies)
      .map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" probe$i")).as("text")))
      .reduce(_ union _)
      .repartition(32)
    big.cache()
    println(s"== corpus: ${big.count()} docs (${copies}x of $n, salted)")

    val sh = t(s"simhash64 ${copies}x")(
      Dedup.simhash64(big, "text", "doc_id").cache())
    println(s"   fingerprints=${sh.count()}")

    // band-bucket occupancy at the production geometry (4 bands of
    // 16 bits): the numbers that decide whether the cap ever engages
    val banded = sh.select(
      col("id"),
      explode(sequence(lit(0), lit(3))).as("_band"),
      col("simhash"))
      .withColumn("_bits",
        expr("shiftright(simhash, _band * 16)").bitwiseAND(lit(0xFFFFL)))
    val occ = banded.groupBy("_band", "_bits").count()
    occ.groupBy("_band")
      .agg(count(lit(1)).as("buckets"), max("count").as("max_occ"),
        round(avg("count"), 2).as("avg_occ"))
      .orderBy("_band")
      .collect()
      .foreach(r => println(
        s"== band ${r.get(0)}: ${r.get(1)} buckets, " +
          s"max occupancy ${r.get(2)}, avg ${r.get(3)}"))

    // the production pairing with the production cap: diag must be 0
    val (pairs, capped) = Dedup.hammingPairsDiag(
      sh.select(col("id"), col("simhash").as("h")),
      "h", "id", maxHamming = 3, bands = 4, maxBucket = 100000L, bits = 64)
    t(s"hamming64 pairs ${copies}x")(println("   pairs=" + pairs.count()))
    val nCapped = capped.count()
    println(s"== capped buckets at maxBucket=100000: $nCapped" +
      (if (nCapped == 0) " (exact recall held)" else "  <-- CAP ENGAGED"))
    spark.stop()
  }
}
