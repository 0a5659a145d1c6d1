package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.FingerprintIndex

/** Steady-state cost of the managed Hamming tier: per-batch wall time
  * of [[FingerprintIndex.ingest]] — band, probe the standing index,
  * xor-verify, survivor rule, one journaled commit — as the corpus
  * grows. The contract under test: batch cost is BATCH-bound (the
  * standing index is touched only through the batch's band-key
  * semi-probe), so per-batch time stays flat as the index grows.
  *
  * Fingerprints are hash-derived 64-bit values (bands=4 → 16-bit
  * band keys, the ≥10⁹-doc geometry); 2% of each batch is planted as
  * a near-dup of the PREVIOUS batch (the previous id's fingerprint
  * with one low bit flipped — hamming 1, found via the standing
  * index: the steady-state dedup work).
  * Run: sbt "Test/runMain graft.tools.FpProbe [batchSize] [batches]"
  */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batchSize = args.headOption.map(_.toLong).getOrElse(100000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(8)

    def fpOf(id: org.apache.spark.sql.Column) = xxhash64(id, lit("fp"))
    def batchDf(b: Int) = {
      val lo = b.toLong * batchSize
      spark.range(lo, lo + batchSize).select(
        col("id").as("doc_id"),
        // plant: previous batch's id-batchSize+1 fingerprint, one bit
        // flipped (the plant target is ≢0 mod 50, so its fp is raw)
        when(pmod(col("id"), lit(50)) === 0 && col("id") >= batchSize,
          fpOf(col("id") - batchSize + 1).bitwiseXOR(lit(1L)))
          .otherwise(fpOf(col("id")))
          .as("h"))
    }

    val dir = java.nio.file.Files.createTempDirectory("fp-probe-").toString
    val idx = FingerprintIndex.open(spark, dir, bands = 4, bits = 64)
    println(s"== fp probe: $batches batches x $batchSize docs " +
      "(bands=4, bits=64, planted 2% hamming-1 vs previous batch)")
    println(f"${"batch"}%6s ${"corpus"}%9s ${"secs"}%7s ${"pairs"}%7s")
    for (b <- 0 until batches) {
      val df = batchDf(b).localCheckpoint(true)
      val t0 = System.nanoTime()
      val r = idx.ingest(s"b$b", df, "h", "doc_id", maxHamming = 2)
      val nPairs = r.pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$b%6d ${idx.corpus.count()}%9d $secs%7.2f $nPairs%7d")
    }
    spark.stop()
  }
}
