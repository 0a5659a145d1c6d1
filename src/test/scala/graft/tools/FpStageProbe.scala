package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, FingerprintIndex}

/** Stage-level timing of one [[FingerprintIndex.ingest]] at a chosen
  * standing-corpus size — which part of the probe grows with the
  * corpus (journal lookup, band+probe+pairs, survivor rule, commit)?
  * Run: sbt "Test/runMain graft.tools.FpStageProbe [batchSize] [batches]"
  */
object FpStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batchSize = args.headOption.map(_.toLong).getOrElse(100000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(10)

    def fpOf(id: org.apache.spark.sql.Column) = xxhash64(id, lit("fp"))
    def batchDf(b: Int) = {
      val lo = b.toLong * batchSize
      spark.range(lo, lo + batchSize).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(50)) === 0 && col("id") >= batchSize,
          fpOf(col("id") - batchSize + 1).bitwiseXOR(lit(1L)))
          .otherwise(fpOf(col("id")))
          .as("h"))
    }

    val dir = java.nio.file.Files.createTempDirectory("fp-stage-").toString
    val idx = FingerprintIndex.open(spark, dir, bands = 4, bits = 64)
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    println(f"${"batch"}%6s ${"applied"}%8s ${"pairs"}%8s ${"drops"}%8s ${"commit"}%8s ${"nPairs"}%7s")
    for (b <- 0 until batches) {
      val df = batchDf(b).localCheckpoint(true)
      val batchId = s"b$b"
      val (_, tApplied) = t(idx.appliedVersion(batchId))
      // the probe, evaluated alone (pairs is the heavy frame)
      val (pairsN, tPairs) = t {
        val (p, _) = Dedup.incrementalHammingPairsDiag(
          df.select(col("doc_id").as("id"), col("h")),
          "h", "id", idx.bandRows, maxHamming = 2, bands = 4,
          maxBucket = 100000L, bits = 64)
        p.count()
      }
      val (_, tFull) = t(idx.ingest(batchId, df, "h", "doc_id", maxHamming = 2))
      println(f"$b%6d $tApplied%8.2f $tPairs%8.2f ${" "}%8s $tFull%8.2f $pairsN%7d")
    }
    spark.stop()
  }
}
