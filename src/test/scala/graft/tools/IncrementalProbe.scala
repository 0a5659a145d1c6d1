package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Scale evidence for incremental LSH (test-scope tool): fixed ingest
  * batch, corpus grown 1x/4x/10x (id-offset copies of documents).
  * At each scale, times (min of reps) the FULL batch re-run
  * (minhashLshPairs over corpus+batch — what a pipeline without a
  * persisted index must do every ingest) against the INCREMENTAL
  * probe of a pre-built band index (what it should do). The full
  * re-run re-shingles and re-minhashes the whole corpus, so it grows
  * with |corpus|; the probe re-hashes only the batch and semi-joins
  * the skinny index, so its growth is the index scan alone.
  * Copies >= 26 wrap the alphabet rotation (the batch then matches
  * copy 0 AND copy 26, growing the pair count) — both arms see
  * identical inputs, so the timing comparison stays fair.
  * Run: sbt "Test/runMain graft.tools.IncrementalProbe [sfDir] [scales] [reps]"
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 4, 10))
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    // fixed batch: 10% of the 1x corpus, ids far above every copy
    val batch = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
      .repartition(32).cache()
    println(s"== batch ${batch.count()} docs, reps=$reps")
    val work = java.nio.file.Files.createTempDirectory("graft-incprobe").toString

    def minOf(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        System.gc()
      }
      (best, n)
    }

    // copy i rotates the alphabet (native translate): copies carry
    // natural text statistics but are mutually dissimilar, so the
    // cross-copy dup density stays realistic (the batch's near-dups
    // live in copy 0 only and do NOT grow with the corpus) instead of
    // every doc pairing with its 9 identical clones
    val abc = "abcdefghijklmnopqrstuvwxyz"
    def rotated(i: Int): Column = {
      val r = i % 26
      translate(col("text"), abc, abc.drop(r) + abc.take(r))
    }
    scales.foreach { copies =>
      val corpus = (0 until copies)
        .map(i => docs.select(
          (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          rotated(i).as("text")))
        .reduce(_ union _)
        .repartition(32).cache()
      val nCorpus = corpus.count()
      val idxDir = s"$work/idx$copies"
      val t0 = System.nanoTime()
      Dedup.lshBandIndex(corpus, "text", "doc_id", 16, 2,
        portableHash = false)
        .write.mode("overwrite").partitionBy("band").parquet(idxDir)
      val tIdx = (System.nanoTime() - t0) / 1e9
      val (tFull, nFull) = minOf {
        Dedup.minhashLshPairs(corpus.unionByName(batch), "text", "doc_id",
          16, 2, 3, 0.7, portableHash = false)
          .where(col("id_a") >= 900000000L || col("id_b") >= 900000000L)
          .count()
      }
      val (tInc, nInc) = minOf {
        Dedup.incrementalLshPairs(batch, "text", "doc_id",
          corpusBands = spark.read.parquet(idxDir),
          corpusTexts = corpus,
          numHashes = 16, bands = 2, threshold = 0.7,
          portableHash = false).count()
      }
      // the EXACT tier, same two arms: a full re-run fingerprints the
      // whole corpus every ingest; the incremental probe anti-joins
      // the batch's fingerprints against the persisted index, so its
      // growth is the index scan alone (the flat-slope claim of
      // Dedup.incrementalExactDedup, measured)
      val fpDir = s"$work/fp$copies"
      val tFp0 = System.nanoTime()
      Dedup.fingerprintIndex(corpus, "text")
        .write.mode("overwrite").parquet(fpDir)
      val tFpIdx = (System.nanoTime() - tFp0) / 1e9
      val (tExFull, nExFull) = minOf {
        Dedup.exactDedup(corpus.unionByName(batch), "text", "doc_id")
          .where(col("doc_id") >= 900000000L).count()
      }
      val (tExInc, nExInc) = minOf {
        Dedup.incrementalExactDedup(batch, "text", "doc_id",
          spark.read.parquet(fpDir)).count()
      }
      println(f"== ${copies}x corpus=$nCorpus idx_build=$tIdx%.2f s " +
        f"full_rerun=$tFull%.2f s ($nFull pairs) " +
        f"incremental=$tInc%.2f s ($nInc pairs)")
      println(f"== ${copies}x exact: fp_idx_build=$tFpIdx%.2f s " +
        f"full_rerun=$tExFull%.2f s ($nExFull survivors) " +
        f"incremental=$tExInc%.2f s ($nExInc survivors)")
      corpus.unpersist()
    }
    spark.stop()
  }
}
