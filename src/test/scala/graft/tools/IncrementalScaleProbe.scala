package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Round-11 scale leg for incremental dedup (VERDICT r10 task 3): a
  * ≥2 M-doc corpus index probed by a 50 k-doc batch — one order past
  * IncrementalProbe's 200 k ceiling, approaching the shape of a real
  * crawl ingest.
  *
  * Corpus copies are made mutually dissimilar with a PER-COPY RANDOM
  * ALPHABET PERMUTATION (copy 0 = identity; a rotation only has 26
  * classes, so 400 copies would be ~15-way exact clones and the
  * output pair count would grow with the corpus — a permutation keeps
  * the batch's near-dups confined to copy 0, so the output stays
  * batch-bound BY CONSTRUCTION and the arms measure engine slope, not
  * output slope). The batch is `batchCopies` id-offset clones of the
  * docs table (identity text): its near-dup partners are copy 0 and
  * its own clones — constant as the corpus grows.
  *
  * Arms, each timed min-of-reps:
  *   full_rerun    — minhashLshPairs over corpus+batch (no index):
  *                   re-shingles/minhashes the WHOLE corpus per ingest
  *   incremental   — probe of the persisted band index (broadcast
  *                   probe-key tier, the default gate)
  *   inc_shuffled  — same probe FORCED past maxBroadcastProbeKeys
  *                   (=1): the shuffled-semi fallback tier a 10^8-doc
  *                   batch would take; must complete and stay in the
  *                   same cost class
  *   exact tiers   — fingerprintIndex anti-join vs full exactDedup
  *
  * Run: sbt "Test/runMain graft.tools.IncrementalScaleProbe \
  *   [sfDir] [copies] [batchCopies] [reps]"   (defaults 400 10 1)
  */
object IncrementalScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(400)
    val batchCopies = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val reps = args.drop(3).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val abc = "abcdefghijklmnopqrstuvwxyz"
    def perm(i: Int): String =
      if (i == 0) abc
      else new scala.util.Random(i.toLong * 7919L)
        .shuffle(abc.toList).mkString
    def permuted(i: Int): Column = translate(col("text"), abc, perm(i))

    val batch = (0 until batchCopies)
      .map(b => docs.select(
        (col("doc_id") + lit(900000000L + b.toLong * 1000000L)).as("doc_id"),
        col("text")))
      .reduce(_ unionByName _)
      .repartition(32).cache()
    println(s"== batch ${batch.count()} docs ($batchCopies copies), " +
      s"corpus ${copies} copies, reps=$reps")
    val work =
      java.nio.file.Files.createTempDirectory("graft-incscale").toString

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

    val corpus = (0 until copies)
      .map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        permuted(i).as("text")))
      .reduce(_ unionByName _)
      .repartition(64).cache()
    val nCorpus = corpus.count()
    val idxDir = s"$work/idx"
    val t0 = System.nanoTime()
    Dedup.lshBandIndex(corpus, "text", "doc_id", 16, 2, portableHash = false)
      .write.mode("overwrite").partitionBy("band").parquet(idxDir)
    val tIdx = (System.nanoTime() - t0) / 1e9
    println(f"== corpus=$nCorpus idx_build=$tIdx%.1f s")

    val (tFull, nFull) = minOf {
      Dedup.minhashLshPairs(corpus.unionByName(batch), "text", "doc_id",
        16, 2, 3, 0.7, portableHash = false)
        .where(col("id_a") >= 900000000L || col("id_b") >= 900000000L)
        .count()
    }
    println(f"== full_rerun=$tFull%.1f s ($nFull batch-touching pairs)")
    val (tInc, nInc) = minOf {
      Dedup.incrementalLshPairs(batch, "text", "doc_id",
        corpusBands = spark.read.parquet(idxDir), corpusTexts = corpus,
        numHashes = 16, bands = 2, threshold = 0.7,
        portableHash = false).count()
    }
    println(f"== incremental=$tInc%.1f s ($nInc pairs, broadcast probe)")
    val (tShuf, nShuf) = minOf {
      Dedup.incrementalLshPairs(batch, "text", "doc_id",
        corpusBands = spark.read.parquet(idxDir), corpusTexts = corpus,
        numHashes = 16, bands = 2, threshold = 0.7,
        portableHash = false, maxBroadcastProbeKeys = 1L).count()
    }
    println(f"== inc_shuffled=$tShuf%.1f s ($nShuf pairs, forced fallback)")

    val fpDir = s"$work/fp"
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
    println(f"== exact: fp_idx_build=$tFpIdx%.1f s " +
      f"full_rerun=$tExFull%.1f s ($nExFull survivors) " +
      f"incremental=$tExInc%.1f s ($nExInc survivors)")
    spark.stop()
  }
}
