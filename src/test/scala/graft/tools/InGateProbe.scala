package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Measures the candidate-id text-fetch strategies of
  * `Dedup.incrementalLshPairsDiag` at and below the
  * `maxPushedFetchIds` ceiling (round-9 verdict #5: the 100k-literal
  * `isin` plan was untested at its gate).
  *
  * Arms, per id-set size n over an id-sorted replicated corpus:
  *  - `isin`: `where(col(id).isin(ids…))` — a pushed parquet IN
  *    filter (row-group skipping), but the predicate is an n-ary
  *    Catalyst expression whose planning cost grows with n;
  *  - `bcast`: broadcast-semi-join of the gathered ids — no parquet
  *    pushdown (full decode of the id column) but O(1) plan size;
  *  - `full`: the unfiltered scan both degrade to.
  * Plan (construction+optimization, no execution) and end-to-end
  * times are reported separately so the gate can be set on data.
  *
  * Run: sbt "Test/runMain graft.tools.InGateProbe [sfDir] [copies] [reps]"
  */
object InGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft-ingate").toString
    // id-sorted corpus (the warehouse layout the pushdown claim
    // assumes): `copies` disjoint-id replicas, sortWithinPartitions
    // after a range repartition → globally ordered parquet row groups
    (0 until copies)
      .map(i => docs.select((col("doc_id") + lit(i.toLong * 1000000L))
        .as("doc_id"), col("text")))
      .reduce(_ union _)
      .repartitionByRange(64, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$work/corpus")
    val corpus = spark.read.parquet(s"$work/corpus")
    val nCorpus = corpus.count()
    val maxId = copies.toLong * 1000000L
    println(s"== corpus $nCorpus rows, $copies copies, reps=$reps")

    def minOf(f: => Unit): Double = {
      var best = Double.MaxValue
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        System.gc()
      }
      best
    }
    // deterministic pseudo-random id spread across the whole range
    def ids(n: Int): Array[Long] =
      Array.tabulate(n)(i => (i.toLong * 7919L * 104729L) % maxId)

    def agg(df: DataFrame): Unit = { df.agg(sum(length(col("text")))).collect(); () }

    val tFull = minOf(agg(corpus))
    println(f"== full_scan exec=$tFull%.2f s")
    Seq(1000, 10000, 50000, 100000).foreach { n =>
      val set = ids(n)
      val tPlanIn = minOf {
        corpus.where(col("doc_id").isin(set.toIndexedSeq: _*))
          .queryExecution.executedPlan
      }
      val tIn = minOf {
        agg(corpus.where(col("doc_id").isin(set.toIndexedSeq: _*)))
      }
      val tPlanB = minOf {
        corpus.join(broadcast(set.toSeq.toDF("doc_id")), Seq("doc_id"),
          "left_semi").queryExecution.executedPlan
      }
      val tB = minOf {
        agg(corpus.join(broadcast(set.toSeq.toDF("doc_id")), Seq("doc_id"),
          "left_semi"))
      }
      println(f"== n=$n%6d isin plan=$tPlanIn%.2f exec=$tIn%.2f s | " +
        f"bcast plan=$tPlanB%.2f exec=$tB%.2f s")
    }
    spark.stop()
  }
}
