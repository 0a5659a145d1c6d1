package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-level timing probe for the round-14 narrow scoring legs
  * (boilerplateRatio, decontaminate, unigramLm, stripRepeatedSpans)
  * on a replicated corpus: each op timed on its default (narrow,
  * collected-dictionary) leg and on its join-leg twin, same JVM,
  * warm second reps. Run:
  * sbt "Test/runMain graft.tools.NarrowScoreProbe [sfDir] [copies]"
  */
object NarrowScoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val docs = (0 until copies)
      .map(i => docs0.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .repartition(32)
    docs.cache()
    println(s"== corpus ${docs.count()} docs")
    val evalSet = docs0.limit(500).select(col("doc_id"), col("text"))

    def stage(name: String)(f: => Unit): Unit = {
      // warm + measured rep, min reported
      val ts = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"== $name: ${ts.min}%.2f s")
      System.gc()
    }

    stage("boilerplate_narrow") {
      graft.pipeline.Boilerplate
        .boilerplateRatio(docs, "text", "doc_id", 3, 5L)
        .agg(sum("boiler_ratio")).collect()
    }
    stage("boilerplate_join") {
      graft.pipeline.Boilerplate
        .boilerplateRatio(docs, "text", "doc_id", 3, 5L,
          maxBroadcastKeys = 0L)
        .agg(sum("boiler_ratio")).collect()
    }
    stage("decontaminate_narrow") {
      graft.pipeline.Decontaminate
        .overlapCounts(docs, evalSet, "text", "doc_id", 3, 2L)
        .agg(sum("overlap")).collect()
    }
    stage("decontaminate_join") {
      graft.pipeline.Decontaminate
        .overlapCounts(docs, evalSet, "text", "doc_id", 3, 2L,
          maxCollectedKeys = 0L)
        .agg(sum("overlap")).collect()
    }
    stage("unigram_narrow") {
      graft.text.TextFunctions
        .unigramLm(docs, "text", "doc_id")
        .agg(sum("lm_logprob")).collect()
    }
    stage("unigram_join") {
      graft.text.TextFunctions
        .unigramLm(docs, "text", "doc_id", narrowScoring = false)
        .agg(sum("lm_logprob")).collect()
    }
    stage("spans_narrow") {
      graft.dedup.Dedup
        .stripRepeatedSpans(docs, "text", "doc_id", width = 8)
        .agg(sum("n_removed")).collect()
    }
    stage("spans_join") {
      graft.dedup.Dedup
        .stripRepeatedSpans(docs, "text", "doc_id", width = 8,
          maxBroadcastKeys = 0L)
        .agg(sum("n_removed")).collect()
    }
    spark.stop()
  }
}
