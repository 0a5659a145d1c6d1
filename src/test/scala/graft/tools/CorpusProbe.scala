package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** 10×-replication probe for the round-6 corpus operators (test-scope
  * tool): unigram LM scoring, corpus profile, token-budget sampling,
  * RRF fusion, quality-aware survivors. The replicated corpus is the
  * usual worst case: every doc has 10 exact copies, so dedup
  * machinery sees maximal cluster pressure while the per-row ops see
  * plain 10× volume.
  * Run: sbt "Test/runMain graft.tools.CorpusProbe [sfDir] [copies]"
  */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    val big = (0 until copies)
      .map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        col("text"), col("source")))
      .reduce(_ union _)
      .repartition(32)
    big.cache()
    println(s"== corpus ${big.count()} docs")

    def stage(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      System.gc()
    }

    stage("unigram_lm") {
      TextFunctions.unigramLm(big, "text", "doc_id")
        .agg(sum("lm_logprob")).collect()
      big.count()
    }
    stage("unigram_lm_fast") {
      TextFunctions.unigramLm(big, "text", "doc_id", deterministic = false)
        .agg(sum("lm_logprob")).collect()
      big.count()
    }
    stage("corpus_profile") {
      graft.pipeline.Curation
        .corpusProfile(big, "text", "doc_id", "source").count()
    }
    stage("token_budget_scale") {
      graft.pipeline.Sampling
        .tokenBudgetSample(big, "text", "doc_id", 100000L).count()
    }
    stage("rrf_fusion") {
      val lex = TextFunctions
        .bm25(big, "text", "doc_id", Seq("table", "join", "query"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(100)
      val prior = big
        .select(col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("q"))
        .orderBy(col("q").desc, col("doc_id").asc).limit(100)
      graft.query.Fuse.rrf(lex, prior, "doc_id").count()
    }
    stage("strip_spans") {
      // worst case by construction: EVERY 10-gram repeats 10× (the
      // replication), so the repeated set is the whole gram table
      graft.dedup.Dedup
        .stripRepeatedSpans(big, "text", "doc_id", width = 10)
        .agg(sum("n_removed")).collect()
      big.count()
    }
    stage("line_dedup") {
      // worst case by construction: every reflowed line appears in 10
      // distinct docs, so the dup dictionary is the WHOLE line space
      // and every doc is rewritten to empty
      val lined = big.select(col("doc_id"),
        TextFunctions.reflowLines(col("text"), 8).as("text"))
      graft.dedup.Dedup.dedupLines(lined, "text", "doc_id")
        .agg(sum("n_removed")).collect()
      big.count()
    }
    stage("survivors_best") {
      // exact-dup pairs via fingerprint groups (the 10× replication IS
      // the duplicate structure): worst-case clusters of size 10
      val fp = big.select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      val pairs = fp.as("a").join(fp.as("b"), "fp")
        .where(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val scored = big.withColumn("q",
        round(TextFunctions.qualityScore(col("text")), 6))
      graft.dedup.Dedup
        .clusterSurvivorsBest(scored, "doc_id", pairs, "q").count()
    }
    spark.stop()
  }
}
