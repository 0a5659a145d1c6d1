package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Measurement aid for the optimization rounds: writes the
  * `.explain("formatted")` output of the bench's hot query pipelines
  * to `<outDir>/<name>.txt`, so plan-shape claims (Exchange counts,
  * join strategies, pushed filters) are committable evidence.
  *
  *   sbt "runMain graft.PlanDump plans/r20 _before"
  *
  * Reads `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` like [[Bench]] and
  * builds the SAME DataFrames the bench times (untimed setup
  * artifacts — standing LSH/fingerprint indexes, the DSIR dictionary —
  * are built into a temp dir exactly as the bench does). Plans only;
  * nothing here executes the queries.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r20"
    val suffix = if (args.length > 1) args(1) else ""
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    val work = Files.createTempDirectory("graft-plandump").toString
    val docs = Tables.load(spark, sfDir, "documents")
    val li = Tables.load(spark, sfDir, "lineitem")
    val emb = Tables.load(spark, sfDir, "embeddings")

    def dump(name: String)(f: => DataFrame): Unit =
      if (only.isEmpty || only.contains(name)) {
        val txt =
          try f.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Exception => s"<failed: ${e.getMessage}>" }
        Files.write(Paths.get(outDir, s"$name$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"dumped $name")
      }

    dump("dsir_weights") {
      graft.pipeline.Importance.dsirLogWeights(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "text", "doc_id", buckets = 8192, portableHash = false,
        deterministic = false)
    }
    if (only.isEmpty || only("dsir_score_batch")) {
      graft.pipeline.Importance.dsirDict(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "text", buckets = 8192, portableHash = false).get
        .write.mode("overwrite").parquet(s"$work/dsirdict")
      dump("dsir_score_batch") {
        graft.pipeline.Importance.dsirScoreWith(
          docs.where(col("doc_id") % 10 === 3),
          spark.read.parquet(s"$work/dsirdict"), "text",
          "doc_id", deterministic = false, buckets = 8192,
          portableHash = false)
      }
    }
    dump("line_dedup") {
      val lined = docs.select(col("doc_id"),
        TextFunctions.reflowLines(col("text"), 8).as("text"))
      Dedup.dedupLines(lined, "text", "doc_id", portableHash = false)
    }
    dump("lsh_pairs") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", 16, 2, 3, 0.7,
        portableHash = false)
    }
    if (only.isEmpty || only("incremental_lsh")) {
      val incCorpus = docs.where(col("doc_id") % 10 =!= 0)
      val incBatch = docs.where(col("doc_id") % 10 === 0)
      Dedup.lshBandIndex(incCorpus, "text", "doc_id", 16, 2,
        portableHash = false)
        .write.mode("overwrite").partitionBy("band").parquet(s"$work/lshidx")
      dump("incremental_lsh") {
        Dedup.incrementalLshPairs(
          incBatch, "text", "doc_id",
          corpusBands = spark.read.parquet(s"$work/lshidx"),
          corpusTexts = incCorpus.select("doc_id", "text"),
          numHashes = 16, bands = 2, threshold = 0.7,
          portableHash = false)
      }
    }
    dump("decontaminate") {
      graft.pipeline.Decontaminate.overlapCounts(
        docs.where(col("doc_id") % 17 =!= 0),
        docs.where(col("doc_id") % 17 === 0),
        "text", "doc_id")
    }
    dump("boilerplate") {
      graft.pipeline.Boilerplate
        .boilerplateRatio(docs, "text", "doc_id", 3, 5L)
    }
    dump("quality_gate") {
      graft.pipeline.Curation.qualityGate(
        docs.withColumn("q", TextFunctions.qualityScore(col("text"))),
        "q", "doc_id", 0.2)
    }
    dump("repetition_gate") {
      graft.pipeline.Curation.repetitionGate(docs, "text")
    }
    dump("unigram_lm") {
      TextFunctions.unigramLm(docs, "text", "doc_id")
    }
    dump("kmv_profile") {
      graft.sketch.Kmv.withEstimates(
        graft.sketch.Kmv.profileSketch(docs, "text", "source", 1024), 1024)
    }
    dump("hamming64_pairs") {
      val sims64 = Dedup.simhash64(docs, "text", "doc_id")
        .select(col("id"), col("simhash").as("h"))
      Dedup.hammingPairs(sims64, "h", "id", maxHamming = 3, bands = 4,
        bits = 64)
    }
    dump("embed_neardup_lsh") {
      Dedup.embeddingNearDupLsh(emb, "embedding", "vec_id", 0.3, bits = 4)
    }
    dump("join_revenue")(SparkEntry.queries("q13_join_revenue")(spark, sfDir))
    dump("window_rank")(SparkEntry.queries("q14_window_rank")(spark, sfDir))
    dump("agg_pricing") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"),
          count(lit(1)))
    }
    dump("zorder_frame") {
      // the frame writeZOrdered writes (sans the sink): one zvalue
      // projection + range shuffle + in-partition sort
      li.withColumn("_zkey", graft.pipeline.Layout.zvalue(
          Seq(col("l_partkey"), col("l_suppkey")), 15))
        .repartitionByRange(32, col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    }
    spark.stop()
  }
}
