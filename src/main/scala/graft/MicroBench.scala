package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Iteration aid for the optimization rounds: times a SELECTED subset
  * of [[Bench]]'s metrics (same pipelines, same min-of-3 methodology)
  * so a single-operator change can be re-measured in seconds instead
  * of re-running the full 48-metric bench. NOT part of the driver
  * contract — [[Bench]] remains the official capture.
  *
  *   sbt "runMain graft.MicroBench dsir_weights line_dedup"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val want: Set[String] = args.toSet
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
    // probe aid: GRAFT_MB_CONF="k=v;k=v" applies session confs before
    // timing, so a flag-gated variant can be A/B'd without code edits
    sys.env.get("GRAFT_MB_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) spark.conf.set(kv.take(i), kv.drop(i + 1))
    })

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def once[A](name: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }
    def timed[A](name: String)(f: => A): Unit =
      if (want.isEmpty || want(name)) {
        val runs = (0 until 3).map(_ => once(name)(f))
        results(name) = runs.min
        println(f"$name%-24s min=${runs.min}%.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
      }
    def timedStateful[A](name: String)(f: Int => A): Unit =
      if (want.isEmpty || want(name)) {
        val runs = (0 until 3).map(i => once(name)(f(i)))
        results(name) = runs.min
        println(f"$name%-24s min=${runs.min}%.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
      }

    val work = Files.createTempDirectory("graft-microbench").toString
    val docs = Tables.load(spark, sfDir, "documents")
    val li = Tables.load(spark, sfDir, "lineitem")
    val events = Tables.load(spark, sfDir, "events")

    // warm-up (codegen)
    events.limit(1000).select(md5(col("props"))).count()
    docs.limit(100).select(TextFunctions.tokenCount(col("text"))).count()
    spark.range(100).selectExpr("sum(id)").count()

    timed("dsir_weights") {
      graft.pipeline.Importance.dsirLogWeights(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "text", "doc_id", buckets = 8192, portableHash = false,
        deterministic = false)
        .count()
    }
    if (want.isEmpty || want("dsir_score_batch")) {
      graft.pipeline.Importance.dsirDict(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "text", buckets = 8192, portableHash = false).get
        .write.mode("overwrite").parquet(s"$work/dsirdict")
      val standing = spark.read.parquet(s"$work/dsirdict")
      timed("dsir_score_batch") {
        graft.pipeline.Importance.dsirScoreWith(
          docs.where(col("doc_id") % 10 === 3), standing, "text",
          "doc_id", deterministic = false, buckets = 8192,
          portableHash = false)
          .agg(sum("dsir_logw")).collect()
      }
    }
    timed("line_dedup") {
      val lined = docs.select(col("doc_id"),
        TextFunctions.reflowLines(col("text"), 8).as("text"))
      Dedup.dedupLines(lined, "text", "doc_id", portableHash = false)
        .agg(sum("n_removed")).collect()
    }
    timed("lsh_pairs") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", 16, 2, 3, 0.7,
        portableHash = false).count()
    }
    if (want.isEmpty || want("incremental_lsh")) {
      val incCorpus = docs.where(col("doc_id") % 10 =!= 0)
      val incBatch = docs.where(col("doc_id") % 10 === 0)
      Dedup.lshBandIndex(incCorpus, "text", "doc_id", 16, 2,
        portableHash = false)
        .write.mode("overwrite").partitionBy("band").parquet(s"$work/lshidx")
      timed("incremental_lsh") {
        Dedup.incrementalLshPairs(
          incBatch, "text", "doc_id",
          corpusBands = spark.read.parquet(s"$work/lshidx"),
          corpusTexts = incCorpus.select("doc_id", "text"),
          numHashes = 16, bands = 2, threshold = 0.7,
          portableHash = false).count()
      }
    }
    if (want.isEmpty || want("fingerprint_ingest")) {
      val fps = docs.select(col("doc_id"),
        xxhash64(col("text"), lit("fp")).as("h"))
      val fpi = graft.dedup.FingerprintIndex.open(
        spark, s"$work/fpingest", bands = 4, bits = 64)
      fpi.seed("corpus", fps.where(col("doc_id") % 10 >= 3), "h", "doc_id")
      var fpRun = 0
      timed("fingerprint_ingest") {
        fpi.ingest(s"b$fpRun",
          fps.where(col("doc_id") % 10 === fpRun % 3),
          "h", "doc_id", maxHamming = 2)
        fpRun += 1
      }
    }
    if (want.isEmpty || want("boilerplate_ingest")) {
      val boil = graft.pipeline.BoilerplateIndex.open(
        spark, s"$work/boilingest", width = 3)
      boil.ingest("corpus",
        docs.where(col("doc_id") % 10 >= 3), "text", "doc_id")
      var boilRun = 0
      timed("boilerplate_ingest") {
        boil.ingest(s"b$boilRun",
          docs.where(col("doc_id") % 10 === boilRun % 3),
          "text", "doc_id")
        boilRun += 1
      }
    }
    if (want.isEmpty || want("append_events")) {
      val valueType = EngineFixtures.eventValue(events).schema.head.dataType
      graft.storage.ParquetLog
        .open(spark, s"$work/warmlog", valueType)
        .append(EngineFixtures.eventValue(events.limit(100)))
      val logs = (0 until 3).map(i =>
        graft.storage.ParquetLog.open(spark, s"$work/log$i", valueType))
      timedStateful("append_events") { i =>
        logs(i).append(EngineFixtures.eventValue(events))
      }
    }
    if (want.isEmpty || want("small_append") || want("minor_compact")) {
      val mSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType, nullable = false)))
      def smallBatch(b: Int) =
        spark.range(b * 2000L, b * 2000L + 2000L)
          .repartition(32)
          .select((col("id") % 97).as("k"), col("id").as("v"))
      if (want.isEmpty || want("minor_compact")) {
        val mStores = (0 until 3).map { s =>
          val st = graft.storage.TableStore.open(
            spark, s"$work/minor$s", mSchema)
          (0 until 8).foreach(b => st.append(smallBatch(b)))
          st
        }
        var mRun = 0
        timed("minor_compact") {
          mStores(mRun % 3).compactSmall(Seq("k"), targetPartitions = 2)
          mRun += 1
        }
      }
      if (want.isEmpty || want("small_append")) {
        val saStore = graft.storage.TableStore.open(
          spark, s"$work/smallappend", mSchema)
        var saRun = 0
        timed("small_append") {
          saStore.append(smallBatch(saRun))
          saRun += 1
        }
      }
    }
    if (want.isEmpty || want("multilog_build") || want("kvindex_build")) {
      val valueType = EngineFixtures.eventValue(events).schema.head.dataType
      val log = graft.storage.ParquetLog.open(spark, s"$work/mblog", valueType)
      log.append(EngineFixtures.eventValue(events))
      val mlogs = (0 until 3).map(i =>
        graft.multilog.MultiLog.open(spark, s"$work/mlog$i"))
      val mcurs = (0 until 3).map(i =>
        graft.indexes.KVIndex.open(spark, s"$work/mcur$i"))
      timedStateful("multilog_build") { i =>
        graft.indexes.MultiLogSink.pump(
          log, mlogs(i), mcurs(i),
          b => b.select(col("value.event_type").as("addr"), col("seq")))
      }
      val kvs = (0 until 3).map(i =>
        graft.indexes.KVIndex.open(spark, s"$work/kv$i"))
      timedStateful("kvindex_build") { i =>
        graft.indexes.SinkIndex.pump(
          log, kvs(i),
          b => b.select(col("value.user_id").as("addr"),
            col("value.props").as("value"), col("seq").as("useq")))
      }
    }
    timed("zorder_write") {
      graft.pipeline.Layout.writeZOrdered(
        li, Seq("l_partkey", "l_suppkey"),
        s"$work/zorder${System.nanoTime()}", numFiles = 32, bits = 15)
    }
    timed("kmv_profile") {
      graft.sketch.Kmv.withEstimates(
          graft.sketch.Kmv.profileSketch(docs, "text", "source", 1024), 1024)
        .agg(sum("est_distinct_tokens")).collect()
    }
    println("{" + results.map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.3f" }.mkString(",") + "}")
    spark.stop()
  }
}
