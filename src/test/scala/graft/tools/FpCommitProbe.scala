package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** VERDICT r20 #4 probe: what does the FingerprintIndex COMMIT's
  * `repartitionByRange` boundary sampler actually cost per ingest?
  * Builds the ingest's banded∪journal commit frame once (checkpointed
  * inputs, exactly like ingest), then writes it to the noop sink in
  * the two candidate shapes, alternating in ONE JVM, reporting job
  * count and summed task time — wall-clock-noise-robust evidence:
  *
  *   range = repartitionByRange(4, kind, band, bkey)  (current: one
  *           extra sampling job that re-evals the checkpointed join)
  *   hash  = repartition(4, band)                      (no sampler,
  *           but staged-file order loses (band) monotonicity — see
  *           FingerprintIndexSpec's tiling assert)
  *
  * Run: sbt "Test/runMain graft.tools.FpCommitProbe"
  */
object FpCommitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val fps = docs.select(col("doc_id"),
      xxhash64(col("text"), lit("fp")).as("h"))

    val jobs = new AtomicLong
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        { taskMs.addAndGet(t.taskMetrics.executorRunTime); () }
    })

    // the ingest's commit frame: banded batch (checkpointed) with the
    // admitted flag join (drops checkpointed) + the journal row
    val banded = Dedup.hammingBandIndex(
      fps.where(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("id"), col("h")),
      "h", "id", 4, 64).localCheckpoint(true)
    val drops = banded.select(col("id").as("_dup_id"))
      .where(col("_dup_id") % 31 === 0).distinct().localCheckpoint(true)
    val nul = (t: String) => lit(null).cast(t)
    val v = banded
      .join(drops, col("id") === col("_dup_id"), "left")
      .select(lit("fp").as("kind"), col("id"), col("band"), col("bkey"),
        col("h"), col("_dup_id").isNull.as("admitted"),
        nul("string").as("batch_id"))
    val j = spark.range(1).select(
      lit("batch").as("kind"), nul("long").as("id"), nul("int").as("band"),
      nul("long").as("bkey"), nul("long").as("h"),
      nul("boolean").as("admitted"), lit("bX").as("batch_id"))
    val frame = v.unionByName(j)

    def shaped(kind: String) = kind match {
      case "range" => frame.repartitionByRange(4,
        col("kind"), col("band"), col("bkey"))
        .sortWithinPartitions("kind", "band", "bkey", "id")
      case "hash" => frame.repartition(4, col("band"))
        .sortWithinPartitions("kind", "band", "bkey", "id")
      case "routed" =>
        // the r21 commit shape: literal-routed band tiling, no sampler
        val route = graft.dedup.FingerprintIndex.routing(4)
        frame.withColumn("_pt",
          when(col("band").isNull, lit(route(0)))
            .otherwise(element_at(typedLit(route.toSeq),
              least(lit(3), (col("band") * 4 / 4).cast("int")) + 1)))
          .repartition(4, col("_pt"))
          .sortWithinPartitions("kind", "band", "bkey", "id")
          .drop("_pt")
    }
    val kinds = Seq("range", "hash", "routed")
    // warm all plans
    kinds.foreach(k =>
      shaped(k).write.format("noop").mode("overwrite").save())
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long, Double)]
    for (_ <- 0 until 5; k <- kinds) {
      jobs.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      shaped(k).write.format("noop").mode("overwrite").save()
      Thread.sleep(150) // let the listener bus drain
      val wall = (System.nanoTime() - t0) / 1e9 - 0.15
      val (pj, pt, pw) = acc.getOrElse(k, (0L, 0L, 0.0))
      acc(k) = (pj + jobs.get(), pt + taskMs.get(), pw + wall)
    }
    for (k <- kinds) {
      val (nj, tms, w) = acc(k)
      println(f"$k%-6s jobs/run=${nj / 5.0}%.1f taskTime/run=${tms / 5.0}%.0f ms wall/run=${w / 5}%.3f s")
    }
    spark.stop()
  }
}
