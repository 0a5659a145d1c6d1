package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Job-level timing of one SinkIndex.pump + one MultiLogSink.pump —
  * bisection aid for the r21 pump-path investigation: prints every
  * Spark job's duration and first stage name so a per-binary diff
  * points at the job that grew. */
object PumpJobsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val events = graft.Tables.load(spark, sfDir, "events")
    val work = java.nio.file.Files.createTempDirectory("pump-probe").toString
    val valueType = graft.EngineFixtures.eventValue(events).schema.head.dataType
    val log = graft.storage.ParquetLog.open(spark, s"$work/log", valueType)
    log.append(graft.EngineFixtures.eventValue(events))

    val starts = mutable.Map.empty[Int, (Long, String)]
    val lines = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = (j.time,
          j.stageInfos.headOption.map(_.name.take(60)).getOrElse("?"))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        starts.get(e.jobId).foreach { case (t0, n) =>
          lines += ((e.jobId, (e.time - t0) / 1e3, n))
        }
        ()
      }
    })

    // warm a pump once (codegen), then measure a fresh one
    locally {
      val kv0 = graft.indexes.KVIndex.open(spark, s"$work/kv0")
      graft.indexes.SinkIndex.pump(log, kv0,
        b => b.select(col("value.user_id").as("addr"),
          col("value.props").as("value"), col("seq").as("useq")))
    }
    Thread.sleep(300); lines.clear()
    val t0 = System.nanoTime()
    val kv = graft.indexes.KVIndex.open(spark, s"$work/kv1")
    graft.indexes.SinkIndex.pump(log, kv,
      b => b.select(col("value.user_id").as("addr"),
        col("value.props").as("value"), col("seq").as("useq")))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"== kvindex pump wall=$wall%.3f s, jobs:")
    lines.foreach { case (id, s, n) => println(f"  job $id%3d $s%8.3f s  $n") }
    spark.stop()
  }
}
