package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

object AppendJobsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = graft.Tables.load(spark, "/root/testdata/sf0.1", "events")
    val work = java.nio.file.Files.createTempDirectory("append-probe").toString
    val vt = graft.EngineFixtures.eventValue(events).schema.head.dataType
    // warm
    graft.storage.ParquetLog.open(spark, s"$work/warm", vt)
      .append(graft.EngineFixtures.eventValue(events.limit(100)))
    val starts = mutable.Map.empty[Int, (Long, String)]
    val lines = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = (j.time,
          j.stageInfos.map(s => s.name.take(36)).mkString("|").take(90)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        starts.get(e.jobId).foreach { case (t0, n) =>
          lines += ((e.jobId, (e.time - t0) / 1e3, n)) }; ()
      }
    })
    for (r <- 0 until 3) {
      lines.clear()
      val log = graft.storage.ParquetLog.open(spark, s"$work/log$r", vt)
      val t0 = System.nanoTime()
      log.append(graft.EngineFixtures.eventValue(events))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(250)
      println(f"== append run $r wall=$wall%.3f")
      lines.foreach { case (id, s, n) => println(f"  job $id%3d $s%7.3f  $n") }
    }
    spark.stop()
  }
}
