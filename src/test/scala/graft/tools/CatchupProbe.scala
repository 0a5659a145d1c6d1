package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.storage.ParquetLog

/** Probe for the admission-controlled streaming catch-up path
  * (test-scope tool): build a large-backlog log (the events table,
  * appended `copies` times), then drain it through
  * `readStream.format("graft-log")` with and without
  * `maxSeqsPerTrigger`, reporting per-micro-batch row counts and
  * total wall time. The interesting numbers at 100 TB shape:
  * unbounded catch-up plans ONE batch over the whole backlog
  * (the round-5 scale gap); admission control must pace it into
  * bounded batches without a throughput collapse.
  * Run: sbt "Test/runMain graft.tools.CatchupProbe [sfDir] [copies] [maxSeqs]"
  */
object CatchupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val maxSeqs = args.drop(2).headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("graft-catchup").toString
    val events = Tables.load(spark, sfDir, "events")
    val value = graft.EngineFixtures.eventValue(events)
    val log = ParquetLog.open(spark, s"$work/log", value.schema.head.dataType)
    (0 until copies).foreach(_ => log.append(value))
    println(s"== backlog ${log.seq + 1} rows, " +
      s"${graft.storage.Manifest.load(log.dir).get.segments.size} segments")

    def drain(tag: String, opts: Map[String, String]): Unit = {
      val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val t0 = System.nanoTime()
      var reader = spark.readStream.format("graft-log")
      opts.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = reader.load(log.dir)
        .writeStream
        .option("checkpointLocation", s"$work/ckpt-$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          if (n > 0) batches.add(n)
          (): Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val bs = batches.asScala.toList
      println(f"== $tag: $secs%.2f s, ${bs.size} batches, " +
        s"rows/batch min=${if (bs.isEmpty) 0 else bs.min} " +
        s"max=${if (bs.isEmpty) 0 else bs.max} total=${bs.sum}")
      System.gc()
    }

    drain("unbounded", Map.empty)
    drain("paced", Map("maxSeqsPerTrigger" -> maxSeqs.toString))
    drain("paced-bytes", Map("maxBytesPerTrigger" -> (32L * 1024 * 1024).toString))
    spark.stop()
  }
}
