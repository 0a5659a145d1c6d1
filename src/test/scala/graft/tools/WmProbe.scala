package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: which occurrences does dropDuplicatesWithinWatermark
  * emit for the q95 fixture (5 re-ingests per content, 100 s apart,
  * 30 s delay, 100-seq batches)? Prints emitted doc_ids per gid band.
  * Run: sbt "Test/runMain graft.tools.WmProbe"
  */
object WmProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("wmprobe").toString
    val src = s"$work/log"
    graft.storage.ParquetLog.open(spark, src, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    spark.range(500)
      .select(col("id").as("seq"),
        struct(col("id").as("doc_id"),
          concat(lit("doc-"), col("id") % 100).as("text")).as("value"),
        lit(false).as("nulled"))
      .write.format("graft-log").mode("append").save(src)
    val stream = spark.readStream.format("graft-log")
      .option("maxSeqsPerTrigger", "100")
      .load(src)
      .select(col("value.doc_id").as("doc_id"), col("value.text").as("text"))
      .withColumn("ts", expr("timestamp_micros((doc_id + 1) * 1000000)"))
    val q = graft.streaming.EventStreamOps
      .streamingContentDedup(stream, "text", "ts", "30 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("wmprobe")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    val rows = spark.table("wmprobe")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val byGid = rows.groupBy(_ % 100)
    // occurrence index = doc_id / 100
    Seq(0L, 10L, 38L, 39L, 40L, 41L, 70L, 99L).foreach { g =>
      println(s"gid $g emitted occs: ${byGid.getOrElse(g, Array.empty[Long]).map(_ / 100).mkString(",")}")
    }
    println("total emitted: " + rows.length)
    spark.stop()
  }
}
