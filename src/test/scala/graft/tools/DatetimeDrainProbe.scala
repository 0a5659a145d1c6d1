package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Columnar-vs-row A/B for the round-13 gate close (test-scope tool):
  * datetime + decimal value shapes. Builds a log whose value is
  * struct<ts: timestamp, d: date, m: decimal(10,2), w: decimal(22,4)>
  * (the long-tier AND unscaled-bytes decimal layouts, plus INT96
  * timestamps — Spark's writer default — and INT32 dates), then times
  * the connector full-drain with `spark.graft.columnar.enabled` on and
  * off, interleaved, min + all runs printed. Before round 13 these
  * schemas silently took the row path; this records what admitting
  * them buys. Run:
  * sbt "Test/runMain graft.tools.DatetimeDrainProbe [sfDir] [reps] [copies]"
  */
object DatetimeDrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("dtprobe").toString
    val events = graft.Tables.load(spark, sfDir, "events")
    val value = events.select(struct(
      timestamp_micros((col("ts") / 1000).cast("long")).as("ts"),
      to_date(timestamp_micros((col("ts") / 1000).cast("long"))).as("d"),
      col("value").cast("decimal(10,2)").as("m"),
      (col("value").cast("decimal(18,4)") * lit("1000000000.0001")
        .cast("decimal(22,4)")).cast("decimal(22,4)").as("w")
    ).as("value"))
    val log = graft.storage.ParquetLog.open(spark, s"$work/log",
      value.schema.head.dataType)
    (1 to copies).foreach(_ => log.append(value))
    println(s"== rows: ${log.seq + 1}")

    // decode every field: decimal sums + timestamp/date extraction —
    // the scan must materialize all four columns
    def drain(): Unit = {
      spark.read.format("graft-log").load(log.dir)
        .agg(sum(col("value.m")), sum(col("value.w")),
          avg(unix_micros(col("value.ts"))),
          avg(datediff(col("value.d"), lit("2024-01-01").cast("date"))))
        .collect()
      ()
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    spark.conf.set("spark.graft.columnar.enabled", "true")
    val planDf = spark.read.format("graft-log").load(log.dir)
      .agg(sum(col("value.m")))
    planDf.collect() // under AQE the columnar transition prints only post-exec
    require(planDf.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "datetime/decimal drain did not plan columnar - gate regressed")
    drain() // warm both paths
    spark.conf.set("spark.graft.columnar.enabled", "false"); drain()
    val cols = scala.collection.mutable.ArrayBuffer.empty[Double]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      spark.conf.set("spark.graft.columnar.enabled", "true")
      cols += time(drain _)
      spark.conf.set("spark.graft.columnar.enabled", "false")
      rows += time(drain _)
      System.gc()
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.3f  runs [${xs.map(x => f"$x%.3f").mkString(", ")}]"
    println(s"== columnar ON:  ${fmt(cols.toSeq)}")
    println(s"== columnar OFF: ${fmt(rows.toSeq)}")
    spark.stop()
  }
}
