package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Columnar-vs-row A/B for DEEP-nested log drains (round 11: the
  * nesting-ladder close) — value = array<struct<a long, s string>>,
  * 4 elements per row, drain = sum over an element field reached
  * through explode-free lambda access. Run:
  * sbt "Test/runMain graft.tools.DeepDrainProbe [sfDir] [reps] [copies]"
  */
object DeepDrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("deepprobe").toString
    val events = graft.Tables.load(spark, sfDir, "events")
    val asDeep = events.select(
      transform(sequence(lit(0), lit(3)), j => struct(
        (col("event_id") * 4 + j).as("a"),
        concat(lit("tag"), (col("event_id") + j).cast("string")).as("s")
      )).as("value"))
    val log = graft.storage.ParquetLog.open(spark, s"$work/log",
      asDeep.schema.head.dataType)
    (1 to copies).foreach(_ => log.append(asDeep))
    println(s"== rows: ${log.seq + 1}")

    def drain(): Unit = {
      spark.read.format("graft-log").load(log.dir)
        .agg(sum(aggregate(col("value"), lit(0L), (acc, e) =>
          acc + e.getField("a"))))
        .collect()
      ()
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    spark.conf.set("spark.graft.columnar.enabled", "true"); drain()
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
    println(s"== deep drain columnar ON:  ${fmt(cols.toSeq)}")
    println(s"== deep drain columnar OFF: ${fmt(rows.toSeq)}")
    spark.stop()
  }
}
