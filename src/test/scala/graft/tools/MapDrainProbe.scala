package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Columnar-vs-row A/B for MAP-valued log drains (round 11: the map
  * repack extension) — the sibling of [[ColumnarProbe]] for the one
  * value shape that previously always took parquet-mr row assembly.
  * Builds a map<string,int> log from the events table (5 entries per
  * row), then times a value-decoding drain (`sum(size(value))` +
  * `sum(value['k0'])`) with `spark.graft.columnar.enabled` on/off.
  * Run: sbt "Test/runMain graft.tools.MapDrainProbe [sfDir] [reps] [copies]"
  */
object MapDrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("mapprobe").toString
    val events = graft.Tables.load(spark, sfDir, "events")
    val asMap = events.select(
      map_from_arrays(
        array((0 until 5).map(j => lit(s"k$j")): _*),
        array((0 until 5).map(j =>
          (col("event_id") * 5 + j).cast("int")): _*)).as("value"))
    val log = graft.storage.ParquetLog.open(spark, s"$work/log",
      asMap.schema.head.dataType)
    (1 to copies).foreach(_ => log.append(asMap))
    println(s"== rows: ${log.seq + 1}")

    def drain(): Unit = {
      spark.read.format("graft-log").load(log.dir)
        .agg(sum(size(col("value"))), sum(element_at(col("value"), "k0")))
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
    println(s"== map drain columnar ON:  ${fmt(cols.toSeq)}")
    println(s"== map drain columnar OFF: ${fmt(rows.toSeq)}")
    spark.stop()
  }
}
