package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** offset2 import throughput A/B (test-scope tool): exports a large
  * synthetic triple, then times a full `graft-offset2` drain with
  * parallel byte-balanced ranges (default heuristic) vs a forced
  * single partition (maxPartitionBytes > data file) — the
  * single-reader shape a naive importer (or the reference itself)
  * is stuck with. Interleaved reps, min + all runs printed.
  * Run: sbt "Test/runMain graft.tools.Offset2Probe [rows] [reps]"
  */
object Offset2Probe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("o2probe").toString
    val t0 = System.nanoTime()
    graft.compat.Offset2.export(
      spark.range(rows).select(col("id").as("seq"),
        concat(lit("{\"id\":"), col("id"), lit(",\"payload\":\""),
          md5(col("id").cast("string")), lit("\"}")).as("value"),
        lit(false).as("nulled")),
      s"$dir/log")
    val exportSec = (System.nanoTime() - t0) / 1e9
    val bytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$dir/log", "data"))
    println(f"== rows: $rows, data: ${bytes / 1e6}%.1f MB, " +
      f"export: $exportSec%.2f s (${bytes / 1e6 / exportSec}%.0f MB/s)")

    def drain(opt: Option[String]): (Int, Double) = {
      val r = opt.foldLeft(spark.read.format("graft-offset2"))(
        (b, v) => b.option("maxPartitionBytes", v)).load(s"$dir/log")
      val parts = r.rdd.getNumPartitions
      val t = System.nanoTime()
      val n = r.agg(count(lit(1)), sum(length(col("value")))).collect()
      require(n.head.getLong(0) == rows)
      (parts, (System.nanoTime() - t) / 1e9)
    }

    val par = scala.collection.mutable.ListBuffer.empty[Double]
    val single = scala.collection.mutable.ListBuffer.empty[Double]
    var parParts = 0; var singleParts = 0
    (1 to reps).foreach { _ =>
      val (p1, t1) = drain(None); parParts = p1; par += t1
      val (p2, t2) = drain(Some((bytes * 2).toString))
      singleParts = p2; single += t2
      System.gc()
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.3f  all [${xs.map(x => f"$x%.3f").mkString(", ")}]"
    println(s"== parallel ($parParts parts): ${fmt(par.toSeq)}  " +
      f"(${bytes / 1e6 / par.min}%.0f MB/s)")
    println(s"== single   ($singleParts parts): ${fmt(single.toSeq)}  " +
      f"(${bytes / 1e6 / single.min}%.0f MB/s)")
    println(f"== speedup (min/min): ${single.min / par.min}%.2fx")
    spark.stop()
  }
}
