package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Columnar-vs-row A/B for the DSv2 connector scan (test-scope tool):
  * builds the same log the bench drains, then times the connector
  * full-drain N times with `spark.graft.columnar.enabled` on and off,
  * plus the parquet FILE source as the vectorized reference. One JVM,
  * interleaved reps, min + all runs printed — the BASELINE.md A/B
  * record. Run:
  * sbt "Test/runMain graft.tools.ColumnarProbe [sfDir] [reps] [copies]"
  * `copies` > 1 appends the events table that many times — the
  * decode-bound regime where the vectorized-vs-row difference shows
  * (at 1x the drain is planning-overhead-bound and both legs tie).
  */
object ColumnarProbe {
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

    // the bench's append fixture: events packed into a fresh log
    val work = java.nio.file.Files.createTempDirectory("colprobe").toString
    val events = graft.Tables.load(spark, sfDir, "events")
    val log = graft.storage.ParquetLog.open(spark, s"$work/log",
      events.schema)
    (1 to copies).foreach(_ => log.append(events))
    println(s"== rows: ${log.seq + 1}")

    def drain(): Unit = {
      spark.read.format("graft-log").load(log.dir)
        .agg(sum(col("seq"))).collect()
      ()
    }
    def fileDrain(): Unit = {
      spark.read.parquet(s"${log.dir}/data")
        .agg(sum(col("seq"))).collect()
      ()
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // warm-up: JIT + footer caches, both paths
    spark.conf.set("spark.graft.columnar.enabled", "true"); drain()
    spark.conf.set("spark.graft.columnar.enabled", "false"); drain()
    fileDrain()
    val cols = scala.collection.mutable.ArrayBuffer.empty[Double]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Double]
    val files = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      spark.conf.set("spark.graft.columnar.enabled", "true")
      cols += time(drain _)
      spark.conf.set("spark.graft.columnar.enabled", "false")
      rows += time(drain _)
      files += time(fileDrain _)
      System.gc()
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.3f  runs [${xs.map(x => f"$x%.3f").mkString(", ")}]"
    println(s"== connector columnar ON:  ${fmt(cols.toSeq)}")
    println(s"== connector columnar OFF: ${fmt(rows.toSeq)}")
    println(s"== parquet file source:    ${fmt(files.toSeq)}")
    spark.stop()
  }
}
