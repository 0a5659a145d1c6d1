package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Oversized-segment split A/B (test-scope tool): builds ONE fat
  * compacted segment (events × copies, coalesced to a single file),
  * then times a full connector drain with row-group splits active
  * (default heuristic planning) vs forced single-partition planning
  * (maxPartitionBytes larger than the file — round-8's behavior,
  * where one multi-GB segment was one straggler task). Interleaved
  * reps, min + all runs printed — the BASELINE.md round-9 record.
  * Run: sbt "Test/runMain graft.tools.SplitProbe [sfDir] [reps] [copies]"
  */
object SplitProbe {
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

    val work = java.nio.file.Files.createTempDirectory("splitprobe").toString
    val events = graft.Tables.load(spark, sfDir, "events")
    val log = graft.storage.ParquetLog.open(spark, s"$work/log",
      events.schema)
    // one append, one file, many row groups: the miniature of a
    // multi-GB compacted segment (whose 128 MB row groups our 8 MB
    // ones stand in for at this fixture size)
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.block.size", 8 * 1024 * 1024)
    log.append(
      (1 to copies).map(_ => events).reduce(_ unionAll _).coalesce(1))
    val m = graft.storage.Manifest.load(log.dir).get
    val bytes = m.segments.map(s =>
      java.nio.file.Files.size(java.nio.file.Paths.get(log.dir, s.path))).sum
    println(s"== rows: ${log.seq + 1}, segments: ${m.segments.size}, " +
      f"bytes: ${bytes / 1e6}%.1f MB")

    def drain(opt: Option[String]): (Int, Double) = {
      val r = opt.foldLeft(spark.read.format("graft-log"))(
        (b, v) => b.option("maxPartitionBytes", v)).load(log.dir)
      val parts = r.rdd.getNumPartitions
      val t0 = System.nanoTime()
      r.agg(sum(col("seq"))).collect()
      (parts, (System.nanoTime() - t0) / 1e9)
    }

    val split = scala.collection.mutable.ListBuffer.empty[Double]
    val single = scala.collection.mutable.ListBuffer.empty[Double]
    var splitParts = 0; var singleParts = 0
    (1 to reps).foreach { _ =>
      val (p1, t1) = drain(None) // heuristic: row-group splits
      splitParts = p1; split += t1
      val (p2, t2) = drain(Some((bytes * 2).toString)) // forced one task
      singleParts = p2; single += t2
      System.gc()
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.3f  all [${xs.map(x => f"$x%.3f").mkString(", ")}]"
    println(s"== split  ($splitParts parts): ${fmt(split.toSeq)}")
    println(s"== single ($singleParts parts): ${fmt(single.toSeq)}")
    println(f"== speedup (min/min): ${single.min / split.min}%.2fx")
    spark.stop()
  }
}
