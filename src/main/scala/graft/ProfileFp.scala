package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway step-level profiler for the fingerprint_ingest metric
  * (optimization-round instrumentation; not part of any contract). */
object ProfileFp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("graft-profilefp").toString
    val docs = Tables.load(spark, sfDir, "documents")
    docs.limit(100).select(md5(col("text"))).count()

    val fps = docs.select(col("doc_id"),
      xxhash64(col("text"), lit("fp")).as("h"))
    val fpi = graft.dedup.FingerprintIndex.open(
      spark, s"$work/fpingest", bands = 4, bits = 64)
    fpi.seed("corpus", fps.where(col("doc_id") % 10 >= 3), "h", "doc_id")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    (0 until 3).foreach { run =>
      println(s"run $run:")
      val batch = fps.where(col("doc_id") % 10 === run % 3)
        .select(col("doc_id").as("id"), col("h"))
      val applied = t("appliedVersion")(fpi.appliedVersion(s"b$run"))
      val (pairs, _) = t("pairsDiag")(
        graft.dedup.Dedup.incrementalHammingPairsDiag(
          batch, "h", "id", fpi.bandRows, 2, 4, 100000L, 64))
      val drops = t("dropIds ckpt")(
        graft.dedup.Dedup.incrementalDropIds(
          pairs.select("id_a", "id_b"),
          batch.select(col("id").cast("long").as("id")), "id", 50)
          .localCheckpoint(true))
      t("commit") {
        fpi.ingest(s"b$run", batch, "h", "id", maxHamming = 2)
      }
      val _ = (applied, drops)
    }
    spark.stop()
  }
}
