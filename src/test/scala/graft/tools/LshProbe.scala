package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Isolated repeat-probe for the LSH pair pipeline only (test-scope
  * tool): N back-to-back timings of lsh_pairs at 1x and `copies`x, to
  * separate plan cost from this box's bursty slowdown windows.
  * Run: sbt "Test/runMain graft.tools.LshProbe [sfDir] [copies] [reps]"
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val big = (0 until copies)
      .map(i => docs.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .repartition(32)
    big.cache()
    println(s"== corpus ${big.count()}")
    import org.apache.spark.sql.DataFrame
    def stage(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      // release accumulated broadcast blocks between stages: Spark's
      // ContextCleaner only frees a broadcast after ITS DRIVER REF is
      // GC'd, and nothing triggers a full GC inside a short-lived
      // probe JVM (periodicGC default: 30 min) — hundreds of MB of
      // dead HashedRelations otherwise pile into the old gen and
      // progressively poison later stages
      System.gc()
    }
    // stage decomposition at copies-x, mirroring minhashLshPairs
    def candidatesOf(d: DataFrame): DataFrame = {
      val sigs = Dedup.minhashSignatures(d, "text", "doc_id", 16, 3,
        portableHash = false)
      val banded = sigs.select(
        col("doc_id"),
        posexplode(array((0 until 2).map { bnd =>
          xxhash64(slice(col("signature"), bnd * 8 + 1, 8)).cast("string")
        }: _*)).as(Seq("band", "bucket")))
      val (within, _) =
        graft.query.Skew.capBuckets(banded, Seq("band", "bucket"), 10000L)
      within.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
        .join(
          within.select(col("doc_id").as("id_b"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    }
    for (r <- 1 to reps) {
      stage(s"rep $r ${copies}x sigs")(
        Dedup.minhashSignatures(big, "text", "doc_id", 16, 3,
          portableHash = false).count())
      stage(s"rep $r ${copies}x candidates")(candidatesOf(big).count())
      stage(s"rep $r ${copies}x verify-only")(
        Dedup.verifyJaccard(big, "text", "doc_id", candidatesOf(big), 3, 0.7,
          portableHash = false)
          .count())
      stage(s"rep $r ${copies}x full")(
        Dedup.minhashLshPairs(big, "text", "doc_id", 16, 2, 3, 0.7,
          portableHash = false).count())
    }
    spark.stop()
  }
}
