package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** A/B of the verify representations on the SPARSE-dup shape (the
  * IncrementalScaleProbe corpus: permuted copies, so candidate docs
  * are a small fraction of the corpus): same candidates, text verify
  * vs hash-array verify. Run:
  * sbt "Test/runMain graft.tools.VerifyAbProbe [sfDir] [copies] [reps]"
  */
object VerifyAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val abc = "abcdefghijklmnopqrstuvwxyz"
    def perm(i: Int): String =
      if (i == 0) abc
      else new scala.util.Random(i.toLong * 7919L)
        .shuffle(abc.toList).mkString
    def permuted(i: Int): Column = translate(col("text"), abc, perm(i))
    val corpus = (0 until copies)
      .map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        permuted(i).as("text")))
      .reduce(_ unionByName _)
      .repartition(64).cache()
    println(s"== corpus ${corpus.count()} docs ($copies copies)")

    // candidates exactly as minhashLshPairs builds them (xx config)
    val banded = Dedup.lshBandIndex(corpus, "text", "doc_id", 16, 2, 3,
      portableHash = false)
    val (within, _) =
      graft.query.Skew.capBuckets(banded, Seq("band", "bucket"), 10000L)
    val l = within.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val r = within.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
      .localCheckpoint(true)
    val nPairs = candidates.count()
    val nDocs = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("i"))
      .distinct().count()
    println(s"== candidates $nPairs pairs over $nDocs distinct docs")

    def stage(name: String)(f: => Long): Unit = {
      var best = Double.MaxValue; var n = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        System.gc()
      }
      println(f"== $name: $best%.2f s ($n rows)")
    }

    stage("verify_text")(
      Dedup.verifyJaccard(corpus, "text", "doc_id", candidates, 3, 0.7,
        portableHash = true).count())
    stage("verify_hash")(
      Dedup.verifyJaccard(corpus, "text", "doc_id", candidates, 3, 0.7,
        portableHash = false).count())
    spark.stop()
  }
}
