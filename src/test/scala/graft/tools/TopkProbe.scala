package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Ann

/** 10×-replication probe for batched multi-query retrieval: Q queries
  * against a replicated embedding corpus in one pass, vs Q separate
  * brute-force passes.
  * Run: sbt "Test/runMain graft.tools.TopkProbe [sfDir] [copies] [Q]"
  */
object TopkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val nq = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val big = (0 until copies)
      .map(i => emb.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ union _)
      .repartition(32)
    big.cache()
    println(s"== corpus ${big.count()} vectors, $nq queries")
    val queries = emb.where(col("vec_id") < nq)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq.sortBy(_._1)

    def stage(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      System.gc()
    }

    stage("batch_one_pass") {
      Ann.cosineTopKBatch(big, "embedding", "vec_id", queries, 10).count()
    }
    stage(s"separate_${nq}_passes") {
      queries.map { case (_, qv) =>
        Ann.cosineTopK(big, "embedding", "vec_id", qv, 10).count()
      }.sum
    }
    spark.stop()
  }
}
