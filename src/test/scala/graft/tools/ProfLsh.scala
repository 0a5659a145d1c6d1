package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch profiler for the LSH dedup path (not part of the API). */
object ProfLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    println("== docs: " + docs.count())
    t("warm shingle")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    t("sigs16")(Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3).count())
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3)
    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until 2).map { b =>
        md5(concat_ws(",", slice(col("signature"), b * 8 + 1, 8))).cast("string")
      }: _*)).as(Seq("band", "bucket")))
    banded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("banded count")(println("   banded=" + banded.count()))
    val l = banded.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("candidates")(println("   cand=" + candidates.count()))
    t("verify")(println("   pairs=" + Dedup.verifyJaccard(docs, "text", "doc_id", candidates, 3, 0.7).count()))
    spark.catalog.clearCache()
    t("full lsh_pairs r2")(Dedup.minhashLshPairs(docs, "text", "doc_id", 16, 2, 3, 0.7).count())
    spark.catalog.clearCache()
    t("full lsh_pairs r3")(Dedup.minhashLshPairs(docs, "text", "doc_id", 16, 2, 3, 0.7).count())
    spark.stop()
  }
}
