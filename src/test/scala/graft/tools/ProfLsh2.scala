package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch: md5-portable vs xxhash64 production LSH cost. */
object ProfLsh2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (i <- 1 to 3) {
      t(s"md5 lsh_pairs $i")(Dedup.minhashLshPairs(docs, "text", "doc_id", 16, 2, 3, 0.7).count())
      spark.catalog.clearCache()
      t(s"xx  lsh_pairs $i")(Dedup.minhashLshPairs(docs, "text", "doc_id", 16, 2, 3, 0.7, portableHash = false).count())
      spark.catalog.clearCache()
      t(s"xx  sigs $i")(Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3, portableHash = false).count())
      t(s"md5 sigs $i")(Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3).count())
    }
    spark.stop()
  }
}
