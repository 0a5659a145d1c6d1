package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"== $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val pairs = t("lsh pairs")(Dedup.minhashLshPairs(docs, "text", "doc_id", 8, 4, 3, 0.35))
    println("   pairs=" + pairs.count())
    val cc = t("connectedComponents")(Dedup.connectedComponents(pairs))
    t("collect")(println("   nodes=" + cc.count()))
    spark.stop()
  }
}
