package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val big = (0 until 10)
      .map(i => docs.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _).repartition(32)
    big.cache(); big.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.dedup.Dedup.stripRepeatedSpans(big, "text", "doc_id", width = 10)
        .agg(sum("n_removed")).collect()
      println(f"== strip_spans run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      System.gc()
    }
    spark.stop()
  }
}
