package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Physical-plan audit for the round-6 operators (test-scope tool):
  * prints executed plans so join strategies / exchange counts can be
  * eyeballed beyond what the suite's plan asserts pin.
  * Run: sbt "Test/runMain graft.tools.PlanAudit"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val hp = Dedup.hammingPairs(
      Dedup.simhash32(docs, "text", "doc_id").toDF("id", "h"),
      "h", "id", maxHamming = 2, bands = 4)
    println("=== hammingPairs plan ===")
    println(hp.queryExecution.executedPlan.toString.take(4000))
    val mx = graft.pipeline.Sampling.mixToTokenWeights(
      docs, "lang", Map("en" -> 0.5, "de" -> 0.5), "text", "doc_id")
    println("=== mixToTokenWeights plan ===")
    println(mx.queryExecution.executedPlan.toString.take(1500))
    spark.stop()
  }
}
