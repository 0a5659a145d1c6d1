package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the FINAL adaptive plans' join strategies for the three
  * deliberate semantic-dedup SortMergeJoins (q76/q115/q128): the r20
  * claim — AQE converts the small-side joins to broadcast at runtime —
  * pinned as a measurement before AqePlanSpec asserts it.
  * Run: sbt "Test/runMain graft.tools.AqeConvProbe /root/testdata/sf0.01"
  */
object AqeConvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q76_semantic_dedup", "q115_incremental_semantic",
        "q128_contrastive_pairs")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val whole = df.queryExecution.executedPlan.toString
      // AdaptiveSparkPlanExec.toString prints the Final Plan followed
      // by the Initial Plan — count strategies in the FINAL section
      val s = whole.split("== Initial Plan ==")(0)
      def n(p: String) = p.r.findAllIn(s).length
      println(s"$q: SMJ=${n("SortMergeJoin")} BHJ=${n("BroadcastHashJoin")} " +
        s"SHJ=${n("ShuffledHashJoin")} final=${whole.contains("isFinalPlan=true")}")
    }
    spark.stop()
  }
}
