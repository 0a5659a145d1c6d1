package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round plan audit over EVERY declared oracle query:
  * materializes each `SparkEntry.queries` frame's physical plan (no
  * execution of the final frame — setup side effects only) and flags
  * the anti-patterns the optimization guide names: cartesian
  * products, nested-loop joins, SortMergeJoins (our operators are
  * expected to broadcast or pre-partition), Python evaluation, and
  * per-plan Exchange counts. One line per query; summary at the end.
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flagged = scala.collection.mutable.ListBuffer.empty[String]
    var audited = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      try {
        val plan = f(spark, sfDir).queryExecution.executedPlan.toString
        audited += 1
        val bad = Seq(
          "CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
          "BatchEvalPython", "ArrowEvalPython")
          .filter(plan.contains)
        val exchanges = "Exchange".r.findAllIn(plan).length
        if (bad.nonEmpty)
          flagged += s"$name: ${bad.mkString(",")} (exchanges=$exchanges)"
        println(f"$name%-28s exchanges=$exchanges%-3d ${bad.mkString(",")}")
      } catch {
        case e: Exception =>
          println(f"$name%-28s <plan failed: ${e.getClass.getSimpleName}>")
      }
    }
    println(s"== audited $audited queries; flagged ${flagged.size}")
    flagged.foreach(l => println(s"  FLAG $l"))
    spark.stop()
  }
}
