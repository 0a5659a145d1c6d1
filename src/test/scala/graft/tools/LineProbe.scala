package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextFunctions

/** Stage-level timing probe for Dedup.dedupLines on the 10×-replicated
  * worst case (every reflowed line in 10 distinct docs → the whole
  * line space is the dup dictionary, every doc rewritten to empty).
  * Run: sbt "Test/runMain graft.tools.LineProbe [sfDir] [copies]"
  */
object LineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val big = (0 until copies)
      .map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .repartition(32)
    big.cache()
    println(s"== corpus ${big.count()} docs")
    val lined = big.select(col("doc_id"),
      TextFunctions.reflowLines(col("text"), 8).as("text"))

    def stage(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      System.gc()
    }

    stage("reflow_only")(lined.agg(sum(length(col("text")))).count())
    val lines = lined
      .select(col("doc_id").as("id"), posexplode(split(col("text"), "\n")))
      .select(col("id"), col("pos").as("p"), col("col").as("_line"),
        md5(trim(col("col"))).as("_k"),
        (length(trim(col("col"))) > 0).as("_nonblank"))
    stage("explode_hash")(lines.count())
    val dupKeys = lines.where(col("_nonblank"))
      .select(col("id"), col("_k")).distinct()
      .groupBy(col("_k")).agg(count(lit(1)).as("_df"))
      .where(col("_df") >= 2).select(col("_k"))
    stage("dup_dict")(dupKeys.count())
    val kept = lines
      .join(dupKeys.withColumn("_dup", lit(1)), Seq("_k"), "left")
      .where(col("_dup").isNull || !col("_nonblank"))
    stage("kept_join")(kept.count())
    stage("full_op") {
      graft.dedup.Dedup.dedupLines(lined, "text", "doc_id")
        .agg(sum("n_removed")).collect()
      0L
    }
    stage("full_op_again") {
      graft.dedup.Dedup.dedupLines(lined, "text", "doc_id")
        .agg(sum("n_removed")).collect()
      0L
    }
    spark.stop()
  }
}
