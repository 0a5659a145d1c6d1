package graft

import org.apache.spark.sql.SparkSession

/** Debug dump of a log / multilog / KV index directory — the analogue
  * of the reference's mbdump tool
  * (multilog/roaring/badger/cmd/mbdump/main.go:21-69).
  * Usage: sbt "runMain graft.Dump <kind> <dir> [n]"  (kind: log|mlog|kv)
  */
object Dump {
  def main(args: Array[String]): Unit = {
    val Array(kind, dir) = args.take(2)
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    kind match {
      case "log" =>
        val log = graft.storage.ParquetLog.open(spark, dir)
        println(s"seq=${log.seq} problems=${log.checkConsistency()}")
        log.toDF.orderBy("seq").show(n, truncate = 60)
      case "mlog" =>
        val m = graft.multilog.MultiLog.open(spark, dir)
        m.table.orderBy("addr", "seq").show(n, truncate = 60)
      case "kv" =>
        val kv = graft.indexes.KVIndex.open(spark, dir)
        println(s"cursor=${kv.getSeq}")
        kv.current.orderBy("addr").show(n, truncate = 60)
      case other => println(s"unknown kind: $other (log|mlog|kv)")
    }
    spark.stop()
  }
}
