package graft

import org.apache.spark.sql.SparkSession

/** Debug dump of a log / multilog / KV index directory — the analogue
  * of the reference's mbdump tool
  * (multilog/roaring/badger/cmd/mbdump/main.go:21-69).
  * Usage: sbt "runMain graft.Dump <kind> <dir> [n]"  (kind: log|mlog|kv)
  */
object Dump {

  /** Render the first `n` entries of the store at `dir` plus its
    * header line (seq/cursor + fsck verdict). Pure function of the
    * directory — the testable core of the CLI. */
  def dump(spark: SparkSession, kind: String, dir: String, n: Int = 20): String =
    kind match {
      case "log" =>
        val log = graft.storage.ParquetLog.open(spark, dir)
        val rows = log.toDF
          .orderBy("seq")
          .limit(n)
          .collect()
          .map(r => s"  ${r.getLong(0)}\t${r.get(1)}\tnulled=${r.getBoolean(2)}")
        (s"seq=${log.seq} problems=${log.checkConsistency()}" +: rows).mkString("\n")
      case "mlog" =>
        val m = graft.multilog.MultiLog.open(spark, dir)
        val rows = m.table
          .orderBy("addr", "seq")
          .limit(n)
          .collect()
          .map(r => s"  ${r.getString(0)}\t${r.getLong(1)}")
        (s"addrs=${m.list().count()}" +: rows).mkString("\n")
      case "kv" =>
        val kv = graft.indexes.KVIndex.open(spark, dir)
        val rows = kv.current
          .orderBy("addr")
          .limit(n)
          .collect()
          .map(r => s"  ${r.getString(0)}\t${r.getString(1)}")
        (s"cursor=${kv.getSeq}" +: rows).mkString("\n")
      case other => s"unknown kind: $other (log|mlog|kv)"
    }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Dump <log|mlog|kv> <dir> [n]")
      sys.exit(2)
    }
    val Array(kind, dir) = args.take(2)
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(dump(spark, kind, dir, n))
    spark.stop()
  }
}
