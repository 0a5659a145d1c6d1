package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{EngineFixtures, Tables}
import graft.storage.ParquetLog

/** Scale evidence for ordered-read planning (test-scope tool): builds
  * a log of `copies` × the sf events table (default 10× ≈ 6M rows at
  * sf0.1), then times (min of reps) each new plan shape against a
  * FORCED-baseline arm. The baseline arms sort by an OPAQUE Scala-UDF
  * identity of `seq` (`seq + 0` would be constant-folded back to
  * `seq`, re-enabling the pushdown) — a computed key the pushdown and
  * the strategy correctly refuse, so Spark plans exactly what it
  * planned before this round (TakeOrderedAndProject over the full
  * log / Exchange + Sort) over the very same data:
  *
  *   - tail100:   orderBy(seq desc).limit(100)  — pushed top-N
  *                (plans only the tail segment) vs full-scan heap
  *   - head100:   orderBy(seq asc).limit(100)   — pushed head read
  *   - drain_asc: orderBy(seq) fully executed   — SeqOrderedDrain
  *                passthrough vs range-Exchange + Sort
  *   - bounded:   seq ∈ mid-1% window, value-only projection —
  *                sliced columnar + seq pruned vs residual-filter arm
  *                (forced via seq+0 bounds Spark can't push)
  *
  * Run: sbt "Test/runMain graft.tools.OrderedScanProbe [sfDir] [copies] [reps]"
  */
object OrderedScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("graft-ordprobe").toString
    val events = EngineFixtures.eventValue(Tables.load(spark, sfDir, "events"))
    val log = ParquetLog.open(spark, s"$work/log", events.schema.head.dataType)
    (0 until copies).foreach(_ => log.append(events))
    val total = log.seq + 1
    println(s"== log $total rows ($copies x events), reps=$reps")

    def timeMin(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue; var n = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"== $label%-22s $best%8.3f s  (rows=$n)")
    }

    val df = log.toDF
    // baseline arms sort by an OPAQUE identity of seq: Catalyst folds
    // `seq + 0` back to `seq` (re-enabling the pushdown this probe
    // wants to compare against), but a Scala UDF is a black box — the
    // planner sees a non-pushable sort key and plans exactly the
    // pre-round-10 shapes (TakeOrderedAndProject / Exchange + Sort)
    val ident = udf((x: Long) => x)

    // latest-100: pushed top-N tail read vs forced TakeOrdered
    timeMin("tail100_pushed") {
      df.orderBy(col("seq").desc).limit(100).collect().length.toLong
    }
    timeMin("tail100_takeordered") {
      df.orderBy(ident(col("seq")).desc).limit(100).collect().length.toLong
    }
    // head-100
    timeMin("head100_pushed") {
      df.orderBy(col("seq")).limit(100).collect().length.toLong
    }
    timeMin("head100_takeordered") {
      df.orderBy(ident(col("seq"))).limit(100).collect().length.toLong
    }
    // full ordered drain, physically executed (toRdd keeps the sort)
    timeMin("drain_asc_strategy") {
      df.orderBy(col("seq")).queryExecution.toRdd.count()
    }
    timeMin("drain_asc_sorted") {
      df.orderBy(ident(col("seq"))).queryExecution.toRdd.count()
    }
    // bounded mid-window value projection: exact pushdown + positional
    // slice (+ seq pruned from the read) vs the vanilla parquet file
    // source over the same files (row-group pruning + residual filter,
    // seq decoded for the re-check — the pre-round-10 shape)
    val lo = total / 2
    val hi = lo + total / 100
    timeMin("bounded_exact") {
      df.where(col("seq") >= lo && col("seq") < hi)
        .select("value").queryExecution.toRdd.count()
    }
    val raw = spark.read.schema(df.schema).parquet(s"$work/log/data")
    timeMin("bounded_filesource") {
      raw.where(col("seq") >= lo && col("seq") < hi)
        .select("value").queryExecution.toRdd.count()
    }
    // struct value drain: nested vectorized decode vs the row leg
    // (same scan, A/B'd on the session columnar toggle)
    def structDrain() =
      df.select(sum(col("value.amount"))).collect().head.getDouble(0).toLong
    timeMin("value_drain_columnar")(structDrain())
    spark.conf.set("spark.graft.columnar.enabled", "false")
    timeMin("value_drain_rowpath")(structDrain())
    spark.conf.set("spark.graft.columnar.enabled", "true")
    spark.stop()
  }
}
