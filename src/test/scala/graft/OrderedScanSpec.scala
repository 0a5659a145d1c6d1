package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.IntegerType

import graft.storage.ParquetLog

/** Ordered-scan planning: dense-seq top-N/limit pushdown
  * ([[graft.sources.GraftLogScanBuilder]]), exact seq-bound pushdown
  * with positional columnar slicing, and the shuffle-free ordered
  * drain strategy ([[graft.plans.OrderedLogScan]]).
  *
  * The scale contracts pinned here:
  *   - "latest N" (`orderBy(seq desc).limit(n)`) plans as a manifest
  *     tail read — NO TakeOrderedAndProject, NO full-log scan;
  *   - a global `orderBy(seq)` drain plans with NO Exchange (at
  *     100 TB, Spark's default range-partitioning sort is a full-log
  *     shuffle doing zero work — partitions are already seq-ordered
  *     and range-disjoint);
  *   - bounded scans stay vectorized: the seq cut is applied as a
  *     row-index slice (dense seqs), not a decoded-seq filter.
  */
class OrderedScanSpec extends SparkSpec {

  /** 3 segments × 10 seqs, int values == seqs; tiny maxPartitionBytes
    * forces one partition per segment so partition-order contracts
    * are observable. */
  private def mkLog(dir: String): ParquetLog = {
    import spark.implicits._
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues((0 until 10).toSeq)
    log.appendValues((10 until 20).toSeq)
    log.appendValues((20 until 30).toSeq)
    log
  }

  private def df(dir: String): DataFrame =
    spark.read.format("graft-log").option("maxPartitionBytes", "1").load(dir)

  private def plan(d: DataFrame): String =
    d.queryExecution.executedPlan.toString

  // ---- top-N / limit pushdown ----

  test("topN desc: Sort+Limit fully pushed — tail read, no TakeOrdered") {
    val dir = tmpDir("ord") + "/log"
    mkLog(dir)
    val q = df(dir).orderBy(col("seq").desc).limit(5)
    val p = plan(q)
    assert(!p.contains("TakeOrdered") && !p.contains("Sort"),
      s"top-N should be pushed into the scan:\n$p")
    assert(p.contains("order=seq DESC"), s"scan not descending:\n$p")
    // exact rows, exact (descending) order
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(29L, 28L, 27L, 26L, 25L))
  }

  test("topN desc spanning partitions: partition order reversed, rows exact") {
    val dir = tmpDir("ordspan") + "/log"
    mkLog(dir)
    val q = df(dir).orderBy(col("seq").desc).limit(15)
    assert(q.collect().map(_.getLong(0)).toSeq == (15L to 29L).reverse)
  }

  test("topN asc: pushed as a head read, stays columnar") {
    val dir = tmpDir("ordasc") + "/log"
    mkLog(dir)
    val q = df(dir).orderBy(col("seq")).limit(5)
    val p = plan(q)
    assert(!p.contains("TakeOrdered") && !p.contains("Sort"), p)
    assert(p.contains("ColumnarToRow"), s"asc top-N lost the vectorized path:\n$p")
    assert(q.collect().map(_.getLong(0)).toSeq == (0L to 4L))
  }

  test("topN composes with pushed seq bounds") {
    val dir = tmpDir("ordbnd") + "/log"
    mkLog(dir)
    val q = df(dir).where(col("seq") >= 8 && col("seq") <= 25)
      .orderBy(col("seq").desc).limit(4)
    assert(!plan(q).contains("Sort"))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(25L, 24L, 23L, 22L))
  }

  test("plain limit pushed: first-n rows, no GlobalLimit job over all partitions") {
    val dir = tmpDir("ordlim") + "/log"
    mkLog(dir)
    val q = df(dir).limit(7)
    // fully pushed: the scan's seq upper bound carries the cut
    assert(plan(q).contains("seq"), plan(q))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (0L to 6L))
  }

  test("limit after a NON-pushed filter is not folded into the scan") {
    val dir = tmpDir("ordlimf") + "/log"
    mkLog(dir)
    // value predicate stays a residual Filter, so the limit must
    // apply AFTER it — a pushed cut here would return wrong rows
    val q = df(dir).where(col("value") >= 25).limit(3)
    val got = q.collect().map(_.getInt(1)).toSeq
    assert(got.length == 3 && got.forall(_ >= 25), got.toString)
  }

  test("plain limit composes with pushed seq bounds") {
    val dir = tmpDir("ordlimb") + "/log"
    mkLog(dir)
    val q = df(dir).where(col("seq") >= 20).limit(4)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (20L to 23L))
  }

  test("topN desc keeps nulled rows (dense seq space, reference semantics)") {
    val dir = tmpDir("ordnull") + "/log"
    val log = mkLog(dir)
    log.nullAt(28L)
    val q = df(dir).orderBy(col("seq").desc).limit(3)
    val rows = q.collect().map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(rows == Seq((29L, false), (28L, true), (27L, false)))
  }

  test("topN on a non-seq column is NOT pushed (falls back to TakeOrdered)") {
    val dir = tmpDir("ordno") + "/log"
    mkLog(dir)
    val q = df(dir).orderBy(col("value").desc).limit(3)
    assert(plan(q).contains("TakeOrdered"), plan(q))
    assert(q.collect().map(_.getInt(1)).toSeq == Seq(29, 28, 27))
  }

  test("pushed top-N is pinned to the planning-time manifest snapshot") {
    import spark.implicits._
    val dir = tmpDir("ordsnap") + "/log"
    val log = mkLog(dir)
    val q = df(dir).orderBy(col("seq").desc).limit(5)
    // force planning (scan built, snapshot taken) BEFORE appending
    q.queryExecution.executedPlan
    log.appendValues((100 until 110).toSeq)
    // Sort+Limit are gone from the plan — a post-plan append must not
    // widen the row set (the old double manifest load would return 15)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(29L, 28L, 27L, 26L, 25L))
  }

  test("bound folding at Long extremes yields an empty scan, not overflow") {
    val dir = tmpDir("ordovf") + "/log"
    mkLog(dir)
    // without the guard, v+1 overflows to Long.MinValue and (bounds
    // being exact, no residual) EVERY row would come back
    assert(df(dir).where(col("seq") > Long.MaxValue).count() == 0)
    assert(df(dir).where(col("seq") < Long.MinValue).count() == 0)
    assert(df(dir).where(col("seq") >= Long.MinValue).count() == 30)
  }

  // ---- exact bound pushdown + positional columnar slice ----

  test("exact bounds: no residual filter, seq pruned from the read schema") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = tmpDir("ordex") + "/log"
    mkLog(dir)
    val q = df(dir).where(col("seq") >= 12 && col("seq") <= 15).select("value")
    val filters = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filters.isEmpty,
      s"bounds should be exact, no re-filter:\n${plan(q)}")
    val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("value"),
      "exact pushdown should let Spark prune seq itself")
    assert(q.collect().map(_.getInt(0)).sorted.toSeq == (12 to 15))
  }

  test("bounded scan stays columnar via positional slicing; A/B matches row path") {
    val dir = tmpDir("ordslice") + "/log"
    mkLog(dir)
    // bounds cross two partition boundaries mid-segment
    def q = df(dir).where(col("seq") >= 7 && col("seq") <= 23)
    val p = plan(q)
    assert(p.contains("ColumnarToRow"),
      s"bounded scan should stay on the vectorized path:\n$p")
    val viaColumnar = q.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    spark.conf.set("spark.graft.columnar.enabled", "false")
    try {
      val viaRows = q.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(viaColumnar.toSeq == viaRows.toSeq)
      assert(viaColumnar.map(_._1).toSeq == (7L to 23L))
    } finally spark.conf.set("spark.graft.columnar.enabled", "true")
  }

  test("point lookup (seq = k) exact through the sliced columnar path") {
    val dir = tmpDir("ordpoint") + "/log"
    mkLog(dir)
    val q = df(dir).where(col("seq") === 17)
    assert(q.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((17L, 17)))
  }

  test("streaming micro-batches ride the sliced columnar path (atomic schema)") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("ordstream") + "/log"
    mkLog(dir)
    // 7 seqs per trigger: every batch is a range cut, most mid-segment
    val stream = spark.readStream.format("graft-log")
      .option("maxSeqsPerTrigger", "7").load(dir)
    val q = stream.writeStream.format("memory").queryName("ord_stream")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(60000)
    finally q.stop()
    val got = spark.table("ord_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(got == (0 until 30).map(i => (i.toLong, i)))
  }

  test("sliced columnar partitions survive a rewrite via the row-repack fallback") {
    val dir = tmpDir("ordslrw") + "/log"
    val log = mkLog(dir)
    val q = df(dir).where(col("seq") >= 7 && col("seq") <= 23)
    assert(plan(q).contains("ColumnarToRow"))
    val rdd = q.rdd // plan committed (columnar, sliced) BEFORE the rewrite
    log.compact()
    val got = rdd.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (7L to 23L),
      "fallback must serve exactly the planned cut — no dups, no gaps")
  }

  test("reversed tail read survives a rewrite (row reader re-resolves, order kept)") {
    val dir = tmpDir("ordrvrw") + "/log"
    val log = mkLog(dir)
    val q = df(dir).orderBy(col("seq").desc).limit(15)
    val rdd = q.rdd
    log.compact()
    assert(rdd.collect().map(_.getLong(0)).toSeq == (15L to 29L).reverse)
  }

  test("count/min/max over seq are answered from the manifest — zero file IO") {
    val dir = tmpDir("ordagg") + "/log"
    val log = mkLog(dir)
    val d = df(dir)
    // plan carries the manifest-aggregate scan, no segment partitions
    val counted = d.agg(org.apache.spark.sql.functions.count("*"))
    assert(plan(counted).contains("AGGREGATE"),
      s"count(*) should push to the manifest:\n${plan(counted)}")
    assert(counted.collect().head.getLong(0) == 30L)
    // composes with exact seq bounds: pure arithmetic
    val bounded = d.where(col("seq") >= 5 && col("seq") < 25)
    assert(bounded.count() == 20L)
    val mm = bounded.agg(
      org.apache.spark.sql.functions.min("seq"),
      org.apache.spark.sql.functions.max("seq"),
      org.apache.spark.sql.functions.count("seq"))
    assert(mm.collect().head.toSeq == Seq(5L, 24L, 20L))
    // empty range: count 0, min/max null
    val empty = d.where(col("seq") > 1000)
    assert(empty.count() == 0L)
    val er = empty.agg(
      org.apache.spark.sql.functions.min("seq"),
      org.apache.spark.sql.functions.count("*")).collect().head
    assert(er.isNullAt(0) && er.getLong(1) == 0L)
    // value aggregates / grouping are NOT pushed — still exact
    assert(d.agg(org.apache.spark.sql.functions.sum("value"))
      .collect().head.getLong(0) == (0 until 30).sum.toLong)
    assert(d.groupBy(col("nulled")).count().collect()
      .map(r => (r.getBoolean(0), r.getLong(1))).toMap == Map(false -> 30L))
    // nulled rows still count (dense seq space)
    val log2dir = tmpDir("ordaggn") + "/log"
    val l2 = mkLog(log2dir)
    l2.nullAt(3)
    assert(df(log2dir).count() == 30L)
  }

  // ---- ordered drain strategy ----

  test("orderBy(seq) full drain: no Exchange, no Sort — SeqOrderedDrain passthrough") {
    val dir = tmpDir("orddrain") + "/log"
    mkLog(dir)
    val q = df(dir).orderBy(col("seq"))
    val p = plan(q)
    assert(p.contains("SeqOrderedDrain"), s"strategy did not fire:\n$p")
    assert(!p.contains("Exchange") && !p.contains("Sort "),
      s"ordered drain must not shuffle or sort:\n$p")
    assert(q.collect().map(_.getLong(0)).toSeq == (0L until 30L))
  }

  test("orderBy(seq desc) full drain: partition reverse + local sort, no Exchange") {
    val dir = tmpDir("orddrainr") + "/log"
    mkLog(dir)
    val q = df(dir).orderBy(col("seq").desc)
    val p = plan(q)
    assert(p.contains("ReversePartitions"), s"strategy did not fire:\n$p")
    assert(!p.contains("Exchange"), s"reverse drain must not shuffle:\n$p")
    assert(q.collect().map(_.getLong(0)).toSeq == (0L until 30L).reverse)
  }

  test("strategy fires through projection + alias; bounds still pushed") {
    val dir = tmpDir("ordalias") + "/log"
    mkLog(dir)
    val q = df(dir).where(col("seq") >= 5 && col("seq") < 25)
      .select(col("seq").as("s"), col("value")).orderBy(col("s"))
    val p = plan(q)
    assert(p.contains("SeqOrderedDrain") && !p.contains("Exchange"), p)
    assert(q.collect().map(_.getLong(0)).toSeq == (5L until 25L))
  }

  test("strategy does NOT fire for non-seq order or non-log relations") {
    val dir = tmpDir("ordmiss") + "/log"
    mkLog(dir)
    val byValue = df(dir).orderBy(col("value"))
    assert(!plan(byValue).contains("SeqOrderedDrain"))
    assert(byValue.collect().length == 30)
    import spark.implicits._
    val plain = (0 until 10).toDF("seq").orderBy(col("seq"))
    assert(!plan(plain).contains("SeqOrderedDrain"))
  }

  test("reported per-partition ordering drops redundant local sorts") {
    val dir = tmpDir("ordrep") + "/log"
    mkLog(dir)
    // sortWithinPartitions(seq) over the scan: the reported ordering
    // satisfies the requirement — no SortExec planned
    val q = df(dir).sortWithinPartitions("seq")
    val sorts = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.isEmpty, s"local sort should be elided:\n${plan(q)}")
    assert(q.collect().length == 30)
  }

  test("log API reverse query plans shuffle-free end to end") {
    import graft.core.QuerySpec.{Reverse, SeqWrap}
    val dir = tmpDir("ordapi") + "/log"
    val log = mkLog(dir)
    val q = log.query(Reverse(true), SeqWrap(true))
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"API reverse drain shuffled:\n$p")
    assert(q.collect().map(_.getLong(0)).toSeq == (0L until 30L).reverse)
  }
}
