package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.core.QuerySpec._
import graft.live.LiveTail
import graft.storage.ParquetLog

/** Scale probe for the DISTRIBUTED push delivery path (test-scope
  * tool; round-11 verdict task #4): drain a ≥1M-row backlog through
  * `LiveTail.pushDistributed` under `maxSeqsPerTrigger` admission
  * control, with a second arm whose `Limit` cut lands MID-backlog
  * (inside a paced micro-batch, several batches in). Asserted per
  * run, executor-side:
  *   - every sink call sees a non-empty, ascending, CONTIGUOUS slice;
  *   - slice spans are globally disjoint and their union is exactly
  *     the expected seq range (exactly-once, exact limit accounting);
  *   - a bounded run self-terminates.
  * Numbers go to BASELINE.md. Run:
  *   sbt "Test/runMain graft.tools.PushProbe [sfDir] [copies] [maxSeqs]"
  */
object PushProbe {

  /** JVM-singleton slice recorder (local-mode executors share the
    * JVM). Contiguity is verified inside the sink call; only the
    * (first,last) span is retained, so a 1M-row drain keeps O(batches)
    * state, not O(rows). */
  object Slices {
    val spans = new ConcurrentLinkedQueue[(Long, Long)]()
    val rows = new AtomicLong(0L)
    def reset(): Unit = { spans.clear(); rows.set(0L) }
    val sink: Iterator[org.apache.spark.sql.Row] => Unit = it => {
      var first = Long.MinValue
      var prev = Long.MinValue
      var n = 0L
      it.foreach { r =>
        val s = r.getLong(0)
        if (n == 0L) first = s
        else require(s == prev + 1, s"non-contiguous slice at $prev -> $s")
        prev = s
        n += 1
      }
      require(n > 0L, "sink invoked with an empty slice")
      spans.add((first, prev))
      rows.addAndGet(n)
      ()
    }
    /** Disjoint spans whose union is exactly [0, expect). */
    def assertExact(expect: Long): Unit = {
      val sorted = spans.asScala.toList.sortBy(_._1)
      var next = 0L
      sorted.foreach { case (a, b) =>
        require(a >= next, s"overlapping spans at $a (already covered to $next)")
        next = math.max(next, b + 1)
      }
      require(rows.get() == expect,
        s"delivered ${rows.get()} rows, want $expect")
      require(sorted.map { case (a, b) => b - a + 1 }.sum == expect,
        "span row-count mismatch")
      require(sorted.headOption.forall(_._1 == 0L) && next == expect,
        s"union not [0,$expect): head=${sorted.headOption} tail=$next")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val maxSeqs = args.drop(2).headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = java.nio.file.Files.createTempDirectory("graft-pushprobe").toString
    val events = Tables.load(spark, sfDir, "events")
    val value = graft.EngineFixtures.eventValue(events)
    val log = ParquetLog.open(spark, s"$work/log", value.schema.head.dataType)
    (0 until copies).foreach(_ => log.append(value))
    val backlog = log.seq + 1
    println(s"== backlog $backlog rows, maxSeqsPerTrigger=$maxSeqs")

    def arm(tag: String, specs: Seq[graft.core.QuerySpec], expect: Long): Unit = {
      Slices.reset()
      val t0 = System.nanoTime()
      val q = LiveTail.pushDistributed(
        log, specs, s"$work/ckpt-$tag", Slices.sink,
        sourceOptions = Map("maxSeqsPerTrigger" -> maxSeqs.toString))
      try {
        if (specs.exists(_.isInstanceOf[graft.core.QuerySpec.Limit]))
          require(q.awaitTermination(600000), s"$tag did not self-terminate")
        else { q.processAllAvailable(); q.stop() }
      } finally if (q.isActive) q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      Slices.assertExact(expect)
      println(f"== $tag: $secs%.2f s, ${Slices.rows.get()} rows, " +
        f"${Slices.spans.size()} slices, ${expect / secs / 1e6}%.2f M rows/s")
      System.gc()
    }

    // full-backlog paced drain (no bound): throughput arm
    arm("full_drain", Seq(Live(true), SeqWrap(true)), backlog)
    // limit cut mid-backlog: 60% of the rows, landing inside a paced
    // micro-batch several batches in — exact accounting + self-stop
    val cut = backlog * 6 / 10
    arm("midcut_limit", Seq(Limit(cut), Live(true), SeqWrap(true)), cut)
    spark.stop()
  }
}
