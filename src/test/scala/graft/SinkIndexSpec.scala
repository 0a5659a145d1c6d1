package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.indexes.{KVIndex, SinkIndex}
import graft.storage.ParquetLog

/** SinkIndex contract ported from the reference
  * (indexes/test/sinkindex.go:23-115): a derived KV view fed by the
  * log, with stop/restart-resume that must NOT reprocess ("WithBreak"),
  * and redacted entries skipped.
  */
class SinkIndexSpec extends SparkSpec {
  import spark.implicits._

  // the reference's categorizer: last value containing the key word
  private def proc(batch: org.apache.spark.sql.DataFrame) = {
    val addr = when(col("value").contains("interesting"), "interesting")
      .when(col("value").contains("boring"), "boring")
    batch.select(addr.as("addr"), col("value"), col("seq").as("useq"))
  }

  test("incremental resume without reprocessing (WithBreak)") {
    val log = ParquetLog.open(spark, tmpDir("silog"), StringType)
    val idx = KVIndex.open(spark, tmpDir("siidx"))
    log.appendValues(
      Seq("boring string", "another boring string", "mildly interesting string")
    )
    val n1 = SinkIndex.pump(log, idx, proc)
    assert(n1 == 3)
    assert(idx.get("boring").contains("another boring string"))
    assert(idx.get("interesting").contains("mildly interesting string"))

    // nothing new → zero consumed (the resume contract)
    assert(SinkIndex.pump(log, idx, proc) == 0)

    // append more, pump again: only the delta is processed
    log.appendValues(Seq("so-so string", "highly interesting string"))
    val n2 = SinkIndex.pump(log, idx, proc)
    assert(n2 == 2)
    assert(idx.get("interesting").contains("highly interesting string"))
    assert(idx.get("boring").contains("another boring string"))
    assert(idx.get("so-so").isEmpty) // uncategorized → not indexed
  }

  test("nulled entries are skipped (sinkindex.go:51-55)") {
    val log = ParquetLog.open(spark, tmpDir("silog2"), StringType)
    val idx = KVIndex.open(spark, tmpDir("siidx2"))
    log.appendValues(Seq("boring one", "interesting one"))
    log.nullAt(1)
    SinkIndex.pump(log, idx, proc)
    assert(idx.get("boring").contains("boring one"))
    assert(idx.get("interesting").isEmpty)
  }

  test("set/delete observable sequence (setidx.go:60-125)") {
    val idx = KVIndex.open(spark, tmpDir("obs"))
    assert(idx.get("k").isEmpty) // Unset
    idx.set("k", "omg what is this")
    assert(idx.get("k").contains("omg what is this"))
    idx.set("k", "so rad")
    assert(idx.get("k").contains("so rad"))
    idx.set("k", "wowzers")
    assert(idx.get("k").contains("wowzers"))
    idx.delete("k")
    assert(idx.get("k").isEmpty) // back to Unset
  }

  test("per-key watch: register/notify/unset/deregister (obv.go:13-51)") {
    val idx = KVIndex.open(spark, tmpDir("watch"))
    idx.set("k", "initial")
    val seen = scala.collection.mutable.ListBuffer.empty[Option[String]]
    val w = idx.watch("k")(v => { seen += v; () })
    // registration delivers the current value immediately
    assert(seen.toList == List(Some("initial")))
    // set → notify with the new value
    idx.set("k", "updated")
    assert(seen.toList == List(Some("initial"), Some("updated")))
    // writes to OTHER keys don't notify
    idx.set("other", "x")
    assert(seen.size == 2)
    // delete → unset notification (the reference's UnsetValue)
    idx.delete("k")
    assert(seen.toList.last.isEmpty)
    // a batch's last write per key wins (useq ordering)
    import spark.implicits._
    idx.applyBatch(
      Seq(("k", "mid", 1L), ("k", "final", 2L)).toDF("addr", "value", "useq"))
    assert(seen.toList.last.contains("final"))
    // deregistration: no further notifications
    val before = seen.size
    w.cancel()
    idx.set("k", "after-cancel")
    assert(seen.size == before)
    // two watchers on one key both fire; cancel is per-watcher
    val seen2 = scala.collection.mutable.ListBuffer.empty[Option[String]]
    val w2 = idx.watch("k")(v => { seen2 += v; () })
    val w3 = idx.watch("k")(_ => ())
    idx.set("k", "both")
    assert(seen2.toList == List(Some("after-cancel"), Some("both")))
    w2.cancel(); w3.cancel()
  }

  test("watchStream: cross-handle per-key change stream") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("watchstream")
    val writer = KVIndex.open(spark, dir)
    // a SEPARATE handle subscribes (≙ another process on shared storage)
    val reader = KVIndex.open(spark, dir)
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[String])]()
    val q = reader
      .watchStream("k")
      .writeStream
      .option("checkpointLocation", tmpDir("wsckpt"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.orderBy("_ver", "useq").collect().foreach { r =>
          seen.add((
            r.getAs[Long]("_ver"),
            if (r.getAs[Boolean]("tombstone")) None
            else Option(r.getAs[String]("value"))
          ))
        }
        (): Unit
      }
      .start()
    try {
      writer.set("k", "v1")
      writer.set("other", "x") // filtered out
      writer.set("k", "v2")
      writer.delete("k")
      q.processAllAvailable()
      val got = seen.asScala.toList
      assert(got.map(_._2) == List(Some("v1"), Some("v2"), None))
      // versions strictly increase across commits
      assert(got.map(_._1) == got.map(_._1).sorted)
    } finally q.stop()
  }

  test("seq-setter cursor (seqsetidx.go:24-55)") {
    val idx = KVIndex.open(spark, tmpDir("cursor"))
    assert(idx.getSeq == graft.core.Seqs.SeqEmpty)
    idx.setSeq(0)
    assert(idx.getSeq == 0)
    idx.setSeq(41)
    assert(idx.getSeq == 41)
  }

  test("compaction preserves current state") {
    val idx = KVIndex.open(spark, tmpDir("compact"))
    idx.set("a", "1"); idx.set("a", "2"); idx.set("b", "x"); idx.delete("b")
    idx.compact()
    assert(idx.get("a").contains("2"))
    assert(idx.get("b").isEmpty)
    assert(idx.current.count() == 1)
  }
}
