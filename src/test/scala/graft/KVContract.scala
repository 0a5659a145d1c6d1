package graft

import org.apache.spark.sql.types.IntegerType

import graft.core.QuerySpec._
import graft.indexes.{KV, SinkIndex}
import graft.storage.ParquetLog

/** Backend conformance matrix for the index layer — the shape of the
  * reference's `indexes/test/registry.go` (the same suite runs over
  * mapidx / mkv / badger there; over TableStore-parquet and
  * driver-memory here). Mix into a SparkSpec and provide `newKV`. */
trait KVContract { self: SparkSpec =>

  /** A fresh, empty backend instance per test. */
  def newKV(): KV

  test("set/get/delete are last-write-wins with unset tombstones") {
    val kv = newKV()
    assert(kv.get("k").isEmpty)
    kv.set("k", "v1")
    assert(kv.get("k").contains("v1"))
    kv.set("k", "v2")
    assert(kv.get("k").contains("v2"))
    kv.delete("k")
    assert(kv.get("k").isEmpty) // UnsetValue, not an error
    kv.set("k", "v3")
    assert(kv.get("k").contains("v3"))
  }

  test("applyBatch orders by useq within a batch") {
    import spark.implicits._
    val kv = newKV()
    kv.applyBatch(
      Seq(("k", "late", false, 5L), ("k", "early", false, 1L))
        .toDF("addr", "value", "tombstone", "useq"))
    assert(kv.get("k").contains("late"))
  }

  test("current snapshot drops tombstones and keeps last writes") {
    val kv = newKV()
    kv.set("a", "1"); kv.set("b", "2"); kv.set("a", "3"); kv.delete("b")
    kv.set("c", "4")
    val snap = kv.current.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap == Map("a" -> "3", "c" -> "4"))
    kv.compact()
    val snap2 = kv.current.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(snap2 == snap)
  }

  test("watch: immediate state, set/delete notifies, cancel stops") {
    val kv = newKV()
    kv.set("w", "v0")
    val seen = scala.collection.mutable.ListBuffer.empty[Option[String]]
    val w = kv.watch("w")(v => { seen += v; () })
    assert(seen.toList == List(Some("v0"))) // immediate current state
    kv.set("w", "v1")
    kv.delete("w")
    assert(seen.toList == List(Some("v0"), Some("v1"), None))
    w.cancel()
    kv.set("w", "v2")
    assert(seen.toList == List(Some("v0"), Some("v1"), None)) // no more
  }

  test("a watcher callback may write back into the index (reentrant)") {
    // the pre-ticket delivery ran under a reentrant synchronized, so a
    // callback that commits again worked; the ticket-ordered delivery
    // must preserve that (a naive wait-for-my-ticket self-deadlocks:
    // the outer delivery can't finish while its callback is blocked
    // inside the nested one)
    val kv = newKV()
    val seen = scala.collection.mutable.ListBuffer.empty[Option[String]]
    val echoed = scala.collection.mutable.ListBuffer.empty[Option[String]]
    kv.watch("echo")(v => { echoed += v; () })
    kv.watch("src") { v =>
      seen += v
      v.foreach(s => kv.set("echo", s"echo-$s")) // write-back, same thread
    }
    kv.set("src", "a")
    kv.set("src", "b")
    assert(seen.toList == List(None, Some("a"), Some("b")))
    // nested commits are durable AND their watchers were notified,
    // in commit order, after each outer delivery completed
    assert(kv.get("echo").contains("echo-b"))
    assert(echoed.toList == List(None, Some("echo-a"), Some("echo-b")))
  }

  test("watch on an unset key: immediate UnsetValue, then the lifecycle") {
    // reference: indexes/test/setidx.go:48-107 — Register on an unset
    // key delivers UnsetValue first, then each set, then unset again
    val kv = newKV()
    val seen = scala.collection.mutable.ListBuffer.empty[Option[String]]
    val w = kv.watch("nope")(v => { seen += v; () })
    kv.set("nope", "omg what is this")
    kv.set("nope", "so rad")
    kv.set("nope", "wowzers")
    kv.delete("nope")
    w.cancel()
    assert(seen.toList == List(None, Some("omg what is this"),
      Some("so rad"), Some("wowzers"), None))
  }

  test("applyBatch refuses a frame without (addr, value) columns") {
    val kv = newKV()
    import spark.implicits._
    intercept[IllegalArgumentException] {
      kv.applyBatch(Seq("only-one-col").toDF("addr"))
    }
  }

  test("a null non-tombstone value reads as unset everywhere") {
    // get, watch and both backends must agree: SQL-NULL value = None
    // (the reference's UnsetValue) — Some(null) breaks the contract
    val idx = newKV()
    import spark.implicits._
    idx.applyBatch(Seq(("nk", null.asInstanceOf[String], false))
      .toDF("addr", "value", "tombstone"))
    assert(idx.get("nk").isEmpty, s"get returned ${idx.get("nk")}")
    val seen = scala.collection.mutable.ListBuffer.empty[Option[String]]
    val w = idx.watch("nk")(v => { seen.synchronized { seen += v }; () })
    try assert(seen.synchronized(seen.toList) == List(None))
    finally w.cancel()
  }

  test("sink pump resumes from the cursor exactly once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val kv = newKV()
    val log = ParquetLog.open(spark, tmpDir("kvc-log"), IntegerType)
    log.appendValues(Seq(10, 20, 30))
    def proc(b: org.apache.spark.sql.DataFrame) =
      b.select(
        col("value").cast("string").as("addr"),
        col("seq").cast("string").as("value"),
        lit(false).as("tombstone"),
        col("seq").as("useq"))
    assert(SinkIndex.pump(log, kv, proc) == 3)
    assert(SinkIndex.pump(log, kv, proc) == 0) // nothing new
    log.appendValues(Seq(40))
    assert(SinkIndex.pump(log, kv, proc) == 1)
    assert(kv.get("40").contains("3")) // value 40 at seq 3
    assert(kv.current.count() == 4)
  }

  test("an interrupted delivery waiter abandons its ticket — later deliveries never stall") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val kv = newKV()
    // watcher on "a" whose post-snapshot deliveries block until gated —
    // holding the ordered-delivery pipeline the way a slow callback does
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val parked = new CountDownLatch(1)
    val seen = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val wa = kv.watch("a") { v =>
      if (calls.incrementAndGet() == 2) { parked.countDown(); gate.await() }
      v.foreach(seen.add(_)); ()
    }
    // "b" needs a watcher too so B's commit has a real delivery to wait on
    val wb = kv.watch("b")(_ => ())
    try {
      val aErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val tA = new Thread(() =>
        try kv.set("a", "1") catch { case t: Throwable => aErr.set(t) })
      tA.start()
      assert(parked.await(30, TimeUnit.SECONDS), "A's delivery never started")
      // B commits behind A and waits its delivery turn; interrupting it
      // used to orphan its ticket and stall every later delivery forever
      val bInterrupted = new CountDownLatch(1)
      val tB = new Thread(() =>
        try kv.set("b", "2")
        catch { case _: InterruptedException => bInterrupted.countDown() })
      tB.start()
      // interrupt only once B's COMMIT is durable and it is parked on
      // the delivery monitor (not still inside the Spark write)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while ((!kv.get("b").contains("2") ||
          tB.getState != Thread.State.WAITING) &&
          System.nanoTime() < deadline) Thread.sleep(10)
      assert(kv.get("b").contains("2"), "B's commit never landed")
      tB.interrupt()
      assert(bInterrupted.await(30, TimeUnit.SECONDS),
        "interrupted waiter should propagate InterruptedException")
      gate.countDown()
      tA.join(30000)
      assert(aErr.get() == null, s"A failed: ${aErr.get()}")
      // the pipeline must still deliver PAST the abandoned ticket
      kv.set("a", "3")
      val d2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!seen.contains("3") && System.nanoTime() < d2) Thread.sleep(10)
      assert(seen.contains("3"),
        s"delivery stalled behind the abandoned ticket; saw $seen")
    } finally { gate.countDown(); wa.cancel(); wb.cancel() }
  }
}

/** The matrix legs. */
class KVIndexContractSpec extends SparkSpec with KVContract {
  def newKV(): KV = graft.indexes.KVIndex.open(spark, tmpDir("kvc-parquet"))

  // TableStore-backed leg only: point-in-time reads ride the
  // versionAsOf snapshot (MemKV keeps no history)
  test("getAsOf reads point-in-time state; compaction folds history loudly") {
    val kv = graft.indexes.KVIndex.open(spark, tmpDir("kvc-asof"))
    kv.set("a", "v1") // commit 1
    kv.set("a", "v2") // commit 2
    kv.delete("a") // commit 3
    assert(kv.version == 3L)
    assert(kv.getAsOf("a", 1L).contains("v1"))
    assert(kv.getAsOf("a", 2L).contains("v2"))
    assert(kv.getAsOf("a", 3L).isEmpty) // tombstoned at v3
    assert(kv.getAsOf("a", 0L).isEmpty) // before any commit
    assert(kv.currentAsOf(2L).collect().map(_.getString(1)).toSeq == Seq("v2"))
    kv.compact()
    val e = intercept[Exception](kv.getAsOf("a", 2L))
    assert(e.getMessage.contains("folded"), e.getMessage)
    assert(kv.getAsOf("a", kv.version).isEmpty) // post-fold state intact
  }
}

class MemKVSpec extends SparkSpec with KVContract {
  def newKV(): KV = graft.indexes.MemKV.open(spark)
}
