package graft

import graft.core.QuerySpec._
import graft.storage.TypedLog

object TypedLogSpec {
  case class Ev(foo: String, bar: Int)
}

class TypedLogSpec extends SparkSpec {
  import TypedLogSpec.Ev
  import spark.implicits._

  test("typed facade: append / get / query round-trip") {
    val log = TypedLog.open[Ev](spark, tmpDir("typed"))
    val first = log.append(Seq(Ev("hello", 23), Ev("world", 42), Ev("moar", 7)))
    assert(first == 0L && log.seq == 2L)
    assert(log.get(1) == Ev("world", 42))
    assert(log.query(Gte(1)) == Seq(Ev("world", 42), Ev("moar", 7)))
    assert(log.query(Reverse(true), Limit(1)) == Seq(Ev("moar", 7)))
    // typed surface skips redacted entries
    log.underlying.nullAt(0)
    assert(log.query() == Seq(Ev("world", 42), Ev("moar", 7)))
  }

  test("typed facade over the in-memory backend (backend-generic)") {
    val mem = graft.storage.MemLog.open(spark, implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
    val log = TypedLog.of[Ev](mem)
    log.append(Seq(Ev("hello", 23), Ev("world", 42)))
    assert(log.seq == 1L)
    assert(log.get(0) == Ev("hello", 23))
    assert(log.query(Reverse(true)) == Seq(Ev("world", 42), Ev("hello", 23)))
  }

  test("sublog resolve joins back to parent values (broadcast)") {
    import org.apache.spark.sql.functions._
    val log = graft.storage.ParquetLog
      .open(spark, tmpDir("rlog"), org.apache.spark.sql.types.StringType)
    log.appendValues(Seq("a0", "b1", "a2", "b3", "a4"))
    val mlog = graft.multilog.MultiLog.open(spark, tmpDir("rmlog"))
    mlog.appendBatch(
      Seq(("a", 0L), ("a", 2L), ("a", 4L), ("b", 1L), ("b", 3L))
        .toDF("addr", "seq")
    )
    val resolved = mlog.sublog("a").resolve(log).orderBy("rank").collect()
    assert(resolved.map(_.getString(2)).toSeq == Seq("a0", "a2", "a4"))
    assert(resolved.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // physical plan uses a broadcast join
    val plan = mlog.sublog("a").resolve(log).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
