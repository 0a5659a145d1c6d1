package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core._
import graft.core.QuerySpec._
import graft.indexes.{KVIndex, MultiLogSink}
import graft.multilog.{MemMultiLog, MultiLog, MultiLogApi}
import graft.storage.ParquetLog

/** MultiLog behaviors ported from the reference suites:
  *   - prime-factorization fan-out oracle (multilog/test/sink.go:27-216)
  *   - add/list/delete lifecycle + delete poisoning
  *     (multilog/test/multilog.go:140-255)
  *   - query-spec matrix over sublogs of multiples
  *     (multilog/test/multilog.go:257-705, here for k=2..9)
  *
  * Run as a conformance MATRIX over both backends, like the
  * reference's registry (multilog/test/registry.go:11-47): the
  * durable bucketed-parquet [[MultiLog]] and the driver-memory
  * [[MemMultiLog]].
  */
object MultiLogSpec {
  // reference: multilog/test/sink.go:226-240; standalone object so the
  // UDF closure stays serializable (no SparkSession capture)
  def factorize(n: Long): Seq[Long] = {
    var x = n
    var f = 2L
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    while (f * f <= x) {
      while (x % f == 0) { out += f; x /= f }
      f += 1
    }
    if (x > 1) out += x
    out.toSeq
  }
}

abstract class MultiLogContractSpec extends SparkSpec {
  import spark.implicits._

  /** Backend under test. */
  def mkMlog(tag: String): MultiLogApi

  test("prime-factorization sink oracle (values 0..19)") {
    val log = ParquetLog.open(spark, tmpDir("sinklog"), LongType)
    log.appendValues((0L until 20L).toSeq)
    val mlog = mkMlog("sinkmlog")
    val cursor = KVIndex.open(spark, tmpDir("sinkcursor"))
    val factorizeUdf =
      udf((v: Long) => MultiLogSpec.factorize(v).map(_.toString))
    MultiLogSink.pump(
      log,
      mlog,
      cursor,
      batch =>
        batch.select(
          explode(factorizeUdf(col("value"))).as("addr"),
          col("seq")
        )
    )
    // oracle: sublog for prime p holds exactly the multiples of p in
    // 2..19 (value == seq in this log)
    for (p <- Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L)) {
      val want = (2L until 20L).filter(_ % p == 0)
      val got = mlog
        .sublog(p.toString)
        .query(SeqWrap(true))
        .collect()
        .map(_.getLong(1))
        .toSeq
      assert(got == want, s"sublog $p")
    }
    // non-primes never become addrs
    val addrs = mlog.list().collect().map(_.getString(0)).map(_.toLong).toSet
    assert(addrs == Set(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L))
  }

  test("query-spec matrix over sublogs of multiples (k=2..9)") {
    val mlog = mkMlog("matrix")
    val rows = for {
      k <- 2 to 9
      seq <- (0L until 40L) if seq % k == 0
    } yield (k.toString, seq)
    mlog.appendBatch(rows.toDF("addr", "seq"))
    val sub4 = mlog.sublog("4") // parent seqs 0,4,8,...,36 at ranks 0..9
    assert(sub4.seq == 9)
    assert(sub4.get(0) == 0L && sub4.get(3) == 12L)
    // rank-space bounds: Gte(1), Lt(3) → ranks 1,2 → parent 4,8
    assert(
      sub4.query(Gte(1), Lt(3), SeqWrap(true)).collect().map(_.getLong(1)).toSeq
        == Seq(4L, 8L)
    )
    // limit 1 → first rank only
    assert(sub4.query(Limit(1)).collect().map(_.getLong(0)).toSeq == Seq(0L))
    // reverse → descending parent seqs
    assert(
      sub4.query(Reverse(true), Limit(3)).collect().map(_.getLong(0)).toSeq
        == Seq(36L, 32L, 28L)
    )
    // out-of-bounds rank
    intercept[GraftErrors.ErrOutOfBounds](sub4.get(10))
  }

  test("append is idempotent on (addr, seq) like bitmap Set") {
    val mlog = mkMlog("idem")
    mlog.append("a", 5L)
    mlog.append("a", 5L)
    assert(mlog.sublog("a").seq == 0)
  }

  test("delete poisons open handles; fresh handle sees empty sublog") {
    val mlog = mkMlog("del")
    mlog.appendBatch(Seq(("deleteme", 1L), ("keep", 2L)).toDF("addr", "seq"))
    val handle = mlog.sublog("deleteme")
    assert(handle.seq == 0)
    mlog.delete("deleteme")
    intercept[GraftErrors.ErrSublogDeleted](handle.seq)
    intercept[GraftErrors.ErrSublogDeleted](handle.get(0))
    // table no longer lists it; the other sublog is intact
    val addrs = mlog.list().collect().map(_.getString(0)).toSet
    assert(addrs == Set("keep"))
    assert(mlog.has("keep") && !mlog.has("deleteme"))
  }

  test("compact preserves sublog contents") {
    val mlog = mkMlog("cmp")
    mlog.appendBatch(Seq(("x", 3L), ("x", 1L)).toDF("addr", "seq"))
    mlog.appendBatch(Seq(("x", 2L), ("y", 9L)).toDF("addr", "seq"))
    mlog.compact()
    assert(mlog.sublog("x").query(SeqWrap(true)).collect()
      .map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(mlog.sublog("y").get(0) == 9L)
  }

  test("resolve maps ranks back to parent values") {
    val log = ParquetLog.open(spark, tmpDir("rvlog"),
      org.apache.spark.sql.types.IntegerType)
    log.appendValues((0 until 10).map(_ * 100))
    val mlog = mkMlog("rv")
    mlog.appendBatch(Seq(("even", 0L), ("even", 2L), ("even", 4L))
      .toDF("addr", "seq"))
    val got = mlog.sublog("even").resolve(log)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((0L, 0L, 0), (1L, 2L, 200), (2L, 4L, 400)))
  }
}

/** Durable backend: bucketed parquet index table. */
class MultiLogSpec extends MultiLogContractSpec {
  import spark.implicits._

  override def mkMlog(tag: String): MultiLogApi =
    MultiLog.open(spark, tmpDir(tag))

  test("reopen continues (peachcloud fork regression shape)") {
    // reference: multilog/test/multilog.go:24-138 — add, close, reopen,
    // add more, verify the union
    val dir = tmpDir("reopen")
    val m1 = MultiLog.open(spark, dir)
    m1.appendBatch(Seq(("x", 1L), ("x", 2L), ("x", 3L)).toDF("addr", "seq"))
    val m2 = MultiLog.open(spark, dir)
    m2.appendBatch(Seq(("x", 4L), ("x", 5L), ("x", 6L)).toDF("addr", "seq"))
    val got = m2.sublog("x").query(SeqWrap(true)).collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("resolve broadcasts small sublogs; gated off when disabled") {
    // a hot addr holding 20% of a 100 TB log must never be forced
    // through the driver — the broadcast is threshold-gated
    val dir = tmpDir("resolvegate")
    val mlog = MultiLog.open(spark, dir)
    val log = graft.storage.ParquetLog.open(
      spark, tmpDir("resolvelog"), org.apache.spark.sql.types.IntegerType)
    import spark.implicits._
    log.appendValues((0 until 50).toSeq)
    mlog.appendBatch((0L until 50L by 2).map(("even", _)).toDF("addr", "seq"))
    def planOf(): String = {
      val r = mlog.sublog("even").resolve(log)
      r.collect()
      r.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    assert(planOf().contains("BroadcastHashJoin"), "small sublog should broadcast")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!planOf().contains("BroadcastHashJoin"),
        "broadcast must respect the disabled threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

/** Driver-memory backend (the reference's mem member of the registry). */
class MemMultiLogSpec extends MultiLogContractSpec {
  override def mkMlog(tag: String): MultiLogApi = MemMultiLog.open(spark)
}
