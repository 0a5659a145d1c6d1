package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.DataType

import graft.core._
import graft.core.QuerySpec._
import graft.storage.{Log, MemLog, ParquetLog}

/** Golden query vectors ported from the reference's conformance suite
  * (reference: test/simple.go:126-236, test/get.go:16-65), run as a
  * BACKEND MATRIX over both [[Log]] implementations — the shape of the
  * reference's registry-driven tests (test/registry.go:9-23): one
  * contract, every backend must pass it.
  */
abstract class LogContractSpec extends SparkSpec {

  /** Backend under test. */
  def backend: String
  def openLog(valueType: DataType): Log

  private def mkLog(values: Seq[Int]): Log = {
    import spark.implicits._
    val log = openLog(org.apache.spark.sql.types.IntegerType)
    val first = log.appendValues(values)
    assert(first == 0L, "first assigned seq must be 0")
    log
  }

  private def values(log: Log, specs: QuerySpec*): Seq[Int] =
    log
      .query(specs: _*)
      .collect()
      .toSeq
      .map(r => r.getInt(r.fieldIndex("value")))

  // test/simple.go "simple"
  test(s"[$backend] simple: full drain in order") {
    assert(values(mkLog(Seq(1, 2, 3))) == Seq(1, 2, 3))
  }

  // test/simple.go "reverse"
  test(s"[$backend] reverse: tail to head") {
    assert(
      values(mkLog(Seq(1, 2, 3, 4, 5)), Reverse(true)) == Seq(5, 4, 3, 2, 1)
    )
  }

  // test/simple.go "reverse-false"
  test(s"[$backend] reverse(false): unchanged") {
    assert(
      values(mkLog(Seq(1, 2, 3, 4, 5)), Reverse(false)) == Seq(1, 2, 3, 4, 5)
    )
  }

  // test/simple.go "gt0" / "gte1" / "lt2" / "lte1" / "limit2"
  test(s"[$backend] gt0") {
    assert(values(mkLog(Seq(1, 2, 3)), Gt(0)) == Seq(2, 3))
  }
  test(s"[$backend] gte1") {
    assert(values(mkLog(Seq(1, 2, 3)), Gte(1)) == Seq(2, 3))
  }
  test(s"[$backend] lt2") {
    assert(values(mkLog(Seq(1, 2, 3)), Lt(2)) == Seq(1, 2))
  }
  test(s"[$backend] lte1") {
    assert(values(mkLog(Seq(1, 2, 3)), Lte(1)) == Seq(1, 2))
  }
  test(s"[$backend] limit2") {
    assert(values(mkLog(Seq(1, 2, 3)), Limit(2)) == Seq(1, 2))
  }

  // The reference's issue-#6 combinations, implemented CORRECTLY
  // (SURVEY §7.4 item 7): bounds compose with reverse on seq order.
  test(s"[$backend] reverse + gte composes correctly") {
    assert(
      values(mkLog(Seq(1, 2, 3, 4, 5)), Reverse(true), Gte(2)) ==
        Seq(5, 4, 3)
    )
  }
  test(s"[$backend] reverse + lt composes correctly") {
    assert(
      values(mkLog(Seq(1, 2, 3, 4, 5)), Reverse(true), Lt(4)) ==
        Seq(4, 3, 2, 1)
    )
  }

  // test/simple.go "seqWrap"
  test(s"[$backend] seqWrap pairs (seq, value)") {
    val got = mkLog(Seq(1, 2, 3))
      .query(SeqWrap(true))
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got == Seq((0L, 1), (1L, 2), (2L, 3)))
  }

  // test/simple.go "EOS": draining past the end yields nothing more
  test(s"[$backend] EOS: query returns exactly the appended entries") {
    assert(values(mkLog(Seq(1, 2))).size == 2)
  }

  // test/get.go point reads
  test(s"[$backend] get(seq) point reads and OOB") {
    val log = mkLog(Seq(1, 2, 3))
    assert(log.get(0).getInt(1) == 1)
    assert(log.get(2).getInt(1) == 3)
    intercept[GraftErrors.ErrOutOfBounds](log.get(3))
    intercept[GraftErrors.ErrOutOfBounds](log.get(-1))
  }

  test(s"[$backend] getMany: batched point reads, absent seqs skipped") {
    val log = mkLog(Seq(10, 20, 30, 40, 50))
    val rows = log.getMany(Seq(4L, 0L, 2L, 99L))
    val got = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 10, 2L -> 30, 4L -> 50))
    assert(log.getMany(Nil).isEmpty)
  }

  test(s"[$backend] seq() is count-1; SeqEmpty on empty log") {
    val log = mkLog(Seq(1, 2, 3))
    assert(log.seq == 2L)
    val empty = openLog(org.apache.spark.sql.types.IntegerType)
    assert(empty.seq == Seqs.SeqEmpty)
  }

  test(s"[$backend] checkConsistency clean log") {
    val log = mkLog(Seq(1, 2, 3))
    assert(log.checkConsistency() == Nil)
  }
}

/** Durable backend leg + parquet-only behaviors (durability, direct
  * point reads, spec validation — validation is backend-independent
  * but needs only one leg). Abstract over the [[graft.storage.FileIO]]
  * routing: the local leg uses bare POSIX paths (java.nio metadata
  * I/O), the Hadoop leg `file:`-schemed paths (the same Hadoop
  * FileSystem code path an hdfs:// or s3a:// store dir takes). */
abstract class ParquetLogContract extends LogContractSpec {
  /** "" = LocalFileIO; "file:" = HadoopFileIO over local disk. */
  def fsPrefix: String
  def logDir(prefix: String): String = fsPrefix + tmpDir(prefix)
  def openLog(valueType: DataType): Log =
    ParquetLog.open(spark, logDir("log"), valueType)

  test("seq bounds are pushed to the scan (exact, planning-time pruning)") {
    import spark.implicits._
    val log = openLog(org.apache.spark.sql.types.IntegerType)
    log.appendValues((0 until 100).toSeq)
    val q = log.query(Gte(10), Lt(20), SeqWrap(true))
    q.collect()
    // the connector scan's description carries the EXACT folded bounds
    // (no residual row-level re-filter — the reader enforces them);
    // plan string because the AQE wrapper hides scans from collectLeaves
    val plan = q.queryExecution.executedPlan.toString
    assert(
      plan.contains("seq∈[10, 19]"),
      s"bounds not pushed:\n$plan")
    assert(
      !q.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }.isDefined,
      s"exact pushdown should plan no residual filter:\n$plan")
  }

  test("a small multi-partition append publishes few DENSE segment files (byte-aware merge)") {
    import spark.implicits._
    val dir = logDir("log-merge")
    val log = ParquetLog.open(spark, dir,
      org.apache.spark.sql.types.LongType)
    // 32 partitions of a tiny batch: without the merge this publishes
    // 32 seq-range files per append and a streaming sink's log goes
    // O(files) at every plan
    log.append(spark.range(2000).repartition(32)
      .select(org.apache.spark.sql.functions.col("id").as("value")))
    val m = graft.storage.Manifest.load(dir).get
    assert(m.segments.length <= 2,
      s"tiny 32-partition append published ${m.segments.length} files")
    // the merged files stay DENSE contiguous ranges covering [0,1999]
    val sorted = m.segments.sortBy(_.minSeq)
    assert(sorted.head.minSeq == 0L && sorted.last.maxSeq == 1999L)
    sorted.sliding(2).foreach {
      case List(a, b) => assert(b.minSeq == a.maxSeq + 1,
        s"gap between segments: $a -> $b")
      case _ => ()
    }
    sorted.foreach(s => assert(s.rows == s.maxSeq - s.minSeq + 1,
      s"segment not dense: $s"))
    // point reads and drains still serve every value exactly once
    // (repartition shuffled the arrival order; seqs are dense anyway)
    val all = log.query().collect().map(_.getLong(0))
    assert(all.length == 2000 && all.toSet == (0L until 2000L).toSet)
    assert(Set(log.get(0L).getLong(1), log.get(1999L).getLong(1))
      .subsetOf((0L until 2000L).toSet))
    assert(log.checkConsistency().isEmpty)
  }

  test("getMany tiers: direct reads, range runs, literal isin, broadcast semi-join — same rows") {
    import spark.implicits._
    val log = openLog(org.apache.spark.sql.types.IntegerType)
    log.appendValues((0 until 3000).toSeq)
    def check(seqs: Seq[Long]): Unit = {
      val got = log.getMany(seqs).map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == seqs.distinct.filter(_ < 3000)
        .map(s => s -> s.toInt).toMap)
    }
    // ≤ MaxDirectReads → driver-direct page reads (absent seq skipped)
    check(Seq(5L, 2999L, 1500L, 5000L))
    // 182 seqs in 2 contiguous runs → OR-of-ranges tier (pushable)
    check((100L to 180L) ++ (2500L to 2600L))
    // 200 scattered seqs (200 runs > MaxRangePredicates, ≤ 1000) → isin
    check((0 until 200).map(i => i * 7L))
    // 1200 scattered seqs (> MaxInLiteralSeqs) → broadcast semi-join
    check((0 until 1200).map(i => (i * 2L + 1) % 3000))
  }

  // test/simple.go "invalid querys"
  test("reverse + live rejected") {
    val e = intercept[GraftErrors.InvalidQuery] {
      QueryPlan.of(Live(true), Reverse(true))
    }
    assert(e.getMessage.contains("can't do reverse and live"))
  }

  // offset2/qry.go:35-69 single-set validation
  test("double lower bound rejected") {
    intercept[GraftErrors.InvalidQuery](QueryPlan.of(Gt(1), Gte(2)))
  }
  test("double upper bound rejected") {
    intercept[GraftErrors.InvalidQuery](QueryPlan.of(Lt(1), Lte(2)))
  }

  test("get(seq) handles struct and array values (driver direct read)") {
    import spark.implicits._
    val slog = ParquetLog.open(spark, logDir("structlog"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType))))
    slog.append(
      Seq((7L, "x"), (8L, null.asInstanceOf[String]))
        .toDF("a", "b")
        .select(org.apache.spark.sql.functions.struct("a", "b").as("value")))
    val r0 = slog.get(0).getStruct(1)
    assert(r0.getLong(0) == 7L && r0.getString(1) == "x")
    val r1 = slog.get(1).getStruct(1)
    assert(r1.getLong(0) == 8L && r1.isNullAt(1))

    val alog = ParquetLog.open(spark, logDir("arrlog"),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType))
    alog.append(Seq(Seq(1, 2, 3), Seq.empty[Int]).toDF("value"))
    assert(alog.get(0).getSeq[Int](1) == Seq(1, 2, 3))
    assert(alog.get(1).getSeq[Int](1).isEmpty)
  }

  // offset2/rw_test.go:66-146 TestWriteAndWriteAgain
  test("reopen continues sequence (durability)") {
    import spark.implicits._
    val dir = logDir("reopen")
    val log1 =
      ParquetLog.open(spark, dir, org.apache.spark.sql.types.IntegerType)
    log1.appendValues(Seq(1, 2, 3))
    val log2 =
      ParquetLog.open(spark, dir, org.apache.spark.sql.types.IntegerType)
    assert(log2.seq == 2L)
    val next = log2.appendValues(Seq(4, 5, 6))
    assert(next == 3L)
    assert(
      log2.query().collect().toSeq.map(_.getInt(0)) == Seq(1, 2, 3, 4, 5, 6))
  }
}

class LogSpec extends ParquetLogContract {
  def backend = "parquet"
  def fsPrefix = ""
}

/** The Hadoop FileSystem leg of the storage matrix: every metadata
  * operation (manifest commit, segment publish, fsck sweep, direct
  * point reads) routed through [[graft.storage.HadoopFileIO]] — the
  * code path an HDFS/object-store deployment takes — driven on local
  * disk via the `file:` scheme. */
class LogHadoopSpec extends ParquetLogContract {
  def backend = "parquet-hadoopfs"
  def fsPrefix = "file:"
}

/** In-memory backend leg (reference: mem/log.go behind the same
  * registry) — the whole contract again, no filesystem. */
class MemLogSpec extends LogContractSpec {
  def backend = "mem"
  def openLog(valueType: DataType): Log = MemLog.open(spark, valueType)
}
