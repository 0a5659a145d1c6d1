package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.IntegerType

import graft.storage.ParquetLog

/** Crash-consistency contract (reference: offset2/log.go:217-344
  * checkJournal/CheckConsistency + rw_test.go:148-191 TestRecover):
  * orphan segments from a crashed append are invisible and sweepable;
  * missing files and gaps are reported.
  */
class ConsistencySpec extends SparkSpec {
  import spark.implicits._

  test("orphan data file (crashed append) detected and swept") {
    val dir = tmpDir("fsck")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    // simulate a crash between segment write and manifest commit
    Files.write(
      Paths.get(dir, "data", "seg-999999999999-orphan.parquet"),
      Array[Byte](1, 2, 3)
    )
    val problems = log.checkConsistency()
    assert(problems.exists(_.contains("orphan")))
    // orphan is invisible to reads
    assert(log.query().count() == 3)
    // repair sweeps it
    log.checkConsistency(repair = true)
    assert(log.checkConsistency() == Nil)
  }

  test("missing segment file reported") {
    val dir = tmpDir("fsck2")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    val seg = Files
      .list(Paths.get(dir, "data"))
      .iterator()
      .next()
    Files.delete(seg)
    val problems = log.checkConsistency()
    assert(problems.exists(_.contains("missing segment")))
  }

  test("stale second writer handle is refused, not lost-updated") {
    val dir = tmpDir("cas")
    val a = ParquetLog.open(spark, dir, IntegerType)
    val b = ParquetLog.open(spark, dir, IntegerType)
    a.appendValues(Seq(1, 2))
    intercept[graft.storage.Manifest.ConcurrentWriteException] {
      b.appendValues(Seq(3))
    }
    // A's commit is intact; a fresh handle sees it and can continue
    val c = ParquetLog.open(spark, dir, IntegerType)
    assert(c.seq == 1)
    c.appendValues(Seq(3))
    assert(c.seq == 2)
  }

  test("reopen after kill sees only committed state") {
    val dir = tmpDir("fsck3")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    // a fresh handle (≙ process restart) reads the manifest
    val log2 = ParquetLog.open(spark, dir, IntegerType)
    assert(log2.seq == 2)
    assert(log2.checkConsistency() == Nil)
  }
}
