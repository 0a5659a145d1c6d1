package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.core.QuerySpec._
import graft.storage.{Log, MemLog, ParquetLog}

/** Redaction vectors ported from the reference
  * (offset2/alter_test.go:24-136, alter_replace_test.go:22-137):
  * null every position × reread × stream-drain; replace and reread.
  * Fixture: the reference's testEvent{Foo,Bar} values. Runs over both
  * [[Log]] backends (registry matrix, test/registry.go:9-23).
  */
abstract class AlterContractSpec extends SparkSpec {
  import spark.implicits._

  def backend: String
  def openLog(valueType: DataType): Log

  private val fixture = Seq(
    ("hello", 23), ("world", 42), ("world", 161), ("world", 1312),
    ("moar", 1234)
  )

  private def valueType = StructType(
    Seq(StructField("foo", StringType), StructField("bar", IntegerType))
  )

  private def mkLog(): Log = {
    val log = openLog(valueType)
    log.append(
      fixture.toDF("foo", "bar").select(struct($"foo", $"bar").as("value"))
    )
    log
  }

  test(s"[$backend] null every position: get errors, stream yields sentinel row") {
    fixture.indices.foreach { i =>
      val log = mkLog()
      log.nullAt(i.toLong)
      // point read → ErrNulled (offset2/log.go:364-367)
      intercept[GraftErrors.ErrNulled](log.get(i.toLong))
      // neighbors unaffected
      fixture.indices.filterNot(_ == i).foreach { j =>
        val r = log.get(j.toLong)
        assert(r.getStruct(1).getString(0) == fixture(j)._1)
        assert(r.getStruct(1).getInt(1) == fixture(j)._2)
      }
      // stream drain: nulled row present as (seq, null, true), stream
      // does NOT fail (offset2/qry.go:159-162)
      val rows = log.query(SeqWrap(true)).collect()
      assert(rows.length == fixture.length)
      val nulledRow = rows.find(_.getLong(0) == i).get
      assert(nulledRow.isNullAt(1) && nulledRow.getBoolean(2))
      assert(rows.count(_.getBoolean(2)) == 1)
    }
  }

  test(s"[$backend] null is idempotent") {
    val log = mkLog()
    log.nullAt(2)
    log.nullAt(2)
    intercept[GraftErrors.ErrNulled](log.get(2))
    assert(log.query(SeqWrap(true)).collect().length == 5)
  }

  test(s"[$backend] replace overwrites in place, neighbors and seqs untouched") {
    val log = mkLog()
    log.replace(1, struct(lit("REPLACE").as("foo"), lit(0).as("bar")))
    val r = log.get(1)
    assert(r.getStruct(1).getString(0) == "REPLACE")
    assert(r.getStruct(1).getInt(1) == 0)
    val seqs = log.query(SeqWrap(true)).collect().map(_.getLong(0)).toSeq
    assert(seqs == Seq(0L, 1L, 2L, 3L, 4L))
    assert(log.get(0).getStruct(1).getString(0) == "hello")
    assert(log.checkConsistency() == Nil)
  }

  test(s"[$backend] replace after null clears the redaction") {
    val log = mkLog()
    log.nullAt(3)
    intercept[GraftErrors.ErrNulled](log.get(3))
    log.replace(3, struct(lit("back").as("foo"), lit(7).as("bar")))
    assert(log.get(3).getStruct(1).getString(0) == "back")
  }

  test(s"[$backend] alter out of bounds") {
    val log = mkLog()
    intercept[GraftErrors.ErrOutOfBounds](log.nullAt(99))
    intercept[GraftErrors.ErrOutOfBounds](
      log.replace(-1, struct(lit("x").as("foo"), lit(1).as("bar")))
    )
  }
}

class AlterSpec extends AlterContractSpec {
  def backend = "parquet"
  def openLog(valueType: DataType): Log =
    ParquetLog.open(spark, tmpDir("alter"), valueType)
}

class MemAlterSpec extends AlterContractSpec {
  def backend = "mem"
  def openLog(valueType: DataType): Log = MemLog.open(spark, valueType)
}
