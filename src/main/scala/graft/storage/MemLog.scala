package graft.storage

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.DataType

import graft.core._

/** In-memory [[Log]] backend — the reference's `mem/log.go:18-76`
  * (a slice of values behind the same interface): driver-held rows,
  * no durability, instant point ops. Exists for the conformance
  * MATRIX (every contract suite runs over both backends, like the
  * reference's registry, test/registry.go:9-23) and for tests/tools
  * that want log semantics without filesystem churn.
  *
  * Scale note, by design: this backend IS the driver's heap — exactly
  * like the reference's mem log is its process heap. Queries still go
  * through the shared QuerySpec → DataFrame lowering (`toDF`
  * parallelizes the rows), so plan-level behavior matches the durable
  * backend; only storage differs.
  */
final class MemLog(
    val spark: SparkSession,
    val valueType: DataType
) extends Log {

  // (value in external row form, nulled); index == seq (dense)
  private val rows = ArrayBuffer.empty[(Any, Boolean)]

  override def seq: Long = synchronized { rows.length - 1L }

  override def toDF: DataFrame = synchronized {
    val data = rows.zipWithIndex.map { case ((v, n), i) =>
      Row(i.toLong, v, n)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, math.max(1, data.length / 1024)),
      rowSchema
    )
  }

  override def append(values: DataFrame): Long = synchronized {
    val base = rows.length.toLong
    val vCol = values.columns.head
    values
      .select(org.apache.spark.sql.functions.col(vCol))
      .collect()
      .foreach(r => rows += ((r.get(0), false)))
    base
  }

  private def boundsCheck(seqNo: Long): Int = {
    if (seqNo < 0 || seqNo >= rows.length)
      throw GraftErrors.ErrOutOfBounds(seqNo)
    seqNo.toInt
  }

  override def get(seqNo: Long): Row = synchronized {
    val i = boundsCheck(seqNo)
    val (v, nulled) = rows(i)
    if (nulled) throw GraftErrors.ErrNulled(seqNo)
    Row(seqNo, v, nulled)
  }

  override def getMany(seqNos: Seq[Long]): Array[Row] = synchronized {
    seqNos.distinct.sorted
      .filter(s => s >= 0 && s < rows.length)
      .map { s =>
        val (v, nulled) = rows(s.toInt)
        Row(s, v, nulled)
      }
      .toArray
  }

  override def nullAt(seqNo: Long): Unit = synchronized {
    val i = boundsCheck(seqNo)
    rows(i) = (null, true)
  }

  override def replace(seqNo: Long, newValue: Column): Unit = synchronized {
    val i = boundsCheck(seqNo)
    // evaluate the Column expression once through the engine so struct/
    // cast semantics match the durable backend exactly
    val v = spark
      .range(1)
      .select(newValue.cast(valueType).as("value"))
      .collect()
      .head
      .get(0)
    rows(i) = (v, false)
  }

  /** Memory is trivially consistent (and repair has nothing to do). */
  override def checkConsistency(
      repair: Boolean = false,
      minAgeMs: Long = 600000L
  ): List[String] = Nil
}

object MemLog {
  def open(spark: SparkSession, valueType: DataType): MemLog =
    new MemLog(spark, valueType)
}
