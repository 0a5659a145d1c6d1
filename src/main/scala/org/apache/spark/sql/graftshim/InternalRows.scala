package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Engine shim (lives under `org.apache.spark.sql` for `private[sql]`
  * access): wrap an `RDD[InternalRow]` as a DataFrame WITHOUT the
  * external-Row encoder round-trip — the piece
  * [[graft.storage.ParquetLog]]'s pinned dense-seq stamping needs to
  * stay in Tungsten while sharing ONE RDD lineage between its count
  * and write passes (the rdd.zipWithIndex safety property, minus its
  * per-row decode/re-encode cost). Pure plumbing over Spark's own
  * `internalCreateDataFrame`; no behavior is modified. */
object InternalRows {
  def toDF(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
