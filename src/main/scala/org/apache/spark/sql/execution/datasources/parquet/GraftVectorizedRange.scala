package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Lives in Spark's parquet package for one reason: the
  * `ParquetRowGroupReader` hand-off interface of
  * [[SpecificParquetRecordReaderBase]] is package-private, and it is
  * the only public-`initialize` route that lets a caller feed the
  * vectorized decoder a RANGE-limited set of row groups (graft's
  * row-group-aligned splits of oversized segments,
  * `graft.sources.SegmentPacking`). No Spark internals are touched
  * beyond implementing that interface over a parquet-mr reader the
  * caller opened with `withRange`. */
object GraftVectorizedRange {

  /** Hand `reader` the row groups `pr` yields (already filtered to
    * the caller's byte range at open), projected to
    * `requestedSchema`; `totalRows` = sum of those groups' counts.
    *
    * Every public `initialize` overload of the vectorized reader
    * builds a FRESH Hadoop conf that pins `int96AsTimestamp=false` —
    * an INT96 timestamp column (Spark's writer DEFAULT for
    * TimestampType) would be refused at schema conversion, even
    * though the decoder itself handles INT96 natively. So instead of
    * calling an overload, this sets the reader's protected fields
    * (same package) to a conf matching what Spark's real file-source
    * path resolves — binaryAsString=false, int96AsTimestamp=TRUE,
    * NTZ inference on — and invokes the private `initializeInternal`
    * (the one line every overload ends with) reflectively. */
  def initialize(
      reader: VectorizedParquetRecordReader,
      fileSchema: MessageType,
      requestedSchema: MessageType,
      pr: ParquetFileReader,
      totalRows: Long
  ): Unit = {
    require(totalRows <= Int.MaxValue,
      s"split row count $totalRows exceeds the vectorized reader's int " +
        "counter — shrink maxPartitionBytes")
    reader.configuration = readConf
    reader.fileSchema = fileSchema
    reader.requestedSchema = requestedSchema
    reader.totalRowCount = totalRows
    val parquetColumn = new ParquetToSparkSchemaConverter(readConf)
      .convertParquetColumn(requestedSchema, scala.Option.empty)
    reader.parquetColumn = parquetColumn
    reader.sparkSchema =
      parquetColumn.sparkType.asInstanceOf[org.apache.spark.sql.types.StructType]
    reader.reader = new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
      override def readNextRowGroup(): PageReadStore = pr.readNextRowGroup()
      override def close(): Unit = pr.close()
    }
    try initInternal.invoke(reader)
    catch {
      case e: java.lang.reflect.InvocationTargetException =>
        throw e.getCause
    }
  }

  /** Shared, effectively-immutable read conf (built once — the open
    * path runs once per segment FILE, so per-call construction was
    * pure hot-path overhead). Nothing mutates it after init; the
    * readers only ever read keys. */
  private val readConf: org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    val sq = org.apache.spark.sql.internal.SQLConf
    conf.setBoolean(sq.PARQUET_BINARY_AS_STRING.key, false)
    conf.setBoolean(sq.PARQUET_INT96_AS_TIMESTAMP.key, true)
    conf.setBoolean(sq.CASE_SENSITIVE.key, false)
    conf.setBoolean(sq.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, true)
    conf.setBoolean(sq.LEGACY_PARQUET_NANOS_AS_LONG.key, false)
    conf
  }

  private val initInternal: java.lang.reflect.Method = {
    val m = classOf[VectorizedParquetRecordReader]
      .getDeclaredMethod("initializeInternal")
    m.setAccessible(true)
    m
  }
}
