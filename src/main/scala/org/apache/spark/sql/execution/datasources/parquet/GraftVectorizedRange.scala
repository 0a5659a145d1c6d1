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
    * `requestedSchema`; `totalRows` = sum of those groups' counts. */
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
    reader.initialize(
      fileSchema,
      requestedSchema,
      new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup(): PageReadStore = pr.readNextRowGroup()
        override def close(): Unit = pr.close()
      },
      totalRows.toInt
    )
  }
}
