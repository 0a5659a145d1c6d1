package graft.codec

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Value serde — the reference's pluggable `Codec` SPI (codec.go:12-31,
  * codec/{json,msgpack,cbor}) re-expressed for Spark:
  *
  *   - typed mode (codec constructed with a prototype `tipe`) =
  *     `Encoder[T]`: [[asTyped]] / [[fromTyped]]
  *   - dynamic mode (`tipe == nil`, decode into interface{}) = raw
  *     JSON strings decoded structurally: [[decodeJson]] with an
  *     explicit or inferred schema, [[encodeJson]] to serialize
  *
  * Byte-level msgpack/CBOR compatibility is intentionally out of
  * scope (SURVEY §7.3): inside the engine values are parquet-encoded
  * columns; wire codecs only matter at import/export boundaries, where
  * `encodeJson`/`decodeJson` are the supported interchange. The
  * codec-matrix conformance idea (offset2/test/test.go:22-38) maps to
  * running the log suites over both the typed and JSON paths.
  */
object Codecs {

  /** Decode a JSON string column with a known schema (typed decode). */
  def decodeJson(c: Column, schema: DataType): Column =
    from_json(c, schema)

  /** Infer the schema of a JSON value column from data (dynamic mode);
    * driver-side sampling, mirroring `tipe == nil`. */
  def inferJsonSchema(df: DataFrame, jsonCol: String): DataType = {
    val sample = df
      .select(col(jsonCol))
      .na
      .drop()
      .limit(1000)
      .collect()
      .map(_.getString(0))
    val spark = df.sparkSession
    import spark.implicits._
    spark.read.json(spark.createDataset(sample)).schema
  }

  /** Serialize any column to its JSON text form. */
  def encodeJson(c: Column): Column = to_json(c)

  /** Typed view of a log value column (Encoder-based = the prototype-
    * typed codec path). */
  def asTyped[T: Encoder](df: DataFrame, valueCol: String = "value"): Dataset[T] =
    df.select(col(valueCol)).as[T](implicitly[Encoder[T]])

  /** Encode typed values into a single `value` column DataFrame. */
  def fromTyped[T](ds: Dataset[T]): DataFrame =
    ds.toDF().select(struct(ds.columns.map(col).toIndexedSeq: _*).as("value"))

  /** Export a log's entries as JSON lines — the wire-interchange
    * sink (one JSON object per entry, seq + nulled carried; the
    * reference's codec frames map to one text line per frame). */
  def exportJsonl(log: graft.storage.ParquetLog, path: String): Unit =
    log.toDF
      .select(to_json(struct(col("seq"), col("value"), col("nulled"))).as("value"))
      .write
      .mode("overwrite")
      .text(path)

  /** Import JSON-lines values into a single `value STRING` column
    * DataFrame ready for [[graft.storage.ParquetLog.append]] —
    * dynamic-schema ingestion (`tipe == nil` mode). */
  def importJsonl(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): DataFrame =
    spark.read.text(path).select(col("value").cast("string").as("value"))
}
