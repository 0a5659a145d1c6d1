package graft.codec

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
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
  * Binary wire interchange: [[MsgPackCodec]] and [[CborCodec]] —
  * hand-rolled to the public specs (msgpack.org spec; RFC 8949) —
  * encode each row as one frame via [[encodeWire]]/[[decodeWire]],
  * completing the reference's codec set (codec/{json,msgpack,cbor}).
  * Inside the engine values remain parquet-encoded columns; the wire
  * codecs matter at import/export boundaries. The codec-matrix
  * conformance idea (offset2/test/test.go:22-38) runs the golden
  * vectors over typed, JSON, msgpack and CBOR paths
  * (CodecMatrixSpec; q30/q44/q45 oracle the decode paths end-to-end).
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

  // ---- binary wire codecs (msgpack / CBOR) -------------------------

  /** Spark row → wire value tree, driven by the schema (structs become
    * insertion-ordered field maps, matching the reference's map-encoded
    * structs). Runs inside Dataset.map — executor-side, no driver
    * funnel. */
  private[codec] def toTree(v: Any, dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    if (v == null) return null
    dt match {
      case st: StructType =>
        val r = v.asInstanceOf[org.apache.spark.sql.Row]
        val m = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          m(f.name) = toTree(r.get(i), f.dataType)
        }
        m
      case at: ArrayType =>
        v.asInstanceOf[scala.collection.Seq[Any]].toVector
          .map(toTree(_, at.elementType))
      case mt: MapType =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
        v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, mv) =>
          m(toTree(k, mt.keyType)) = toTree(mv, mt.valueType)
        }
        m
      case ByteType | ShortType | IntegerType | LongType =>
        v match {
          case b: Byte  => b.toLong
          case s: Short => s.toLong
          case i: Int   => i.toLong
          case l: Long  => l
        }
      case FloatType | DoubleType | StringType | BooleanType | BinaryType => v
      case other =>
        throw new UnsupportedOperationException(
          s"wire codec: unsupported Spark type $other")
    }
  }

  /** Wire value tree → external row value per the schema (inverse of
    * [[toTree]]; integral widths narrowed back from Long). */
  private[codec] def fromTree(v: Any, dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    if (v == null) return null
    dt match {
      case st: StructType =>
        val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
        org.apache.spark.sql.Row.fromSeq(
          st.fields.toIndexedSeq.map(f => fromTree(m.getOrElse(f.name, null), f.dataType))
        )
      case at: ArrayType =>
        v.asInstanceOf[Seq[Any]].map(fromTree(_, at.elementType))
      case mt: MapType =>
        v.asInstanceOf[scala.collection.Map[Any, Any]].map { case (k, mv) =>
          fromTree(k, mt.keyType) -> fromTree(mv, mt.valueType)
        }.toMap
      case ByteType    => v.asInstanceOf[Long].toByte
      case ShortType   => v.asInstanceOf[Long].toShort
      case IntegerType => v.asInstanceOf[Long].toInt
      case LongType    => v.asInstanceOf[Long]
      case FloatType =>
        v match { case f: Float => f; case d: Double => d.toFloat }
      case DoubleType | StringType | BooleanType | BinaryType => v
      case other =>
        throw new UnsupportedOperationException(
          s"wire codec: unsupported Spark type $other")
    }
  }

  /** Encode each row of `df` into one wire frame (the reference's
    * one-frame-per-entry discipline). Returns a `bytes BINARY`
    * single-column DataFrame; schema travels separately (the codec is
    * prototype-typed, codec.go:12-31). */
  def encodeWire(df: DataFrame, codec: WireCodec): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    df.map(row => codec.encode(toTree(row, schema)))(Encoders.BINARY)
      .toDF("bytes")
  }

  /** Decode wire frames back into rows of `schema` — the typed decode
    * path. One executor-side map, no shuffle. */
  def decodeWire(
      frames: DataFrame,
      schema: org.apache.spark.sql.types.StructType,
      codec: WireCodec
  ): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .select(col(frames.columns.head))
      .as[Array[Byte]]
      .map(b =>
        fromTree(codec.decode(b), schema)
          .asInstanceOf[org.apache.spark.sql.Row]
      )(org.apache.spark.sql.Encoders.row(schema))
  }
}
