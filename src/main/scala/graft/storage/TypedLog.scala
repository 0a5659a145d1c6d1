package graft.storage

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.QuerySpec

/** Typed facade over any [[Log]] backend — the prototype-typed codec
  * path of the reference (`NewLog(codec.New(tipe))`): values are case
  * classes, `Encoder`-serialized into the log's struct column.
  *
  * {{{
  *   case class Ev(foo: String, bar: Int)
  *   val log = TypedLog.open[Ev](spark, dir)           // durable
  *   val mem = TypedLog.of[Ev](MemLog.open(spark, ...)) // any backend
  *   log.append(Seq(Ev("hello", 23)))
  *   val vs: Seq[Ev] = log.query(Gte(1), Limit(2))
  * }}}
  */
final class TypedLog[T: Encoder] private[storage] (val underlying: Log) {

  private def spark: SparkSession = underlying.spark
  def seq: Long = underlying.seq

  def append(values: Seq[T]): Long = {
    val ds = spark.createDataset(values)(implicitly[Encoder[T]])
    underlying.append(graft.codec.Codecs.fromTyped(ds))
  }

  /** Typed point read (ErrNulled / ErrOutOfBounds as in the raw API). */
  def get(seqNo: Long): T = {
    val row = underlying.get(seqNo)
    rowToValue(row.getStruct(1))
  }

  /** Typed query drain: values in spec order (nulled entries excluded
    * — the typed surface has no null sentinel; use the raw API for
    * redaction-aware streams). */
  def query(specs: QuerySpec*): Seq[T] =
    typedDs(specs: _*).collect().toSeq

  /** The query as a Dataset[T] for further composition. */
  def typedDs(specs: QuerySpec*): Dataset[T] =
    underlying
      .query(specs: _*)
      .where(!col("nulled"))
      .select("value.*")
      .as[T](implicitly[Encoder[T]])

  private def rowToValue(struct: org.apache.spark.sql.Row): T = {
    // single-row round trip through the encoder
    val df = spark.createDataFrame(
      java.util.List.of(struct),
      implicitly[Encoder[T]].schema
    )
    df.as[T](implicitly[Encoder[T]]).collect()(0)
  }
}

object TypedLog {
  def open[T: Encoder](spark: SparkSession, dir: String): TypedLog[T] = {
    val schema = implicitly[Encoder[T]].schema
    new TypedLog[T](ParquetLog.open(spark, dir, schema))
  }

  /** Wrap an already-open backend (e.g. a [[MemLog]]) — the value type
    * must match the encoder's struct schema. */
  def of[T: Encoder](log: Log): TypedLog[T] = new TypedLog[T](log)
}
