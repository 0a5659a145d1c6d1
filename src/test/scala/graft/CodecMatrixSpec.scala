package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.codec.Codecs
import graft.core.QuerySpec._
import graft.storage.ParquetLog

/** The reference runs its log conformance suite over a codec matrix
  * (offset2/test/test.go:22-38: json/msgpack/cbor). Our serde surface
  * is Encoder-typed structs and dynamic JSON strings (SURVEY §2.1
  * op 9) — the same golden vectors must hold over both value shapes.
  */
object CodecMatrixSpec {
  // top-level: Encoders cannot instantiate test-class inner classes
  case class Ev(foo: String, bar: Int)
}

class CodecMatrixSpec extends SparkSpec {
  import CodecMatrixSpec.Ev

  private def runVectors(values: ParquetLog => Unit, read: (ParquetLog, Long) => Ev): Unit = {
    val log = valuesLog(values)
    // gt0 / lte1 / limit2 / reverse — the core spec vectors
    assert(
      log.query(Gt(0), SeqWrap(true)).collect().map(_.getLong(0)).toSeq
        == Seq(1L, 2L)
    )
    assert(
      log.query(Lte(1), SeqWrap(true)).collect().map(_.getLong(0)).toSeq
        == Seq(0L, 1L)
    )
    assert(
      log.query(Reverse(true), Limit(1), SeqWrap(true)).collect()
        .map(_.getLong(0)).toSeq == Seq(2L)
    )
    // typed point read round-trips the codec
    assert(read(log, 1L) == Ev("world", 42))
  }

  private def valuesLog(fill: ParquetLog => Unit): ParquetLog = {
    val dir = tmpDir("codec")
    val log = ParquetLog.open(
      spark,
      dir,
      StructType(Seq(StructField("foo", StringType), StructField("bar", IntegerType)))
    )
    fill(log)
    log
  }

  test("typed Encoder codec (struct values)") {
    import spark.implicits._
    runVectors(
      log =>
        log.append(
          Codecs.fromTyped(
            spark.createDataset(Seq(Ev("hello", 23), Ev("world", 42), Ev("moar", 7)))
          )
        ),
      (log, seq) => {
        val s = log.get(seq).getStruct(1)
        Ev(s.getString(0), s.getInt(1))
      }
    )
  }

  test("dynamic JSON codec (string values)") {
    import spark.implicits._
    val dir = tmpDir("codecjson")
    val log = ParquetLog.open(spark, dir, StringType)
    log.appendValues(
      Seq("""{"foo":"hello","bar":23}""", """{"foo":"world","bar":42}""",
        """{"foo":"moar","bar":7}""")
    )
    assert(
      log.query(Gt(0), SeqWrap(true)).collect().map(_.getLong(0)).toSeq
        == Seq(1L, 2L)
    )
    // decode through the codec layer: schema inference + from_json
    val schema = Codecs.inferJsonSchema(log.toDF.select(col("value")), "value")
    val decoded = log
      .query(SeqWrap(true))
      .select(col("seq"), Codecs.decodeJson(col("value"), schema).as("v"))
      .where(col("seq") === 1)
      .collect()(0)
    assert(decoded.getStruct(1).getAs[String]("foo") == "world")
    assert(decoded.getStruct(1).getAs[Long]("bar") == 42L)
    // and re-encode round-trips
    val rt = log
      .query(SeqWrap(true))
      .select(
        Codecs.encodeJson(Codecs.decodeJson(col("value"), schema)).as("j")
      )
      .collect()
      .map(_.getString(0))
    assert(rt.forall(_.contains("\"foo\"")))
  }
}
