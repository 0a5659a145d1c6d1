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

  test("msgpack golden wire vectors (spec examples)") {
    import graft.codec.MsgPackCodec
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    // fixint / negative fixint / nil / bool
    assert(hex(MsgPackCodec.encode(7L)) == "07")
    assert(hex(MsgPackCodec.encode(-1L)) == "ff")
    assert(hex(MsgPackCodec.encode(null)) == "c0")
    assert(hex(MsgPackCodec.encode(true)) == "c3")
    // int widths: EVERY int takes the smallest SIGNED slot that fits —
    // byte-identical to the reference's ugorji MsgpackHandle with
    // Canonical=true and PositiveIntUnsigned left false
    // (codec/msgpack/msgpack.go:21-22): 200 is int16 d100c8, never
    // uint8 ccc8
    assert(hex(MsgPackCodec.encode(200L)) == "d100c8")
    assert(hex(MsgPackCodec.encode(40000L)) == "d200009c40")
    assert(hex(MsgPackCodec.encode(100000L)) == "d2000186a0")
    assert(hex(MsgPackCodec.encode(1L << 40)) == "d3000001" + "0000000000")
    // the unsigned family is still ACCEPTED on decode (foreign frames)
    assert(MsgPackCodec.decode(Array(0xcc, 0xc8).map(_.toByte)) == 200L)
    assert(MsgPackCodec.decode(
      Array(0xcd, 0x9c, 0x40).map(_.toByte)) == 40000L)
    assert(hex(MsgPackCodec.encode(-200L)) == "d1ff38")
    assert(hex(MsgPackCodec.encode(-100000L)) == "d2fffe7960")
    // the spec's canonical {"compact":true,"schema":0} example
    val m = scala.collection.mutable.LinkedHashMap[Any, Any](
      "compact" -> true, "schema" -> 0L)
    assert(hex(MsgPackCodec.encode(m)) == "82a7636f6d70616374c3a6736368656d6100")
    // double
    assert(hex(MsgPackCodec.encode(1.5)) == "cb3ff8000000000000")
    // round-trip of a nested tree
    val tree = scala.collection.mutable.LinkedHashMap[Any, Any](
      "s" -> "héllo", "xs" -> Vector(1L, null, false, 2.25),
      "b" -> Array[Byte](1, 2, 3))
    val back = MsgPackCodec
      .decode(MsgPackCodec.encode(tree))
      .asInstanceOf[scala.collection.Map[Any, Any]]
    assert(back("s") == "héllo")
    assert(back("xs") == Vector(1L, null, false, 2.25))
    assert(back("b").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
  }

  test("cbor golden wire vectors (RFC 8949 appendix A)") {
    import graft.codec.CborCodec
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    // RFC 8949 Appendix A examples
    assert(hex(CborCodec.encode(0L)) == "00")
    assert(hex(CborCodec.encode(10L)) == "0a")
    assert(hex(CborCodec.encode(25L)) == "1819")
    assert(hex(CborCodec.encode(1000L)) == "1903e8")
    assert(hex(CborCodec.encode(-10L)) == "29")
    assert(hex(CborCodec.encode(-1000L)) == "3903e7")
    assert(hex(CborCodec.encode("IETF")) == "6449455446")
    assert(hex(CborCodec.encode(Vector(1L, 2L, 3L))) == "83010203")
    assert(hex(CborCodec.encode(null)) == "f6")
    assert(hex(CborCodec.encode(false)) == "f4")
    assert(hex(CborCodec.encode(1.1)) == "fb3ff199999999999a")
    val m = scala.collection.mutable.LinkedHashMap[Any, Any](
      "a" -> 1L, "b" -> Vector(2L, 3L))
    assert(hex(CborCodec.encode(m)) == "a26161016162820203")
    // round-trip
    val back = CborCodec.decode(CborCodec.encode(m))
      .asInstanceOf[scala.collection.Map[Any, Any]]
    assert(back("a") == 1L && back("b") == Vector(2L, 3L))
  }

  test("wire codec matrix: log round-trip through msgpack and cbor frames") {
    import spark.implicits._
    import graft.codec.{CborCodec, MsgPackCodec}
    for (codec <- Seq(MsgPackCodec, CborCodec)) {
      val log = valuesLog(l =>
        l.append(Codecs.fromTyped(spark.createDataset(
          Seq(Ev("hello", 23), Ev("world", 42), Ev("moar", 7))))))
      val df = log.query(SeqWrap(true)).select(col("seq"), col("value"))
      val frames = Codecs.encodeWire(df, codec)
      val back = Codecs.decodeWire(frames, df.schema, codec)
      val got = back
        .orderBy("seq")
        .collect()
        .map(r => (r.getLong(0), r.getStruct(1).getString(0), r.getStruct(1).getInt(1)))
        .toSeq
      assert(
        got == Seq((0L, "hello", 23), (1L, "world", 42), (2L, "moar", 7)),
        s"codec ${codec.name}")
    }
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

  test("cbor decode accepts the RFC's preferred/indefinite forms") {
    import graft.codec.CborCodec
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // float16 (preferred serialization for exactly-representable
    // values): 1.5 = f9 3e00, -0.0 = f9 8000, Infinity = f9 7c00
    assert(CborCodec.decode(b(0xf9, 0x3e, 0x00)) == 1.5)
    assert(CborCodec.decode(b(0xf9, 0x7c, 0x00)) ==
      Double.PositiveInfinity)
    // subnormal: 2^-24
    assert(CborCodec.decode(b(0xf9, 0x00, 0x01)) == math.pow(2, -24))
    // indefinite-length array [1, 2]: 9f 01 02 ff
    assert(CborCodec.decode(b(0x9f, 0x01, 0x02, 0xff)) ==
      Vector(1L, 2L))
    // indefinite-length map {"a": 1}: bf 61 61 01 ff
    val m = CborCodec.decode(b(0xbf, 0x61, 0x61, 0x01, 0xff))
      .asInstanceOf[scala.collection.Map[Any, Any]]
    assert(m("a") == 1L)
    // indefinite text string "ab" in two chunks: 7f 61 61 61 62 ff
    assert(CborCodec.decode(b(0x7f, 0x61, 0x61, 0x61, 0x62, 0xff)) == "ab")
    // a bare break is still refused
    intercept[IllegalArgumentException] { CborCodec.decode(b(0xff)) }
  }
}
