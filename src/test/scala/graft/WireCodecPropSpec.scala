package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{CborCodec, MsgPackCodec, WireCodec}

/** Property fuzz for the hand-rolled wire codecs: arbitrary value
  * trees (nested maps/arrays over null/bool/long/double/string/bytes)
  * must round-trip bit-exactly through both msgpack and CBOR,
  * including the width-boundary integers each format encodes with a
  * different head. No Spark session needed.
  */
class WireCodecPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  private val genScalar: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.oneOf(true, false),
    Gen.long,
    // width boundaries both codecs switch heads at
    Gen.oneOf(0L, 1L, 23L, 24L, 31L, 32L, 127L, 128L, 255L, 256L,
      65535L, 65536L, -1L, -24L, -25L, -32L, -33L, -128L, -129L,
      -32768L, -32769L, Int.MaxValue.toLong, Int.MaxValue + 1L,
      Int.MinValue.toLong, Int.MinValue - 1L, Long.MaxValue, Long.MinValue),
    Gen.double.suchThat(d => !d.isNaN), // NaN != NaN breaks equality
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  )

  private def genTree(depth: Int): Gen[Any] =
    if (depth <= 0) genScalar
    else
      Gen.frequency(
        4 -> genScalar,
        2 -> Gen.listOfN(3, genTree(depth - 1)).map(_.toVector),
        2 -> Gen
          .listOfN(3, Gen.zip(Gen.alphaNumStr, genTree(depth - 1)))
          .map { kvs =>
            val m = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
            kvs.foreach { case (k, v) => m(k) = v }
            m
          }
      )

  /** Structural equality with Array[Byte] content compare. */
  private def eqTree(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (p, q) => eqTree(p, q) }
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      x.size == y.size && x.toSeq.zip(y.toSeq).forall {
        case ((ka, va), (kb, vb)) => eqTree(ka, kb) && eqTree(va, vb)
      }
    case (x, y) => x == y
  }

  private def roundtrips(codec: WireCodec): Unit = {
    val trees = samples(genTree(3), 300)
    assert(trees.nonEmpty)
    trees.foreach { t =>
      val back = codec.decode(codec.encode(t))
      assert(eqTree(t, back), s"${codec.name} round-trip diverged for: $t")
    }
  }

  test("msgpack: random trees round-trip bit-exactly")(roundtrips(MsgPackCodec))
  test("cbor: random trees round-trip bit-exactly")(roundtrips(CborCodec))

  test("integer heads are minimal-width at the boundaries") {
    // msgpack: 127 is a fixint (1 byte), 128 needs int16 head (we skip
    // uint8 on write since the value model is signed); -32 fixint, -33 int8
    assert(MsgPackCodec.encode(127L).length == 1)
    assert(MsgPackCodec.encode(-32L).length == 1)
    assert(MsgPackCodec.encode(-33L).length == 2)
    // cbor: 23 inline, 24 one extra byte, 256 two extra
    assert(CborCodec.encode(23L).length == 1)
    assert(CborCodec.encode(24L).length == 2)
    assert(CborCodec.encode(256L).length == 3)
    assert(CborCodec.encode(-25L).length == 2)
  }
}
