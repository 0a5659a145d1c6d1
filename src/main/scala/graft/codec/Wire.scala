package graft.codec

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

/** Wire-interchange value tree shared by the binary codecs: null,
  * Boolean, Long (all integrals), Float, Double, String, Array[Byte],
  * Seq[Any], and an insertion-ordered Map[String, Any] for structs.
  * This mirrors the reference codec SPI's `interface{}` value model
  * (codec.go:12-31) — the codecs below are hand-rolled to the PUBLIC
  * format specs (no library deps in this build).
  */
trait WireCodec extends Serializable {
  def name: String
  def encode(v: Any): Array[Byte]
  def decode(bytes: Array[Byte]): Any
}

/** MessagePack (msgpack.org spec): the subset covering the value tree
  * — nil/bool/int/float/str/bin/array/map families, with the smallest
  * applicable encoding on write and the full family set on read.
  * Reference behavior twin: codec/msgpack/msgpack.go:20-76.
  */
object MsgPackCodec extends WireCodec {
  val name = "msgpack"

  def encode(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val o = new DataOutputStream(bos)
    write(o, v)
    bos.toByteArray
  }

  private def write(o: DataOutputStream, v: Any): Unit = v match {
    case null       => o.writeByte(0xc0)
    case b: Boolean => o.writeByte(if (b) 0xc3 else 0xc2)
    case n: Byte    => writeLong(o, n.toLong)
    case n: Short   => writeLong(o, n.toLong)
    case n: Int     => writeLong(o, n.toLong)
    case n: Long    => writeLong(o, n)
    case f: Float   => o.writeByte(0xca); o.writeFloat(f)
    case d: Double  => o.writeByte(0xcb); o.writeDouble(d)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) o.writeByte(0xa0 | b.length)
      else if (b.length < 256) { o.writeByte(0xd9); o.writeByte(b.length) }
      else if (b.length < 65536) { o.writeByte(0xda); o.writeShort(b.length) }
      else { o.writeByte(0xdb); o.writeInt(b.length) }
      o.write(b)
    case b: Array[Byte] =>
      if (b.length < 256) { o.writeByte(0xc4); o.writeByte(b.length) }
      else if (b.length < 65536) { o.writeByte(0xc5); o.writeShort(b.length) }
      else { o.writeByte(0xc6); o.writeInt(b.length) }
      o.write(b)
    case xs: Seq[_] =>
      if (xs.length < 16) o.writeByte(0x90 | xs.length)
      else if (xs.length < 65536) { o.writeByte(0xdc); o.writeShort(xs.length) }
      else { o.writeByte(0xdd); o.writeInt(xs.length) }
      xs.foreach(write(o, _))
    case m: scala.collection.Map[_, _] =>
      if (m.size < 16) o.writeByte(0x80 | m.size)
      else if (m.size < 65536) { o.writeByte(0xde); o.writeShort(m.size) }
      else { o.writeByte(0xdf); o.writeInt(m.size) }
      m.foreach { case (k, mv) => write(o, k); write(o, mv) }
    case other =>
      throw new IllegalArgumentException(
        s"msgpack: unsupported value ${other.getClass}")
  }

  private def writeLong(o: DataOutputStream, n: Long): Unit =
    // SIGNED family for every int, smallest signed width that fits —
    // byte-identical to the reference's encoder (codec/msgpack/
    // msgpack.go:21-22 uses ugorji MsgpackHandle{Canonical:true} whose
    // PositiveIntUnsigned defaults to FALSE, so 200 encodes d100c8 in
    // the int16 slot, not ccc8). The unsigned family (0xcc-0xcf) is
    // accepted on decode for foreign frames but never emitted.
    if (n >= -32 && n <= 127) o.writeByte(n.toInt) // pos/neg fixint
    else if (n >= Byte.MinValue && n <= Byte.MaxValue) { o.writeByte(0xd0); o.writeByte(n.toInt) }
    else if (n >= Short.MinValue && n <= Short.MaxValue) { o.writeByte(0xd1); o.writeShort(n.toInt) }
    else if (n >= Int.MinValue && n <= Int.MaxValue) { o.writeByte(0xd2); o.writeInt(n.toInt) }
    else { o.writeByte(0xd3); o.writeLong(n) }

  def decode(bytes: Array[Byte]): Any = {
    val r = new Reader(bytes)
    val v = read(r)
    require(r.pos == bytes.length, s"msgpack: ${bytes.length - r.pos} trailing bytes")
    v
  }

  private final class Reader(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16().toLong
    def i64(): Long = (u32() << 32) | u32()
    def take(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
  }

  private def read(r: Reader): Any = {
    val t = r.u8()
    if (t < 0x80) t.toLong // positive fixint
    else if (t >= 0xe0) (t - 256).toLong // negative fixint
    else if ((t & 0xf0) == 0x80) readMap(r, t & 0x0f)
    else if ((t & 0xf0) == 0x90) readArr(r, t & 0x0f)
    else if ((t & 0xe0) == 0xa0) readStr(r, t & 0x1f)
    else t match {
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => r.take(r.u8())
      case 0xc5 => r.take(r.u16())
      case 0xc6 => r.take(r.u32().toInt)
      case 0xca => java.lang.Float.intBitsToFloat(r.u32().toInt)
      case 0xcb => java.lang.Double.longBitsToDouble(r.i64())
      case 0xcc => r.u8().toLong
      case 0xcd => r.u16().toLong
      case 0xce => r.u32()
      case 0xcf => r.i64() // uint64 read as signed (value model is Long)
      case 0xd0 => r.u8().toByte.toLong
      case 0xd1 => r.u16().toShort.toLong
      case 0xd2 => r.u32().toInt.toLong
      case 0xd3 => r.i64()
      case 0xd9 => readStr(r, r.u8())
      case 0xda => readStr(r, r.u16())
      case 0xdb => readStr(r, r.u32().toInt)
      case 0xdc => readArr(r, r.u16())
      case 0xdd => readArr(r, r.u32().toInt)
      case 0xde => readMap(r, r.u16())
      case 0xdf => readMap(r, r.u32().toInt)
      case other =>
        throw new IllegalArgumentException(f"msgpack: unsupported tag 0x$other%02x")
    }
  }

  private def readStr(r: Reader, n: Int): String =
    new String(r.take(n), StandardCharsets.UTF_8)
  private def readArr(r: Reader, n: Int): Vector[Any] =
    Vector.fill(n)(read(r))
  private def readMap(r: Reader, n: Int): scala.collection.Map[Any, Any] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
    var i = 0
    while (i < n) { val k = read(r); m(k) = read(r); i += 1 }
    m
  }
}

/** CBOR (RFC 8949): major types 0/1 (ints), 2 (bytes), 3 (text),
  * 4 (array), 5 (map), 7 (false/true/null/float32/float64) — same
  * subset, smallest-width heads on write (the RFC's preferred
  * serialization). Reference behavior twin: codec/cbor/cbor.go:19-76.
  */
object CborCodec extends WireCodec {
  val name = "cbor"

  def encode(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val o = new DataOutputStream(bos)
    write(o, v)
    bos.toByteArray
  }

  private def head(o: DataOutputStream, major: Int, n: Long): Unit = {
    val m = major << 5
    if (n < 24) o.writeByte(m | n.toInt)
    else if (n < 256) { o.writeByte(m | 24); o.writeByte(n.toInt) }
    else if (n < 65536) { o.writeByte(m | 25); o.writeShort(n.toInt) }
    else if (n < (1L << 32)) { o.writeByte(m | 26); o.writeInt(n.toInt) }
    else { o.writeByte(m | 27); o.writeLong(n) }
  }

  private def write(o: DataOutputStream, v: Any): Unit = v match {
    case null       => o.writeByte(0xf6)
    case b: Boolean => o.writeByte(if (b) 0xf5 else 0xf4)
    case n: Byte    => writeLong(o, n.toLong)
    case n: Short   => writeLong(o, n.toLong)
    case n: Int     => writeLong(o, n.toLong)
    case n: Long    => writeLong(o, n)
    case f: Float   => o.writeByte(0xfa); o.writeFloat(f)
    case d: Double  => o.writeByte(0xfb); o.writeDouble(d)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      head(o, 3, b.length.toLong); o.write(b)
    case b: Array[Byte] => head(o, 2, b.length.toLong); o.write(b)
    case xs: Seq[_] =>
      head(o, 4, xs.length.toLong); xs.foreach(write(o, _))
    case m: scala.collection.Map[_, _] =>
      head(o, 5, m.size.toLong)
      m.foreach { case (k, mv) => write(o, k); write(o, mv) }
    case other =>
      throw new IllegalArgumentException(
        s"cbor: unsupported value ${other.getClass}")
  }

  private def writeLong(o: DataOutputStream, n: Long): Unit =
    if (n >= 0) head(o, 0, n) else head(o, 1, -1L - n)

  def decode(bytes: Array[Byte]): Any = {
    val r = new Reader(bytes)
    val v = read(r)
    require(r.pos == bytes.length, s"cbor: ${bytes.length - r.pos} trailing bytes")
    v
  }

  private final class Reader(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16().toLong
    def i64(): Long = (u32() << 32) | u32()
    def take(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
  }

  private def readLen(r: Reader, info: Int): Long = info match {
    case n if n < 24 => n.toLong
    case 24          => r.u8().toLong
    case 25          => r.u16().toLong
    case 26          => r.u32()
    case 27          => r.i64()
    case other =>
      throw new IllegalArgumentException(s"cbor: unsupported length info $other")
  }

  /** RFC 8949 half-precision (float16) → double: sign / 5-bit
    * exponent / 10-bit mantissa, with subnormals and Inf/NaN — the
    * spec's own reference decode (appendix D). Preferred serializers
    * EMIT float16 for values it represents exactly, so the read side
    * must accept it even though this writer never produces it. */
  private def halfToDouble(h: Int): Double = {
    val exp = (h >> 10) & 0x1f
    val mant = h & 0x3ff
    val v =
      if (exp == 0) math.pow(2, -24) * mant
      else if (exp != 31) math.pow(2, exp - 25) * (1024 + mant)
      else if (mant == 0) Double.PositiveInfinity
      else Double.NaN
    if ((h & 0x8000) != 0) -v else v
  }

  /** The break stop code (0xff), returned only inside
    * indefinite-length containers. */
  private object Break

  private def read(r: Reader): Any = {
    val v = readItem(r)
    require(!v.isInstanceOf[Break.type], "cbor: unexpected break (0xff)")
    v
  }

  private def readItem(r: Reader): Any = {
    val t = r.u8()
    if (t == 0xff) return Break
    val major = t >> 5
    val info = t & 0x1f
    major match {
      case 0 => readLen(r, info)
      case 1 => -1L - readLen(r, info)
      case 2 =>
        if (info == 31) {
          // indefinite byte string: definite-length chunks until break
          val out = new java.io.ByteArrayOutputStream()
          var chunk = readItem(r)
          while (!chunk.isInstanceOf[Break.type]) {
            out.write(chunk.asInstanceOf[Array[Byte]])
            chunk = readItem(r)
          }
          out.toByteArray
        } else r.take(readLen(r, info).toInt)
      case 3 =>
        if (info == 31) {
          val sb = new StringBuilder
          var chunk = readItem(r)
          while (!chunk.isInstanceOf[Break.type]) {
            sb.append(chunk.asInstanceOf[String])
            chunk = readItem(r)
          }
          sb.toString
        } else
          new String(r.take(readLen(r, info).toInt), StandardCharsets.UTF_8)
      case 4 =>
        if (info == 31) {
          val buf = Vector.newBuilder[Any]
          var v = readItem(r)
          while (!v.isInstanceOf[Break.type]) { buf += v; v = readItem(r) }
          buf.result()
        } else {
          val n = readLen(r, info).toInt
          Vector.fill(n)(read(r))
        }
      case 5 =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
        if (info == 31) {
          var k = readItem(r)
          while (!k.isInstanceOf[Break.type]) {
            m(k) = read(r)
            k = readItem(r)
          }
        } else {
          val n = readLen(r, info).toInt
          var i = 0
          while (i < n) { val k = read(r); m(k) = read(r); i += 1 }
        }
        m
      case 7 =>
        info match {
          case 20 => false
          case 21 => true
          case 22 => null
          case 25 => halfToDouble(r.u16())
          case 26 => java.lang.Float.intBitsToFloat(r.u32().toInt)
          case 27 => java.lang.Double.longBitsToDouble(r.i64())
          case other =>
            throw new IllegalArgumentException(s"cbor: unsupported simple $other")
        }
      case other =>
        throw new IllegalArgumentException(s"cbor: unsupported major $other")
    }
  }
}
