package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-doc line-dedup rewrite: text → struct(clean_text,
  * n_lines, n_kept), dropping every non-blank line whose key is in the
  * (driver-collected, sorted) duplicated-line dictionary.
  *
  * This is the NARROW rebuild leg of [[graft.dedup.Dedup.dedupLines]]
  * — the [[CodebookArgmin]] pattern applied to the sub-document tier:
  * the dictionary rides the expression as one primitive long[]
  * (shipped to executors once inside the broadcast task binary), so
  * the rebuild is a per-row map with NO line explode, NO back-join and
  * NO doc-keyed re-aggregation. The join leg it replaces shuffles
  * every surviving LINE of the corpus to regroup docs — at 100 TB that
  * second shuffle is corpus-sized; here nothing moves but the counted
  * keys. The join leg remains the over-gate fallback and the
  * executable twin (PipelinePropSpec pins identical output on both
  * legs across both hash configs).
  *
  * Semantics are exactly the join leg's: lines split on `\n` (trailing
  * empties kept, like `split(text, "\n")` with Spark's -1 limit); a
  * line's key is the hash of its SPACE-trimmed form (Spark `trim` —
  * 0x20 only, tabs are content); blank-after-trim lines are never
  * tested and always kept; kept lines rejoin with `\n` in original
  * order. Keys are 64-bit: the first 8 md5 bytes big-endian when
  * `portable` (== `parseUnsignedLong(md5hex.take(16), 16)`, the form
  * the driver derives from the dict's md5-hex keys) or Catalyst's
  * XXH64 (seed 42) otherwise — both sides of the membership test
  * truncate/hash identically, so a dictionary line always matches
  * (no false negatives); a cross-line 64-bit collision (~n²/2^65) is
  * the same accepted class as the gram/line-key hashing above.
  *
  * Codegen: reference-object call (see MinHashSignature's note) — the
  * enclosing stage stays inside WholeStageCodegen. */
case class DedupLinesRewrite(
    child: Expression,
    portable: Boolean,
    keys: Array[Long]
) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))

  override def prettyName: String = "dedup_lines_rewrite"

  // keep the plan string flat: never print the dictionary
  override def toString: String =
    s"dedup_lines_rewrite($child, n=${keys.length})"

  // content-based equality (the synthesized case-class equals compares
  // the Array by reference): two rewrites over equal dictionaries must
  // canonicalize equal or CSE/exchange-reuse can't see through them
  override def equals(other: Any): Boolean = other match {
    case that: DedupLinesRewrite =>
      child == that.child && portable == that.portable &&
        java.util.Arrays.equals(keys, that.keys)
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + portable.hashCode()
    31 * h + java.util.Arrays.hashCode(keys)
  }

  override def nullSafeEval(input: Any): Any =
    rewrite(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def rewrite(input: UTF8String): InternalRow = {
    val text = input.toString
    val out = new java.lang.StringBuilder(text.length)
    var nLines = 0L
    var nKept = 0L
    var start = 0
    var first = true
    val n = text.length
    while (start <= n) {
      val nl = text.indexOf('\n', start)
      val end = if (nl < 0) n else nl
      nLines += 1
      // Spark trim(): strip 0x20 only — tabs/CR are line content
      var s = start
      var e = end
      while (s < e && text.charAt(s) == ' ') s += 1
      while (e > s && text.charAt(e - 1) == ' ') e -= 1
      val keep = s == e || !inDict(text, s, e)
      if (keep) {
        nKept += 1
        if (!first) out.append('\n')
        out.append(text, start, end)
        first = false
      }
      if (nl < 0) start = n + 1 else start = nl + 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString),
      java.lang.Long.valueOf(nLines),
      java.lang.Long.valueOf(nKept)))
  }

  private def inDict(text: String, s: Int, e: Int): Boolean = {
    val bytes = text.substring(s, e)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val key =
      if (portable) {
        val d = DedupLinesRewrite.md5.get().digest(bytes)
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      } else {
        val u = UTF8String.fromBytes(bytes)
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }
    java.util.Arrays.binarySearch(keys, key) >= 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("dedupLinesExpr", this,
        classOf[DedupLinesRewrite].getName)
      s"${ev.value} = $ref.rewrite($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-doc DISTINCT non-blank line keys, one narrow pass: text →
  * array of the doc's distinct trimmed-line hashes — md5 hex strings
  * when `portable` (byte-identical to `md5(trim(line))`, the form the
  * q85/q86 oracles recompute) or XXH64 longs otherwise (identical to
  * `xxhash64(trim(line))`).
  *
  * This feeds [[graft.dedup.Dedup.dedupLines]]' document-frequency
  * count: emitting per-doc-distinct keys from the ROW means the count
  * is ONE map-side-combined shuffle of partial counts — the composed
  * alternative (explode every line, then `.distinct()` over
  * (id, key)) shuffles every line key of the corpus once just to
  * dedup within docs, and its higher-order-function form
  * (`array_distinct(transform(filter(...)))`) evaluates interpreted
  * and demotes the stage out of WholeStageCodegen. Same line/trim/
  * blank semantics as [[DedupLinesRewrite]]; null text → null
  * (explode drops it, like posexplode of a null split). */
case class DistinctLineKeys(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      if (portable) StringType else LongType, containsNull = false)

  override def prettyName: String = "distinct_line_keys"

  override def nullSafeEval(input: Any): Any =
    keysOf(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def keysOf(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val text = input.toString
    val seen = new java.util.LinkedHashSet[Any]
    var start = 0
    val n = text.length
    while (start <= n) {
      val nl = text.indexOf('\n', start)
      val end = if (nl < 0) n else nl
      var s = start
      var e = end
      while (s < e && text.charAt(s) == ' ') s += 1
      while (e > s && text.charAt(e - 1) == ' ') e -= 1
      if (s < e) {
        val bytes = text.substring(s, e)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (portable) {
          val d = DedupLinesRewrite.md5Digest(bytes)
          val hex = new Array[Byte](32)
          var i = 0
          while (i < 16) {
            hex(2 * i) = DistinctLineKeys.HexChars((d(i) >> 4) & 0xf)
            hex(2 * i + 1) = DistinctLineKeys.HexChars(d(i) & 0xf)
            i += 1
          }
          seen.add(UTF8String.fromBytes(hex))
        } else {
          val u = UTF8String.fromBytes(bytes)
          seen.add(java.lang.Long.valueOf(
            XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
              u.numBytes, 42L)))
        }
      }
      if (nl < 0) start = n + 1 else start = nl + 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("lineKeysExpr", this,
        classOf[DistinctLineKeys].getName)
      s"${ev.value} = $ref.keysOf($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctLineKeys {
  private[functions] val HexChars: Array[Byte] =
    "0123456789abcdef".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def column(text: Column, portable: Boolean): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      DistinctLineKeys(
        org.apache.spark.sql.GraftExprColumn.expression(text), portable))
}

object DedupLinesRewrite {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[functions] def md5Digest(bytes: Array[Byte]): Array[Byte] =
    md5.get().digest(bytes)

  /** Wrap as a Column (the data-carrying-expression shim — see
    * [[CodebookArgmin.assign]] for why this must NOT go through the
    * session function registry). Sorts a defensive copy of `keys`. */
  def rewriteColumn(text: Column, portable: Boolean, keys: Array[Long]): Column = {
    val sorted = keys.clone()
    java.util.Arrays.sort(sorted)
    org.apache.spark.sql.GraftExprColumn.column(
      DedupLinesRewrite(
        org.apache.spark.sql.GraftExprColumn.expression(text),
        portable, sorted))
  }
}
