package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-row SimHash fingerprint: string → array<long> holding
  * ZERO elements (blank doc — no token votes) or ONE fingerprint —
  * bit-identical to the composed forms in [[graft.dedup.Dedup
  * .simhash32Composed]]/[[graft.dedup.Dedup.simhash64Composed]]
  * (asserted in ShingleExprSpec) but computed as a NARROW expression:
  *
  *   - the composed form explodes tokens and folds 32/64
  *     conditional-sum vote columns per doc — the widest aggregation
  *     in the engine, with a doc-keyed SHUFFLE carrying the votes.
  *   - here every token votes into a per-row counter array during one
  *     walk; no explode, no shuffle — fingerprints stream at scan
  *     speed and [[graft.dedup.Dedup.hammingPairs]]'s band exchange
  *     becomes the pipeline's first (and only necessary) shuffle.
  *
  * The ARRAY return type is the row-drop contract: the composed
  * form's token explode made blank docs vanish from the output, so
  * callers `explode(...)` this array — a Generate evaluates the
  * expression ONCE per row and drops the empty arrays, where a
  * `where(isNotNull(...))` over a projected alias would be pushed
  * below the Project and evaluate the fingerprint twice per row.
  *
  * Vote math mirrors the composed form exactly: the token hash is the
  * md5 prefix — first 4 bytes big-endian-unsigned for 32 bits; for 64
  * bits two unsigned halves (`hi` = bytes 0-3, `lo` = bytes 4-7) with
  * bit b < 32 reading `lo` and b >= 32 reading `hi` — each token
  * occurrence votes ±1 per bit (duplicates INCLUDED — SimHash is
  * frequency-weighted), and bit b of the fingerprint is set iff its
  * vote sum is positive. Bit 63 of a 64-bit fingerprint is the long
  * sign bit — a bit pattern, not a magnitude. */
case class SimHashFingerprint(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits == 32 || bits == 64,
    s"simhash_fingerprint bits must be 32 or 64 (got $bits)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public for the generated code path (see MinHashSignature's
    * codegen note: a real doGenCode keeps the enclosing stage in
    * WholeStageCodegen; the per-row work is this same method). */
  def compute(input: UTF8String): ArrayData = {
    val votes = new Array[Int](bits)
    var any = false
    val digest = SimHashFingerprint.md5.get()
    // width-1 shingles ARE the tokens (positional, duplicates kept);
    // the degenerate blank-doc walk emits one "" — skipped, matching
    // TextFunctions.tokens' empty-array contract
    ShingleExpr.foreachShingle(input, 1) { tok =>
      if (tok.nonEmpty) {
        any = true
        val d = digest.digest(
          tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        def be32(off: Int): Long =
          ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
            ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
        if (bits == 32) {
          val h = be32(0)
          var b = 0
          while (b < 32) {
            if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        } else {
          val hi = be32(0)
          val lo = be32(4)
          var b = 0
          while (b < 32) {
            if (((lo >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
          while (b < 64) {
            if (((hi >> (b - 32)) & 1L) == 1L) votes(b) += 1
            else votes(b) -= 1
            b += 1
          }
        }
      }
    }
    if (!any) new GenericArrayData(Array.empty[Any])
    else {
      var fp = 0L
      var b = 0
      while (b < bits) {
        if (votes(b) > 0) fp |= (1L << b)
        b += 1
      }
      new GenericArrayData(Array[Any](java.lang.Long.valueOf(fp)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("simhashExpr", this,
        classOf[SimHashFingerprint].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFingerprint {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

object SimHashExpr {
  /** Register `simhash_fingerprint(text, bits)` — idempotent, same
    * discipline as [[ShingleExpr.register]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_fingerprint")))
      return
    reg.createOrReplaceTempFunction(
      "simhash_fingerprint",
      graft.GraftExtensions.builders.toMap.apply("simhash_fingerprint"),
      "built-in"
    )
  }
}
