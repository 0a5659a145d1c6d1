package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-row MinHash signature: string → array<long> of
  * `numHashes` 61-bit minima — bit-identical to the composed form in
  * [[graft.dedup.Dedup.minhashSignatures]] (asserted in
  * ShingleExprSpec) but computed as a NARROW expression:
  *
  *   - the composed form explodes distinct shingles and folds
  *     `numHashes` min-aggregations per doc — correct and map-side
  *     combined, but it materializes one row per (doc, shingle) and
  *     pays a doc-keyed SHUFFLE carrying K×8 bytes per doc. At 10 B
  *     docs that shuffle alone is ~1.3 TB of signature traffic.
  *   - here the signature is a per-row fold over
  *     [[ShingleExpr.foreachShingle]]: no explode, no shuffle, no
  *     shingle-set allocation (min is duplicate-insensitive, so the
  *     positional walk needs no dedup) — signatures stream out at
  *     scan speed and the FIRST shuffle of an LSH pipeline is the
  *     band-bucket exchange, which is unavoidable.
  *
  * Hash arithmetic is shared with the composed form by construction:
  * the 32-bit base hash is the md5 hex prefix (`portable = true`, the
  * DuckDB-recomputable config) or Catalyst's own XXH64 over the
  * shingle's UTF-8 bytes masked to 32 bits (`xxhash64(s) &
  * 0xffffffff`), and the K derived hashes are
  * `(a_k * x + b_k) mod (2^61-1)` with [[graft.dedup.Dedup
  * .hashParams]]'s exact constants — plain Long arithmetic on both
  * sides, so the values (including any wrap semantics) cannot
  * diverge.
  *
  * Null text evaluates to null (callers drop null-text rows — the
  * composed form's explode made them vanish, and
  * `minhashSignatures` preserves that contract with a filter).
  *
  * Codegen: the generated code calls [[compute]] on the expression
  * instance (shipped once via `addReferenceObj`) — the per-row work
  * is the same compiled JVM method either way (it is md5-bound, not
  * dispatch-bound), but a real `doGenCode` keeps the ENCLOSING stage
  * inside WholeStageCodegen, where a CodegenFallback would demote the
  * whole scan→project pipeline to interpreted row processing. */
case class MinHashSignature(
    child: Expression,
    width: Int,
    numHashes: Int,
    portable: Boolean
) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      val (a, b) = graft.dedup.Dedup.hashParams(k)
      as(k) = a; bs(k) = b; k += 1
    }
    (as, bs)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def compute(input: UTF8String): ArrayData = {
    val (as, bs) = params
    val p = graft.dedup.Dedup.HashP
    val mins = Array.fill(numHashes)(Long.MaxValue)
    ShingleExpr.foreachShingle(input, width) { sh =>
      val x = baseHash(sh)
      var k = 0
      while (k < numHashes) {
        val v = (as(k) * x + bs(k)) % p
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf): Array[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhashExpr", this,
        classOf[MinHashSignature].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  private def baseHash(s: String): Long =
    if (portable) {
      // == conv(substring(md5(s), 1, 8), 16, 10): the first 8 hex
      // chars of the digest are its first 4 bytes, read big-endian
      // unsigned
      val d = MinHashSignature.md5.get()
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    } else {
      // == xxhash64(s) & 0xffffffff: Catalyst's XxHash64 over a
      // string hashes the UTF8String bytes with seed 42
      val u = UTF8String.fromString(s)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes,
        42L) & 0xffffffffL
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  // MessageDigest is stateful and not thread-safe; digest() resets it,
  // so one instance per task thread serves every row
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

object MinHashExpr {
  /** Register `minhash_signature(text, width, numHashes, portable)` —
    * a no-op when the session already has it (same idempotent
    * discipline as [[ShingleExpr.register]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_signature")))
      return
    reg.createOrReplaceTempFunction(
      "minhash_signature",
      graft.GraftExtensions.builders.toMap.apply("minhash_signature"),
      "built-in"
    )
  }
}
