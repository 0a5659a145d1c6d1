package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-doc distinct-gram overlap against a (driver-collected, sorted)
  * XXH64 key set, one narrow pass: text → struct(n_grams, n_hits)
  * where `n_grams` counts the doc's DISTINCT width-shingles (exactly
  * `size(WordShingles(text, width))` — the degenerate short-doc
  * shingle included) and `n_hits` counts how many of them are in the
  * key set (keys are `xxhash64(gram)` — Catalyst XXH64, seed 42).
  *
  * This is the narrow scoring leg shared by
  * [[graft.pipeline.Boilerplate.boilerplateRatio]] (keys = the
  * corpus-wide boilerplate dictionary) and
  * [[graft.pipeline.Decontaminate.overlapCounts]] (keys = the eval
  * set's distinct grams): both ops' join legs explode every gram of
  * the corpus and REGROUP the hits per doc — a doc-keyed shuffle of
  * every gram hit; with the dictionary riding the expression
  * ([[CodebookArgmin]] pattern) scoring is a per-row map and the
  * only shuffle left is the dictionary COUNT itself (boilerplate) or
  * nothing at all (decontamination — the eval grams were a broadcast
  * already; collecting them removes even the map-side join). The
  * join legs remain the over-gate fallbacks and executable twins.
  *
  * Shingle semantics are [[WordShingles]]' via the shared walker;
  * distinctness is STRING-exact (the hash is only the membership
  * key, same accepted 64-bit-collision class as the gram-key
  * shuffles). Null text → null struct (callers coalesce to the join
  * leg's null-shape). */
case class GramSetOverlap(
    child: Expression,
    width: Int,
    keys: Array[Long]
) extends UnaryExpression {

  require(width > 0, s"gram width must be > 0 (got $width)")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false)))

  override def prettyName: String = "gram_set_overlap"

  // keep the plan string flat: never print the dictionary
  override def toString: String =
    s"gram_set_overlap($child, w=$width, n=${keys.length})"

  // content-based equality (see DedupLinesRewrite)
  override def equals(other: Any): Boolean = other match {
    case that: GramSetOverlap =>
      child == that.child && width == that.width &&
        java.util.Arrays.equals(keys, that.keys)
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + width
    31 * h + java.util.Arrays.hashCode(keys)
  }

  override def nullSafeEval(input: Any): Any =
    overlap(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def overlap(input: UTF8String): InternalRow = {
    val seen = new java.util.HashSet[String]
    var nGrams = 0L
    var nHits = 0L
    ShingleExpr.foreachShingle(input, width) { g =>
      if (seen.add(g)) {
        nGrams += 1
        val u = UTF8String.fromString(g)
        val h = XXH64.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        if (java.util.Arrays.binarySearch(keys, h) >= 0) nHits += 1
      }
    }
    new GenericInternalRow(Array[Any](
      java.lang.Long.valueOf(nGrams), java.lang.Long.valueOf(nHits)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("gramSetExpr", this,
        classOf[GramSetOverlap].getName)
      s"${ev.value} = $ref.overlap($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramSetOverlap {
  /** Wrap as a Column (the data-carrying-expression shim — see
    * [[CodebookArgmin.assign]]). Sorts a defensive copy of `keys`. */
  def column(text: Column, width: Int, keys: Array[Long]): Column = {
    val sorted = keys.clone()
    java.util.Arrays.sort(sorted)
    org.apache.spark.sql.GraftExprColumn.column(
      GramSetOverlap(
        org.apache.spark.sql.GraftExprColumn.expression(text),
        width, sorted))
  }
}

/** Per-doc DISTINCT shingle hashes in one walk: text → array<long>,
  * == `transform(WordShingles(text, width), xxhash64)` (first-
  * occurrence order, degenerate short-doc shingle included) without
  * materializing the string array or paying the interpreted
  * higher-order transform — the verify build side of
  * [[graft.dedup.Dedup.verifyJaccardOn]]'s production config hashes
  * every corpus doc exactly once through this. Spec-pinned equal to
  * the composed form (ShingleExprSpec). Null text → null. */
case class ShingleHashes(child: Expression, width: Int)
    extends UnaryExpression {

  require(width > 0, s"shingle width must be > 0 (got $width)")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def hashes(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val seen = new java.util.LinkedHashSet[String]
    ShingleExpr.foreachShingle(input, width)(seen.add(_))
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) {
      val u = UTF8String.fromString(it.next())
      out(i) = java.lang.Long.valueOf(XXH64.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingleHashExpr", this,
        classOf[ShingleHashes].getName)
      s"${ev.value} = $ref.hashes($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def column(text: Column, width: Int): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      ShingleHashes(
        org.apache.spark.sql.GraftExprColumn.expression(text), width))
}
