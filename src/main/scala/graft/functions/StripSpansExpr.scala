package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-doc repeated-span strip: text → struct(clean_text,
  * n_tokens, n_kept), dropping every token covered by a width-gram
  * whose XXH64 key is in that width's (driver-collected, sorted)
  * repeated-gram dictionary — the narrow rebuild leg of
  * [[graft.dedup.Dedup.stripRepeatedSpans]] /
  * [[graft.dedup.Dedup.stripRepeatedSpansMulti]], sibling of
  * [[DedupLinesRewrite]].
  *
  * The join leg it replaces re-explodes every token of the corpus and
  * regroups it per doc (a corpus-sized doc-keyed shuffle through a
  * window + collect_list); here the dictionaries ride the expression
  * as primitive long[][] and the whole strip is a per-row map — the
  * only shuffle left in the operator is the per-width gram COUNT,
  * which is map-side combined and 8 bytes per key. The join leg
  * remains the over-gate fallback and executable twin (PipelineSpec /
  * PipelinePropSpec pin identical output on both legs).
  *
  * Semantics are exactly the join legs': tokens are
  * `TextFunctions.tokens` (lowercase, split `\s+`, no empties — the
  * [[ShingleExpr.foreachShingle]] width-1 walk); a width-w gram at
  * start s is the space-joined token slice [s, s+w) hashed with
  * Catalyst XXH64 (seed 42, == `xxhash64(concat_ws(" ", slice))`);
  * token p is covered iff ANY dictionary gram's interval [s, s+w)
  * contains it, ACROSS tiers (boundary-event prefix sum, exactly the
  * Multi leg's union); kept tokens rejoin with single spaces (the
  * join leg's rebuild normalizes whitespace the same way). Docs with
  * fewer than w tokens have no w-grams. */
case class StripSpansRewrite(
    child: Expression,
    widths: Array[Int],
    keys: Array[Array[Long]]
) extends UnaryExpression {

  require(widths.length == keys.length,
    s"widths (${widths.length}) and key sets (${keys.length}) must pair up")
  require(widths.forall(_ > 0), "widths must be > 0")

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))

  override def prettyName: String = "strip_spans_rewrite"

  // keep the plan string flat: never print the dictionaries
  override def toString: String =
    s"strip_spans_rewrite($child, " +
      widths.zip(keys).map { case (w, k) => s"w$w:n=${k.length}" }
        .mkString(", ") + ")"

  // content-based equality (see DedupLinesRewrite)
  override def equals(other: Any): Boolean = other match {
    case that: StripSpansRewrite =>
      child == that.child &&
        java.util.Arrays.equals(widths, that.widths) &&
        keys.length == that.keys.length &&
        keys.indices.forall(i => java.util.Arrays.equals(keys(i), that.keys(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + java.util.Arrays.hashCode(widths)
    keys.foreach(k => h = 31 * h + java.util.Arrays.hashCode(k))
    h
  }

  override def nullSafeEval(input: Any): Any =
    rewrite(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def rewrite(input: UTF8String): InternalRow = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    ShingleExpr.foreachShingle(input, 1)(t => if (t.nonEmpty) toks += t)
    val n = toks.length
    // boundary events: diff(s) += 1, diff(s+w) -= 1 per dictionary
    // hit; prefix sum > 0 == covered (the Multi leg's exact algebra)
    val diff = new Array[Int](n + 1)
    var ti = 0
    while (ti < widths.length) {
      val w = widths(ti)
      val ks = keys(ti)
      if (n >= w && ks.length > 0) {
        val sb = new java.lang.StringBuilder
        var s = 0
        while (s <= n - w) {
          sb.setLength(0)
          var k = 0
          while (k < w) {
            if (k > 0) sb.append(' ')
            sb.append(toks(s + k))
            k += 1
          }
          val u = UTF8String.fromString(sb.toString)
          val h = XXH64.hashUnsafeBytes(
            u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
          if (java.util.Arrays.binarySearch(ks, h) >= 0) {
            diff(s) += 1
            diff(s + w) -= 1
          }
          s += 1
        }
      }
      ti += 1
    }
    val out = new java.lang.StringBuilder
    var nKept = 0L
    var cov = 0
    var p = 0
    while (p < n) {
      cov += diff(p)
      if (cov <= 0) {
        if (nKept > 0) out.append(' ')
        out.append(toks(p))
        nKept += 1
      }
      p += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString),
      java.lang.Long.valueOf(n.toLong),
      java.lang.Long.valueOf(nKept)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("stripSpansExpr", this,
        classOf[StripSpansRewrite].getName)
      s"${ev.value} = $ref.rewrite($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripSpansRewrite {
  /** Wrap as a Column (the data-carrying-expression shim — see
    * [[CodebookArgmin.assign]]). Sorts defensive copies of the key
    * sets. */
  def column(
      text: Column,
      tiers: Seq[(Int, Array[Long])]
  ): Column = {
    val widths = tiers.map(_._1).toArray
    val sorted = tiers.map { case (_, k) =>
      val c = k.clone(); java.util.Arrays.sort(c); c
    }.toArray
    org.apache.spark.sql.GraftExprColumn.column(
      StripSpansRewrite(
        org.apache.spark.sql.GraftExprColumn.expression(text),
        widths, sorted))
  }
}
