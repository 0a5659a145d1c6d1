package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The five counters behind [[graft.text.TextFunctions.qualityScore]]
  * in ONE text walk: text → struct(n_chars, n_punct, n_digit,
  * n_tokens, n_stop) —
  *
  *   - n_chars  == `length(text)` (Unicode code points),
  *   - n_punct  == chars matched by the quality punctuation class
  *     (`length(text) - length(regexp_replace(text, punct, ""))` —
  *     an ASCII class, so UTF-16-unit counting is exact),
  *   - n_digit  == `[0-9]` chars, same identity,
  *   - n_tokens == `size(tokens(text))` (the shared walker),
  *   - n_stop   == `size(filter(tokens(text), isin(stopwords)))`.
  *
  * The composed `qualityScore` evaluates `tokens()` (lower + split +
  * array_remove) up to three times and runs two `regexp_replace`
  * passes per row — whole-stage CSE dedupes some but not the regex
  * engines. Here every counter falls out of one pass; the score
  * FORMULA stays declarative in [[graft.text.TextFunctions
  * .qualityScore]] (identical Column algebra over these counters, so
  * doubles cannot diverge from the composed twin — spec-pinned in
  * ShingleExprSpec). Null text → null struct (the composed form's
  * null, via its null-propagating builtins). */
case class QualityStats(child: Expression, stopwords: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  override def prettyName: String = "quality_stats"

  override def toString: String = s"quality_stats($child)"

  // content-based equality (the Array param defeats the synthesized
  // case-class equals — see DedupLinesRewrite); equal instances are
  // what lets whole-stage CSE evaluate the struct ONCE per row even
  // though qualityScore reads five fields from it
  override def equals(other: Any): Boolean = other match {
    case that: QualityStats =>
      child == that.child &&
        java.util.Arrays.equals(
          stopwords.asInstanceOf[Array[AnyRef]],
          that.stopwords.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.hashCode(stopwords.asInstanceOf[Array[AnyRef]])

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.length * 2)
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def stats(input: UTF8String): InternalRow = {
    val text = input.toString
    var nPunct = 0L
    var nDigit = 0L
    var i = 0
    val len = text.length
    while (i < len) {
      val c = text.charAt(i)
      // the quality punctuation class, verbatim:
      // [.,;:!?'"()\[\]{}-] — all ASCII, so per-UTF-16-unit counting
      // equals per-code-point counting
      c match {
        case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' |
            ')' | '[' | ']' | '{' | '}' | '-' => nPunct += 1
        case d if d >= '0' && d <= '9' => nDigit += 1
        case _ => ()
      }
      i += 1
    }
    var nTokens = 0L
    var nStop = 0L
    ShingleExpr.foreachShingle(input, 1) { tok =>
      if (tok.nonEmpty) {
        nTokens += 1
        if (stopSet.contains(tok)) nStop += 1
      }
    }
    new GenericInternalRow(Array[Any](
      java.lang.Long.valueOf(input.numChars().toLong),
      java.lang.Long.valueOf(nPunct),
      java.lang.Long.valueOf(nDigit),
      java.lang.Long.valueOf(nTokens),
      java.lang.Long.valueOf(nStop)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("qualityStatsExpr", this,
        classOf[QualityStats].getName)
      s"${ev.value} = $ref.stats($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityStats {
  def column(text: Column, stopwords: Seq[String]): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      QualityStats(
        org.apache.spark.sql.GraftExprColumn.expression(text),
        stopwords.toArray))
}
