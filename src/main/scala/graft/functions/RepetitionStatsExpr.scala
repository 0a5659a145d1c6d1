package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The eleven Gopher repetition signals (Rae et al. 2021 Table A1) in
  * ONE text walk: text → struct(dup_line_frac, dup_line_char_frac,
  * top_{2,3,4}gram_char_frac, dup_{5..10}gram_char_frac).
  *
  * The composed Column-algebra twins
  * ([[graft.text.TextFunctions.dupLineFracComposed]] family,
  * spec-pinned bit-identical in TextRepetitionSpec) are the executable
  * semantics; this expression exists because higher-order-function
  * lambdas re-evaluate CAPTURED subtrees per element — a sorted gram
  * array referenced inside `filter`'s lambda is re-sorted once per
  * index, turning an O(m log m)/doc panel into O(m² log m)/doc. Here
  * each gram size is one hash-count pass over a token array built
  * once; the doubles cannot diverge from the twins because both sides
  * compute the same integer counters and round with the same HALF_UP
  * 6-dp rule.
  *
  * Semantics (shared verbatim with the q137 DuckDB oracle):
  *   - lines = `\n`-split segments with any non-0x20 char (blank-ish
  *     lines are structure, not content); dup-line fractions count
  *     instances of values occurring ≥2×, by count and by char mass;
  *   - grams = space-joined lowercase `\s+` tokens; top-n = the most
  *     frequent gram (ties to the UTF-8-byte-largest — `array_max`
  *     struct order), count × gram chars / text chars, clamped to 1;
  *   - dup-n = gram char MASS (Σ count × chars) in grams occurring
  *     ≥2×, over total gram mass;
  *   - fewer than n tokens → 0.0 (no full n-gram exists);
  *   - null text → null struct.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(
    (Seq("dup_line_frac", "dup_line_char_frac") ++
      (2 to 4).map(n => s"top_${n}gram_char_frac") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac"))
      .map(StructField(_, DoubleType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def toString: String = s"repetition_stats($child)"

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** UTF-8 byte order — what UTF8String (and DuckDB's BINARY
    * collation) compare by; Java String compareTo is UTF-16 order,
    * which disagrees above the BMP. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def codePoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** Public for the generated code path. */
  def stats(input: UTF8String): InternalRow = {
    val out = new Array[Any](11)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]],
      java.lang.Double.valueOf(0.0))

    // --- line signals ---
    val text = input.toString
    val lines = text.split("\n", -1).filter(_.exists(_ != ' '))
    if (lines.nonEmpty) {
      val counts = new java.util.HashMap[String, Int](lines.length * 2)
      lines.foreach(l => counts.merge(l, 1, Integer.sum))
      var dupInst = 0L
      var dupChars = 0L
      var totChars = 0L
      lines.foreach { l =>
        val len = codePoints(l)
        totChars += len
        if (counts.get(l) >= 2) { dupInst += 1; dupChars += len }
      }
      out(0) = java.lang.Double.valueOf(
        round6(dupInst.toDouble / lines.length))
      if (totChars > 0)
        out(1) = java.lang.Double.valueOf(
          round6(dupChars.toDouble / totChars))
    }

    // --- gram signals ---
    val toks = mutable.ArrayBuffer.empty[String]
    ShingleExpr.foreachShingle(input, 1)(t => if (t.nonEmpty) toks += t)
    val tlen = input.numChars().toDouble
    var n = 2
    while (n <= 10) {
      if (toks.length >= n) {
        val counts = new java.util.HashMap[String, Int](toks.length * 2)
        val sb = new java.lang.StringBuilder(64)
        var p = 0
        val last = toks.length - n
        while (p <= last) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(p + j))
            j += 1
          }
          counts.merge(sb.toString, 1, Integer.sum)
          p += 1
        }
        if (n <= 4) {
          var bestC = 0
          var bestG: String = null
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue
            if (c > bestC || (c == bestC && utf8Less(bestG, e.getKey)))
              { bestC = c; bestG = e.getKey }
          }
          out(n) = java.lang.Double.valueOf(round6(
            math.min(bestC * codePoints(bestG).toDouble / tlen, 1.0)))
        } else {
          var dupMass = 0L
          var totMass = 0L
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val m = e.getValue.toLong * codePoints(e.getKey)
            totMass += m
            if (e.getValue >= 2) dupMass += m
          }
          if (totMass > 0)
            out(n) = java.lang.Double.valueOf(
              round6(dupMass.toDouble / totMass))
        }
      }
      n += 1
    }
    new GenericInternalRow(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("repetitionStatsExpr", this,
        classOf[RepetitionStats].getName)
      s"${ev.value} = $ref.stats($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  def column(text: Column): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      RepetitionStats(
        org.apache.spark.sql.GraftExprColumn.expression(text)))
}

/** The eleven-threshold Gopher admission decision as ONE boolean
  * expression — one text walk per row by construction. Filtering on
  * eleven `getField` reads of [[RepetitionStats]] plans eleven copies
  * of the struct subtree inside FilterExec, and filter predicates sit
  * OUTSIDE whole-stage subexpression elimination (which unifies
  * Project/Aggregate expressions only) — the bench measured the
  * composed gate at ~10× the one-walk panel cost from exactly this.
  * `thresholds` in panel field order: dup_line_frac,
  * dup_line_char_frac, top_{2..4}gram_char_frac,
  * dup_{5..10}gram_char_frac. Null text → null (the filter drops it,
  * matching the composed predicate's null semantics). */
case class RepetitionGate(child: Expression, thresholds: Seq[Double])
    extends UnaryExpression {
  require(thresholds.size == 11,
    s"RepetitionGate takes the 11 panel thresholds (got ${thresholds.size})")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "repetition_gate"
  override def toString: String = s"repetition_gate($child)"

  @transient private lazy val statsOf = RepetitionStats(child)
  @transient private lazy val bar = thresholds.toArray

  override def nullSafeEval(input: Any): Any =
    admit(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def admit(input: UTF8String): Boolean = {
    val row = statsOf.stats(input)
    var i = 0
    while (i < 11) {
      if (row.getDouble(i) > bar(i)) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("repetitionGateExpr", this,
        classOf[RepetitionGate].getName)
      s"${ev.value} = $ref.admit($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionGate {
  def column(text: Column, thresholds: Seq[Double]): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      RepetitionGate(
        org.apache.spark.sql.GraftExprColumn.expression(text), thresholds))
}
