package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-doc mean token log-probability under a (driver-collected)
  * unigram vocabulary, one narrow pass: text → array<double> holding
  * ZERO elements (no tokens — the row must drop, matching the join
  * leg's explode) or ONE mean — the narrow scoring leg of
  * [[graft.text.TextFunctions.unigramLm]].
  *
  * The join leg explodes every token of the corpus, probes the
  * broadcast vocab and REGROUPS per doc (collect_list + sort for the
  * deterministic mean — a doc-keyed shuffle of every token's
  * log-prob). But `broadcast(vocab)` had already collected the vocab
  * to the driver — a vocab is driver-sized by construction — so the
  * lookup table can ride this expression instead
  * ([[CodebookArgmin]] pattern) and scoring becomes a per-row map:
  * the only shuffle left in the operator is the corpus token COUNT.
  * The join leg remains the executable twin (`narrowScoring = false`,
  * spec-pinned equal).
  *
  * Arithmetic is the join leg's exactly: per-token log-probs arrive
  * PRE-ROUNDED (the vocab rows are collected with their Spark-rounded
  * `_logp`; `oovLogp` is rounded by the caller the same way);
  * `sortedSum = true` sums each doc's terms in ascending value order
  * (the deterministic leg's sort_array ++ aggregate fold) before the
  * 6-dp HALF_UP mean; `false` sums in token order (the production
  * leg's plain sum — same value up to last-ulp summation order). */
case class UnigramScore(
    child: Expression,
    vocabTokens: Array[String],
    vocabLogps: Array[Double],
    oovLogp: Double,
    sortedSum: Boolean
) extends UnaryExpression {

  require(vocabTokens.length == vocabLogps.length,
    "vocab tokens and log-probs must pair up")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "unigram_score"

  // keep the plan string flat: never print the vocabulary
  override def toString: String =
    s"unigram_score($child, v=${vocabTokens.length})"

  // content-based equality (see DedupLinesRewrite)
  override def equals(other: Any): Boolean = other match {
    case that: UnigramScore =>
      child == that.child && oovLogp == that.oovLogp &&
        sortedSum == that.sortedSum &&
        java.util.Arrays.equals(
          vocabTokens.asInstanceOf[Array[AnyRef]],
          that.vocabTokens.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(vocabLogps, that.vocabLogps)
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + java.lang.Double.hashCode(oovLogp)
    h = 31 * h + sortedSum.hashCode()
    h = 31 * h + java.util.Arrays.hashCode(
      vocabTokens.asInstanceOf[Array[AnyRef]])
    31 * h + java.util.Arrays.hashCode(vocabLogps)
  }

  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      vocabTokens.length * 2)
    var i = 0
    while (i < vocabTokens.length) {
      m.put(vocabTokens(i), vocabLogps(i))
      i += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def score(input: UTF8String): GenericArrayData = {
    val ps = scala.collection.mutable.ArrayBuffer.empty[Double]
    ShingleExpr.foreachShingle(input, 1) { tok =>
      if (tok.nonEmpty) {
        val v = lookup.get(tok)
        ps += (if (v == null) oovLogp else v.doubleValue())
      }
    }
    if (ps.isEmpty) new GenericArrayData(Array.empty[Any])
    else {
      val arr = ps.toArray
      if (sortedSum) java.util.Arrays.sort(arr)
      var sum = 0.0
      var i = 0
      while (i < arr.length) { sum += arr(i); i += 1 }
      val mean = java.math.BigDecimal.valueOf(sum / arr.length)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      new GenericArrayData(Array[Any](java.lang.Double.valueOf(mean)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("unigramExpr", this,
        classOf[UnigramScore].getName)
      s"${ev.value} = $ref.score($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramScore {
  /** Wrap as a Column (the data-carrying-expression shim — see
    * [[CodebookArgmin.assign]]). */
  def column(
      text: Column,
      vocab: Seq[(String, Double)],
      oovLogp: Double,
      sortedSum: Boolean
  ): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      UnigramScore(
        org.apache.spark.sql.GraftExprColumn.expression(text),
        vocab.map(_._1).toArray, vocab.map(_._2).toArray,
        oovLogp, sortedSum))
}
