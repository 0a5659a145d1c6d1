package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word w-shingling: string → array<string> of distinct
  * whitespace-token w-grams.
  *
  * Exactly equivalent (asserted in ShingleExprSpec) to the composed
  * built-in form
  * `array_distinct(transform(sequence(…), i => concat_ws(' ',
  * slice(split(lower(trim(text)), "\\s+"), i, w))))`, which walks the
  * token array once per position and allocates a slice each time —
  * the measured hot spot of the MinHash pipeline. Here: lowercase,
  * all-whitespace edge trim (matching `TextFunctions.tokens`), single
  * regex-free tokenizer pass, shingles emitted from token offsets,
  * first-occurrence-ordered dedup.
  *
  * The per-row work is string-building, which generated code cannot
  * improve — but a real `doGenCode` (calling [[compute]] via a
  * reference object) keeps the ENCLOSING stage in WholeStageCodegen,
  * where a CodegenFallback would demote the whole scan→project
  * pipeline to interpreted row processing.
  */
case class WordShingles(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def compute(input: UTF8String): ArrayData = {
    // first-occurrence-ordered DEDUP on top of the shared walker (the
    // walker itself emits positional shingles, duplicates included)
    val out = mutable.LinkedHashSet.empty[String]
    ShingleExpr.foreachShingle(input, width)(out += _)
    new GenericArrayData(out.toArray.map(UTF8String.fromString): Array[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingleExpr", this,
        classOf[WordShingles].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass sliding-window token chunking: string → array<string> of
  * `width`-token windows at `stride`-grid starts plus the clamped
  * final window ([[ShingleExpr.foreachChunk]] — the
  * `TextFunctions.chunks` contract). Exists because the composed
  * zip_with-ladder form builds an expression tree `width` nodes deep:
  * fine at the repetition panel's n ≤ 10, a planner StackOverflow at
  * the 512–2048-token windows an embedding/packing pipeline actually
  * uses. Same codegen posture as [[WordShingles]]: real `doGenCode`
  * via a reference object keeps the enclosing stage whole-stage
  * compiled. */
case class TokenChunks(child: Expression, width: Int, stride: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def compute(input: UTF8String): ArrayData = {
    val out = mutable.ArrayBuffer.empty[Any]
    ShingleExpr.foreachChunk(input, width, stride)(s =>
      out += UTF8String.fromString(s))
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("chunksExpr", this,
        classOf[TokenChunks].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenChunks {
  /** Wrap as a Column (the data-carrying-expression shim). */
  def column(text: org.apache.spark.sql.Column, width: Int, stride: Int)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftExprColumn.column(
      TokenChunks(
        org.apache.spark.sql.GraftExprColumn.expression(text),
        width, stride))
}

object ShingleExpr {

  /** Lowercase + all-edge-whitespace trim + `\\s+`-run tokenization —
    * the exact `TextFunctions.tokens` semantics (a bare trim() strips
    * only 0x20 and leaves phantom "" tokens on newline-ended text;
    * `split(text, "\\s+", -1)` semantics otherwise), shared by every
    * native text walker here. Blank docs yield ONE "" token. */
  private[functions] def tokenize(
      input: UTF8String): mutable.ArrayBuffer[String] = {
    val lowered = input.toLowerCase.toString
    def isWs(c: Char): Boolean = // Java regex \\s: [ \\t\\n\\x0B\\f\\r]
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    var s = 0
    var e = lowered.length
    while (s < e && isWs(lowered.charAt(s))) s += 1
    while (e > s && isWs(lowered.charAt(e - 1))) e -= 1
    val text = lowered.substring(s, e)
    val toks = mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    var tokenStart = 0
    while (i < n) {
      if (isWs(text.charAt(i))) {
        toks += text.substring(tokenStart, i)
        while (i < n && isWs(text.charAt(i))) i += 1
        tokenStart = i
      } else i += 1
    }
    toks += text.substring(tokenStart, n)
    toks
  }

  private def joined(
      toks: mutable.ArrayBuffer[String], p: Int, width: Int,
      sb: java.lang.StringBuilder): String = {
    sb.setLength(0)
    var k = 0
    while (k < width) {
      if (k > 0) sb.append(' ')
      sb.append(toks(p + k))
      k += 1
    }
    sb.toString
  }

  /** The ONE shingle walk shared by every native text expression
    * ([[WordShingles]], [[graft.functions.MinHashSignature]]):
    * [[tokenize]], then invoke `f` once per POSITIONAL width-shingle
    * (duplicates included — dedup where set semantics matter, e.g.
    * [[WordShingles]]; min-folds don't need it). Degenerate docs
    * (< width tokens, including empty/all-whitespace text) yield ONE
    * shingle: all tokens joined ("" for blank docs) — so every doc is
    * comparable. */
  private[functions] def foreachShingle(
      input: UTF8String,
      width: Int
  )(f: String => Unit): Unit = {
    val toks = tokenize(input)
    if (toks.length >= width) {
      var p = 0
      val last = toks.length - width
      val sb = new java.lang.StringBuilder(64)
      while (p <= last) {
        f(joined(toks, p, width, sb))
        p += 1
      }
    } else {
      f(toks.mkString(" "))
    }
  }

  /** Sliding-window chunk walk: width-token windows at starts on the
    * `stride` grid, plus the FINAL window (start = tokens − width)
    * when it is off-grid — `TextFunctions.chunks` semantics, emitted
    * in ascending start order. Degenerate docs (< width tokens) yield
    * themselves (all tokens joined; "" for blank docs). Linear in the
    * EMITTED character count — the composed zip_with-ladder form was
    * expression-tree-depth `width`, which overflows the planner stack
    * at production packing widths (512–2048 tokens). */
  private[functions] def foreachChunk(
      input: UTF8String,
      width: Int,
      stride: Int
  )(f: String => Unit): Unit = {
    val toks = tokenize(input)
    if (toks.length >= width) {
      val last = toks.length - width
      val sb = new java.lang.StringBuilder(64)
      var p = 0
      while (p <= last) {
        f(joined(toks, p, width, sb))
        p += stride
      }
      if (last % stride != 0) f(joined(toks, last, width, sb))
    } else {
      f(toks.mkString(" "))
    }
  }

  /** Register `word_shingles(text, width)` — a no-op when the session
    * already has it (operators call this per-invocation; re-registering
    * would log a "replaced a previously registered function" warning
    * per call). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles")))
      return
    // the SAME guarded builder the extensions injector registers —
    // arity and non-null-literal checks included, so both
    // registration paths refuse malformed calls identically
    reg.createOrReplaceTempFunction(
      "word_shingles",
      graft.GraftExtensions.builders.toMap.apply("word_shingles"),
      "built-in"
    )
  }
}
