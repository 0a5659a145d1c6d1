package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization: text → its canonical composed form.
  *
  * Why the pipeline needs it: the SAME visible text arrives from
  * different sources in different byte forms — "café" as U+00E9 from
  * one crawler, as `e` + combining U+0301 from another — and every
  * byte-keyed operator downstream (exact-dedup fingerprints, line
  * keys, gram hashes, KMV content sketches) silently treats them as
  * DIFFERENT documents. Normalizing once at ingest makes content
  * identity mean visible identity. (Spark has no built-in; a Scala
  * UDF would demote the enclosing stage out of whole-stage codegen —
  * this is the [[LangMarkerHits]]-style native expression instead.)
  *
  * Fast path: already-NFC input (the overwhelming majority of real
  * text — ASCII is trivially NFC) is detected with
  * `Normalizer.isNormalized`, a scan with NO allocation, and
  * returned as the SAME UTF8String; only denormalized rows pay the
  * String round-trip. Null → null. DuckDB replays it as
  * `nfc_normalize` (q127). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def normalize(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nfcNormalizeExpr", this,
        classOf[NfcNormalize].getName)
      s"${ev.value} = $ref.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def column(text: Column): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      NfcNormalize(org.apache.spark.sql.GraftExprColumn.expression(text)))
}
