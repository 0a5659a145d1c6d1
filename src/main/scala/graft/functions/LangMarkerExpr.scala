package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-stopword hit counts for every language in ONE token walk:
  * text → array<long>, element i = occurrences of language i's marker
  * words (duplicates counted, exactly
  * `size(filter(tokens(text), isin(markers_i)))`).
  *
  * The composed [[graft.text.TextFunctions.langIdComposed]] evaluates
  * `tokens()` once per LANGUAGE through interpreted higher-order
  * filters; here one walk votes every token into its languages'
  * counters (a token can mark several languages — "la"/"que" are both
  * French and Spanish markers — so the lookup maps token → language
  * index list). The argmax/tie-break FORMULA stays declarative in
  * [[graft.text.TextFunctions.langId]], identical Column algebra over
  * these counters (spec-pinned bit-equal; content-based equality lets
  * whole-stage CSE evaluate the walk once per row despite one read
  * per language). Null text → null. */
case class LangMarkerHits(child: Expression, markers: Array[Array[String]])
    extends UnaryExpression {

  require(markers.nonEmpty, "at least one language's markers required")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lang_marker_hits"

  override def toString: String =
    s"lang_marker_hits($child, langs=${markers.length})"

  // content-based equality (see DedupLinesRewrite)
  override def equals(other: Any): Boolean = other match {
    case that: LangMarkerHits =>
      child == that.child && markers.length == that.markers.length &&
        markers.indices.forall(i =>
          java.util.Arrays.equals(
            markers(i).asInstanceOf[Array[AnyRef]],
            that.markers(i).asInstanceOf[Array[AnyRef]]))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode()
    markers.foreach(m =>
      h = 31 * h + java.util.Arrays.hashCode(m.asInstanceOf[Array[AnyRef]]))
    h
  }

  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]
    for (i <- markers.indices; w <- markers(i)) {
      val b = m.get(w)
      if (b == null) {
        val nb = scala.collection.mutable.ArrayBuffer(i)
        m.put(w, nb)
      } else b += i
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size() * 2)
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  override def nullSafeEval(input: Any): Any =
    hits(input.asInstanceOf[UTF8String])

  /** Public for the generated code path. */
  def hits(input: UTF8String): GenericArrayData = {
    val counts = new Array[Long](markers.length)
    ShingleExpr.foreachShingle(input, 1) { tok =>
      if (tok.nonEmpty) {
        val langs = lookup.get(tok)
        if (langs != null) {
          var i = 0
          while (i < langs.length) { counts(langs(i)) += 1; i += 1 }
        }
      }
    }
    new GenericArrayData(counts.map(java.lang.Long.valueOf): Array[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("langMarkerExpr", this,
        classOf[LangMarkerHits].getName)
      s"${ev.value} = $ref.hits($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangMarkerHits {
  def column(text: Column, markers: Seq[Seq[String]]): Column =
    org.apache.spark.sql.GraftExprColumn.column(
      LangMarkerHits(
        org.apache.spark.sql.GraftExprColumn.expression(text),
        markers.map(_.toArray).toArray))
}
