package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Streaming document curation — the continuous-ingest twin of
  * [[graft.pipeline.Curation]]: documents arrive on a stream, pass
  * the same narrow gates, and exact duplicates are dropped with
  * streaming state keyed on the content fingerprint.
  *
  * The gates are stateless per-row expressions (identical plans batch
  * or streaming). Dedup state is one 16-byte fingerprint per distinct
  * document ever admitted; for bounded state on an unbounded stream,
  * pass `dedupWatermark` + an event-time column and the operator
  * switches to `dropDuplicatesWithinWatermark` (duplicates are then
  * only suppressed within the watermark horizon — the standard
  * trade on infinite streams).
  */
object DocStreamOps {

  /** Gate + streaming exact-dedup. `docs` may be batch or streaming;
    * output carries (idCol, textCol, n_tokens, quality). */
  def curateStream(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      tsCol: Option[String] = None,
      dedupWatermark: Option[String] = None
  ): DataFrame = {
    val t = col(textCol)
    val gated = docs
      .withColumn("n_tokens", TextFunctions.tokenCount(t).cast("long"))
      .withColumn("quality", TextFunctions.qualityScore(t))
      .where(
        TextFunctions.langId(t) === lang &&
          col("quality") >= minQuality &&
          col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens
      )
      .withColumn("fp", TextFunctions.fingerprint(t))
    val deduped = (tsCol, dedupWatermark) match {
      case (Some(ts), Some(wm)) =>
        // the one streaming-dedup primitive (bounded state): see also
        // EventStreamOps.streamingContentDedup for dedup WITHOUT gates
        EventStreamOps.dedupWithinWatermark(gated, Seq("fp"), ts, wm)
      case (None, None) =>
        // explicit opt-in to UNBOUNDED dedup state (a batch-ish
        // stream); with both knobs absent this is what was asked for
        gated.dropDuplicates("fp")
      case _ =>
        // one knob without the other is a config mistake — silently
        // falling back to unbounded state would grow until OOM days
        // later, the exact scale-killer this operator exists to avoid
        throw new IllegalArgumentException(
          "curateStream needs BOTH tsCol and dedupWatermark for " +
            "bounded streaming dedup (or neither, to opt into " +
            s"unbounded state): got tsCol=$tsCol, " +
            s"dedupWatermark=$dedupWatermark")
    }
    deduped.drop("fp")
  }
}
