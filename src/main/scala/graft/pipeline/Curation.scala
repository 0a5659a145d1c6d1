package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** The composed curation pipeline a training-data run executes end to
  * end: gate on language / quality / length (all narrow, all pushed to
  * the scan), collapse exact duplicates to their canonical doc, then
  * cut a deterministic sample at the target rate.
  *
  * Plan shape at 100 TB: the three gates fuse into one codegen'd
  * filter over the scan; exact dedup is the single fingerprint-keyed
  * shuffle; the sample gate is another narrow filter. One shuffle
  * total — the minimum any dedup-bearing curation can do.
  */
object Curation {

  /** Returns the curated rows of `df` plus `n_tokens` and `quality`
    * columns. `sampleRate = 1.0` keeps every survivor. */
  def curate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      sampleRate: Double = 1.0,
      seed: String = "s0"
  ): DataFrame = {
    val t = col(textCol)
    val gated = df
      .withColumn("n_tokens", TextFunctions.tokenCount(t).cast("long"))
      .withColumn("quality", TextFunctions.qualityScore(t))
      .where(
        TextFunctions.langId(t) === lang &&
          col("quality") >= minQuality &&
          col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens
      )
    val deduped = Dedup.exactDedup(gated, textCol, idCol)
    if (sampleRate >= 1.0) deduped
    else Sampling.hashSample(deduped, idCol, sampleRate, seed)
  }
}
