package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Contrastive training-pair mining — the dedup machinery pointed at
  * DATASET CONSTRUCTION instead of removal: embedding/retrieval
  * models train on (anchor, positive, negative) triples, and a
  * curation engine already computes exactly the raw material:
  *
  *   - POSITIVES: verified near-duplicates (jaccard ≥ threshold) —
  *     same content, different surface;
  *   - HARD NEGATIVES: LSH candidates that FAILED verification —
  *     docs the hash family found similar-looking but that are
  *     provably below threshold, the "close but different" examples
  *     that teach a model its decision boundary (random negatives
  *     are trivially separable);
  *   - RANDOM NEGATIVES: a deterministic hash ring — each doc pairs
  *     with the next doc in hash order WITHIN its ring bucket
  *     (wrapping), so the pairing is unbiased, retry-stable, needs
  *     no RNG, and the per-bucket window keeps the sort distributed
  *     (no global single-partition window). Ring pairs that happen
  *     to be verified positives are anti-joined away.
  *
  * Plan shape: one [[Dedup.minhashLshPairs]] run at threshold 0
  * scores every candidate (banded signatures, capped buckets,
  * count-gated verify — all its scale machinery), one narrow split
  * by the real threshold, one bucketed window for the ring. Output:
  * `(anchor, other, kind, score)`, `score` null for ring negatives.
  */
object Contrastive {

  def minePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleWidth: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Long = 10000L,
      ringBuckets: Int = 64,
      seed: String = "s0",
      portableHash: Boolean = true
  ): DataFrame = {
    require(threshold > 0.0, s"threshold must be > 0 (got $threshold)")
    require(ringBuckets > 0, s"ringBuckets must be > 0 (got $ringBuckets)")
    // every LSH candidate, scored: threshold 0 disables the verify
    // filter, so the frame carries positives AND failed candidates
    // (materialized once — it feeds three consumers below)
    val scored = Dedup
      .minhashLshPairs(df, textCol, idCol, numHashes, bands,
        shingleWidth, threshold = 0.0, maxBucket, portableHash)
      .localCheckpoint(true)
    def shaped(rows: DataFrame, kind: String): DataFrame =
      rows.select(
        col("id_a").cast("long").as("anchor"),
        col("id_b").cast("long").as("other"),
        lit(kind).as("kind"),
        col("jaccard").as("score"))
    val positives = shaped(
      scored.where(col("jaccard") >= threshold), "positive")
    val hardNegs = shaped(
      scored.where(col("jaccard") < threshold), "hard_negative")
    // deterministic hash ring, bucketed so the window distributes
    val w = Window.partitionBy("_rb").orderBy(col("_h"), col("anchor"))
    val ring = df
      .select(col(idCol).cast("long").as("anchor"))
      .withColumn("_h", Sampling.hashOf(col("anchor"), seed))
      .withColumn("_rb", pmod(col("_h"), lit(ringBuckets.toLong)))
      .withColumn("other",
        coalesce(lead(col("anchor"), 1).over(w),
          first(col("anchor")).over(w)))
      .where(col("other") =!= col("anchor")) // singleton buckets
      .select(col("anchor"), col("other"),
        lit("random_negative").as("kind"),
        lit(null).cast("double").as("score"))
    // hygiene: a ring pair that IS a verified positive (either
    // orientation) would mislabel a near-dup as a negative
    val posKeys = scored.where(col("jaccard") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("_ka"),
        greatest(col("id_a"), col("id_b")).as("_kb"))
    val cleanRing = ring
      .join(posKeys,
        least(col("anchor"), col("other")) === col("_ka") &&
          greatest(col("anchor"), col("other")) === col("_kb"),
        "left_anti")
    positives.unionByName(hardNegs).unionByName(cleanRing)
  }
}
