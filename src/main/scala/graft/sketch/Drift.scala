package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift detection between two standing corpus profiles — the
  * monitoring step a long-running ingest pipeline runs after every
  * batch wave: did today's crawl change the corpus shape? Which
  * strata appeared, vanished, or shifted their length/quality
  * distribution?
  *
  * Everything consumes PROFILE frames ([[ProfileIndex.profileEstimates]]
  * / [[Kmv.withEstimates]] outputs) — strata-sized inputs, so every
  * computation here is profile-sized: the corpus is never touched.
  * The distribution comparison is the exact two-sample
  * Kolmogorov–Smirnov statistic over the profiles' bottom-k value
  * samples ([[SampleSketch]]) — uniform samples of the two corpora,
  * so D = max |F̂_a − F̂_b| estimates the true corpus KS with the
  * usual O(1/√k) sampling error.
  */
object Drift {

  /** Exact two-sample KS statistic per stratum from two sample-array
    * columns: explode both samples (strata × ≤2k rows — profile
    * scale), then one window pass with a RANGE frame, which counts
    * every row with value ≤ current — empirical CDFs evaluated after
    * all ties at each distinct value, the textbook exact treatment.
    * Strata missing either sample get NULL (no distribution to
    * compare). Returns `(strataCol, ks)`, ks in [0,1] rounded to 6. */
  def ksStat(
      joined: DataFrame,
      strataCol: String,
      aCol: String,
      bCol: String): DataFrame = {
    val pts = joined
      .where(size(col(aCol)) > 0 && size(col(bCol)) > 0)
      .select(
        col(strataCol),
        size(col(aCol)).cast("double").as("_na"),
        size(col(bCol)).cast("double").as("_nb"),
        explode(concat(
          transform(col(aCol), v => struct(v.as("v"), lit(1L).as("a"))),
          transform(col(bCol), v => struct(v.as("v"), lit(0L).as("a")))))
          .as("_p"))
      .select(col(strataCol), col("_na"), col("_nb"),
        col("_p.v").as("_v"), col("_p.a").as("_a"))
    val cdfFrame = Window
      .partitionBy(col(strataCol))
      .orderBy(col("_v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("_ca", sum(col("_a")).over(cdfFrame).cast("double"))
      .withColumn("_cb",
        sum(lit(1L) - col("_a")).over(cdfFrame).cast("double"))
      .groupBy(col(strataCol))
      .agg(round(
        max(abs(col("_ca") / col("_na") - col("_cb") / col("_nb"))),
        6).as("ks"))
  }

  /** Per-stratum drift report between two profile frames. Emits one
    * row per stratum of either side:
    *
    *   - `status`: `both` / `new` (only in `after`) / `gone`
    *   - `docs_ratio`, `tokens_ratio`, `distinct_ratio`: after/before
    *     (NULL unless `both`), rounded to 6
    *   - with value samples on both sides (`vs_values`): `ks` — the
    *     exact two-sample KS statistic between the standing
    *     distributions, NULL where either sample is missing/empty.
    *
    * Plan shape: a full outer join of two strata-sized frames plus
    * one strata×2k window pass — milliseconds regardless of corpus
    * size, because the profiles already absorbed the corpus. */
  def profileDrift(
      before: DataFrame,
      after: DataFrame,
      strataCol: String): DataFrame = {
    val hasVals = before.columns.contains("vs_values") &&
      after.columns.contains("vs_values")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(
        (Seq(
          col(strataCol),
          col("docs").cast("double").as(s"_docs$tag"),
          col("tokens").cast("double").as(s"_tokens$tag"),
          col("est_distinct_docs").as(s"_dist$tag")) ++
          (if (hasVals) Seq(col("vs_values").as(s"_vs$tag")) else Nil)): _*)
    val joined = side(before, "B").join(side(after, "A"),
      Seq(strataCol), "full")
    val status = when(col("_docsB").isNull, lit("new"))
      .when(col("_docsA").isNull, lit("gone"))
      .otherwise(lit("both"))
    def ratio(a: String, b: String): Column =
      when(col(a).isNotNull && col(b).isNotNull && col(b) =!= 0.0,
        round(col(a) / col(b), 6))
    val base = joined.select(
      (Seq(
        col(strataCol),
        status.as("status"),
        ratio("_docsA", "_docsB").as("docs_ratio"),
        ratio("_tokensA", "_tokensB").as("tokens_ratio"),
        ratio("_distA", "_distB").as("distinct_ratio")) ++
        (if (hasVals) Seq(col("_vsB"), col("_vsA")) else Nil)): _*)
    if (!hasVals) base
    else
      base
        .join(ksStat(base, strataCol, "_vsB", "_vsA"),
          Seq(strataCol), "left")
        .drop("_vsB", "_vsA")
  }
}
