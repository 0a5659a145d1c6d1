package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Corpus-level boilerplate detection: n-grams that recur across many
  * DIFFERENT documents (nav bars, license headers, templated openers)
  * are boilerplate; a document made mostly of them is template chaff
  * even when it is not an exact duplicate of anything. Complements
  * within-doc repetition (TextFunctions) and cross-doc dedup (Dedup):
  * this is the cross-doc, sub-document signal.
  *
  * Plan shape at 100 TB: one shingle pass over the corpus feeds a
  * gram-keyed partial-aggregated count (shuffle #1, (gram, n) pairs
  * only — no text); grams are then cut to the boilerplate survivors
  * (df >= minDocs), which is a tiny fraction of the gram space, so
  * the count-back join streams the full gram list against a SHRUNK
  * right side (AQE picks broadcast when it fits) before the final
  * per-doc aggregation (shuffle #2 on doc id). Two narrow shuffles,
  * both carrying hashes/counts — the minimum for a corpus-frequency
  * statistic.
  */
object Boilerplate {

  /** Distinct width-grams appearing in at least `minDocs` documents:
    * (gram, df) — the corpus's boilerplate dictionary. */
  def boilerplateGrams(
      df: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 3,
      minDocs: Long = 2L
  ): DataFrame = {
    require(width > 0, s"boilerplate width must be > 0 (got $width)")
    require(minDocs > 1, s"boilerplate minDocs must be > 1 (got $minDocs)")
    df
      // shingles are distinct per doc → count(*) = document frequency
      .select(col(idCol), explode(
        Dedup.shinglesNative(df, col(textCol), width)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)
  }

  /** Per-document boilerplate ratio: of the doc's distinct
    * width-grams, the fraction appearing in >= minDocs docs corpus-
    * wide. Returns (id, n_grams, n_boiler, boiler_ratio).
    *
    * Internal gram identity is `xxhash64(gram)` — 8 bytes on the wire
    * where the gram text averages ~25, so both shuffles and the
    * semi-join right side shrink ~3× (the output carries no keys, so
    * it is hash-invariant; a 64-bit collision — ~n²/2^65, a handful
    * of merged doc-frequencies even at 10^10 distinct grams — can at
    * worst nudge one gram over `minDocs`, noise for a ratio gate and
    * unobservable at oracle scale). [[boilerplateGrams]] keeps the
    * string-keyed form: its OUTPUT is the dictionary itself. */
  def boilerplateRatio(
      df: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 3,
      minDocs: Long = 2L,
      maxBroadcastKeys: Long = 1000000L
  ): DataFrame = {
    require(width > 0, s"boilerplate width must be > 0 (got $width)")
    require(minDocs > 1, s"boilerplate minDocs must be > 1 (got $minDocs)")
    val grams = df
      .select(col(idCol), explode(
        Dedup.shinglesNative(df, col(textCol), width)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("_gk"))
    val boiler = grams
      .groupBy(col("_gk"))
      .agg(count(lit(1)).as("df")) // shingles distinct per doc → df
      .where(col("df") >= minDocs)
      .select(col("_gk"))
    // Count-gated narrow scoring (the dedupLines discipline): while
    // the boilerplate dictionary is modest, collect it and score every
    // doc in ONE per-row expression ([[graft.functions
    // .GramSetOverlap]]) — the gram-df count above stays the only
    // shuffle; the hit semi-join and the doc-keyed regroup of every
    // gram hit are gone. Past the gate, the join leg degrades
    // gracefully (spec-pinned identical output).
    val dict = boiler.localCheckpoint(true)
    if (dict.count() <= maxBroadcastKeys) {
      val keys = dict.collect().map(_.getLong(0))
      val s = graft.functions.GramSetOverlap
        .column(col(textCol), width, keys)
      // explode(array(...)): evaluate ONCE per row; a null text's
      // null struct falls back to the join leg's exact expressions
      val fallbackN =
        size(Dedup.shinglesNative(df, col("_t"), width)).cast("long")
      return df
        .select(col(idCol), col(textCol).as("_t"),
          explode(array(s)).as("_s"))
        .select(col(idCol),
          coalesce(col("_s.n_grams"), fallbackN).as("n_grams"),
          coalesce(col("_s.n_hits"), lit(0L)).as("n_boiler"))
        .withColumn(
          "boiler_ratio",
          round(col("n_boiler").cast("double") / col("n_grams"), 6))
    }
    val perDoc = grams
      .join(dict, Seq("_gk"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_boiler"))
    df.select(col(idCol),
        size(Dedup.shinglesNative(df, col(textCol), width))
          .cast("long").as("n_grams"))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_boiler"))
      .withColumn(
        "boiler_ratio",
        round(col("n_boiler").cast("double") / col("n_grams"), 6))
  }
}
