package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** The lang / quality / length gates shared by [[curate]],
    * [[curateNear]] and [[graft.streaming.IngestDaemon]] — three
    * narrow predicates that fuse into one codegen'd filter over the
    * scan. */
  private[graft] def gate(
      df: DataFrame,
      textCol: String,
      lang: String,
      minQuality: Double,
      minTokens: Int,
      maxTokens: Int
  ): DataFrame = {
    val t = col(textCol)
    // n_tokens and quality both read the ONE-walk qualityStats struct
    // (content-equal expressions → whole-stage CSE evaluates it once);
    // langId is the second walk — two text passes per gated doc where
    // the composed helpers ran four-plus
    val s = TextFunctions.qualityStats(t)
    df.withColumn("n_tokens", s.getField("n_tokens"))
      .withColumn("quality", TextFunctions.qualityScoreOf(s))
      .where(
        TextFunctions.langId(t) === lang &&
          col("quality") >= minQuality &&
          col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens
      )
  }

  /** The Gopher repetition gate (Rae et al. 2021 Table A1): keep
    * documents under ALL eleven repetition thresholds — duplicated
    * lines, top-{2,3,4}-gram char share, dup-{5..10}-gram mass. The
    * defaults are the paper's published cut-offs. One native text
    * walk per row ([[TextFunctions.repetitionStats]] — the eleven
    * field reads are content-equal expressions, whole-stage CSE
    * evaluates the struct once); pure filter, pushed to the scan, no
    * shuffle — composes before/after [[curate]]'s quality gate. */
  def repetitionGate(
      df: DataFrame,
      textCol: String,
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxTopNgramCharFrac: Seq[Double] = Seq(0.20, 0.18, 0.16),
      maxDupNgramCharFrac: Seq[Double] =
        Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)
  ): DataFrame = {
    require(maxTopNgramCharFrac.size == 3,
      s"maxTopNgramCharFrac covers n in 2..4 (got ${maxTopNgramCharFrac.size} thresholds)")
    require(maxDupNgramCharFrac.size == 6,
      s"maxDupNgramCharFrac covers n in 5..10 (got ${maxDupNgramCharFrac.size} thresholds)")
    // ONE boolean expression, one text walk. The obvious composed
    // predicate — eleven getField reads of repetitionStats AND-ed in
    // a where() — plans eleven copies of the struct subtree inside
    // FilterExec, and filter predicates sit outside whole-stage
    // subexpression elimination (Project/Aggregate only): the bench
    // measured that form at ~10× the one-walk panel cost.
    df.where(graft.functions.RepetitionGate.column(col(textCol),
      Seq(maxDupLineFrac, maxDupLineCharFrac) ++
        maxTopNgramCharFrac ++ maxDupNgramCharFrac))
  }

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
    val gated = gate(df, textCol, lang, minQuality, minTokens, maxTokens)
    val deduped = Dedup.exactDedup(gated, textCol, idCol)
    if (sampleRate >= 1.0) deduped
    else Sampling.hashSample(deduped, idCol, sampleRate, seed)
  }

  /** [[curate]] with the FINGERPRINT near-dup tier in place of exact
    * dedup: gate survivors are clustered by
    * [[Dedup.fingerprintClusters]] (simhash → pigeonhole-banded
    * Hamming pairing → connected components) and each cluster keeps
    * its minimum-id member; unclustered docs pass through. The cap
    * diagnostic is ENFORCED — a band bucket past `maxBucket` throws
    * instead of silently shipping a corpus that still contains
    * near-duplicates the pairing missed (the reference's
    * checkable-consistency discipline, offset2/log.go:304-344).
    *
    * Plan shape at 100 TB: the gates are one fused filter over the
    * scan; the fingerprint tier runs entirely on the skinny
    * `(id, fingerprint)` projection (one narrow simhash aggregation,
    * a banded equi-join, a pairs-graph-only CC); the loser set is a
    * small fraction of the corpus, so the back anti-join streams
    * against a shrunken right side AQE broadcasts when it fits. */
  def curateNear(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucket: Long = 100000L,
      bits: Int = 64,
      sampleRate: Double = 1.0,
      seed: String = "s0",
      maxIter: Int = 50
  ): DataFrame = {
    val gated = gate(df, textCol, lang, minQuality, minTokens, maxTokens)
    val losers = Dedup
      .fingerprintClusters(gated, textCol, idCol,
        maxHamming, bands, maxBucket, bits, maxIter)
      .where(col("id") =!= col("component"))
      .select(col("id").as("_dup_id"))
    val deduped =
      gated.join(losers, gated(idCol) === col("_dup_id"), "left_anti")
    if (sampleRate >= 1.0) deduped
    else Sampling.hashSample(deduped, idCol, sampleRate, seed)
  }

  /** Ingest-batch curation against a STANDING corpus — the
    * steady-state form of [[curateNear]]: the new batch is gated
    * (language / quality / length, one fused filter), then near-dup'd
    * INCREMENTALLY via [[Dedup.incrementalLshPairs]] against the
    * corpus's persisted [[Dedup.lshBandIndex]] — the standing corpus
    * is never re-hashed or re-paired. Drop rule
    * ([[Dedup.incrementalDropIds]], the SAME components+min-canonical
    * policy as [[curateNear]], unified in round 10): connected
    * components over the batch-touching pair graph; a cluster holding
    * any corpus doc drops all its batch members (the standing corpus
    * always wins — it is already curated), an all-batch cluster keeps
    * its minimum id. Returns the batch survivors with `n_tokens` and
    * `quality` attached, like [[curate]].
    *
    * Plan shape at 100 TB: gates fuse into the batch scan; the pair
    * stage is batch-linear (broadcast-semi index probe, pushed-id
    * text fetch); the side-tagging joins run pairs×batch-ids (AQE
    * broadcasts the small side) and the final anti-join streams the
    * gated batch against the small drop set. Nothing corpus-sized
    * moves at any point. */
  def curateIncremental(
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      corpusBands: DataFrame,
      corpusTexts: DataFrame,
      lang: String = "en",
      minQuality: Double = 0.5,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleWidth: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Long = 10000L,
      portableHash: Boolean = true,
      maxIter: Int = 50
  ): DataFrame = {
    val gated = gate(newDocs, textCol, lang, minQuality, minTokens, maxTokens)
    val pairs = Dedup.incrementalLshPairs(
      gated, textCol, idCol, corpusBands, corpusTexts,
      numHashes, bands, shingleWidth, threshold, maxBucket, portableHash)
    val drops =
      Dedup.incrementalDropIds(pairs, gated.select(col(idCol)), idCol, maxIter)
    gated.join(drops, gated(idCol) === col("_dup_id"), "left_anti")
  }

  /** [[curateIncremental]] over a MANAGED [[graft.dedup.DedupIndex]]:
    * gate the batch, then one transactional
    * [[graft.dedup.DedupIndex.ingest]] — probe, survivor rule, and
    * the index advance (the batch's bands + fingerprints) as a single
    * versioned commit, crash-replayable exactly once. The production
    * entry point for a standing ingest pipeline; `curateIncremental`
    * remains for callers managing loose band frames themselves.
    * Returns the admitted batch rows with `n_tokens` and `quality`
    * attached. */
  def curateIngest(
      index: graft.dedup.DedupIndex,
      batchId: String,
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      corpusTexts: DataFrame,
      lang: String = "en",
      minQuality: Double = 0.5,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      threshold: Double = 0.5,
      maxBucket: Long = 10000L
  ): DataFrame = {
    val gated = gate(newDocs, textCol, lang, minQuality, minTokens, maxTokens)
    index
      .ingest(batchId, gated, textCol, idCol, corpusTexts, threshold,
        maxBucket)
      .admitted
  }

  /** Per-stratum corpus profile — the diagnostic a mixing decision
    * reads before [[Sampling.stratifiedHashSample]] sets weights:
    * for each stratum (source, lang, …) the doc count, token total,
    * distinct-content count (by [[TextFunctions.fingerprint]]), the
    * duplication ratio, and the distinct-token (vocabulary) count.
    *
    * Every metric is an INTEGER or a ratio of integers, so the
    * result is bit-deterministic regardless of aggregation order —
    * no float-summation caveats in the oracle. Plan shape: one
    * groupBy over the corpus (count-distinct expands to the standard
    * two-phase plan) plus one explode+groupBy pair for the
    * vocabulary, joined on the tiny per-stratum frame. */
  def corpusProfile(
      df: DataFrame,
      textCol: String,
      idCol: String,
      strataCol: String
  ): DataFrame = {
    val base = df
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("tokens"),
        countDistinct(TextFunctions.fingerprint(col(textCol)))
          .as("distinct_docs"))
      .withColumn(
        "dup_ratio",
        round(lit(1.0) - col("distinct_docs").cast("double") / col("docs"), 6))
    val vocabSize = df
      .select(col(strataCol),
        explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      // tokens() yields [] for blank docs (nothing explodes), so this
      // filter is pure defense now — kept so the vocabulary can never
      // count an empty-string "word" if the tokenizer contract shifts
      .where(length(col("_tok")) > 0)
      .groupBy(col(strataCol))
      .agg(countDistinct(col("_tok")).as("distinct_tokens"))
    base.join(vocabSize, Seq(strataCol), "left")
      .withColumn("distinct_tokens",
        coalesce(col("distinct_tokens"), lit(0L)))
  }

  /** Keep the top `keepFrac` of rows by `scoreCol` — the adaptive
    * cousin of `curate`'s fixed `minQuality` threshold: "best 20% of
    * the crawl", whatever score distribution this crawl has.
    *
    * THE SCALE PATH (default): estimate the cut point with
    * `approxQuantile` (one partial-aggregated pass, Greenwald-Khanna,
    * no sort, no shuffle of rows) and apply it as a narrow filter a
    * second pass pushes to the scan. Selectivity is approximate
    * within `relErr` — exactly the trade a 100 TB gate wants.
    *
    * `exact = true` ranks with `percent_rank` over (score desc, id)
    * instead: deterministic to the row and DuckDB-oracle-able, but
    * the global window is a single-reducer sort — verification scale
    * only. */
  def qualityGate(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      keepFrac: Double,
      exact: Boolean = false,
      relErr: Double = 0.001
  ): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"qualityGate keepFrac must be in (0, 1] (got $keepFrac)")
    if (keepFrac >= 1.0) df
    else if (exact) {
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      df.withColumn("_pr", percent_rank().over(w))
        .where(col("_pr") < keepFrac)
        .drop("_pr")
    } else {
      val cuts =
        df.stat.approxQuantile(scoreCol, Array(1.0 - keepFrac), relErr)
      // approxQuantile returns NO quantiles for an empty (or all-null
      // score) input — an empty corpus gates to an empty corpus, not a
      // MatchError
      if (cuts.isEmpty) df.limit(0)
      else df.where(col(scoreCol) >= cuts(0))
    }
  }
}
