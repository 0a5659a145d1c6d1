package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** DSIR-style data selection — "Data Selection for Language Models
  * via Importance Resampling" (Xie et al., NeurIPS 2023): score every
  * raw document by how much more likely its hashed-n-gram features are
  * under a trusted TARGET corpus than under the raw corpus itself,
  * then resample the raw corpus proportionally to those importance
  * weights. The cheap, embarrassingly-parallel way to steer a 100 TB
  * crawl toward a reference distribution (Wikipedia, curated books)
  * without running a model over it.
  *
  * Scale shape: features are hashed into a FIXED number of buckets
  * (the paper's trick — no vocabulary, no OOV, bounded state), so each
  * side's distribution is ONE map-side-combined explode+groupBy whose
  * result is `buckets` rows; the log-ratio dictionary is
  * broadcast-joined to the scoring pass; the resample is the priority
  * rule in log space (no `exp` under/overflow) planned as
  * TakeOrderedAndProject — nothing corpus-sized shuffles and no global
  * sort materializes.
  */
object Importance {

  /** Per-doc feature grams from a PRE-PROJECTED token array:
    * unigrams, plus word bigrams when `bigrams` (the paper's feature
    * set). Single-token docs get no bigram (folding them to the full
    * text would be a unigram duplicate, not a bigram).
    *
    * Callers must project `TextFunctions.tokens(text)` into a column
    * first and pass THAT here: the gram tree references the token
    * array several times, and `Generate` gets no codegen
    * subexpression elimination — inlining `tokens(text)` re-ran
    * `split(lower(text))` once per reference, ~8 full-text regex
    * splits per row on the bigram path (the r20 plan audit; same
    * lesson as [[TextFunctions.ngramsAll]]'s per-element-capture
    * note). */
  private def featureGramsOfToks(toks: Column, bigrams: Boolean): Column =
    if (!bigrams) toks
    else {
      // ngramsAll(n=2) under the size>=2 guard, over the projected
      // token array: two shifted slices zipped pairwise
      val width = greatest(size(toks) - 1, lit(0))
      val bi = zip_with(
        slice(toks, lit(1), width), slice(toks, lit(2), width),
        (a, b) => concat_ws(" ", a, b))
      concat(
        toks,
        when(size(toks) >= 2, bi)
          .otherwise(typedLit(Array.empty[String])))
    }

  private def bucketOf(
      gram: Column, buckets: Int, seed: String, portable: Boolean): Column =
    Sampling.hashOf(gram, seed, portable) % buckets

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** DSIR log importance weights: for each raw doc,
    * `Σ_grams ln p_target(bucket) − ln p_raw(bucket)` under add-`alpha`
    * smoothed hashed-gram bag distributions (sum, not mean — the
    * weight is the likelihood RATIO of the whole doc, so longer docs
    * legitimately move further from 0). Returns `(idCol, dsir_logw)`
    * for non-blank raw docs; an empty target or raw side has no model
    * and returns the empty frame loudly rather than scoring noise.
    *
    * Determinism for the oracle (`deterministic = true`, default):
    * per-bucket log ratios are rounded to 6 dp, each doc's terms are
    * summed in ascending-value order (collect_list order is not
    * deterministic; the sort makes it so), and the sum is rounded to
    * 6 dp — the exact discipline of
    * [[graft.text.TextFunctions.unigramLm]]. `deterministic = false`
    * is the production scale path: a plain codegen'd partial-agg sum
    * per doc (no list materialization, no per-row sort) — same value
    * up to float summation order (≤ last-ulp wobble), measurably
    * cheaper at probe scale. `portableHash = false` swaps the md5
    * bucket hash for codegen'd xxhash64 (different, equally valid
    * buckets — the production knob every hash-keyed op here
    * carries). */
  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = 8192,
      bigrams: Boolean = true,
      alpha: Double = 1.0,
      seed: String = "dsir",
      portableHash: Boolean = true,
      deterministic: Boolean = true
  ): DataFrame =
    dsirDict(raw, target, textCol, buckets, bigrams, alpha, seed,
      portableHash) match {
      case None =>
        raw.select(col(idCol), lit(0.0).as("dsir_logw")).limit(0)
      case Some(dict) =>
        dsirScoreWith(raw, dict, textCol, idCol, deterministic,
          buckets, bigrams, seed, portableHash)
    }

  /** The persistable half of [[dsirLogWeights]]: the `(bucket,
    * log-ratio, default)` dictionary as a `buckets`-row frame —
    * columns `bucket`, `lr`, `default_lr` (the shared smoothing ratio
    * for buckets unseen on both sides, carried on every row so the
    * frame is self-contained). Write it once (it is KB-scale parquet)
    * and score every future ingest batch with [[dsirScoreWith]] —
    * the steady-state form: the 100 TB raw corpus and the target are
    * each scanned ONCE ever; per batch only the batch moves. `None`
    * when either side has no grams (no model — score nothing,
    * loudly). */
  def dsirDict(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      buckets: Int = 8192,
      bigrams: Boolean = true,
      alpha: Double = 1.0,
      seed: String = "dsir",
      portableHash: Boolean = true
  ): Option[DataFrame] = {
    require(buckets > 0, s"buckets must be > 0 (got $buckets)")
    require(alpha > 0.0, s"alpha must be > 0 (got $alpha)")
    // ONE side-tagged count pass instead of two: the union scans each
    // side exactly once either way, but a single PIVOTED per-bucket
    // groupBy is one shuffle + one job where the per-side form paid
    // two of each — at 100 TB the shuffle is ≤ buckets rows, the
    // savings are the whole second corpus-scan job's scheduling.
    // Pivoting (conditional sums per side) instead of grouping by
    // (side, bucket) also removes the FullOuter join the per-side
    // frames needed downstream — the r20 plan audit showed it as a
    // SortMergeJoin (2 exchanges + 2 sorts) evaluated once per dict
    // consumer.
    val tagged = target.select(lit("t").as("_side"),
        col(textCol).as("_text"))
      .unionByName(raw.select(lit("r").as("_side"),
        col(textCol).as("_text")))
    val counts = tagged
      .where(length(trim(col("_text"))) > 0)
      .select(col("_side"), TextFunctions.tokens(col("_text")).as("_toks"))
      .select(col("_side"),
        explode(featureGramsOfToks(col("_toks"), bigrams)).as("_g"))
      .select(col("_side"),
        bucketOf(col("_g"), buckets, seed, portableHash).as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("_side") === "t", 1L).otherwise(0L)).as("_ct"),
        sum(when(col("_side") === "r", 1L).otherwise(0L)).as("_cr"))
      .localCheckpoint(true)
    // ONE totals job (the old shape ran four: two emptiness probes
    // here plus two totals aggs inside dictFromCounts)
    val tot = counts.agg(sum("_ct"), sum("_cr")).collect().head
    val tTot = if (tot.isNullAt(0)) 0L else tot.getLong(0)
    val rTot = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    if (tTot == 0L || rTot == 0L) None
    else Some(dictFromPivot(counts, tTot, rTot, buckets, bigrams, alpha,
      seed, portableHash))
  }

  /** The log-ratio dictionary from ONE pivoted per-bucket count frame
    * (`(bucket, _ct, _cr)`, zero where a side never saw the bucket)
    * with pre-aggregated side totals — the fused fast path of
    * [[dictFromCounts]]; identical values by construction (same
    * formula, same HALF_UP 6-dp rounding, `0 + alpha` ==
    * `coalesce(null, 0) + alpha`). */
  private def dictFromPivot(
      counts: DataFrame,
      tTot: Long,
      rTot: Long,
      buckets: Int,
      bigrams: Boolean,
      alpha: Double,
      seed: String,
      portableHash: Boolean
  ): DataFrame = {
    val tDen = tTot.toDouble + alpha * buckets
    val rDen = rTot.toDouble + alpha * buckets
    val defaultLr =
      round6(math.log(alpha / tDen) - math.log(alpha / rDen))
    counts.select(
      col("bucket"),
      round(
        log((col("_ct").cast("double") + alpha) / tDen) -
          log((col("_cr").cast("double") + alpha) / rDen),
        6).as("lr"),
      lit(defaultLr).as("default_lr"),
      lit(buckets).as("buckets"),
      lit(bigrams).as("bigrams"),
      lit(seed).as("seed"),
      lit(portableHash).as("portable"))
  }

  /** Per-bucket gram counts of `df` — the mergeable half of a DSIR
    * model (counts ADD across disjoint corpora; the standing
    * [[DsirIndex]] accumulates exactly these rows batch by batch).
    * Columns `(bucket, _c)`; blank docs contribute nothing. */
  private[graft] def bucketCounts(
      df: DataFrame,
      textCol: String,
      buckets: Int,
      bigrams: Boolean,
      seed: String,
      portableHash: Boolean
  ): DataFrame =
    df.where(length(trim(col(textCol))) > 0)
      .select(TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(explode(featureGramsOfToks(col("_toks"), bigrams)).as("_g"))
      .select(bucketOf(col("_g"), buckets, seed, portableHash).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("_c"))

  /** The add-`alpha` log-ratio dictionary from two bucket-count
    * frames (`tc`: (bucket, _ct); `rc`: (bucket, _cr)) — the
    * [[DsirIndex.dict]] math, value-identical to [[dsirDict]]'s fused
    * [[dictFromPivot]] at equal counts (same formula, same rounding),
    * so the standing artifact's dictionary is bit-identical to the
    * one-shot build. An absent raw side (zero rows) is a UNIFORM raw
    * model (every bucket at the smoothing floor) — the standing
    * artifact's cold start; [[dsirDict]] still refuses it (a one-shot
    * build with no raw corpus is a caller bug, not a cold start). */
  private[graft] def dictFromCounts(
      tc: DataFrame,
      rc: DataFrame,
      buckets: Int,
      bigrams: Boolean,
      alpha: Double,
      seed: String,
      portableHash: Boolean
  ): DataFrame = {
    val tTotRow = tc.agg(sum("_ct")).collect().head
    val rTotRow = rc.agg(sum("_cr")).collect().head
    val tDen =
      (if (tTotRow.isNullAt(0)) 0L else tTotRow.getLong(0)).toDouble +
        alpha * buckets
    val rDen =
      (if (rTotRow.isNullAt(0)) 0L else rTotRow.getLong(0)).toDouble +
        alpha * buckets
    // buckets unseen on BOTH sides share one default ratio — computed
    // driver-side with the same HALF_UP 6-dp rounding the dictionary
    // rows get, so the scoring coalesce is bit-identical to a
    // hypothetical zero-count dictionary row
    val defaultLr =
      round6(math.log(alpha / tDen) - math.log(alpha / rDen))
    tc.join(rc, Seq("bucket"), "full")
      .select(
        col("bucket"),
        round(
          log((coalesce(col("_ct"), lit(0L)).cast("double") + alpha) / tDen) -
            log((coalesce(col("_cr"), lit(0L)).cast("double") + alpha) / rDen),
          6).as("lr"),
        lit(defaultLr).as("default_lr"),
        // the hash configuration, PINNED on every row: a dictionary
        // scored under different knobs is silent garbage (the batch's
        // buckets land in the wrong rows) — dsirScoreWith refuses a
        // mismatch instead
        lit(buckets).as("buckets"),
        lit(bigrams).as("bigrams"),
        lit(seed).as("seed"),
        lit(portableHash).as("portable"))
  }

  /** Score any batch against a standing [[dsirDict]] frame: one
    * broadcast join over the batch's exploded grams, nothing
    * corpus-sized moves. The dictionary carries its hash
    * configuration on every row ([[dsirDict]] pins it); a call whose
    * knobs disagree is REFUSED — under mismatched knobs the batch's
    * buckets land in the wrong rows and every weight is silent
    * garbage. */
  def dsirScoreWith(
      batch: DataFrame,
      dict: DataFrame,
      textCol: String,
      idCol: String,
      deterministic: Boolean = true,
      buckets: Int = 8192,
      bigrams: Boolean = true,
      seed: String = "dsir",
      portableHash: Boolean = true
  ): DataFrame = {
    val nonBlank = length(trim(col(textCol))) > 0
    // the dictionary is driver-sized by construction (≤ buckets
    // rows); its pinned knobs and shared default are one scalar
    // read, then the scoring pass is a broadcast join + per-doc
    // aggregate over the batch
    val head = dict
      .select(col("default_lr"), col("buckets"), col("bigrams"),
        col("seed"), col("portable"))
      .limit(1).collect().headOption
    // an EMPTY dictionary frame (wrong path, zero-row parquet) has no
    // pinned knobs to check and no model to score under — defaulting
    // every weight to 0.0 would be silent garbage, the exact failure
    // mode the pinned-knob refusal exists to prevent
    require(head.nonEmpty,
      "dsirScoreWith: empty DSIR dictionary — a dictionary frame with " +
        "no rows has no model (wrong path?); build one with dsirDict")
    head.foreach { h =>
      require(
        h.getInt(1) == buckets && h.getBoolean(2) == bigrams &&
          h.getString(3) == seed && h.getBoolean(4) == portableHash,
        s"dsirScoreWith knobs (buckets=$buckets, bigrams=$bigrams, " +
          s"seed=$seed, portable=$portableHash) do not match the " +
          s"dictionary's pinned (buckets=${h.getInt(1)}, " +
          s"bigrams=${h.getBoolean(2)}, seed=${h.getString(3)}, " +
          s"portable=${h.getBoolean(4)}) — scoring under mismatched " +
          "knobs buckets the batch wrongly and every weight is garbage")
    }
    val default = head.map(_.getDouble(0))
    val withDefault = batch
      .where(nonBlank)
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        explode(featureGramsOfToks(col("_toks"), bigrams)).as("_g"))
      .select(col(idCol), bucketOf(col("_g"), buckets, seed, portableHash).as("bucket"))
      .join(broadcast(dict.select(col("bucket"), col("lr"))), Seq("bucket"), "left")
      .withColumn("_lr", coalesce(col("lr"), lit(default.getOrElse(0.0))))
    if (deterministic)
      withDefault
        .groupBy(col(idCol))
        .agg(
          round(
            aggregate(sort_array(collect_list(col("_lr"))), lit(0.0),
              (acc, x) => acc + x),
            6).as("dsir_logw"))
    else
      withDefault
        .groupBy(col(idCol))
        .agg(round(sum(col("_lr")), 6).as("dsir_logw"))
  }

  /** Importance RESAMPLE: the `k` raw docs drawn without replacement
    * with probability ∝ exp(dsir_logw) — the paper's Gumbel-top-k,
    * expressed as the [[Sampling.prioritySample]] rule in LOG space:
    * priority `ln(u) − logw` (u = the deterministic id-hash mapped to
    * (0,1]), k smallest win. Monotone-identical to `u / w` but immune
    * to exp overflow at |logw| in the hundreds (any real document).
    * Planned as TakeOrderedAndProject — a distributed top-k, no global
    * sort, no window over one partition. Returns `(idCol, dsir_logw)`
    * for the selected docs; ties (astronomically unlikely) break by
    * id for retry-stable determinism. */
  def dsirSample(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      buckets: Int = 8192,
      bigrams: Boolean = true,
      alpha: Double = 1.0,
      seed: String = "dsir",
      sampleSeed: String = "s0",
      portableHash: Boolean = true,
      deterministic: Boolean = true
  ): DataFrame = {
    require(k > 0, s"dsirSample k must be > 0 (got $k)")
    val w = dsirLogWeights(
      raw, target, textCol, idCol, buckets, bigrams, alpha, seed,
      portableHash, deterministic)
    val u = (Sampling.hashOf(col(idCol), sampleSeed, portableHash) + 1)
      .cast("double") / lit(4294967296.0)
    w.withColumn("_prio", round(log(u), 6) - col("dsir_logw"))
      .orderBy(col("_prio").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("dsir_logw"))
  }
}
