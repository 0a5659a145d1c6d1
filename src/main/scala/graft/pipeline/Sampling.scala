package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-shaping operators for training-data pipelines: sampling,
  * mixing, ordering, and sequence packing. These are the steps that
  * run AFTER filtering/dedup and decide what the model actually sees.
  *
  * Everything here is deterministic (hash-derived, seed-parameterized)
  * so a 100 TB pipeline re-run reproduces byte-identical datasets, and
  * every operator is a narrow per-row transform or a per-shard window
  * — no driver-side randomness, no `sample()` nondeterminism across
  * retried tasks (Spark's `sample` re-draws when a task is re-executed;
  * hash-gating never does).
  */
object Sampling {

  /** Portable 32-bit hash of (id, seed): first 8 hex chars of
    * `md5("<id>:<seed>")` as a long in [0, 2^32). The DuckDB oracle
    * recomputes it verbatim (`('0x' || substr(md5(...),1,8))::BIGINT`). */
  def hashOf(id: Column, seed: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, 8), 16, 10)
      .cast("long")

  /** [[hashOf]] with the production knob every other hash-keyed op
    * carries (`portableHash = false` → Catalyst `xxhash64`, codegen'd,
    * no crypto hash per row on what is otherwise a pure filter scan —
    * at 100 TB the md5 IS the sample's cost). Both configs are
    * deterministic and seed-parameterized; they draw DIFFERENT (still
    * valid, still reproducible) samples, so the knob is a config
    * choice, not a semantics knob — the oracle fixtures stay on the
    * portable default. */
  def hashOf(id: Column, seed: String, portable: Boolean): Column =
    if (portable) hashOf(id, seed)
    else pmod(xxhash64(concat(id.cast("string"), lit(":" + seed))),
      lit(4294967296L))

  /** Threshold for `rate` on the 32-bit hash range. Rates above 1.0
    * saturate (keep everything); negative or NaN rates would silently
    * empty the output, so they are refused. */
  private def gate(rate: Double): Long = {
    require(!rate.isNaN && rate >= 0.0,
      s"sample rate must be a non-negative number (got $rate)")
    (rate * 4294967296.0).toLong
  }

  /** Deterministic `rate`-sample: keep rows whose id-hash falls under
    * the rate gate. Pure filter — pushed to the scan, no shuffle, and
    * stable across re-runs/retries (the property `DataFrame.sample`
    * lacks). Different `seed`s give independent samples. */
  def hashSample(
      df: DataFrame,
      idCol: String,
      rate: Double,
      seed: String = "s0",
      portableHash: Boolean = true
  ): DataFrame =
    df.where(hashOf(col(idCol), seed, portableHash) < lit(gate(rate)))

  /** Stratified deterministic sampling — the "data mixing" primitive:
    * per-stratum keep-rates (e.g. lang or source weights), applied as
    * one narrow filter. Strata missing from `fractions` fall back to
    * `defaultRate`. */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      defaultRate: Double,
      idCol: String,
      seed: String = "s0",
      portableHash: Boolean = true
  ): DataFrame = {
    val thresh = fractions.foldLeft(lit(gate(defaultRate)): Column) {
      case (elze, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(gate(rate))).otherwise(elze)
    }
    df.where(hashOf(col(idCol), seed, portableHash) < thresh)
  }

  /** Resample a corpus to TARGET stratum proportions — the mixing
    * ACTION that [[graft.pipeline.Curation.corpusProfile]]'s
    * diagnostic informs: given target weights per stratum (language /
    * source mix), downsample each stratum so the output hits the
    * target proportions at the largest achievable size (no
    * upsampling). `Tmax = min_s(N_s / w_s)` is the biggest total the
    * observed counts support; each stratum keeps `w_s * T / N_s` of
    * its rows via the deterministic hash gate (`T = min(totalRows,
    * Tmax)` when a smaller budget is given). Strata not in `weights`
    * are dropped; a weighted stratum absent from the corpus makes the
    * mix unachievable (its Tmax would be 0) and throws
    * `IllegalArgumentException` naming the stratum — NOTE this is a
    * deliberate divergence from the q87/q91 DuckDB oracle SQL, whose
    * `USING (lang)` join would silently ignore an absent stratum
    * (unreachable with the oracle fixtures, which only weight present
    * strata).
    *
    * Plan shape at 100 TB: stratum cardinality is small by definition
    * (languages, sources), so the observed counts are ONE map-side-
    * combined aggregation collected to the driver (same pattern as
    * BM25's corpus constants); the rates become literals in a single
    * pushed-down filter — the data-sized pass is a pure narrow scan,
    * retry-stable like every hash gate here. */
  def mixToWeights(
      df: DataFrame,
      strataCol: String,
      weights: Map[String, Double],
      idCol: String,
      seed: String = "s0",
      totalRows: Option[Long] = None,
      portableHash: Boolean = true
  ): DataFrame = {
    require(weights.nonEmpty, "mixToWeights needs at least one stratum weight")
    require(weights.values.forall(_ > 0),
      s"stratum weights must be > 0 (got $weights)")
    // strata keyed as strings (weights are a Map[String, _]); casting
    // the column keeps non-string stratum columns (int bucket ids)
    // working with the same string-keyed API
    val observed = observedBy(df, strataCol, count(lit(1)))
    val rates = mixRates(observed, weights, totalRows)
    stratifiedHashSample(df, strataCol, rates, defaultRate = 0.0, idCol,
      seed, portableHash)
  }

  /** Per-stratum totals (strata keyed as strings so non-string
    * stratum columns work with the string-keyed weight maps). */
  private def observedBy(
      df: DataFrame,
      strataCol: String,
      total: Column
  ): Map[String, Long] =
    df.groupBy(col(strataCol).cast("string").as("_s"))
      .agg(total.as("_t"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  /** The shared mixing-rate math (one place, so the IEEE expression
    * tree the oracles recompute can never drift between the row and
    * token variants): `Tmax = min_s(obs_s / w_s)`, capped by the
    * budget, `rate_s = w_s * T / obs_s`; zero-total strata are
    * dropped (their rate would be 0 via the default anyway). */
  private def mixRates(
      observed: Map[String, Long],
      weights: Map[String, Double],
      budget: Option[Long]
  ): Map[String, Double] = {
    // defense-in-depth mirror of the public entry points' check: a 0.0
    // weight reaching the Tmax min would yield obs/0.0 = Infinity and
    // silently distort the mix instead of failing loudly
    require(weights.values.forall(_ > 0),
      s"stratum weights must be > 0 (got $weights)")
    // a weighted stratum absent from the corpus makes Tmax 0 and would
    // silently empty the ENTIRE output — fail loudly naming it instead
    // (the caller either fixes the weight map or filters it upstream)
    val missing = weights.keySet.filterNot(observed.get(_).exists(_ > 0))
    require(missing.isEmpty,
      s"mix weights name strata absent from the corpus: " +
        s"${missing.toSeq.sorted.mkString(", ")} — their Tmax would be 0 " +
        "and the whole output would be empty")
    val tmax = weights
      .map { case (s, w) => observed.getOrElse(s, 0L) / w }
      .min
    val t = budget.fold(tmax)(b => math.min(b.toDouble, tmax))
    weights.flatMap { case (s, w) =>
      observed.get(s).filter(_ > 0).map(obs => s -> (w * t) / obs)
    }
  }

  /** Token-weighted mixing — [[mixToWeights]] in TOKEN space, the
    * form mixes are actually specified in ("50% web, 30% code, 20%
    * wiki of the token budget"): per-stratum token totals from ONE
    * aggregation pass, `Tmax = min_s(T_s / w_s)` the largest token
    * total the corpus supports at the target proportions, each
    * stratum keeps `(w_s * T) / T_s` of its rows by hash gate
    * (`T = min(budgetTokens, Tmax)` when a budget is given).
    * Row-level gating hits a token target in expectation — the
    * [[tokenBudgetSample]] scale-path trade, tight for any corpus
    * big enough to need mixing. Same plan shape as [[mixToWeights]]:
    * tiny collected agg → literal rates → one pushed filter.
    * Returns the kept rows with `n_tokens` attached. */
  def mixToTokenWeights(
      df: DataFrame,
      strataCol: String,
      weights: Map[String, Double],
      textCol: String,
      idCol: String,
      seed: String = "s0",
      budgetTokens: Option[Long] = None,
      portableHash: Boolean = true
  ): DataFrame = {
    require(weights.nonEmpty, "mixToTokenWeights needs at least one stratum")
    require(weights.values.forall(_ > 0),
      s"stratum weights must be > 0 (got $weights)")
    val withTok = df.withColumn(
      "n_tokens",
      graft.text.TextFunctions.tokenCount(col(textCol)).cast("long"))
    val observed = observedBy(withTok, strataCol, sum(col("n_tokens")))
    val rates = mixRates(observed, weights, budgetTokens)
    stratifiedHashSample(withTok, strataCol, rates, defaultRate = 0.0,
      idCol, seed, portableHash)
  }

  /** Temperature-based stratum mixing — the mT5/XLM-R α-sampling rule:
    * stratum s contributes tokens ∝ `T_s^alpha` (T_s its natural token
    * count). `alpha = 1` preserves natural proportions; lowering it
    * flattens the mix toward uniform — the standard way multilingual
    * pipelines up-weight low-resource strata without hand-tuning a
    * weight table. Derives `w_s = T_s^alpha` from the SAME single
    * aggregation pass [[mixToTokenWeights]] uses and feeds the shared
    * rate math ([[mixRates]]), so the plan shape is unchanged: tiny
    * collected agg → literal rates → one pushed hash-gate filter.
    *
    * Because a filter can only DOWNSAMPLE, the flattening works from
    * the small end: `Tmax = min_s(T_s / T_s^alpha) = min_s T_s^(1-α)`
    * is set by the SMALLEST stratum, which keeps everything, while
    * larger strata keep `(T_min / T_s)^(1-α)` of their tokens —
    * natural proportions at α = 1 (every rate is 1, nothing drops),
    * full flattening toward the smallest at α → 0. `budgetTokens`
    * scales the whole mix down proportionally when even the flattened
    * total is more than the run wants.
    *
    * Oracle geometry: at `alpha = 0.5` the weight is IEEE `sqrt` —
    * correctly rounded in every engine — so q124 recomputes the exact
    * rates in SQL. General `alpha` uses `Math.pow` (last-ulp
    * engine-dependent: fine for mixing, not for an exactness oracle). */
  def temperatureMix(
      df: DataFrame,
      strataCol: String,
      textCol: String,
      idCol: String,
      alpha: Double,
      seed: String = "s0",
      budgetTokens: Option[Long] = None,
      portableHash: Boolean = true
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1] (got $alpha)")
    val withTok = df.withColumn(
      "n_tokens",
      graft.text.TextFunctions.tokenCount(col(textCol)).cast("long"))
    val observed = observedBy(withTok, strataCol, sum(col("n_tokens")))
    val weights = observed.collect {
      case (s, t) if t > 0 =>
        s -> (if (alpha == 0.5) math.sqrt(t.toDouble)
              else math.pow(t.toDouble, alpha))
    }
    require(weights.nonEmpty, "temperatureMix: corpus has no tokens")
    val rates = mixRates(observed, weights, budgetTokens)
    stratifiedHashSample(withTok, strataCol, rates, defaultRate = 0.0,
      idCol, seed, portableHash)
  }

  /** Leakage-safe train/valid/test splitting: hash-split by the
    * near-dup CLUSTER, not the document. A plain per-doc hash split
    * leaks evaluation signal — a paraphrase of a training document
    * lands in the test set and scores as generalization — so the
    * split key is the doc's connected component over `pairs` (any
    * near-dup pair frame: LSH, SimHash, embedding; `id_a`/`id_b`),
    * with singletons their own cluster: every member of a cluster
    * gets the SAME label, and near-dups can never straddle a split.
    *
    * Deterministic and retry-stable like every sampling op here: the
    * label is a hash gate on the cluster key against the cumulative
    * fractions (first match wins; the LAST split absorbs the hash
    * tail, so fractions must sum to 1). Plan shape: the components
    * run on the PAIRS graph only (pairs are rare; docs without pairs
    * never enter the contraction), one left join attaches the key,
    * the labeling is a narrow expression. Returns `df` + `split`. */
  def leakSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      seed: String = "s0",
      maxIter: Int = 50,
      portableHash: Boolean = true
  ): DataFrame = {
    require(splits.size >= 2, "leakSafeSplit needs at least two splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names in ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0),
      s"split fractions must be > 0 (got $splits)")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1 (got ${splits.map(_._2).sum})")
    val comps = graft.dedup.Dedup
      .connectedComponents(pairs, maxIter = maxIter)
      .withColumnRenamed("id", idCol)
    val keyed = df
      .join(comps, Seq(idCol), "left")
      .withColumn("_ckey",
        coalesce(col("component"), col(idCol).cast("long")))
      .drop("component")
    val h = hashOf(col("_ckey"), seed, portableHash)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val label = splits.zip(cum).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), c), elze) =>
      when(h < lit(gate(c)), lit(name)).otherwise(elze)
    }
    keyed.withColumn("split", label).drop("_ckey")
  }

  /** Deterministic global interleave ("shuffle") order: position =
    * rank of the id-hash. Training dataloaders need the corpus in a
    * fixed pseudo-random order decorrelated from ingest order; sorting
    * by a hash is the distributed, reproducible way (Spark range-
    * partitions the sort — no single reducer). Returns the input plus
    * a dense 0-based `position` column.
    *
    * Scale note: `row_number` over a global order runs one final
    * pass on a single reducer at the very end. For 100 TB you'd keep
    * just the hash sort-key as the order (files written range-
    * partitioned in hash order) and skip the dense numbering; the
    * dense position is for consumers that need an explicit index. */
  def interleave(df: DataFrame, idCol: String, seed: String = "s0"): DataFrame = {
    val h = hashOf(col(idCol), seed)
    val w = Window.orderBy(h.asc, col(idCol).asc)
    df.withColumn("position", row_number().over(w).cast("long") - 1)
  }

  /** The 100 TB interleave: just the sort key. `df.orderBy
    * (interleaveKey(col(id), seed))` runs as a range-partitioned
    * distributed sort and the written file order IS the shuffle —
    * no dense numbering pass. */
  def interleaveKey(
      id: Column,
      seed: String = "s0",
      portableHash: Boolean = true
  ): Column =
    hashOf(id, seed, portableHash)

  /** The interleaved CORPUS WRITE the key enables — the executable
    * 100 TB shuffle story: rows land in `numFiles` parquet files
    * range-partitioned on ([[interleaveKey]], id), each file sorted
    * within, so reading the files in range order IS the interleave —
    * no dense numbering, no single-reducer final pass (the plan is a
    * range Exchange, never SinglePartition; [[interleave]]'s
    * `row_number` stays the small-corpus variant for consumers that
    * need an explicit index). The key is persisted as `_ikey` so a
    * re-read can verify contiguity and a training loader can
    * merge-read files in order without recomputing hashes. Ties in
    * the 32-bit key are broken by id in BOTH the partitioning and the
    * in-file sort — file key-ranges never interleave even on hash
    * collisions. */
  def writeInterleaved(
      df: DataFrame,
      idCol: String,
      path: String,
      numFiles: Int,
      seed: String = "s0",
      portableHash: Boolean = true
  ): Unit = {
    require(numFiles > 0, s"numFiles must be > 0 (got $numFiles)")
    interleavedPlan(df, idCol, numFiles, seed, portableHash)
      .write.mode("overwrite").parquet(path)
  }

  /** The dataframe [[writeInterleaved]] writes (separate so specs can
    * assert the plan shape: range Exchange, no SinglePartition). */
  private[graft] def interleavedPlan(
      df: DataFrame,
      idCol: String,
      numFiles: Int,
      seed: String,
      portableHash: Boolean = true
  ): DataFrame = {
    // _ikey is a reserved output column: silently overwriting one from
    // the input (e.g. a re-read of a previous writeInterleaved output)
    // would lose caller data — fail loudly, the caller drops it first
    require(!df.columns.contains("_ikey"),
      "input already has a _ikey column (reserved for the interleave " +
        "key, e.g. from a previous writeInterleaved output) — drop or " +
        "rename it before re-interleaving")
    df.withColumn("_ikey", interleaveKey(col(idCol), seed, portableHash))
      .repartitionByRange(numFiles, col("_ikey"), col(idCol))
      .sortWithinPartitions(col("_ikey"), col(idCol))
  }

  /** Cap each stratum's contribution at `k` rows, chosen by hash rank
    * — "at most N docs per source/domain", the mixing cap that keeps
    * one crawl from dominating a training mix. Deterministic like
    * [[hashSample]]; the per-stratum window shuffles once on the
    * stratum key (AQE handles a skewed giant stratum). */
  def topKPerStratum(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      k: Int,
      seed: String = "s0",
      portableHash: Boolean = true
  ): DataFrame = {
    val w = Window
      .partitionBy(col(strataCol))
      .orderBy(hashOf(col(idCol), seed, portableHash).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Sample a corpus down to a TOKEN budget — the data-mixing step
    * that answers "give me 50 B tokens of this source", where doc
    * counts are the wrong unit because doc lengths vary by orders of
    * magnitude.
    *
    * THE SCALE PATH (default): one aggregate pass estimates the
    * corpus token total, the keep-rate `budget / total` is applied as
    * a [[hashSample]] gate — a pure pushed-down filter, no shuffle,
    * retry-stable; the delivered budget is approximate within
    * sampling error (tight for any corpus big enough to need this).
    *
    * `exact = true` orders docs by `(hash(id, seed), id)` — a
    * deterministic "random" order — and keeps the greedy prefix whose
    * PRECEDING cumulative token count is under the budget (so the
    * budget is exceeded by at most one document). The running-sum
    * window is a single-reducer global sort: verification scale only,
    * and the DuckDB-oracle-able twin of the gate. Both paths return
    * the input columns plus `n_tokens`. */
  def tokenBudgetSample(
      df: DataFrame,
      textCol: String,
      idCol: String,
      budgetTokens: Long,
      seed: String = "s0",
      exact: Boolean = false,
      portableHash: Boolean = true
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0 (got $budgetTokens)")
    val withTok = df.withColumn(
      "n_tokens",
      graft.text.TextFunctions.tokenCount(col(textCol)).cast("long"))
    if (exact) {
      val w = Window
        .orderBy(hashOf(col(idCol), seed, portableHash).asc, col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      withTok
        .withColumn("_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .where(col("_before") < budgetTokens)
        .drop("_before")
    } else {
      val totalRow = withTok.agg(sum(col("n_tokens"))).collect().head
      // empty corpus: sum is null — everything (nothing) fits the budget
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      if (total <= budgetTokens) withTok
      else hashSample(withTok, idCol, budgetTokens.toDouble / total, seed,
        portableHash)
    }
  }

  /** Sequence packing (GPT-style concat-and-chunk) metadata, sharded:
    * within each of `numShards` hash-shards, documents are laid out in
    * id order; each doc gets its token start offset and the index of
    * the `budget`-sized context window its first token lands in.
    * Returns (shard, id, n_tokens, start_tok, bin).
    *
    * Sharding is what makes this scale: packing is inherently
    * sequential (an offset depends on every doc before it), so the
    * 100 TB layout packs independently within shards — each shard's
    * window is one partition of work, all shards in parallel. A global
    * pack is `numShards = 1` (verification scale only).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long,
      numShards: Int = 1,
      seed: String = "s0",
      portableHash: Boolean = true
  ): DataFrame = {
    require(budget > 0, s"packSequences budget must be > 0 (got $budget)")
    require(numShards > 0, s"packSequences numShards must be > 0 (got $numShards)")
    val shard =
      pmod(hashOf(col(idCol), seed, portableHash), lit(numShards)).cast("int")
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("start_tok") / lit(budget)))
      .select(col("shard"), col(idCol), col("n_tokens"), col("start_tok"), col("bin"))
  }

  /** Deterministic weighted sampling WITHOUT replacement — priority
    * sampling (Duffield, Lund, Thorup, "Priority sampling for
    * estimation of arbitrary subset sums", JACM 2007): each row gets
    * priority `u / w` with `u = hash(id, seed) / 2^32` uniform in
    * [0,1), and the k SMALLEST priorities per stratum are the sample
    * — higher weight ⇒ smaller expected priority ⇒ more likely in.
    * Unlike the rate gates above this draws an EXACT-size sample per
    * stratum (k rows, or all of a stratum smaller than k), and unlike
    * `DataFrame.sample` it is deterministic and retry-stable: the
    * priority is pure hash arithmetic, so re-runs, retries and other
    * engines (the DuckDB oracle replays the identical division) pick
    * the identical rows.
    *
    * Plan shape at 100 TB: one shuffle by the stratum key (the
    * row_number window) over rows carrying only (id, stratum, weight)
    * — strata are few by definition (languages, sources), so the
    * window state is k ids per stratum; a skew-prone single stratum
    * can be pre-cut with [[hashSample]] to O(k·log) candidates first
    * (priorities are uniform: the k smallest survive any unbiased
    * pre-cut that keeps ≫ k rows). Weights must be strictly
    * positive. */
  def prioritySample(
      df: DataFrame,
      strataCol: String,
      weight: Column,
      k: Int,
      idCol: String,
      seed: String = "s0",
      portableHash: Boolean = true
  ): DataFrame = {
    require(k > 0, s"prioritySample k must be > 0 (got $k)")
    val priority = hashOf(col(idCol), seed, portableHash).cast("double") /
      (lit(4294967296.0) * weight.cast("double"))
    val w = Window
      .partitionBy(col(strataCol))
      .orderBy(priority.asc, col(idCol).asc)
    df.withColumn("_prio_rn", row_number().over(w))
      .where(col("_prio_rn") <= k)
      .drop("_prio_rn")
  }

  /** Materialize FRACTIONAL training epochs — the mixing action for
    * weights above 1 (DoReMi / Pile-style domain reweighting, where
    * an upweighted domain is seen more than once per pass): each row
    * is emitted `floor(e)` times plus one more with probability
    * `frac(e)`, decided by the deterministic id-hash gate — so the
    * realized epoch count is exact in expectation, reproducible, and
    * retry-stable. `epochs` is any non-negative double column
    * (per-stratum literals, a quality score, a learned weight);
    * rows with `e < 1` become a downsample (kept with probability
    * e), making this the one-op generalization of [[hashSample]] to
    * weights on BOTH sides of 1.
    *
    * Output: the input columns plus `epoch_idx` (0-based copy
    * number). Plan shape: a narrow explode of a per-row
    * `sequence(0, repeats-1)` — no shuffle, no driver state; the
    * blow-up factor is the mixture's own epoch mass. */
  def epochRepeat(
      df: DataFrame,
      epochs: Column,
      idCol: String,
      seed: String = "s0",
      portableHash: Boolean = true
  ): DataFrame = {
    require(!df.columns.contains("epoch_idx"),
      "epochRepeat reserves the epoch_idx column name")
    val e = epochs.cast("double")
    val extra = (hashOf(col(idCol), seed, portableHash).cast("double") <
      (e - floor(e)) * lit(4294967296.0)).cast("long")
    val repeats = floor(e).cast("long") + extra
    df.withColumn("_reps", repeats)
      .where(col("_reps") > 0)
      .withColumn("epoch_idx",
        explode(sequence(lit(0L), col("_reps") - 1)))
      .drop("_reps")
  }
}
