package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All of these are pure `org.apache.spark.sql.functions` compositions
  * — no UDFs — so they stay inside whole-stage codegen and scale as
  * narrow per-row transforms (no shuffle; a 100 TB corpus maps through
  * them at scan speed). Every function is deterministic and has an
  * exact ANSI-SQL equivalent for the DuckDB oracle.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens. Edge whitespace of EVERY kind is
    * neutral (Spark's `trim` strips only 0x20 — a trailing newline
    * would otherwise leave a phantom "" token in every
    * newline-terminated document, inflating token counts, budgets and
    * signature votes corpus-wide): `split` on `\s+` can only emit ""
    * at the array edges, so `array_remove` drops exactly those — one
    * array pass instead of the extra full-text regex scan a
    * `regexp_replace` edge-strip costs (that variant measurably
    * slowed every tokenizing operator in the round-13 bench). */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "\\s+"), "")

  /** Whitespace token count (empty/all-whitespace text counts 0 —
    * [[tokens]] already yields the empty array for it). */
  def tokenCount(text: Column): Column =
    size(tokens(text))

  /** Reflow whitespace tokens into fixed `width`-token lines joined
    * by newlines — imposes line structure on unsegmented text so
    * line-granular ops ([[graft.dedup.Dedup.dedupLines]]) apply to
    * newline-free corpora. Narrow per-row expression; empty text
    * reflows to the empty string. */
  def reflowLines(text: Column, width: Int): Column = {
    require(width > 0, s"reflowLines width must be > 0 (got $width)")
    val toks = tokens(text)
    val n = when(length(trim(text)) === 0, lit(0)).otherwise(size(toks))
    when(n === 0, lit(""))
      .otherwise(concat_ws("\n",
        transform(
          sequence(lit(0), floor((n - 1) / lit(width)).cast("int")),
          i => concat_ws(" ", slice(toks, i * width + 1, lit(width))))))
  }

  /** BPE-ish subword count: word chunks of <=4 chars + standalone
    * punctuation, the usual cheap proxy for LLM token budgeting.
    * Counted via regex so it needs no vocabulary. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]{1,4}|[^a-z0-9\\s]"), lit(0)))

  private val punctClass = "[.,;:!?'\"()\\[\\]{}-]"

  /** Punctuation chars / total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, lit(0.0)).otherwise(
      (total - length(regexp_replace(text, punctClass, ""))).cast("double") / total
    )
  }

  /** Digit chars / total chars. */
  def digitRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, lit(0.0)).otherwise(
      (total - length(regexp_replace(text, "[0-9]", ""))).cast("double") / total
    )
  }

  /** English stopwords — a small fixed list shared verbatim with the
    * oracle SQL (graft.SparkEntry.oracleSql) so ratios match exactly. */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "was",
      "it", "for", "on", "with", "as", "at", "by", "that", "this")

  /** Stopword tokens / tokens (0 for empty). */
  def stopwordRatio(text: Column): Column = {
    val hits = size(filter(tokens(text), w => w.isin(stopwordsEn: _*)))
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(hits.cast("double") / tokenCount(text))
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, presence of stopwords (prose-ness), low digit noise.
    * Weights are arbitrary but fixed; the oracle recomputes them.
    *
    * Counting is ONE native text walk ([[graft.functions
    * .QualityStats]] — round 14; the composed ratio helpers evaluated
    * `tokens()` three times and ran two regex engines per row); the
    * score FORMULA below is the same Column algebra over the same
    * integer counters, so the doubles cannot diverge from
    * [[qualityScoreComposed]] (spec-pinned). The struct is read five
    * times but whole-stage CSE evaluates it once per row (the
    * expression's content-based equality is what makes the five
    * reads recognizably identical). */
  def qualityScore(text: Column): Column =
    qualityScoreOf(qualityStats(text))

  /** The one-walk counter struct behind [[qualityScore]] — exposed so
    * composed pipelines (Curation's gate) can read `n_tokens` and the
    * score from ONE evaluation (whole-stage CSE unifies the
    * content-equal struct reads). */
  private[graft] def qualityStats(text: Column): Column =
    graft.functions.QualityStats.column(text, stopwordsEn)

  /** The score formula over a [[qualityStats]] struct. */
  private[graft] def qualityScoreOf(s: Column): Column = {
    val nChars = s.getField("n_chars")
    val nTokens = s.getField("n_tokens")
    val lenScore = least(nTokens.cast("double") / 100.0, lit(1.0))
    val pRatio = when(nChars === 0, lit(0.0))
      .otherwise(s.getField("n_punct").cast("double") / nChars)
    val punctOk = when(pRatio < 0.1, 1.0).otherwise(0.5)
    val sRatio = when(nTokens === 0, lit(0.0))
      .otherwise(s.getField("n_stop").cast("double") / nTokens)
    val stopOk = least(sRatio * 5.0, lit(1.0))
    val dRatio = when(nChars === 0, lit(0.0))
      .otherwise(s.getField("n_digit").cast("double") / nChars)
    val digitOk = when(dRatio < 0.2, 1.0).otherwise(0.3)
    round(
      lenScore * 0.3 + punctOk * 0.2 + stopOk * 0.3 + digitOk * 0.2,
      6
    )
  }

  /** The composed (multi-pass builtins) score — the executable
    * specification [[qualityScore]]'s native counters are pinned
    * against (ShingleExprSpec asserts bit-identical doubles). */
  private[graft] def qualityScoreComposed(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctOk = when(punctRatio(text) < 0.1, 1.0).otherwise(0.5)
    val stopOk = least(stopwordRatio(text) * 5.0, lit(1.0))
    val digitOk = when(digitRatio(text) < 0.2, 1.0).otherwise(0.3)
    round(
      lenScore * 0.3 + punctOk * 0.2 + stopOk * 0.3 + digitOk * 0.2,
      6
    )
  }

  /** Marker stopwords per language for the n-gram-free heuristic
    * language ID. Shared verbatim with the oracle. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "que")
  )

  /** Heuristic language ID: argmax of marker-stopword hits, ties broken
    * by the fixed language order above, "und" (undetermined) when no
    * marker hits at all. Counting is ONE native token walk
    * ([[graft.functions.LangMarkerHits]] — round 14; the composed form
    * re-tokenized once per language through interpreted higher-order
    * filters); the argmax/tie-break formula below is identical Column
    * algebra over the same counters, so results cannot diverge from
    * [[langIdComposed]] (spec-pinned). */
  def langId(text: Column): Column = {
    val hitsArr = graft.functions.LangMarkerHits
      .column(text, langMarkers.map(_._2))
    val counts = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> hitsArr.getItem(i)
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, c), elze) =>
      when(c === best && best > 0, lit(lang)).otherwise(elze)
    }
  }

  /** The composed (per-language filter) form — the executable
    * specification [[langId]]'s native counters are pinned against. */
  private[graft] def langIdComposed(text: Column): Column = {
    val toks = tokens(text)
    val counts = langMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, w => w.isin(words: _*)))
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, c), elze) =>
      when(c === best && best > 0, lit(lang)).otherwise(elze)
    }
  }

  /** Document fingerprint: md5 of the normalized text (lower-case,
    * whitespace collapsed, trimmed) — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Unicode NFC normalization ([[graft.functions.NfcNormalize]], a
    * codegen'd native expression — no UDF): canonical composed form,
    * so byte-keyed identity (fingerprints, line keys, gram hashes)
    * treats "café" the same whether a source shipped U+00E9 or
    * `e`+combining-acute. Run it BEFORE [[fingerprint]] on corpora
    * with mixed provenance; already-NFC rows (all ASCII) return the
    * same string with no allocation. */
  def nfcNormalize(text: Column): Column =
    graft.functions.NfcNormalize.column(text)

  /** Distinct tokens / total tokens — the low-diversity (template /
    * boilerplate) repetition signal of Gopher-style quality filters.
    * Pure columnar: no explode, no shuffle. */
  def uniqueTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Sliding-window token chunks — the doc→passage split an embedding
    * pipeline runs before vectorizing: windows of `chunkTokens`
    * tokens, starts every `stride` tokens (overlap = chunk − stride),
    * the final window clamped at the document end. Docs shorter than
    * one chunk yield themselves. Pure columnar (sequence + slice), no
    * explode here — pair with `posexplode` to get (chunk_idx, text)
    * rows. */
  def chunks(text: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens > 0, s"chunks chunkTokens must be > 0 (got $chunkTokens)")
    require(stride > 0, s"chunks stride must be > 0 (got $stride)")
    // A window starts on the stride grid, plus the FINAL window
    // (kept so the up-to-stride-1 tail tokens of every document
    // appear in SOME chunk; a tail window that is also on the grid is
    // emitted once). Docs shorter than one chunk yield themselves.
    // Native one-pass walk ([[graft.functions.TokenChunks]]): the
    // previous composed form was a zip_with ladder `chunkTokens`
    // expressions deep — fine for the repetition panel's n ≤ 10, a
    // planner StackOverflow at the 512–2048-token windows packing
    // pipelines actually use — and the pre-fix transform-with-slice
    // form re-tokenized the text once per window.
    graft.functions.TokenChunks.column(text, chunkTokens, stride)
  }

  /** PII scrubbing: replace emails, URLs, and long digit runs (ids,
    * phone/account numbers) with typed placeholder tokens. The
    * patterns are deliberately conservative and RE2-compatible so the
    * DuckDB oracle applies the identical regexes; a production scrub
    * extends the pattern list, not the plan shape (still one narrow
    * regexp_replace chain inside codegen, no UDF). */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(
      text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[0-9]{9,}", "<NUM>")
  }

  /** Word n-grams WITH duplicates (multiset — unlike
    * [[graft.dedup.Dedup.shingles]] which is a set), for frequency-
    * based repetition measures.
    *
    * Built by zipping `n` SHIFTED slices of the token array — every
    * array is an argument of `zip_with`, so the tokenizer runs a
    * bounded number of times per ROW. The obvious form (`transform`
    * over positions with `slice(toks, i, n)` in the lambda) captures
    * `toks` in the lambda body, and higher-order functions re-evaluate
    * captured subtrees PER ELEMENT — it re-split the text once per
    * gram position, O(tokens²) per document (the r17 DSIR bench run
    * measured it as 8 s of a 0.4 s operator). */
  def ngramsAll(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = size(toks)
    val width = greatest(m - (n - 1), lit(0))
    val grams = (0 until n)
      .map(j => slice(toks, lit(j + 1), width))
      .reduce((acc, nxt) =>
        zip_with(acc, nxt, (a, b) => concat_ws(" ", a, b)))
    when(m >= n, grams).otherwise(array(concat_ws(" ", toks)))
  }

  /** Okapi BM25 relevance of every document for a small fixed term
    * set — the lexical ranking half of a retrieval/search layer (the
    * embedding half is `similarity/Ann`).
    *
    * Plan shape: per-term tf is a narrow per-row `filter(tokens)`
    * count (no explode, no inverted-index shuffle — the term list is
    * a query, so it is tiny and inlined); the corpus constants (N,
    * avgdl, per-term df) come from ONE partial-aggregated pass whose
    * k+2 numbers return to the driver and re-enter as literals; the
    * score is then a second narrow pass, summed in FIXED term order
    * so the float result is deterministic (a groupBy-sum over
    * exploded terms would add in shuffle order). Returns (id, score)
    * for docs matching at least one term, score rounded to 6. */
  def bm25(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val toks = tokens(col(textCol))
    def tf(t: String): Column =
      size(filter(toks, w => w === lit(t))).cast("double")
    val dl = tokenCount(col(textCol)).cast("double")
    // one aggregate pass: N, avgdl, df per term
    val aggs = avg(dl).as("avgdl") +:
      terms.map(t => sum((tf(t) > 0).cast("long")).as(s"df_$t"))
    val consts = df.agg(count(lit(1)).as("n"), aggs: _*).collect()(0)
    // empty corpus: avgdl is SQL NULL and getDouble would NPE — there
    // is nothing to rank, return the empty (id, score) frame
    if (consts.getLong(0) == 0L)
      return df.select(col(idCol), lit(0.0).as("score")).limit(0)
    val n = consts.getLong(0).toDouble
    val avgdl = consts.getDouble(1)
    val score = terms.zipWithIndex
      .map { case (t, i) =>
        val dfT = consts.getLong(2 + i).toDouble
        val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
        lit(idf) * tf(t) * (lit(k1) + 1.0) /
          (tf(t) + lit(k1) * (lit(1.0) - b + lit(b) * dl / avgdl))
      }
      .reduce(_ + _) // fixed left-to-right term order
    df.select(col(idCol), round(score, 6).as("score"))
      .where(col("score") > 0.0)
  }

  /** CCNet-style unigram language-model scoring: per-document mean
    * token log-probability under the CORPUS's own unigram
    * distribution — the cheap LM-perplexity proxy the classic
    * web-corpus pipelines gate on (low mean log-prob = rare-token
    * soup = likely junk; suspiciously high = boilerplate).
    *
    * Scale shape: token counts are ONE explode+groupBy shuffle
    * (map-side combined); the top-`vocabSize` vocabulary with
    * precomputed log-probs is BROADCAST to the scoring join (a vocab
    * is small by construction — that is what makes it a vocab); the
    * per-doc mean is the second and last shuffle. Out-of-vocabulary
    * tokens get `ln(oovCount / totalTokens)` — an unseen-token
    * pseudo-count, not a hard zero.
    *
    * Determinism for the oracle (`deterministic = true`, default):
    * per-token log-probs are rounded to 6 dp FIRST, each doc's terms
    * are summed in ASCENDING VALUE order (sort_array over the
    * collected list — collect_list order is not deterministic, the
    * sort makes it so), and the mean is rounded to 6 dp.
    * `deterministic = false` is the production scale path: a plain
    * codegen'd sum/count per doc (no list materialization, no
    * ObjectHashAggregate) — same value up to float summation order
    * (≤ last-ulp wobble), ~2× cheaper at 10× probe scale. Returns
    * `(id, lm_logprob)` for non-empty docs. */
  def unigramLm(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocabSize: Int = 65536,
      oovCount: Double = 0.5,
      deterministic: Boolean = true,
      narrowScoring: Boolean = true
  ): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be > 0 (got $vocabSize)")
    require(oovCount > 0.0, s"oovCount must be > 0 (got $oovCount)")
    val toks = df
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
    // materialize the count table ONCE (eager localCheckpoint — the
    // dedupLines/verifyJaccard gate pattern): the total action below
    // and the vocab cut inside the scoring plan would otherwise each
    // re-run the full tokenize+explode+shuffle pipeline
    val counts = toks
      .groupBy("_tok").agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    // one scalar action: the corpus token total becomes a literal
    // (empty corpus → no token rows → empty result, not a div-by-0)
    val totalRow = counts.agg(sum("_c")).collect().head
    if (totalRow.isNullAt(0))
      return toks.select(col(idCol), lit(0.0).as("lm_logprob")).limit(0)
    val total = totalRow.getLong(0).toDouble
    val vocab = counts
      .orderBy(col("_c").desc, col("_tok").asc) // deterministic cut
      .limit(vocabSize)
      .select(col("_tok"),
        round(log(col("_c").cast("double") / lit(total)), 6).as("_logp"))
    if (narrowScoring) {
      // The vocab is driver-sized BY CONSTRUCTION (that is what makes
      // it a vocab — the join leg's broadcast() collected it to the
      // driver anyway), so collect it WITH its Spark-rounded log-probs
      // and score each doc in ONE per-row expression
      // ([[graft.functions.UnigramScore]]): no token explode, no
      // probe join, no doc-keyed regroup of every token's log-prob —
      // the token COUNT above stays the operator's only shuffle. The
      // join leg below (`narrowScoring = false`) is the executable
      // twin, spec-pinned equal on the deterministic config.
      val vpairs = vocab.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toSeq
      val oovLogp = java.math.BigDecimal
        .valueOf(math.log(oovCount / total))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val s = graft.functions.UnigramScore
        .column(col(textCol), vpairs, oovLogp, sortedSum = deterministic)
      // explode: zero-token docs (e.g. tab-only text that passes the
      // blank filter but tokenizes empty) drop exactly like the join
      // leg's token explode dropped them
      return df
        .where(length(trim(col(textCol))) > 0)
        .select(col(idCol), explode(s).as("lm_logprob"))
    }
    val scored = toks
      .join(broadcast(vocab), Seq("_tok"), "left")
      .withColumn("_logp",
        coalesce(col("_logp"), round(log(lit(oovCount / total)), 6)))
    if (deterministic)
      scored
        .groupBy(col(idCol))
        .agg(
          sort_array(collect_list(col("_logp"))).as("_ps"),
          count(lit(1)).as("_n"))
        .select(
          col(idCol),
          round(
            aggregate(col("_ps"), lit(0.0), (a, x) => a + x) / col("_n"),
            6).as("lm_logprob"))
    else
      scored
        .groupBy(col(idCol))
        .agg(round(sum(col("_logp")) / count(lit(1)), 6).as("lm_logprob"))
  }

  /** [[unigramLm]] in its CROSS-CORPUS form — the actual CCNet shape:
    * train the unigram distribution on a trusted REFERENCE corpus
    * (Wikipedia in the paper), score the crawl against it. Self-
    * trained scoring ([[unigramLm]]) ranks docs by in-corpus
    * typicality; reference-trained scoring ranks them by closeness
    * to the reference's language — the gate that filters a noisy
    * crawl toward clean text instead of toward its own mode.
    *
    * Same scale shape as [[unigramLm]]: the reference's token counts
    * are one map-side-combined shuffle (over the REFERENCE only —
    * typically orders of magnitude smaller than the corpus being
    * scored), the vocab is driver-sized by construction, and the
    * corpus side is scored in one narrow per-row expression
    * ([[graft.functions.UnigramScore]]) — the 100 TB crawl is
    * scanned once, never exploded, never shuffled. OOV tokens get
    * `ln(oovCount / referenceTotal)`. An EMPTY reference has no
    * model: the empty `(id, lm_logprob)` frame returns (score
    * nothing, loudly droppable) rather than scoring everything OOV.
    * Returns `(id, lm_logprob)` for non-empty docs, the q121 oracle
    * recomputes both the training and the scoring in SQL. */
  def unigramLmFrom(
      ref: DataFrame,
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocabSize: Int = 65536,
      oovCount: Double = 0.5,
      deterministic: Boolean = true
  ): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be > 0 (got $vocabSize)")
    require(oovCount > 0.0, s"oovCount must be > 0 (got $oovCount)")
    val counts = ref
      .where(length(trim(col(textCol))) > 0)
      .select(explode(tokens(col(textCol))).as("_tok"))
      .groupBy("_tok").agg(count(lit(1)).as("_c"))
      .localCheckpoint(true) // total + vocab cut reuse one shuffle
    val totalRow = counts.agg(sum("_c")).collect().head
    if (totalRow.isNullAt(0))
      return df.select(col(idCol), lit(0.0).as("lm_logprob")).limit(0)
    val total = totalRow.getLong(0).toDouble
    val vpairs = counts
      .orderBy(col("_c").desc, col("_tok").asc) // deterministic cut
      .limit(vocabSize)
      .select(col("_tok"),
        round(log(col("_c").cast("double") / lit(total)), 6).as("_logp"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
    val oovLogp = java.math.BigDecimal
      .valueOf(math.log(oovCount / total))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val s = graft.functions.UnigramScore
      .column(col(textCol), vpairs, oovLogp, sortedSum = deterministic)
    df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(s).as("lm_logprob"))
  }

  /** Cross-corpus BIGRAM language-model scoring with add-α smoothing
    * — one conditioning order up from [[unigramLmFrom]] (the CCNet
    * shape: score candidate text against a trusted reference corpus;
    * bigrams separate fluent text from shuffled-word soup that a
    * unigram model scores identically). Per document:
    * `avg over bigrams (w1,w2) of ln((c(w1 w2) + α) / (c(w1) + α·V))`
    * with counts from the REFERENCE corpus and `V` its distinct
    * vocabulary — add-α smoothing keeps unseen bigrams (and unseen
    * contexts) finite. Each bigram logprob is 6-dp rounded and the
    * per-doc mean sums in sorted order, so both engines fold the
    * identical IEEE doubles in the identical order (the q121
    * discipline).
    *
    * Plan shape at 100 TB: everything is keyed joins and map-side
    * aggregates — the reference dictionary is (distinct ref bigrams)
    * rows, never collected; the scored side explodes to one row per
    * bigram, joins the dictionary on the bigram string and the
    * context count on the first token, and folds back per doc. No
    * windows, no driver-side state beyond V and the token total. */
  def bigramLmFrom(
      ref: DataFrame,
      df: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 0.5
  ): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0 (got $alpha)")
    def bigramsOf(d: DataFrame): Column = {
      // capture-free (ngramsAll zips shifted slices — the element_at
      // form re-tokenized per position); single-token docs have NO
      // bigrams, so the <2 fallback is the EMPTY array, not ngramsAll's
      // whole-text degenerate gram
      val toks = tokens(col(textCol))
      when(size(toks) >= 2, ngramsAll(col(textCol), 2))
        .otherwise(typedLit(Array.empty[String]))
    }
    val refToks = ref
      .where(length(trim(col(textCol))) > 0)
      .select(explode(tokens(col(textCol))).as("_tok"))
    val vRow = refToks.agg(countDistinct(col("_tok"))).collect().head
    val v = vRow.getLong(0)
    if (v == 0L)
      return df.select(col(idCol), lit(0.0).as("lm_logprob")).limit(0)
    val ctxCounts = refToks
      .groupBy(col("_tok").as("_w1"))
      .agg(count(lit(1)).as("_cu"))
    val bigramCounts = ref
      .where(length(trim(col(textCol))) > 0)
      .select(explode(bigramsOf(ref)).as("_bg"))
      .groupBy("_bg")
      .agg(count(lit(1)).as("_cb"))
    val scored = df
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(bigramsOf(df)).as("_bg"))
      .withColumn("_w1", split(col("_bg"), " ").getItem(0))
      .join(bigramCounts, Seq("_bg"), "left")
      .join(ctxCounts, Seq("_w1"), "left")
      .select(col(idCol),
        round(log(
          (coalesce(col("_cb"), lit(0L)).cast("double") + lit(alpha)) /
            (coalesce(col("_cu"), lit(0L)).cast("double") +
              lit(alpha) * lit(v.toDouble))), 6).as("_logp"))
    scored
      .groupBy(col(idCol))
      .agg(
        round(
          aggregate(sort_array(collect_list(col("_logp"))), lit(0.0),
            (acc, x) => acc + x) / count(lit(1)),
          6).as("lm_logprob"))
  }

  // --- Gopher-style repetition signals (Rae et al. 2021, Table A1) ---

  /** The full Gopher repetition panel as one struct: duplicated-line
    * fraction + char fraction, top-{2,3,4}-gram char fraction,
    * dup-{5..10}-gram char fraction. Eleven signals, ONE native text
    * walk per row ([[graft.functions.RepetitionStats]] — a hash-count
    * pass per gram size over a token array built once; no explode, no
    * shuffle, scan-speed at 100 TB). The standard pre-training
    * repetition gate evaluates all of them per document and
    * thresholds each. The Column-algebra twins below are the
    * executable semantics, spec-pinned bit-identical. */
  def repetitionStats(text: Column): Column =
    graft.functions.RepetitionStats.column(text)

  /** Fraction of lines that are duplicates of another line in the SAME
    * document (instance-counted: all k copies of a k≥2 line count;
    * blank-after-trim lines are structure, not content). The
    * template/boilerplate page signal; 0.0 for docs with no non-empty
    * lines. Reads the [[repetitionStats]] struct — several signal
    * reads per row still cost ONE walk (whole-stage CSE unifies the
    * content-equal struct evaluations). */
  def dupLineFrac(text: Column): Column =
    repetitionStats(text).getField("dup_line_frac")

  /** Character-mass companion of [[dupLineFrac]]: chars in duplicated
    * lines / chars in all non-empty lines — one long duplicated
    * footer weighs its true share, not one line-count vote. */
  def dupLineCharFrac(text: Column): Column =
    repetitionStats(text).getField("dup_line_char_frac")

  /** Fraction of the document's characters covered by its single most
    * frequent word `n`-gram (count × gram chars / text chars, clamped
    * to 1.0 — overlapping occurrences can oversubscribe on degenerate
    * "a a a …" docs; ties break to the UTF-8-byte-largest gram,
    * deterministically in both engines). The Gopher top-2/3/4-gram
    * gates; 0.0 when the doc has fewer than `n` tokens. */
  def topNgramCharFrac(text: Column, n: Int): Column = {
    require(n >= 2 && n <= 4,
      s"topNgramCharFrac panel covers n in 2..4 (got $n); " +
        "use topNgramCharFracComposed for other widths")
    repetitionStats(text).getField(s"top_${n}gram_char_frac")
  }

  /** Fraction of the doc's `n`-gram character MASS (Σ count × chars)
    * sitting in n-grams that occur at least twice — the Gopher
    * dup-5..10-gram family. Mass-normalized rather than
    * position-normalized (a position-coverage bitmap needs per-token
    * state; the mass form bounds the same behavior and stays in
    * [0,1]). 0.0 below `n` tokens. */
  def dupNgramCharFrac(text: Column, n: Int): Column = {
    require(n >= 5 && n <= 10,
      s"dupNgramCharFrac panel covers n in 5..10 (got $n); " +
        "use dupNgramCharFracComposed for other widths")
    repetitionStats(text).getField(s"dup_${n}gram_char_frac")
  }

  // Executable Column-algebra twins of the native panel, spec-pinned
  // bit-identical (TextRepetitionSpec). Duplicate instances of a
  // SORTED array are exactly the instances equal to a neighbor; value
  // runs are the spans between inequality boundaries. Every array
  // here is built in ARGUMENT position (zip_with/arrays_zip inputs) —
  // a captured array inside a higher-order lambda re-evaluates per
  // element (the O(m² log m) trap the native expression exists to
  // avoid); these twins stay O(m log m) and generalize to any n, but
  // the native walk is still ~an order faster (no per-row sorts, no
  // boxed index arrays).

  /** Non-empty lines of `text` (split on `\n`; lines that trim to ""
    * are structural paragraph breaks, not content). */
  private def contentLines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  /** For sorted array `s` of size `m`: a boolean mask, element i true
    * iff instance i equals a neighbor (belongs to a value with c≥2).
    * Built from shifted copies in argument position — the lambdas
    * bind only their own elements. */
  private def dupMaskOf(s: Column, m: Column): Column = {
    val sNext = concat(
      slice(s, lit(2), greatest(m - 1, lit(0))),
      array(lit(null).cast("string")))
    val eqNext = zip_with(s, sNext, (a, b) => a <=> b)
    val eqPrev = concat(
      array(lit(false)),
      slice(eqNext, lit(1), greatest(m - 1, lit(0))))
    zip_with(eqNext, eqPrev, (a, b) => a || b)
  }

  private[graft] def dupLineFracComposed(text: Column): Column = {
    val s = sort_array(contentLines(text))
    val m = size(s)
    when(m === 0, lit(0.0)).otherwise(
      round(
        size(filter(dupMaskOf(s, m), x => x)).cast("double") / m,
        6))
  }

  private[graft] def dupLineCharFracComposed(text: Column): Column = {
    val s = sort_array(contentLines(text))
    val m = size(s)
    when(m === 0, lit(0.0)).otherwise {
      val dupChars = aggregate(
        zip_with(dupMaskOf(s, m), s,
          (d, l) => when(d, length(l).cast("long")).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x)
      val totChars = aggregate(
        transform(s, l => length(l).cast("long")),
        lit(0L), (acc, x) => acc + x)
      when(totChars === 0, lit(0.0))
        .otherwise(round(dupChars.cast("double") / totChars, 6))
    }
  }

  /** Value runs of the doc's sorted `n`-gram multiset, as
    * `struct(c, gram)`. Run starts are the inequality boundaries;
    * each run's count is the gap to the next start's index. Callers
    * guard `tokenCount >= n`. */
  private def gramRuns(text: Column, n: Int): Column = {
    val g = sort_array(ngramsAll(text, n))
    val m = size(g)
    val gPrev = concat(
      array(lit(null).cast("string")),
      slice(g, lit(1), greatest(m - 1, lit(0))))
    // (gram, new-run flag, 1-based idx), zipped ONCE in argument
    // position; field names degrade to "0","1","2" for computed inputs
    val zipped = arrays_zip(
      g,
      zip_with(g, gPrev, (a, b) => a <=> b),
      sequence(lit(1), m))
    val starts = filter(zipped, t => !t.getField("1"))
    val nextIdx = concat(
      transform(
        slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
        t => t.getField("2")),
      array(m + 1))
    zip_with(starts, nextIdx, (a, e) =>
      struct(
        (e - a.getField("2")).as("c"),
        a.getField("0").as("gram")))
  }

  private[graft] def topNgramCharFracComposed(text: Column, n: Int): Column = {
    require(n > 0, s"topNgramCharFracComposed n must be > 0 (got $n)")
    val toks = tokens(text)
    when(size(toks) < n, lit(0.0)).otherwise {
      val top = array_max(gramRuns(text, n))
      round(
        least(
          (top.getField("c") * length(top.getField("gram"))).cast("double") /
            length(text),
          lit(1.0)),
        6)
    }
  }

  private[graft] def dupNgramCharFracComposed(text: Column, n: Int): Column = {
    require(n > 0, s"dupNgramCharFracComposed n must be > 0 (got $n)")
    val toks = tokens(text)
    when(size(toks) < n, lit(0.0)).otherwise {
      val runs = gramRuns(text, n)
      val masses = transform(runs, r =>
        struct(
          (r.getField("c") * length(r.getField("gram"))).cast("long").as("m"),
          (r.getField("c") >= 2).as("dup")))
      val dupMass = aggregate(masses, lit(0L), (a, r) =>
        a + when(r.getField("dup"), r.getField("m")).otherwise(lit(0L)))
      val totMass = aggregate(masses, lit(0L),
        (a, r) => a + r.getField("m"))
      when(totMass === 0, lit(0.0))
        .otherwise(round(dupMass.cast("double") / totMass, 6))
    }
  }

  private[graft] def repetitionStatsComposed(text: Column): Column =
    struct(
      (Seq(
        dupLineFracComposed(text).as("dup_line_frac"),
        dupLineCharFracComposed(text).as("dup_line_char_frac")) ++
        (2 to 4).map(n =>
          topNgramCharFracComposed(text, n).as(s"top_${n}gram_char_frac")) ++
        (5 to 10).map(n =>
          dupNgramCharFracComposed(text, n).as(s"dup_${n}gram_char_frac"))): _*)
}
