package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination: flag (and drop) training documents that
  * share word n-grams with an evaluation set — the standard guard
  * against test-set leakage in a training-data pipeline.
  *
  * Plan shape at 100 TB: the eval side is definitionally small (a
  * benchmark suite — thousands of docs, not billions), so its distinct
  * n-gram set is collected into a broadcast hash relation; the corpus
  * side is ONE narrow scan → shingle → explode pass joined map-side
  * against that broadcast, then a partial-aggregated count per doc.
  * No corpus-keyed shuffle ever carries document text — only
  * (id, gram) pairs that actually hit the eval set survive to the
  * aggregation. Contrast with a corpus×corpus dedup: decontamination
  * is corpus×benchmark, which is why broadcast is safe here and on
  * by default; pass `broadcastEval = false` to let AQE choose for an
  * unusually large eval set.
  */
object Decontaminate {

  /** Per-document contamination counts: (id, overlap) where `overlap`
    * is the number of distinct width-grams of the doc that appear
    * anywhere in `evalSet`. Only contaminated docs (overlap >=
    * minOverlap) are returned. */
  def overlapCounts(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 3,
      minOverlap: Long = 1L,
      broadcastEval: Boolean = true,
      maxCollectedKeys: Long = 1000000L
  ): DataFrame = {
    require(width > 0, s"decontaminate width must be > 0 (got $width)")
    require(minOverlap > 0, s"decontaminate minOverlap must be > 0 (got $minOverlap)")
    // gram identity = xxhash64(gram): the broadcast hash relation and
    // the corpus-side probe carry 8-byte keys instead of gram text
    // (~3× smaller); the output carries no keys, so it is
    // hash-invariant up to 64-bit collisions (~n²/2^65 — could at
    // worst count one phantom overlap gram, unobservable at oracle
    // scale and noise against a gram-count threshold)
    val evalGrams0 = evalSet
      .select(explode(
        Dedup.shinglesNative(evalSet, col(textCol), width)).as("_gram"))
      .select(xxhash64(col("_gram")).as("_gk"))
      .distinct()
    // Count-gated narrow scoring: the eval gram set was going to ride
    // a broadcast hash relation anyway — while it is modest, COLLECT
    // it instead and score every corpus doc in one per-row expression
    // ([[graft.functions.GramSetOverlap]]): no corpus-side gram
    // explode, no join, no doc-keyed regroup of hits — the whole
    // operator is one narrow scan of the corpus. Past the gate (or
    // with broadcastEval = false, the caller's "unusually large eval
    // set" escape hatch) the join leg runs as before.
    if (broadcastEval) {
      val dict = evalGrams0.localCheckpoint(true)
      if (dict.count() <= maxCollectedKeys) {
        val keys = dict.collect().map(_.getLong(0))
        val s = graft.functions.GramSetOverlap
          .column(col(textCol), width, keys)
        // null-text corpus rows: null struct → null overlap → dropped
        // by the threshold filter, exactly like the join leg (whose
        // explode dropped the doc before aggregation)
        return corpus
          .select(col(idCol), explode(array(s)).as("_s"))
          .select(col(idCol), col("_s.n_hits").as("overlap"))
          .where(col("overlap") >= minOverlap)
      }
      // over-gate: fall through to the join leg against the already-
      // materialized dict
      return overlapJoinLeg(corpus, broadcast(dict), textCol, idCol,
        width, minOverlap)
    }
    overlapJoinLeg(corpus, evalGrams0, textCol, idCol, width, minOverlap)
  }

  /** The join/regroup scoring leg of [[overlapCounts]] — the over-gate
    * fallback and the executable twin the narrow leg is spec-pinned
    * against. */
  private def overlapJoinLeg(
      corpus: DataFrame,
      evalGrams: DataFrame,
      textCol: String,
      idCol: String,
      width: Int,
      minOverlap: Long
  ): DataFrame =
    corpus
      // shingles are distinct per doc, so count(*) after the join is
      // the number of distinct shared grams
      .select(col(idCol), explode(
        Dedup.shinglesNative(corpus, col(textCol), width)).as("_gram"))
      .select(col(idCol), xxhash64(col("_gram")).as("_gk"))
      .join(evalGrams, "_gk")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap"))
      .where(col("overlap") >= minOverlap)

  /** The clean corpus: `corpus` minus every doc [[overlapCounts]]
    * flags. A broadcast-able id set drives the anti join (the
    * contaminated set is bounded by the eval set's reach, not the
    * corpus). */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 3,
      minOverlap: Long = 1L
  ): DataFrame = {
    val dirty =
      overlapCounts(corpus, evalSet, textCol, idCol, width, minOverlap)
        .select(col(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** The eval set's distinct gram keys, collected once — for callers
    * that apply the SAME immutable eval set to batch after batch (the
    * [[graft.streaming.IngestDaemon]] loop): computing the dictionary
    * per batch would rescan and re-collect the eval set every
    * micro-batch for no reason. Pair with [[decontaminateWithKeys]].
    * Refuses (loudly) an eval set past `maxKeys` — a dictionary that
    * big shouldn't be pinned on a driver across batches. */
  def evalGramKeys(
      evalSet: DataFrame,
      textCol: String,
      width: Int = 3,
      maxKeys: Long = 1000000L): Array[Long] = {
    require(width > 0, s"decontaminate width must be > 0 (got $width)")
    val dict = evalSet
      .select(explode(
        Dedup.shinglesNative(evalSet, col(textCol), width)).as("_gram"))
      .select(xxhash64(col("_gram")).as("_gk"))
      .distinct()
      .localCheckpoint(true)
    val n = dict.count()
    require(n <= maxKeys,
      s"evalGramKeys: $n distinct grams exceeds maxKeys=$maxKeys — " +
        "use overlapCounts/decontaminate per batch (join leg) instead " +
        "of pinning the dictionary")
    dict.collect().map(_.getLong(0))
  }

  /** [[decontaminate]] against a PRE-COLLECTED gram dictionary
    * ([[evalGramKeys]]): one narrow corpus scan, no eval-set work at
    * all — the steady-state form for a standing eval set. */
  def decontaminateWithKeys(
      corpus: DataFrame,
      keys: Array[Long],
      textCol: String,
      idCol: String,
      width: Int = 3,
      minOverlap: Long = 1L
  ): DataFrame = {
    require(width > 0, s"decontaminate width must be > 0 (got $width)")
    require(minOverlap > 0,
      s"decontaminate minOverlap must be > 0 (got $minOverlap)")
    val s = graft.functions.GramSetOverlap.column(col(textCol), width, keys)
    corpus
      .withColumn("_s", explode(array(s)))
      .where(col("_s.n_hits").isNull || col("_s.n_hits") < minOverlap)
      .drop("_s")
  }

  /** SPAN-level decontamination (the Lee-et-al strip applied to an
    * eval set): instead of dropping a whole document because one
    * quoted benchmark snippet appears in it ([[decontaminate]] —
    * right for short docs, wasteful for long ones), remove exactly
    * the tokens covered by a `width`-gram of the eval set and keep
    * the rest. Same machinery as
    * [[graft.dedup.Dedup.stripRepeatedSpans]] with the hit
    * dictionary swapped from "corpus-repeated grams" to "eval
    * grams": the dictionary is eval-sized (collected + scored in one
    * narrow per-row expression while it fits; past
    * `maxBroadcastKeys` the shared join leg takes over), so the
    * corpus pays one scan and no gram-count shuffle at all — cheaper
    * than the repeated-span tier, not just equal to it. Returns
    * `(id, clean_text, n_removed)`. */
  def stripEvalSpans(
      corpus: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      width: Int = 10,
      maxBroadcastKeys: Long = 1000000L
  ): DataFrame = {
    require(width > 0, s"stripEvalSpans width must be > 0 (got $width)")
    // eval gram keys, IDENTICAL construction to the corpus side's
    // (xxhash64 of the space-joined lowercase token slice) — the
    // dictionaries must live in the same key space
    val evalGrams = evalSet
      .select(graft.text.TextFunctions.tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .where(col("_n") >= width)
      .select(col("_toks"),
        explode(sequence(lit(0), col("_n") - width)).as("start"))
      .select(xxhash64(concat_ws(" ",
        slice(col("_toks"), col("start") + 1, lit(width)))).as("g"))
      .distinct()
      .localCheckpoint(true)
    if (evalGrams.count() <= maxBroadcastKeys) {
      val ks = evalGrams.collect().map(_.getLong(0))
      val rw = graft.functions.StripSpansRewrite
        .column(col(textCol), Seq(width -> ks))
      corpus
        .select(col(idCol).as("id"), explode(array(rw)).as("_s"))
        .select(
          col("id").as(idCol),
          coalesce(col("_s.clean_text"), lit("")).as("clean_text"),
          coalesce(col("_s.n_tokens") - col("_s.n_kept"), lit(0L))
            .as("n_removed"))
    } else
      Dedup.stripSpansJoinLeg(corpus, textCol, idCol, width, evalGrams)
  }
}
