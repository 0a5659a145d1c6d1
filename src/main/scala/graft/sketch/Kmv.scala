package graft.sketch

import java.{lang => jl}

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Mergeable distinct-count sketches (KMV — k minimum values,
  * Bar-Yossef et al.) for incremental corpus profiling.
  *
  * [[graft.pipeline.Curation.corpusProfile]] answers "how many
  * distinct documents / tokens per stratum" EXACTLY with a
  * `countDistinct` — the right tool for one batch, but it cannot be
  * maintained incrementally: distinct counts of two batches don't
  * add, so a 100 TB standing corpus would have to be RESCANNED after
  * every ingest to keep its profile current. (The reference has no
  * profiling tier at all — its stores answer only per-log counts,
  * `multilog/roaring/sublog.go:55`-style rank/card lookups.)
  *
  * The KMV sketch closes that gap: keep the k smallest DISTINCT
  * 60-bit hashes of the values seen. The sketch of a union is
  * computable from the sketches of the parts (the k smallest of
  * `kmin(A) ∪ kmin(B)` ARE the k smallest of `A ∪ B`), so per-batch
  * sketches fold into a standing profile without touching the
  * corpus; with `h_k` the k-th smallest hash in a space of size `D`,
  * `(k-1) · D / h_k` estimates the distinct count with relative
  * error ~`1/sqrt(k-2)` (k=1024 → ~3%) in O(k) memory per stratum.
  *
  * Everything is deterministic and cross-engine exact: the hash is
  * the first 15 hex chars of md5 (60 bits — DuckDB replays it as
  * `('0x' || substr(md5(v), 1, 15))::BIGINT`), the sketch is a set
  * (no arrival-order dependence, unlike HLL register races or
  * space-saving counters), and the estimate is one IEEE double
  * division both engines evaluate identically — so the whole tier is
  * oracle-checkable (q118/q119), not just spec-trusted.
  *
  * Scale shape: the aggregation is a typed [[Aggregator]] (the
  * [[graft.multilog.BitmapIndex]] pattern) — partial sketches
  * combine MAP-SIDE, so one pass over a 100 TB batch shuffles only
  * `strata × k` longs (KmvSpec pins the two-stage
  * ObjectHashAggregate plan). Merging standing profiles is
  * profile-sized work, corpus-free by construction.
  */
object Kmv {

  /** Bits of the hash space: 15 md5 hex chars. Keys are uniform on
    * `[0, 2^60)` and always fit a non-negative long. */
  val HashBits = 60

  private val domain: Double = math.pow(2.0, HashBits)

  /** 60-bit hash of any value — first 15 hex chars of md5, exactly
    * `('0x' || substr(md5(v), 1, 15))::BIGINT` in DuckDB. */
  def hash60(v: Column): Column =
    conv(substring(md5(v), 1, 15), 16, 10).cast("long")

  /** [[hash60]] of the whitespace-normalized document fingerprint
    * ([[TextFunctions.fingerprint]]) — the content-identity key the
    * exact dedup tier already groups by, reused so "estimated
    * distinct docs" counts exactly what `corpusProfile` counts. */
  def contentHash60(text: Column): Column =
    conv(substring(TextFunctions.fingerprint(text), 1, 15), 16, 10)
      .cast("long")

  /** Fold 60-bit hashes into the sorted array of the k smallest
    * distinct values seen. The buffer IS the sorted `Array[Long]` —
    * kept as a live object within a partition (ObjectHashAggregate)
    * and crossing the partial→final exchange as a plain long array
    * (8 bytes/hash; the earlier java-serialized TreeSet paid ~3-4×
    * that per entry at strata × k × partitions scale). Once the
    * sketch is full, a row hashing above the current max is rejected
    * in O(1); the bounded number of accepted inserts (≈ k·ln(N/k)
    * per partition) each pay one O(k) arraycopy.
    *
    * NULL inputs contribute NOTHING — matching `corpusProfile`'s
    * `countDistinct` (which skips nulls) and the DuckDB replay
    * formula; a null would otherwise decode as a phantom hash 0 and
    * poison every estimate of a stratum containing one null text. */
  class KmvAgg(k: Int)
      extends Aggregator[jl.Long, Array[Long], Array[Long]] {
    require(k >= 2, s"kmv needs k >= 2 (got $k)")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(s: Array[Long], hBoxed: jl.Long): Array[Long] = {
      if (hBoxed == null) return s // null value → no hash (see above)
      val h = hBoxed.longValue()
      val n = s.length
      if (n == k && h >= s(n - 1)) return s // full and not smaller: O(1)
      val idx = java.util.Arrays.binarySearch(s, h)
      if (idx >= 0) return s // already present (distinct semantics)
      val ins = -idx - 1
      val outLen = if (n < k) n + 1 else k
      val out = new Array[Long](outLen)
      System.arraycopy(s, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(s, ins, out, ins + 1, outLen - 1 - ins)
      out
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      // two-pointer sorted merge with dedup, truncated at k — the
      // k smallest of kmin(A) ∪ kmin(B) ARE the k smallest of A ∪ B
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var m = 0
      while (m < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (b(j) < a(i)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v } // equal: keep one
        out(m) = take; m += 1
      }
      if (m == out.length) out else java.util.Arrays.copyOf(out, m)
    }
    override def finish(s: Array[Long]): Array[Long] = s
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** The KMV aggregate as a column function: apply to a [[hash60]]
    * column under any `groupBy`. Boxed-long input so a NULL hash is
    * visible to the aggregator (and skipped) instead of decoding as
    * a phantom 0. */
  def sketchAgg(k: Int): UserDefinedFunction =
    udaf(new KmvAgg(k), Encoders.LONG)

  /** Per-stratum KMV sketch of `value`: one map-side-combined pass,
    * output `strata… , kmv` (ascending array of ≤ k hashes). */
  def sketch(
      df: DataFrame,
      strata: Seq[String],
      value: Column,
      k: Int): DataFrame =
    df.groupBy(strata.map(col): _*)
      .agg(sketchAgg(k)(hash60(value)).as("kmv"))

  /** Distinct-count estimate from a sketch column: exact (the sketch
    * holds every hash) below k, `(k-1) · 2^60 / h_k` at k. The
    * constant is one exactly-representable double literal, so the
    * estimate is a single IEEE division any engine reproduces
    * bit-for-bit. */
  def estimate(kmv: Column, k: Int): Column = {
    val c = (k - 1).toDouble * domain
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit(c) / element_at(kmv, k).cast("double"))
  }

  /** The estimate's constant as an exact decimal-integer literal —
    * inline it into oracle SQL so both engines parse the identical
    * double. */
  def estimateConstLiteral(k: Int): String =
    java.math.BigDecimal
      .valueOf((k - 1).toDouble * domain)
      .toBigInteger
      .toString

  /** Fold per-part sketches (one `kmvCol` row per part × stratum)
    * into the per-stratum sketch of the union — profile-sized work,
    * never touching the underlying data. Strata whose every input
    * sketch is empty drop out (explode of nothing); profiles never
    * produce them (a stratum exists only with rows). */
  def mergeSketches(
      df: DataFrame,
      strata: Seq[String],
      kmvCol: String,
      k: Int): DataFrame =
    df.select(strata.map(col) :+ explode(col(kmvCol)).as("_h"): _*)
      .groupBy(strata.map(col): _*)
      .agg(sketchAgg(k)(col("_h")).as(kmvCol))

  /** The mergeable corpus profile: per-stratum exact counters (docs,
    * tokens — these DO add across batches) plus KMV sketches of
    * distinct content ([[contentHash60]], what `corpusProfile`'s
    * `distinct_docs` counts) and distinct vocabulary ([[hash60]] of
    * each token, its `distinct_tokens`). Two aggregation passes (the
    * vocab sketch needs the token explode, same as `corpusProfile`)
    * joined on the stratum — both map-side combined, output is
    * strata-sized. `vkmv` is the empty array for an all-blank
    * stratum. */
  def profileSketch(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      k: Int): DataFrame = {
    val text = col(textCol)
    val base = df
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("docs"),
        sum(TextFunctions.tokenCount(text).cast("long")).as("tokens"),
        sketchAgg(k)(contentHash60(text)).as("kmv"))
    val vocab = df
      .select(col(strataCol), explode(TextFunctions.tokens(text)).as("_tok"))
      .where(length(col("_tok")) > 0)
      .groupBy(col(strataCol))
      .agg(sketchAgg(k)(hash60(col("_tok"))).as("vkmv"))
    base
      .join(vocab, Seq(strataCol), "left")
      .withColumn("vkmv",
        coalesce(col("vkmv"), typedLit(Array.empty[Long])))
  }

  /** Fold a union of per-batch [[profileSketch]] frames into the
    * profile of the union corpus: counters sum, sketches merge —
    * all profile-sized, no corpus access. This is the incremental
    * maintenance step: `standing ∪ batchProfile → merge`. */
  def mergeProfileSketches(
      profiles: DataFrame,
      strataCol: String,
      k: Int): DataFrame = {
    val base = profiles
      .groupBy(col(strataCol))
      .agg(sum(col("docs")).as("docs"), sum(col("tokens")).as("tokens"))
    val content = mergeSketches(profiles, Seq(strataCol), "kmv", k)
    val vocab = mergeSketches(profiles, Seq(strataCol), "vkmv", k)
    base
      .join(content, Seq(strataCol), "left")
      .join(vocab, Seq(strataCol), "left")
      .withColumn("kmv", coalesce(col("kmv"), typedLit(Array.empty[Long])))
      .withColumn("vkmv", coalesce(col("vkmv"), typedLit(Array.empty[Long])))
  }

  /** Append the distinct-count estimates to a profile frame:
    * `est_distinct_docs` / `est_distinct_tokens`, rounded to 6 dp
    * (both engines round the identical double). */
  def withEstimates(profile: DataFrame, k: Int): DataFrame =
    profile
      .withColumn("est_distinct_docs", round(estimate(col("kmv"), k), 6))
      .withColumn("est_distinct_tokens",
        round(estimate(col("vkmv"), k), 6))
}
