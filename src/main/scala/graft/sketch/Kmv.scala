package graft.sketch

import java.{lang => jl}
import java.util.TreeSet

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
    * distinct values seen. The buffer is a bounded TreeSet — O(log k)
    * per row, size ≤ k — kept as a live object within a partition
    * (ObjectHashAggregate) and serialized only across the partial→
    * final exchange. */
  class KmvAgg(k: Int)
      extends Aggregator[Long, TreeSet[jl.Long], Array[Long]] {
    require(k >= 2, s"kmv needs k >= 2 (got $k)")
    override def zero: TreeSet[jl.Long] = new TreeSet[jl.Long]()
    override def reduce(s: TreeSet[jl.Long], h: Long): TreeSet[jl.Long] = {
      if (s.size < k) s.add(h)
      else if (h < s.last && s.add(h)) s.pollLast()
      s
    }
    override def merge(
        a: TreeSet[jl.Long],
        b: TreeSet[jl.Long]): TreeSet[jl.Long] = {
      val it = b.iterator()
      while (it.hasNext) reduce(a, it.next())
      a
    }
    override def finish(s: TreeSet[jl.Long]): Array[Long] = {
      val out = new Array[Long](s.size)
      val it = s.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    override def bufferEncoder: Encoder[TreeSet[jl.Long]] =
      Encoders.javaSerialization[TreeSet[jl.Long]]
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** The KMV aggregate as a column function: apply to a [[hash60]]
    * column under any `groupBy`. */
  def sketchAgg(k: Int): UserDefinedFunction =
    udaf(new KmvAgg(k), Encoders.scalaLong)

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
