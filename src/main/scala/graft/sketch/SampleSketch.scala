package graft.sketch

import java.{lang => jl}

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** Mergeable VALUE-DISTRIBUTION sketches: a deterministic bottom-k
  * uniform sample (Cohen & Kaplan's bottom-k sampling) carrying a
  * double value per sampled key — the quantile/mean companion of the
  * [[Kmv]] distinct-count sketch.
  *
  * `percentile_approx` answers "what is the p90 document length per
  * stratum" for ONE batch, but its internal sketch cannot be stored
  * and folded, so a standing corpus's length/quality distributions
  * would need a full rescan after every ingest. Keeping the k
  * smallest id-HASHES (with their values) instead gives a uniform
  * sample whose union law is exact — the bottom-k of
  * `bottomk(A) ∪ bottomk(B)` IS the bottom-k of `A ∪ B` — so
  * per-batch sketches fold into a standing profile corpus-free, and
  * any quantile is then estimated from the ≤k sampled values with
  * standard `O(1/sqrt(k))` sampling error.
  *
  * Determinism and the cross-engine oracle: the sample is keyed by
  * [[Kmv.hash60]] of the row id (not by arrival), hash ties keep the
  * SMALLEST value (a 60-bit collision is ~never, but the rule makes
  * even that case order-free), and the quantile is percentile_cont
  * interpolation over the sorted sample — every step is replayable
  * in DuckDB SQL (`GROUP BY hash` + `row_number` + the same IEEE
  * interpolation), so the tier is oracle-checked (q140), not
  * spec-trusted.
  *
  * Scale shape: identical to [[Kmv]] — a typed [[Aggregator]] whose
  * partials combine map-side; one pass over a 100 TB batch shuffles
  * `strata × k` (hash, value) pairs; merging standing profiles is
  * profile-sized work.
  */
object SampleSketch {

  /** (sorted hashes, parallel values) — the aggregation buffer and
    * output. Arrays stay parallel: `values(i)` belongs to
    * `hashes(i)`. */
  type Buf = (Array[Long], Array[Double])

  /** Bottom-k by hash with min-value collision rule. Input rows are
    * (hash60(id), value); a null hash OR null value contributes
    * nothing (mirroring `countDistinct`/`avg` null semantics and the
    * SQL replay, which never sees null rows either). */
  class SampleAgg(k: Int) extends Aggregator[(jl.Long, jl.Double), Buf, Buf] {
    require(k >= 2, s"sample sketch needs k >= 2 (got $k)")
    override def zero: Buf = (Array.emptyLongArray, Array.emptyDoubleArray)

    override def reduce(s: Buf, in: (jl.Long, jl.Double)): Buf = {
      if (in._1 == null || in._2 == null) return s
      val h = in._1.longValue()
      val v = in._2.doubleValue()
      val (hs, vs) = s
      val n = hs.length
      if (n == k && h >= hs(n - 1)) {
        // full and not below the max: only an exact tie on the max
        // hash can still lower its value
        if (h == hs(n - 1) && v < vs(n - 1)) {
          val nv = vs.clone(); nv(n - 1) = v; return (hs, nv)
        }
        return s
      }
      val idx = java.util.Arrays.binarySearch(hs, h)
      if (idx >= 0) { // hash present: keep the smaller value
        if (v < vs(idx)) { val nv = vs.clone(); nv(idx) = v; (hs, nv) }
        else s
      } else {
        val ins = -idx - 1
        val outLen = if (n < k) n + 1 else k
        val oh = new Array[Long](outLen)
        val ov = new Array[Double](outLen)
        System.arraycopy(hs, 0, oh, 0, ins)
        System.arraycopy(vs, 0, ov, 0, ins)
        oh(ins) = h
        ov(ins) = v
        System.arraycopy(hs, ins, oh, ins + 1, outLen - 1 - ins)
        System.arraycopy(vs, ins, ov, ins + 1, outLen - 1 - ins)
        (oh, ov)
      }
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (a._1.isEmpty) return b
      if (b._1.isEmpty) return a
      val outLen = math.min(k, a._1.length + b._1.length)
      val oh = new Array[Long](outLen)
      val ov = new Array[Double](outLen)
      var i = 0; var j = 0; var m = 0
      while (m < outLen && (i < a._1.length || j < b._1.length)) {
        if (i >= a._1.length) { oh(m) = b._1(j); ov(m) = b._2(j); j += 1 }
        else if (j >= b._1.length) { oh(m) = a._1(i); ov(m) = a._2(i); i += 1 }
        else if (a._1(i) < b._1(j)) { oh(m) = a._1(i); ov(m) = a._2(i); i += 1 }
        else if (b._1(j) < a._1(i)) { oh(m) = b._1(j); ov(m) = b._2(j); j += 1 }
        else { // equal hash: the min value, one slot
          oh(m) = a._1(i); ov(m) = math.min(a._2(i), b._2(j)); i += 1; j += 1
        }
        m += 1
      }
      if (m == outLen) (oh, ov)
      else (java.util.Arrays.copyOf(oh, m), java.util.Arrays.copyOf(ov, m))
    }

    override def finish(s: Buf): Buf = s
    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  }

  /** The bottom-k sample aggregate as a column function:
    * `sampleAgg(k)(hashCol, valueCol)`. */
  def sampleAgg(k: Int): UserDefinedFunction =
    udaf(new SampleAgg(k), Encoders.tuple(Encoders.LONG, Encoders.DOUBLE))

  /** Per-stratum bottom-k value sample of `value` keyed by
    * [[Kmv.hash60]] of `id` (cast to string — the id space the whole
    * hash family keys on): one map-side-combined pass, output
    * `strata… , vs_hashes, vs_values` (parallel ascending-by-hash
    * arrays of ≤ k entries). */
  def valueSketch(
      df: DataFrame,
      strata: Seq[String],
      id: Column,
      value: Column,
      k: Int): DataFrame =
    df.groupBy(strata.map(col): _*)
      .agg(sampleAgg(k)(
        Kmv.hash60(id.cast("string")),
        value.cast("double")).as("_vs"))
      .select(strata.map(col) :+
        col("_vs._1").as("vs_hashes") :+
        col("_vs._2").as("vs_values"): _*)

  /** Fold per-part samples (one row per part × stratum) into the
    * per-stratum sample of the union — profile-sized, corpus-free.
    * The union law is exact, so this equals [[valueSketch]] over the
    * concatenated data, bit for bit. */
  def mergeValueSketches(
      df: DataFrame,
      strata: Seq[String],
      k: Int): DataFrame =
    df.select(strata.map(col) :+
        explode(arrays_zip(col("vs_hashes"), col("vs_values"))).as("_e"): _*)
      .groupBy(strata.map(col): _*)
      .agg(sampleAgg(k)(
        col("_e.vs_hashes"), col("_e.vs_values")).as("_vs"))
      .select(strata.map(col) :+
        col("_vs._1").as("vs_hashes") :+
        col("_vs._2").as("vs_values"): _*)

  /** percentile_cont-style linear interpolation over the SORTED
    * sample values: `pos = q·(m−1)`, `v[⌊pos⌋] + frac·(v[⌊pos⌋+1] −
    * v[⌊pos⌋])` — the exact formula the DuckDB oracle replays (same
    * IEEE doubles from the same sampled integers). NULL for an empty
    * sample. Pure argument-position Column algebra — no lambda
    * captures, no shuffle. */
  def estimateQuantile(values: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"quantile q must be in [0,1] (got $q)")
    val vs = sort_array(values)
    val m = size(vs)
    val pos = lit(q) * (m - 1).cast("double")
    val lo = floor(pos).cast("int")
    val frac = pos - floor(pos)
    when(m === 0, lit(null).cast("double")).otherwise(
      element_at(vs, lo + 1) +
        (element_at(vs, least(lo + 2, m)) - element_at(vs, lo + 1)) * frac)
  }

  /** Sample mean, summed in ascending-value order (deterministic —
    * the stored hash order is arrival-independent but value order is
    * what the SQL replay's `sum(v ORDER BY v)` uses). NULL for an
    * empty sample. */
  def estimateMean(values: Column): Column = {
    val vs = sort_array(values)
    when(size(vs) === 0, lit(null).cast("double")).otherwise(
      aggregate(vs, lit(0.0), (a, x) => a + x) / size(vs))
  }
}
