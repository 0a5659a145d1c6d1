package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage tier
  * of a 100 TB vector corpus (4× smaller than float32, integer dot
  * products downstream). Symmetric per-vector scheme: each vector
  * stores `scale = max |v_i|` and codes `q_i = floor(v_i / scale * 127
  * + 0.5)` in [-127, 127].
  *
  * The quantizer is pure columnar arithmetic (no UDF) and the floor
  * form is engine-portable: `floor(x + 0.5)` rounds identically
  * everywhere, where `round()` half-cases differ between engines.
  * Cosine over quantized codes needs no dequantization at all — the
  * per-vector scales cancel in the cosine ratio — so the search tier
  * reads 1/4 the bytes and never touches the scales.
  */
object Quantize {

  /** Per-vector symmetric int8 codes: (id, scale, q array<int>).
    * Zero vectors quantize to all-zero codes with scale 0. */
  def int8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val sc = array_max(transform(col(vecCol), x => abs(x))).cast("double")
    val codes = transform(
      col(vecCol),
      x =>
        when(sc === 0.0, lit(0L))
          .otherwise(floor(x.cast("double") / sc * 127.0 + lit(0.5)))
          .cast("int")
    )
    df.select(col(idCol), sc.as("scale"), codes.as("q"))
  }

  /** Reconstruct approximate floats from codes: `q_i * scale / 127`. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale / 127.0)

  /** Exact-over-codes top-k: cosine of the int8 codes against one
    * quantized query (scales cancel, so this IS the quantized-tier
    * score). Integer dot products accumulate in long — no overflow
    * below ~2^46 dims. Same narrow scan + TakeOrderedAndProject plan
    * as [[Ann.cosineTopK]], reading quarter-width vectors. */
  def cosineTopKInt8(
      quantized: DataFrame,
      qCol: String,
      idCol: String,
      queryVec: Seq[Float],
      k: Int
  ): DataFrame = {
    require(queryVec.nonEmpty, "cosineTopKInt8 query vector is empty")
    // quantize the query driver-side with the same arithmetic
    val qs = queryVec.map(_.toFloat.abs).max.toDouble
    val qCodes =
      if (qs == 0.0) queryVec.map(_ => 0L)
      else queryVec.map(v => math.floor(v.toDouble / qs * 127.0 + 0.5).toLong)
    val qLit = array(qCodes.map(lit): _*)
    val qNorm = math.sqrt(qCodes.map(c => (c * c).toDouble).sum)
    val dotQ = aggregate(
      zip_with(col(qCol), qLit, (x, y) => x.cast("long") * y),
      lit(0L),
      (acc, x) => acc + x
    )
    val normQ = sqrt(
      aggregate(
        col(qCol),
        lit(0L),
        (acc, x) => acc + x.cast("long") * x.cast("long")
      ).cast("double")
    )
    quantized
      .select(
        col(idCol),
        round(
          when(normQ === 0.0 || lit(qNorm) === 0.0, 0.0)
            .otherwise(dotQ.cast("double") / (normQ * lit(qNorm))),
          6
        ).as("score")
      )
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
