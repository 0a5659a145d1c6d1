package graft.multilog

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Bitmap-compressed multilog storage — the fidelity path matching the
  * reference's roaring sublogs (multilog/roaring/sublog.go:19-30;
  * sroar bitmaps keyed by addr). A custom typed
  * `Aggregator[Long, Roaring64NavigableMap, Array[Byte]]` folds each
  * sublog's parent seqs into one compressed bitmap; rank addressing
  * (`bitmap.Select(rank)`, sublog.go:55) runs directly on the
  * serialized bytes.
  *
  * Why it matters at scale: a sublog of k seqs stores in O(runs)
  * instead of O(k) rows, the per-addr aggregation combines map-side,
  * and the resulting `(addr, bitmap)` table is tiny enough to
  * broadcast for sublog→parent joins. The row-table form
  * ([[MultiLog.table]]) stays the queryable source of truth; this is
  * its compact materialization (both are checked equal in
  * BitmapIndexSpec).
  */
object BitmapIndex {

  private def serialize(b: Roaring64NavigableMap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream()
    b.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = {
    val b = new Roaring64NavigableMap()
    b.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    b
  }

  /** Fold (addr, seq) rows into a serialized roaring bitmap of seqs. */
  class BitmapAgg
      extends Aggregator[(String, Long), Roaring64NavigableMap, Array[Byte]] {
    override def zero: Roaring64NavigableMap = new Roaring64NavigableMap()
    override def reduce(
        b: Roaring64NavigableMap,
        row: (String, Long)
    ): Roaring64NavigableMap = { b.addLong(row._2); b }
    override def merge(
        a: Roaring64NavigableMap,
        b: Roaring64NavigableMap
    ): Roaring64NavigableMap = { a.or(b); a }
    override def finish(b: Roaring64NavigableMap): Array[Byte] = serialize(b)
    override def bufferEncoder: Encoder[Roaring64NavigableMap] =
      Encoders.javaSerialization[Roaring64NavigableMap]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Materialize a multilog index table `(addr, seq)` as
    * `(addr, bitmap, card)` — one compressed bitmap per sublog. */
  def fromTable(table: DataFrame): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    table
      .select(col("addr").as[String], col("seq").as[Long])
      .groupByKey(_._1)
      .agg(new BitmapAgg().toColumn.name("bitmap"))
      .toDF("addr", "bitmap")
      .withColumn("card", bitmapCard(col("bitmap")))
  }

  /** Rank → parent seq on the serialized bitmap (bitmap Select). */
  def bitmapSelect(bitmap: org.apache.spark.sql.Column, rank: org.apache.spark.sql.Column) = {
    udf((bytes: Array[Byte], r: Long) => {
      val b = deserialize(bytes)
      if (r < 0 || r >= b.getLongCardinality) null
      else java.lang.Long.valueOf(b.select(r))
    }).apply(bitmap, rank)
  }

  /** Cardinality of a serialized bitmap. */
  def bitmapCard(bitmap: org.apache.spark.sql.Column) =
    udf((bytes: Array[Byte]) => deserialize(bytes).getLongCardinality)
      .apply(bitmap)

  /** Membership test on a serialized bitmap. */
  def bitmapContains(bitmap: org.apache.spark.sql.Column, seq: org.apache.spark.sql.Column) =
    udf((bytes: Array[Byte], s: Long) => deserialize(bytes).contains(s))
      .apply(bitmap, seq)
}
