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
    // register on the table's OWN session (the Column-only helpers
    // below can only reach SparkSession.active)
    register(spark)
    import spark.implicits._
    table
      .select(col("addr").as[String], col("seq").as[Long])
      .groupByKey(_._1)
      .agg(new BitmapAgg().toColumn.name("bitmap"))
      .toDF("addr", "bitmap")
      .withColumn("card", bitmapCard(col("bitmap")))
  }

  // The three per-row bitmap reads are native Catalyst expressions
  // ([[graft.functions.BitmapExpr]], registered on first use like
  // VecOps): the bitmap work itself is library code either way, but a
  // plain UDF demoted every CONSUMING stage out of WholeStageCodegen.
  // Column-from-raw-Expression is private[sql] in Spark 4, so the
  // public path is registry + call_function — same plan, same codegen.

  /** Register the bitmap functions on `spark`. The Column helpers
    * below self-register on `SparkSession.active` at construction — a
    * bare Column cannot know which session will analyze it — so a
    * Column applied to a frame owned by a DIFFERENT session resolves
    * only if that session has the functions: sessions built with
    * [[graft.GraftExtensions]] always do (the functions are
    * injected), any other session can call this explicitly.
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bitmap_select")))
      return
    reg.createOrReplaceTempFunction("bitmap_select",
      exprs => graft.functions.BitmapExpr.BitmapSelect(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction("bitmap_card",
      exprs => graft.functions.BitmapExpr.BitmapCardinality(exprs.head),
      "built-in")
    reg.createOrReplaceTempFunction("bitmap_contains",
      exprs => graft.functions.BitmapExpr.BitmapContains(exprs(0), exprs(1)),
      "built-in")
  }

  /** Rank → parent seq on the serialized bitmap (bitmap Select);
    * null when the rank is out of range. Registers on the ACTIVE
    * session — see [[register]] for cross-session use. */
  def bitmapSelect(bitmap: org.apache.spark.sql.Column, rank: org.apache.spark.sql.Column) = {
    register(SparkSession.active)
    call_function("bitmap_select", bitmap, rank)
  }

  /** Cardinality of a serialized bitmap. Registers on the ACTIVE
    * session — see [[register]] for cross-session use. */
  def bitmapCard(bitmap: org.apache.spark.sql.Column) = {
    register(SparkSession.active)
    call_function("bitmap_card", bitmap)
  }

  /** Membership test on a serialized bitmap. Registers on the ACTIVE
    * session — see [[register]] for cross-session use. */
  def bitmapContains(bitmap: org.apache.spark.sql.Column, seq: org.apache.spark.sql.Column) = {
    register(SparkSession.active)
    call_function("bitmap_contains", bitmap, seq)
  }
}
