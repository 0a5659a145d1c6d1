package graft.pipeline

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.storage.{FileIO, TableStore}

/** The standing boilerplate dictionary as a MANAGED artifact — the
  * [[graft.sketch.ProfileIndex]] discipline applied to the
  * gram-frequency tier: per-gram document frequencies maintained
  * incrementally, batch by batch, in one [[TableStore]] with a
  * per-batch journal.
  *
  * Why incremental: [[Boilerplate.boilerplateGrams]] recomputes the
  * corpus-wide gram-df count from scratch — right for one batch,
  * impossible as a standing signal at 100 TB (the whole corpus
  * re-shuffles per refresh). Document frequencies ADD across
  * disjoint batches, so each ingest appends only the BATCH's
  * (gram-hash, df) rows and the standing dictionary is the
  * merge-on-read sum — the same append-only + fold-on-compact shape
  * as the profile artifact. Exactly-once is replay-window-free: a
  * batch's gram counts depend on nothing but the batch.
  *
  * The store is corpus-gram-sized — that is what a corpus-frequency
  * statistic IS — but per-ingest work is batch-bound (one shingle
  * pass + one map-side-combined count over the batch, one
  * batch-gram-sized commit), and reads prune: [[ratio]] scores any
  * frame against the CUT dictionary (df ≥ minDocs — a tiny fraction
  * of the gram space) through the same count-gated
  * collect-or-semi-join legs as the batch operator.
  *
  * `width` is pinned at creation and refused on mismatch (gram
  * spaces of different widths must never sum). Ids must be globally
  * unique across batches (the standing df counts each document
  * once). */
final class BoilerplateIndex private (
    val spark: SparkSession,
    val dir: String,
    store: TableStore,
    val width: Int
) {

  def version: Long = store.version

  /** The commit version that applied `batchId`, if any. */
  def appliedVersion(batchId: String): Option[Long] =
    store.readVersioned
      .where(col("kind") === "batch" && col("batch_id") === batchId)
      .select(col("_ver"))
      .collect()
      .headOption
      .map(_.getLong(0))

  /** Transactional ingest: the batch's per-gram document frequencies
    * (shingles are distinct per doc, so count(*) = df), appended with
    * the journal row in one commit. Idempotent by `batchId`. */
  def ingest(
      batchId: String,
      docs: DataFrame,
      textCol: String,
      idCol: String): Long = synchronized {
    appliedVersion(batchId).getOrElse {
      val nul = (t: String) => lit(null).cast(t)
      val rows = docs
        .select(col(idCol), explode(
          Dedup.shinglesNative(docs, col(textCol), width)).as("gram"))
        .groupBy(xxhash64(col("gram")).as("g"))
        .agg(count(lit(1)).as("df"))
        .select(lit("gram").as("kind"), col("g"), col("df"),
          nul("string").as("batch_id"))
      val j = spark.range(1).select(
        lit("batch").as("kind"), nul("long").as("g"), nul("long").as("df"),
        lit(batchId).as("batch_id"))
      store.append(rows.unionByName(j))
    }
  }

  /** The standing dictionary cut at `minDocs`: (g, df) gram hashes
    * appearing in at least `minDocs` documents EVER ingested —
    * merge-on-read sum over the per-batch rows. */
  def boilerplateGrams(minDocs: Long): DataFrame = {
    require(minDocs > 1, s"minDocs must be > 1 (got $minDocs)")
    store.read
      .where(col("kind") === "gram")
      .groupBy(col("g"))
      .agg(sum(col("df")).as("df"))
      .where(col("df") >= minDocs)
  }

  /** Per-document boilerplate ratio of ANY frame against the
    * STANDING dictionary — [[Boilerplate.boilerplateRatio]]'s scoring
    * legs (count-gated narrow expression, semi-join past the gate)
    * with the df count replaced by the standing state: the frame
    * being scored never feeds a corpus-wide shuffle. Note the
    * dictionary reflects what was INGESTED — score a batch before or
    * after ingesting it deliberately (after = self-inclusive, the
    * batch operator's semantics on a one-batch corpus). */
  def ratio(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minDocs: Long,
      maxBroadcastKeys: Long = 1000000L): DataFrame = {
    val dict = boilerplateGrams(minDocs).select(col("g"))
      .localCheckpoint(true)
    val fallbackN =
      size(Dedup.shinglesNative(docs, col("_t"), width)).cast("long")
    if (dict.count() <= maxBroadcastKeys) {
      val keys = dict.collect().map(_.getLong(0))
      val s = graft.functions.GramSetOverlap
        .column(col(textCol), width, keys)
      docs
        .select(col(idCol), col(textCol).as("_t"),
          explode(array(s)).as("_s"))
        .select(col(idCol),
          coalesce(col("_s.n_grams"), fallbackN).as("n_grams"),
          coalesce(col("_s.n_hits"), lit(0L)).as("n_boiler"))
        .withColumn("boiler_ratio",
          round(col("n_boiler").cast("double") / col("n_grams"), 6))
    } else {
      val grams = docs
        .select(col(idCol), explode(
          Dedup.shinglesNative(docs, col(textCol), width)).as("gram"))
        .select(col(idCol), xxhash64(col("gram")).as("g"))
      val perDoc = grams
        .join(dict, Seq("g"), "left_semi")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_boiler"))
      docs.select(col(idCol),
          size(Dedup.shinglesNative(docs, col(textCol), width))
            .cast("long").as("n_grams"))
        .join(perDoc, Seq(idCol), "left")
        .na.fill(0L, Seq("n_boiler"))
        .withColumn("boiler_ratio",
          round(col("n_boiler").cast("double") / col("n_grams"), 6))
    }
  }

  /** Offline maintenance: fold the per-batch gram rows into one row
    * per gram (journal rows survive; the fold is the read path's sum,
    * so every dictionary cut is unchanged). */
  def compact(): Unit = synchronized {
    store.rewrite { df =>
      val nul = (t: String) => lit(null).cast(t)
      df.where(col("kind") === "gram")
        .groupBy(col("g"))
        .agg(sum(col("df")).as("df"))
        .select(lit("gram").as("kind"), col("g"), col("df"),
          nul("string").as("batch_id"))
        .unionByName(df.where(col("kind") === "batch"))
    }
  }

  /** Checkpointed streaming leg: one [[ingest]] per micro-batch. */
  def start(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val batchId = s"stream-$id"
        val applied = appliedVersion(batchId)
        if (applied.isDefined || b.isEmpty) ()
        else { ingest(batchId, b, textCol, idCol); () }
      }
      .start()
}

object BoilerplateIndex {

  private[pipeline] val storeSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("g", LongType, nullable = true),
    StructField("df", LongType, nullable = true),
    StructField("batch_id", StringType, nullable = true)
  ))

  /** Open (or create) the index at `dir`; `width` is pinned at
    * creation and refused on mismatch. */
  def open(spark: SparkSession, dir: String, width: Int): BoilerplateIndex = {
    require(width > 0, s"width must be > 0 (got $width)")
    storedWidth(dir) match {
      case Some(w) =>
        require(w == width,
          s"BoilerplateIndex at $dir was built with width=$w — gram " +
            "spaces of different widths must never sum")
      case None =>
        FileIO.forPath(dir).mkdirs(dir)
        val props = new Properties()
        props.setProperty("width", width.toString)
        FileIO.storeProps(marker(dir), props,
          "graft BoilerplateIndex parameters")
    }
    new BoilerplateIndex(spark, dir,
      TableStore.open(spark, FileIO.join(dir, "store"), storeSchema),
      width)
  }

  /** Reopen with the width the index was built with. */
  def open(spark: SparkSession, dir: String): BoilerplateIndex = {
    val w = storedWidth(dir).getOrElse(
      throw new IllegalArgumentException(s"no BoilerplateIndex at $dir"))
    open(spark, dir, w)
  }

  private def marker(dir: String) = FileIO.join(dir, "boilerplate.properties")

  private def storedWidth(dir: String): Option[Int] =
    FileIO.loadProps(marker(dir)).map(_.getProperty("width").toInt)
}
