package graft.pipeline

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{FileIO, TableStore}

/** The standing DSIR model as a MANAGED artifact — the
  * [[BoilerplateIndex]] discipline applied to importance resampling
  * (Xie et al., NeurIPS 2023): per-bucket hashed-gram counts for the
  * TARGET corpus and the RAW pool, maintained incrementally in one
  * [[TableStore]] with a per-batch journal, so the log-ratio
  * dictionary every ingest batch is scored under is always current
  * without ever rescanning a corpus.
  *
  * Why incremental: [[Importance.dsirDict]] scans both corpora per
  * build — right once, impossible as a standing signal at 100 TB.
  * Hashed-gram bucket counts ADD across disjoint batches, so each
  * ingest appends only the BATCH's ≤`buckets` count rows and the
  * standing model is the merge-on-read sum — same append-only +
  * fold-on-compact shape as the profile and boilerplate artifacts.
  * Exactly-once is replay-window-free: a batch's bucket counts depend
  * on nothing but the batch.
  *
  * Store size is O(buckets × batches) rows pre-compact — KB-scale
  * parquet, never corpus-shaped. [[dict]] reduces it to one
  * `buckets`-row frame in [[Importance.dsirDict]]'s exact shape
  * (pinned-knob columns included), so [[score]] is
  * [[Importance.dsirScoreWith]] against the standing state: one
  * broadcast join over the batch's grams, nothing corpus-sized moves.
  *
  * The hash configuration (`buckets`/`bigrams`/`alpha`/`seed`/
  * `portable`) is pinned at creation and refused on mismatch — counts
  * bucketed under different knobs must never sum (the same refusal
  * [[Importance.dsirScoreWith]] applies at scoring time).
  *
  * Reference for the resume discipline: ssbc/margaret
  * indexes/sinkindex.go:29-37 (derived state advances exactly once
  * per applied batch, replays are idempotent by cursor).
  */
final class DsirIndex private (
    val spark: SparkSession,
    val dir: String,
    store: TableStore,
    val buckets: Int,
    val bigrams: Boolean,
    val alpha: Double,
    val seed: String,
    val portable: Boolean
) {

  def version: Long = store.version

  /** The commit version that applied (`side`, `batchId`), if any —
    * target and raw ingests journal independently (the same id may
    * legitimately feed both sides once each). */
  def appliedVersion(side: String, batchId: String): Option[Long] =
    store.readVersioned
      .where(col("kind") === "batch" && col("side") === side &&
        col("batch_id") === batchId)
      .select(col("_ver"))
      .collect()
      .headOption
      .map(_.getLong(0))

  /** Accumulate `docs` into the TARGET side of the model — typically
    * called once per trusted-corpus version ("wikipedia-2026-08"),
    * then never again: the target is scanned exactly once ever.
    * Idempotent by `batchId`. */
  def ingestTarget(batchId: String, docs: DataFrame, textCol: String): Long =
    ingestSide("t", batchId, docs, textCol)

  /** Accumulate `docs` into the RAW-pool side of the model — one call
    * per ingest batch (the daemon wires this into its exactly-once
    * step). Idempotent by `batchId`. */
  def ingestRaw(batchId: String, docs: DataFrame, textCol: String): Long =
    ingestSide("r", batchId, docs, textCol)

  private def ingestSide(
      side: String, batchId: String, docs: DataFrame, textCol: String): Long =
    synchronized {
      appliedVersion(side, batchId).getOrElse {
        val nul = (t: String) => lit(null).cast(t)
        val rows = Importance
          .bucketCounts(docs, textCol, buckets, bigrams, seed, portable)
          .select(lit("cnt").as("kind"), lit(side).as("side"),
            col("bucket"), col("_c").as("c"), nul("string").as("batch_id"))
        val j = spark.range(1).select(
          lit("batch").as("kind"), lit(side).as("side"),
          nul("long").as("bucket"), nul("long").as("c"),
          lit(batchId).as("batch_id"))
        store.append(rows.unionByName(j))
      }
    }

  private def sideCounts(
      side: String, as: String, asOf: Option[Long]): DataFrame =
    asOf.map(v => store.readAsOf(v).drop("_ver")).getOrElse(store.read)
      .where(col("kind") === "cnt" && col("side") === side)
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as(as))

  /** The standing log-ratio dictionary in [[Importance.dsirDict]]'s
    * exact frame shape (pinned-knob columns included — any
    * [[Importance.dsirScoreWith]] caller can consume it directly).
    * `None` until the target side holds at least one gram: with no
    * target there is NO model, and scoring would be silent garbage —
    * refuse instead. An empty RAW side is the documented cold start
    * (uniform raw model); it sharpens as batches accumulate.
    *
    * [[dictAsOf]] pins the dictionary to a store commit — the VERSION
    * OF RECORD a replaying consumer scores under (see [[score]]);
    * it fails loudly if a later [[compact]] folded that history
    * away. */
  def dict: Option[DataFrame] = dictAt(None)

  /** The dictionary EXACTLY as of store commit `version`. */
  def dictAsOf(version: Long): Option[DataFrame] = dictAt(Some(version))

  private def dictAt(asOf: Option[Long]): Option[DataFrame] = {
    val tc = sideCounts("t", "_ct", asOf).localCheckpoint(true)
    if (tc.agg(sum("_ct")).collect().head.isNullAt(0)) None
    else Some(Importance.dictFromCounts(
      tc, sideCounts("r", "_cr", asOf).localCheckpoint(true),
      buckets, bigrams, alpha, seed, portable))
  }

  /** Score any frame against the standing dictionary — one broadcast
    * join over the batch's grams ([[Importance.dsirScoreWith]]).
    * Refuses loudly when no target has been ingested.
    * `deterministic = false` is the production scale knob (plain
    * partial-agg sum, ≤ last-ulp wobble vs the sorted sum).
    *
    * `asOf` scores against the dictionary EXACTLY as of store commit
    * `asOf` — the version-of-record discipline: the daemon scores
    * each batch at the version its own raw-side ingest committed
    * (journaled, [[appliedVersion]]), so a crash-window replay —
    * even one racing an [[ingestTarget]] registration — re-derives
    * the persisted weights bit-for-bit, and every stored score is
    * reproducible from the journal alone. */
  def score(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      deterministic: Boolean = true,
      asOf: Option[Long] = None
  ): DataFrame = {
    val d = dictAt(asOf).getOrElse(throw new IllegalStateException(
      s"DsirIndex at $dir has no target-side counts — ingestTarget a " +
        "trusted corpus before scoring (a no-target model would score " +
        "every document as garbage)"))
    Importance.dsirScoreWith(docs, d, textCol, idCol, deterministic,
      buckets, bigrams, seed, portable)
  }

  /** Offline maintenance: fold the per-batch count rows into one row
    * per (side, bucket) — the read path's sum, so every dictionary
    * derived after the fold is unchanged. Journal rows survive. */
  def compact(): Unit = synchronized {
    store.rewrite { df =>
      val nul = (t: String) => lit(null).cast(t)
      df.where(col("kind") === "cnt")
        .groupBy(col("side"), col("bucket"))
        .agg(sum(col("c")).as("c"))
        .select(lit("cnt").as("kind"), col("side"), col("bucket"),
          col("c"), nul("string").as("batch_id"))
        .unionByName(df.where(col("kind") === "batch"))
    }
  }
}

object DsirIndex {

  private[pipeline] val storeSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("side", StringType, nullable = false),
    StructField("bucket", LongType, nullable = true),
    StructField("c", LongType, nullable = true),
    StructField("batch_id", StringType, nullable = true)
  ))

  /** Open (or create) the index at `dir`; the hash configuration is
    * pinned at creation and refused on mismatch. */
  def open(
      spark: SparkSession,
      dir: String,
      buckets: Int = 8192,
      bigrams: Boolean = true,
      alpha: Double = 1.0,
      seed: String = "dsir",
      portable: Boolean = true
  ): DsirIndex = {
    require(buckets > 0, s"buckets must be > 0 (got $buckets)")
    require(alpha > 0.0, s"alpha must be > 0 (got $alpha)")
    storedKnobs(dir) match {
      case Some((b, bg, a, s0, p)) =>
        require(
          b == buckets && bg == bigrams && a == alpha && s0 == seed &&
            p == portable,
          s"DsirIndex at $dir was built with (buckets=$b, bigrams=$bg, " +
            s"alpha=$a, seed=$s0, portable=$p) — counts bucketed under " +
            "different knobs must never sum")
      case None =>
        FileIO.forPath(dir).mkdirs(dir)
        val props = new Properties()
        props.setProperty("buckets", buckets.toString)
        props.setProperty("bigrams", bigrams.toString)
        props.setProperty("alpha", alpha.toString)
        props.setProperty("seed", seed)
        props.setProperty("portable", portable.toString)
        FileIO.storeProps(marker(dir), props, "graft DsirIndex parameters")
    }
    new DsirIndex(spark, dir,
      TableStore.open(spark, FileIO.join(dir, "store"), storeSchema),
      buckets, bigrams, alpha, seed, portable)
  }

  /** Reopen with the knobs the index was built with. */
  def open(spark: SparkSession, dir: String): DsirIndex = {
    val (b, bg, a, s0, p) = storedKnobs(dir).getOrElse(
      throw new IllegalArgumentException(s"no DsirIndex at $dir"))
    open(spark, dir, b, bg, a, s0, p)
  }

  private def marker(dir: String) = FileIO.join(dir, "dsir.properties")

  private def storedKnobs(
      dir: String): Option[(Int, Boolean, Double, String, Boolean)] =
    FileIO.loadProps(marker(dir)).map { p =>
      (p.getProperty("buckets").toInt, p.getProperty("bigrams").toBoolean,
        p.getProperty("alpha").toDouble, p.getProperty("seed"),
        p.getProperty("portable").toBoolean)
    }
}
