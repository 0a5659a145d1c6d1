package graft.sketch

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{FileIO, TableStore}

/** The standing corpus profile as a FIRST-CLASS managed artifact —
  * the [[graft.dedup.DedupIndex]] discipline applied to the
  * statistics tier: per-stratum counters and KMV sketches
  * ([[Kmv.profileSketch]]) maintained incrementally, batch by batch,
  * in one [[TableStore]] with a per-batch journal.
  *
  * Store layout is APPEND-ONLY: each ingest commits the BATCH's
  * profile rows (not a rewritten snapshot) plus its journal row in
  * one atomic version; the standing profile is the
  * [[Kmv.mergeProfileSketches]] fold over everything appended —
  * merge-on-read, exact by the merge law q119 oracles cross-engine.
  * [[compact]] folds the accumulated batch rows into one row per
  * stratum when the history gets long (read cost between compactions
  * is `batches × strata` sketch rows — KB-scale, corpus-free).
  *
  * Exactly-once is simpler than the dedup artifacts': a batch's
  * profile depends on NOTHING but the batch (no standing-state
  * probe), so a redelivered or half-applied `batchId` deterministically
  * recomputes the same rows and the journal check skips the append.
  * No pre-batch snapshot, no replay window at all.
  *
  * `k`, the stratum column and the text column are PINNED at
  * creation and refused on mismatch: sketches at different k (or
  * over different keys) are different estimators — folding them
  * silently corrupts every future estimate.
  *
  * Plan shape at 100 TB: per ingest, the two map-side-combined
  * passes of [[Kmv.profileSketch]] over the BATCH only, then a
  * strata-sized commit. The standing corpus is never rescanned —
  * the gap `corpusProfile`'s exact `countDistinct` cannot close. */
final class ProfileIndex private (
    val spark: SparkSession,
    val dir: String,
    store: TableStore,
    val k: Int,
    val strataCol: String,
    val textCol: String,
    val valueCol: Option[String]
) {

  import ProfileIndex.nulCol

  /** Fold stored profile rows (counters + KMV + value samples) into
    * one row per stratum — the same merges the write path's sketches
    * obey, so read-time folding is exact. */
  private def foldRows(rows: DataFrame): DataFrame = {
    val merged = Kmv.mergeProfileSketches(
      rows.drop("vs_hashes", "vs_values"), strataCol, k)
    if (valueCol.isEmpty)
      merged
        .withColumn("vs_hashes", nulCol("array<bigint>"))
        .withColumn("vs_values", nulCol("array<double>"))
    else {
      val vs = SampleSketch.mergeValueSketches(
        rows.select(col(strataCol),
          coalesce(col("vs_hashes"), typedLit(Array.empty[Long]))
            .as("vs_hashes"),
          coalesce(col("vs_values"), typedLit(Array.empty[Double]))
            .as("vs_values")),
        Seq(strataCol), k)
      merged.join(vs, Seq(strataCol), "left")
        .withColumn("vs_hashes",
          coalesce(col("vs_hashes"), typedLit(Array.empty[Long])))
        .withColumn("vs_values",
          coalesce(col("vs_values"), typedLit(Array.empty[Double])))
    }
  }

  def version: Long = store.version

  /** The commit version that applied `batchId`, if any. */
  def appliedVersion(batchId: String): Option[Long] =
    store.readVersioned
      .where(col("kind") === "batch" && col("batch_id") === batchId)
      .select(col("_ver"))
      .collect()
      .headOption
      .map(_.getLong(0))

  /** Transactional ingest: profile the batch ([[Kmv.profileSketch]]
    * — batch-only, two map-side-combined passes; plus one
    * [[SampleSketch.valueSketch]] pass when `valueCol` is pinned,
    * keyed by the content fingerprint so no id column is needed and
    * cross-batch duplicates resolve deterministically), append its
    * rows + the journal row as one commit. Idempotent by `batchId`. */
  def ingest(batchId: String, docs: DataFrame): Long = synchronized {
    appliedVersion(batchId).getOrElse {
      val prof = Kmv.profileSketch(docs, textCol, strataCol, k)
      val nul = nulCol
      val base = prof.select(
        col(strataCol).cast("string").as("stratum"),
        col("docs").cast("long").as("docs"),
        col("tokens").cast("long").as("tokens"),
        col("kmv"), col("vkmv"))
      val withVals = valueCol match {
        case Some(vc) =>
          val vs = SampleSketch.valueSketch(
              docs, Seq(strataCol),
              graft.text.TextFunctions.fingerprint(col(textCol)),
              col(vc), k)
            .select(col(strataCol).cast("string").as("stratum"),
              col("vs_hashes"), col("vs_values"))
          base.join(vs, Seq("stratum"), "left")
        case None =>
          base
            .withColumn("vs_hashes", nul("array<bigint>"))
            .withColumn("vs_values", nul("array<double>"))
      }
      val rows = withVals.select(
        lit("profile").as("kind"), col("stratum"), col("docs"),
        col("tokens"), col("kmv"), col("vkmv"),
        col("vs_hashes"), col("vs_values"),
        nul("string").as("batch_id"))
      val j = spark.range(1).select(
        lit("batch").as("kind"), nul("string").as("stratum"),
        nul("long").as("docs"), nul("long").as("tokens"),
        nul("array<bigint>").as("kmv"), nul("array<bigint>").as("vkmv"),
        nul("array<bigint>").as("vs_hashes"),
        nul("array<double>").as("vs_values"),
        lit(batchId).as("batch_id"))
      store.append(rows.unionByName(j))
    }
  }

  /** The standing profile: counters summed, sketches folded across
    * every ingested batch (exact by the merge laws). One row per
    * stratum: `strataCol, docs, tokens, kmv, vkmv, vs_hashes,
    * vs_values` (the value-sample columns null when no `valueCol` is
    * pinned). */
  def profile: DataFrame =
    foldRows(
      store.read
        .where(col("kind") === "profile")
        .select(col("stratum").as(strataCol), col("docs"), col("tokens"),
          col("kmv"), col("vkmv"), col("vs_hashes"), col("vs_values")))

  /** [[profile]] with the distinct-count estimates appended — plus,
    * when a `valueCol` is pinned, the standing value distribution
    * (`<valueCol>_p50/_p90/_mean` from the folded bottom-k sample). */
  def profileEstimates: DataFrame = {
    val base = Kmv.withEstimates(profile, k)
    valueCol match {
      case Some(vc) =>
        base
          .withColumn(s"${vc}_p50",
            round(SampleSketch.estimateQuantile(col("vs_values"), 0.5), 6))
          .withColumn(s"${vc}_p90",
            round(SampleSketch.estimateQuantile(col("vs_values"), 0.9), 6))
          .withColumn(s"${vc}_mean",
            round(SampleSketch.estimateMean(col("vs_values")), 6))
      case None => base
    }
  }

  /** The standing profile EXACTLY as of store commit `version` — the
    * snapshot twin of [[profile]] for reproducible-run bookkeeping
    * (what were the corpus statistics when the run was pinned).
    * Fails loudly if a later [[compact]] folded that history away. */
  def profileAsOf(version: Long): DataFrame =
    foldRows(
      store.readAsOf(version).drop("_ver")
        .where(col("kind") === "profile")
        .select(col("stratum").as(strataCol), col("docs"), col("tokens"),
          col("kmv"), col("vkmv"), col("vs_hashes"), col("vs_values")))

  /** Offline maintenance: fold the accumulated per-batch profile
    * rows into ONE row per stratum (journal rows survive — replays
    * of applied batches still skip). The fold is the same merge the
    * read path applies, so [[profile]] is unchanged by compaction. */
  def compact(): Unit = synchronized {
    store.rewrite { df =>
      val folded = foldRows(
        df.where(col("kind") === "profile")
          .select(col("stratum").as(strataCol), col("docs"),
            col("tokens"), col("kmv"), col("vkmv"),
            col("vs_hashes"), col("vs_values")))
        .select(lit("profile").as("kind"),
          col(strataCol).cast("string").as("stratum"),
          col("docs").cast("long"), col("tokens").cast("long"),
          col("kmv"), col("vkmv"), col("vs_hashes"), col("vs_values"),
          nulCol("string").as("batch_id"))
      folded.unionByName(df.where(col("kind") === "batch"))
    }
  }

  /** Wire a STREAMING `docs` frame into the loop: one [[ingest]] per
    * micro-batch, ids from the checkpointed streaming counter.
    * Redelivery is covered by the journal check; empty batches
    * commit nothing (deterministic — a replay re-skips). */
  def start(
      docs: DataFrame,
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
        else { ingest(batchId, b); () }
      }
      .start()
}

object ProfileIndex {

  private[sketch] val nulCol: String => org.apache.spark.sql.Column =
    t => lit(null).cast(t)

  private[sketch] val storeSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("stratum", StringType, nullable = true),
    StructField("docs", LongType, nullable = true),
    StructField("tokens", LongType, nullable = true),
    StructField("kmv", ArrayType(LongType), nullable = true),
    StructField("vkmv", ArrayType(LongType), nullable = true),
    StructField("vs_hashes", ArrayType(LongType), nullable = true),
    StructField("vs_values", ArrayType(DoubleType), nullable = true),
    StructField("batch_id", StringType, nullable = true)
  ))

  /** Open (or create) the profile index at `dir`. Creation pins
    * `(k, strataCol, textCol, valueCol)` next to the store; a reopen
    * compares and REFUSES a mismatch. `valueCol` (optional) adds a
    * standing VALUE-DISTRIBUTION sample per stratum
    * ([[SampleSketch]] — quantiles/mean of e.g. `n_chars` or a
    * quality score, maintained by the same corpus-free fold). */
  def open(spark: SparkSession, dir: String, k: Int,
      strataCol: String, textCol: String,
      valueCol: Option[String] = None): ProfileIndex = {
    require(k >= 2, s"kmv needs k >= 2 (got $k)")
    val vcStr = valueCol.getOrElse("")
    storedParams(dir) match {
      case Some((pk, ps, pt, pv)) =>
        require(pk == k && ps == strataCol && pt == textCol && pv == vcStr,
          s"ProfileIndex at $dir was built with (k=$pk, strata=$ps, " +
            s"text=$pt, value=${if (pv.isEmpty) "<none>" else pv}) — " +
            "sketches under different parameters are different " +
            "estimators; folding them corrupts every estimate")
      case None =>
        FileIO.forPath(dir).mkdirs(dir)
        writeParams(dir, k, strataCol, textCol, vcStr)
    }
    new ProfileIndex(spark, dir,
      TableStore.open(spark, FileIO.join(dir, "store"), storeSchema),
      k, strataCol, textCol, valueCol)
  }

  /** Reopen with the parameters the index was built with. */
  def open(spark: SparkSession, dir: String): ProfileIndex = {
    val (k, s, t, v) = storedParams(dir).getOrElse(
      throw new IllegalArgumentException(s"no ProfileIndex at $dir"))
    open(spark, dir, k, s, t, Some(v).filter(_.nonEmpty))
  }

  private def marker(dir: String) = FileIO.join(dir, "profile.properties")

  private def storedParams(dir: String): Option[(Int, String, String, String)] =
    FileIO.loadProps(marker(dir)).map(props =>
      (props.getProperty("k").toInt,
        props.getProperty("strataCol"), props.getProperty("textCol"),
        // markers written before the value tier have no valueCol —
        // absent means none, matching their actual contents
        Option(props.getProperty("valueCol")).getOrElse("")))

  private def writeParams(
      dir: String, k: Int, strataCol: String, textCol: String,
      valueCol: String): Unit = {
    val props = new Properties()
    props.setProperty("k", k.toString)
    props.setProperty("strataCol", strataCol)
    props.setProperty("textCol", textCol)
    props.setProperty("valueCol", valueCol)
    FileIO.storeProps(marker(dir), props, "graft ProfileIndex parameters")
  }
}
