package graft.pipeline

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.storage.{FileIO, TableStore}

/** The standing EVAL-SET dictionary as a managed artifact — the
  * [[BoilerplateIndex]] discipline applied to benchmark
  * decontamination: the distinct gram keys of every benchmark suite
  * ever registered, maintained in one [[TableStore]] with a
  * per-set journal, so span/doc decontamination is steady-state and
  * VERSIONED.
  *
  * Why incremental: [[Decontaminate.evalGramKeys]] recomputes the
  * dictionary from the raw eval parquet per daemon handle — fine for
  * one immutable set, but a production pipeline accumulates suites
  * over time (new benchmarks ship monthly) and needs an auditable
  * answer to "which sets is my corpus clean against, as of when?".
  * Gram keys UNION across sets, so each registration appends only the
  * NEW set's keys (anti-joined against the standing store — keys stay
  * globally distinct) with a journal row naming the set; the standing
  * dictionary is the union read. `appliedVersion(setId)` is the audit
  * handle.
  *
  * Reads are count-gated like every dictionary consumer here:
  * [[decontaminate]]/[[overlapCounts]] score through the narrow
  * per-row [[graft.functions.GramSetOverlap]] expression while the
  * dictionary fits the driver, and degrade to the broadcast-join leg
  * past the gate — the corpus side is always ONE scan.
  *
  * `width` is pinned at creation and refused on mismatch (gram
  * spaces of different widths must never union). */
final class EvalIndex private (
    val spark: SparkSession,
    val dir: String,
    store: TableStore,
    val width: Int
) {

  def version: Long = store.version

  /** Reload the on-disk manifest into this handle — cross-process
    * (and cross-handle) visibility for long-lived consumers: a daemon
    * resolving "the dictionary version current NOW" per fresh batch
    * must see suites other handles registered since its open, or its
    * documented as-of-commit contract silently freezes at the first
    * batch. Returns the refreshed version. */
  def refresh(): Long = store.refresh()

  // the dictionary is immutable PER COMMIT VERSION (gram rows only
  // ever accumulate; compaction re-lays but never changes the key
  // set), so collected key arrays are cached on the handle keyed by
  // version: the daemon's per-batch gating, a standalone
  // decontaminate loop, and a replaying consumer pinning an older
  // version all pay the dictionary job ONCE per version instead of
  // once per call. Over-gate dictionaries (the join leg) are not
  // cached — the join leg never collects.
  @transient private val keyCache =
    scala.collection.mutable.Map.empty[Long, Array[Long]]

  /** The collected dictionary at `asOf` (default: current), or None
    * when it exceeds `maxKeys` — ONE gate job (collect up to
    * maxKeys+1, overflow row = too big), cached per version. */
  private def collectedKeys(
      asOf: Option[Long], maxKeys: Long): Option[Array[Long]] =
    synchronized {
      val ver = asOf.getOrElse(store.version)
      keyCache.get(ver) match {
        case Some(ks) if ks.length <= maxKeys => Some(ks)
        case Some(_) => None
        case None =>
          val limit = math.min(maxKeys + 1, Int.MaxValue.toLong).toInt
          val gathered = asOf.map(keysAsOf).getOrElse(keys)
            .limit(limit).collect().map(_.getLong(0))
          if (gathered.length > maxKeys) None
          else { keyCache(ver) = gathered; Some(gathered) }
      }
    }

  /** The commit version that registered eval set `setId`, if any —
    * the "is my corpus clean against suite X?" audit handle. */
  def appliedVersion(setId: String): Option[Long] =
    store.readVersioned
      .where(col("kind") === "set" && col("set_id") === setId)
      .select(col("_ver"))
      .collect()
      .headOption
      .map(_.getLong(0))

  /** Register one eval set: its distinct gram keys (xxhash64 of the
    * space-joined lowercase token slice — the exact key space the
    * scoring legs probe) anti-joined against the standing keys, plus
    * the journal row, in ONE commit. Idempotent by `setId`. The set
    * itself should be immutable — a revised benchmark is a NEW set
    * id. */
  def ingest(setId: String, evalSet: DataFrame, textCol: String): Long =
    synchronized {
      appliedVersion(setId).getOrElse {
        val nul = (t: String) => lit(null).cast(t)
        val fresh = evalSet
          .select(explode(
            Dedup.shinglesNative(evalSet, col(textCol), width)).as("_gram"))
          .select(xxhash64(col("_gram")).as("g"))
          .distinct()
          .join(keys, Seq("g"), "left_anti")
          .select(lit("gram").as("kind"), col("g"),
            nul("string").as("set_id"))
        val j = spark.range(1).select(
          lit("set").as("kind"), nul("long").as("g"),
          lit(setId).as("set_id"))
        store.append(fresh.unionByName(j))
      }
    }

  /** The standing distinct gram keys, as a frame (column `g`). */
  def keys: DataFrame =
    store.read.where(col("kind") === "gram").select(col("g"))

  /** The dictionary EXACTLY as of commit `version` — the handle a
    * replaying consumer pins so a suite registered mid-crash-window
    * cannot change a recorded gating decision
    * ([[graft.streaming.IngestDaemon]]'s knobs of record). Fails
    * loudly if a later [[compact]] folded that history away. */
  def keysAsOf(version: Long): DataFrame =
    store.readAsOf(version).drop("_ver")
      .where(col("kind") === "gram").select(col("g"))

  /** The dictionary collected for driver-side pinning (the
    * count-gated narrow-expression scoring path), optionally at a
    * pinned version. Refuses (loudly) a dictionary past `maxKeys` —
    * one that big shouldn't be pinned on a driver across batches;
    * use the frame-level [[decontaminate]] (join leg) instead. */
  def gramKeys(
      maxKeys: Long = 1000000L,
      asOf: Option[Long] = None): Array[Long] =
    collectedKeys(asOf, maxKeys).getOrElse(
      throw new IllegalArgumentException(
        s"EvalIndex.gramKeys: distinct grams exceed maxKeys=$maxKeys " +
          "— use the frame-level decontaminate (join leg) instead of " +
          "pinning the dictionary"))

  /** Per-document contamination counts of ANY frame against the
    * standing dictionary — [[Decontaminate.overlapCounts]] semantics
    * with the eval scan replaced by the standing state. Count-gated:
    * one narrow per-row expression while the dictionary fits,
    * broadcast-join leg past `maxCollectedKeys`. */
  def overlapCounts(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      minOverlap: Long = 1L,
      maxCollectedKeys: Long = 1000000L): DataFrame = {
    require(minOverlap > 0,
      s"decontaminate minOverlap must be > 0 (got $minOverlap)")
    collectedKeys(None, maxCollectedKeys) match {
      case Some(ks) =>
        val s = graft.functions.GramSetOverlap.column(col(textCol), width, ks)
        corpus
          .select(col(idCol), explode(array(s)).as("_s"))
          .select(col(idCol), col("_s.n_hits").as("overlap"))
          .where(col("overlap") >= minOverlap)
      case None =>
        corpus
          .select(col(idCol), explode(
            Dedup.shinglesNative(corpus, col(textCol), width)).as("_gram"))
          .select(col(idCol), xxhash64(col("_gram")).as("g"))
          .distinct()
          .join(keys, Seq("g"), "left_semi")
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("overlap"))
          .where(col("overlap") >= minOverlap)
    }
  }

  /** Drop every corpus doc sharing ≥ `minOverlap` grams with ANY
    * registered eval set — the steady-state decontamination gate. */
  def decontaminate(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      minOverlap: Long = 1L,
      maxCollectedKeys: Long = 1000000L): DataFrame = {
    val dirty = overlapCounts(corpus, textCol, idCol, minOverlap,
      maxCollectedKeys).select(col(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** Offline maintenance: fold per-set gram rows (already distinct by
    * the ingest anti-join; the fold just re-lays segments). Journal
    * rows survive. */
  def compact(): Unit = synchronized {
    store.rewrite { df =>
      val nul = (t: String) => lit(null).cast(t)
      df.where(col("kind") === "gram")
        .select(col("g")).distinct()
        .select(lit("gram").as("kind"), col("g"),
          nul("string").as("set_id"))
        .unionByName(df.where(col("kind") === "set"))
    }
  }
}

object EvalIndex {

  private[pipeline] val storeSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("g", LongType, nullable = true),
    StructField("set_id", StringType, nullable = true)
  ))

  /** Open (or create) the index at `dir`; `width` is pinned at
    * creation and refused on mismatch. */
  def open(spark: SparkSession, dir: String, width: Int): EvalIndex = {
    require(width > 0, s"width must be > 0 (got $width)")
    storedWidth(dir) match {
      case Some(w) =>
        require(w == width,
          s"EvalIndex at $dir was built with width=$w — gram spaces " +
            "of different widths must never union")
      case None =>
        FileIO.forPath(dir).mkdirs(dir)
        val props = new Properties()
        props.setProperty("width", width.toString)
        FileIO.storeProps(marker(dir), props, "graft EvalIndex parameters")
    }
    new EvalIndex(spark, dir,
      TableStore.open(spark, FileIO.join(dir, "store"), storeSchema),
      width)
  }

  /** Reopen with the width the index was built with. */
  def open(spark: SparkSession, dir: String): EvalIndex = {
    val w = storedWidth(dir).getOrElse(
      throw new IllegalArgumentException(s"no EvalIndex at $dir"))
    open(spark, dir, w)
  }

  private def marker(dir: String) = FileIO.join(dir, "eval.properties")

  private def storedWidth(dir: String): Option[Int] =
    FileIO.loadProps(marker(dir)).map(_.getProperty("width").toInt)
}
