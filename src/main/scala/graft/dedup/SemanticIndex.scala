package graft.dedup

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{FileIO, TableStore}

/** What one [[SemanticIndex.ingest]] produced. `admitted` is pinned
  * to the pre-batch snapshot (same contract as [[IngestResult]]): it
  * evaluates identically before or after the commit, or on a replay. */
final case class SemanticIngestResult(
    admitted: DataFrame,
    version: Long,
    replayed: Boolean
)

/** The standing SemDeDup state as a FIRST-CLASS managed artifact —
  * the [[DedupIndex]] discipline applied to the embedding tier: every
  * vector ever seen, with its cell under a PINNED codebook, in one
  * [[TableStore]] with a per-batch journal. "Assign the batch, admit
  * against everything seen, advance the index by the batch" is ONE
  * versioned commit.
  *
  * Why ALL seen vectors, not survivors: in SemDeDup the dominator
  * need not have survived (b drops when ANY earlier same-cell a
  * reaches the threshold, even if a itself was dropped) — an index of
  * survivors would re-admit near-dups of dropped docs and the rolling
  * run would diverge from the one-shot rule.
  *
  * Why the codebook is pinned at creation and refused on mismatch:
  * cells assigned under different centroids are disjoint namespaces —
  * a probe under the wrong codebook silently misses every prior
  * near-dup (no error, just duplicates shipped). The codebook is
  * persisted next to the store and compared element-wise at reopen.
  *
  * Crash contract = [[DedupIndex]]'s (reference: SinkIndex
  * cursor-after-apply, indexes/sinkindex.go:39-50): the journal row
  * rides the same atomic commit as the vector rows; a replayed
  * `batchId` recomputes its admitted set against the PRE-batch
  * snapshot (`readAsOf`) and appends nothing.
  *
  * Id contract: batch ids must exceed all indexed ids (monotonic
  * ingest — the rolling ≡ one-shot identity depends on it).
  *
  * Plan shape at 100 TB: per ingest, one narrow batch assign, a
  * codebook-bounded cell-literal probe into the standing store (the
  * probed cells' rows move, nothing else), one batch-sized commit. */
final class SemanticIndex private (
    val spark: SparkSession,
    val dir: String,
    store: TableStore,
    val cents: Seq[(Long, Seq[Float])]
) {

  def version: Long = store.version

  /** Every vector ever seen: `(id, cell, embedding)`. */
  def cells: DataFrame = cellsAt(None)

  /** The curated corpus: admitted vectors only — the admit decision
    * rides the SAME commit as the index advance, so the corpus record
    * can never diverge from the index (no second store, no second
    * crash window). */
  def corpus: DataFrame =
    stateAt(None).where(col("kind") === "vec" && col("admitted"))
      .select(col("id"), col("cell"), col("embedding"))

  /** The commit version that applied `batchId`, if any. */
  def appliedVersion(batchId: String): Option[Long] =
    store.readVersioned
      .where(col("kind") === "batch" && col("batch_id") === batchId)
      .select(col("_ver"))
      .collect()
      .headOption
      .map(_.getLong(0))

  /** Bootstrap: index `vecs` WITHOUT deduping them (an
    * already-curated corpus entering the managed artifact). Idempotent
    * by `batchId`; an overlapping re-seed under a new id appends no
    * duplicate vector rows. */
  def seed(
      batchId: String,
      vecs: DataFrame,
      vecCol: String,
      idCol: String
  ): Long = synchronized {
    appliedVersion(batchId).getOrElse {
      val assigned = graft.similarity.Ann
        .ivfAssignVectors(vecs, vecCol, idCol, cents)
        .select(col(idCol).cast("long").as("id"),
          col("cell").cast("long").as("cell"),
          col(vecCol).cast("array<float>").as("embedding"))
      commit(
        assigned.join(cellsAt(None).select("id").distinct(),
          Seq("id"), "left_anti")
          .withColumn("admitted", lit(true)), // bootstrap = curated
        batchId)
    }
  }

  /** Transactional ingest: admit the batch against everything seen
    * ([[Dedup.incrementalSemanticDedup]] over the pre-batch
    * snapshot), then ALL batch vectors + the journal row as one
    * commit. */
  def ingest(
      batchId: String,
      newVecs: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95
  ): SemanticIngestResult = synchronized {
    val applied = appliedVersion(batchId)
    // pre-batch snapshot: a replay must not pair the batch with itself
    val pre = applied.map(_ - 1)
    val admitted = Dedup.incrementalSemanticDedup(
      newVecs, vecCol, idCol,
      cellsAt(pre).withColumnRenamed("id", idCol)
        .withColumnRenamed("embedding", vecCol),
      cents, threshold)
    val ver = applied.getOrElse {
      val adm = admitted.select(col(idCol).cast("long").as("_adm_id"))
      commit(
        graft.similarity.Ann
          .ivfAssignVectors(newVecs, vecCol, idCol, cents)
          .select(col(idCol).cast("long").as("id"),
            col("cell").cast("long").as("cell"),
            col(vecCol).cast("array<float>").as("embedding"))
          .join(adm, col("id") === col("_adm_id"), "left")
          .select(col("id"), col("cell"), col("embedding"),
            col("_adm_id").isNotNull.as("admitted")),
        batchId)
    }
    SemanticIngestResult(admitted, ver, applied.isDefined)
  }

  private def commit(vecRows: DataFrame, batchId: String): Long = {
    val nul = (t: String) => lit(null).cast(t)
    val v = vecRows.select(
      lit("vec").as("kind"), col("id"), col("cell"), col("embedding"),
      col("admitted"), nul("string").as("batch_id"))
    val j = spark.range(1).select(
      lit("batch").as("kind"), nul("long").as("id"), nul("long").as("cell"),
      nul("array<float>").as("embedding"), nul("boolean").as("admitted"),
      lit(batchId).as("batch_id"))
    store.append(v.unionByName(j))
  }

  /** Wire a STREAMING `vecs` frame (carrying `idCol` + `vecCol`) into
    * the loop: one [[ingest]] per micro-batch, batch ids from the
    * checkpointed streaming counter. Exactly-once is simpler than the
    * text daemon's: there is ONE store, and the admit decision rides
    * the index commit, so a redelivered batch just recomputes against
    * the pre-batch snapshot and appends nothing. */
  def start(
      vecs: DataFrame,
      vecCol: String,
      idCol: String,
      checkpointDir: String,
      threshold: Double = 0.95,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)
  ): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val batchId = s"stream-$id"
        // idle-trigger fast path: an empty batch the index never saw
        // commits nothing (deterministic — its replay re-skips); one
        // journal lookup per micro-batch, not two
        val applied = appliedVersion(batchId)
        if (applied.isDefined || b.isEmpty) ()
        else { ingest(batchId, b, vecCol, idCol, threshold); () }
      }
      .start()

  /** Offline maintenance (the [[DedupIndex.compact]] contract): fold
    * commit history into few cell-sorted segments so the per-ingest
    * cell probe prunes row groups; journal rows survive, pre-fold
    * replays fail loudly. */
  def compact(targetPartitions: Int = 8): Unit = synchronized {
    store.rewrite(
      _.repartitionByRange(targetPartitions, col("kind"), col("cell"))
        .sortWithinPartitions("kind", "cell", "id"))
  }

  /** MINOR maintenance — the [[DedupIndex.compactMinor]] contract:
    * version-preserving small-tail fold, replays and snapshots keep
    * working, cost bounded by the small tail. */
  def compactMinor(
      targetPartitions: Int = 8,
      maxSegmentBytes: Long = 256L << 20): Boolean = synchronized {
    store.compactSmall(Seq("kind", "cell"), targetPartitions,
      maxSegmentBytes)
  }

  private def stateAt(pre: Option[Long]): DataFrame = pre match {
    case Some(v) if v <= 0 =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], SemanticIndex.storeSchema)
    case Some(v) => store.readAsOf(v).drop("_ver")
    case None => store.read
  }

  private def cellsAt(pre: Option[Long]): DataFrame =
    stateAt(pre).where(col("kind") === "vec")
      .select(col("id"), col("cell"), col("embedding"))
}

object SemanticIndex {

  private[dedup] val storeSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("id", LongType, nullable = true),
    StructField("cell", LongType, nullable = true),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("admitted", BooleanType, nullable = true),
    StructField("batch_id", StringType, nullable = true)
  ))

  /** Open (or create) the index at `dir` under `cents`. Creation
    * persists the codebook next to the store; a reopen compares it
    * element-wise and REFUSES a mismatch. */
  def open(spark: SparkSession, dir: String,
      cents: Seq[(Long, Seq[Float])]): SemanticIndex = {
    require(cents.nonEmpty, "empty codebook")
    val sorted = cents.sortBy(_._1)
    storedCents(spark, dir) match {
      case Some(p) =>
        require(p == sorted,
          s"SemanticIndex at $dir was built with a different codebook " +
            s"(k=${p.size}); cells assigned under different centroids " +
            "are disjoint namespaces — probes would silently miss")
      case None =>
        FileIO.forPath(dir).mkdirs(dir)
        writeCents(spark, dir, sorted)
    }
    new SemanticIndex(spark, dir,
      TableStore.open(spark, FileIO.join(dir, "store"), storeSchema),
      sorted)
  }

  /** Reopen with the codebook the index was built with. */
  def open(spark: SparkSession, dir: String): SemanticIndex = {
    val p = storedCents(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no SemanticIndex at $dir"))
    open(spark, dir, p)
  }

  private def marker(dir: String) = FileIO.join(dir, "codebook.properties")
  private def cbDir(dir: String) = FileIO.join(dir, "codebook")

  private def storedCents(
      spark: SparkSession, dir: String): Option[Seq[(Long, Seq[Float])]] = {
    if (FileIO.loadProps(marker(dir)).isEmpty) None
    else Some(spark.read.parquet(cbDir(dir))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
      .toSeq)
  }

  private def writeCents(
      spark: SparkSession, dir: String,
      cents: Seq[(Long, Seq[Float])]): Unit = {
    import spark.implicits._
    cents.toDF("cell", "embedding")
      .repartition(1)
      .write.mode("overwrite").parquet(cbDir(dir))
    // the marker commits LAST: a crash mid-write leaves no marker and
    // the next open recreates the codebook
    val props = new Properties()
    props.setProperty("k", cents.size.toString)
    props.setProperty("dims", cents.head._2.length.toString)
    FileIO.storeProps(marker(dir), props, "graft SemanticIndex codebook")
  }
}
