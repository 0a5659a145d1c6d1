package graft.dedup

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{FileIO, TableStore}

/** What one [[VecDedupIndex.ingest]] produced — frames pinned to the
  * pre-batch snapshot (the [[IngestResult]] contract). */
final case class VecIngestResult(
    pairs: DataFrame,
    admitted: DataFrame,
    capped: DataFrame,
    version: Long,
    replayed: Boolean
)

/** The standing EMBEDDING near-dup state as a managed artifact — the
  * third of the trilogy ([[DedupIndex]] for text, [[SemanticIndex]]
  * for SemDeDup): every vector ever seen with its sign-LSH bucket, in
  * one [[TableStore]] with a per-batch journal, so "probe the batch,
  * emit batch-touching pairs, apply the survivor rule, advance the
  * index" is ONE versioned commit.
  *
  * `bits` is pinned at creation and refused on mismatch (signatures
  * under different widths are disjoint namespaces — a wrong-width
  * probe silently misses every prior near-dup). The signature planes
  * themselves are deterministic md5 arithmetic, so `bits` is the
  * whole parameterization.
  *
  * Indexed population: EVERY batch vector, admitted or not — a future
  * vector similar to a dropped one but sharing no bucket with its
  * canonical must still pair (the same losers-are-indexed argument as
  * [[DedupIndex]]).
  *
  * Crash contract and id discipline: identical to [[DedupIndex]] —
  * journal rides the commit, replays recompute against the pre-batch
  * snapshot (`readAsOf`) and append nothing; batch ids must exceed
  * indexed ids.
  *
  * Plan shape at 100 TB: the batch is bucketed narrowly, its distinct
  * bucket keys broadcast (count-gated) into the standing store; only
  * probed buckets' rows move, the mega-bucket cap counts the combined
  * population, and the commit appends batch-sized parquet. */
final class VecDedupIndex private (
    val spark: SparkSession,
    val dir: String,
    store: TableStore,
    val bits: Int
) {

  def version: Long = store.version

  /** Every vector ever seen: `(id, bucket, embedding)`. */
  def buckets: DataFrame = bucketsAt(None)

  /** The curated corpus: admitted vectors only — the survivor decision
    * rides the SAME commit as the index advance (the [[SemanticIndex]]
    * contract), so the corpus record can never diverge from the index.
    * NOTE: rolling admission is decided at each vector's ingest; a
    * FUTURE doc can merge two components that a one-shot run over the
    * final corpus would have merged up front — inherent to any
    * streaming dedup, and pinned as "restart ≡ the uninterrupted
    * rolling run" rather than a global one-shot identity. */
  def corpus: DataFrame =
    stateAt(None).where(col("kind") === "vec" && col("admitted"))
      .select(col("id"), col("bucket"), col("embedding"))

  /** The commit version that applied `batchId`, if any. */
  def appliedVersion(batchId: String): Option[Long] =
    store.readVersioned
      .where(col("kind") === "batch" && col("batch_id") === batchId)
      .select(col("_ver"))
      .collect()
      .headOption
      .map(_.getLong(0))

  /** Bootstrap: index `vecs` without deduping them. Idempotent by
    * `batchId`; an overlapping re-seed appends no duplicate rows. */
  def seed(
      batchId: String,
      vecs: DataFrame,
      vecCol: String,
      idCol: String
  ): Long = synchronized {
    appliedVersion(batchId).getOrElse {
      commit(
        bucketRows(vecs, vecCol, idCol)
          .join(bucketsAt(None).select("id").distinct(),
            Seq("id"), "left_anti")
          .withColumn("admitted", lit(true)), // bootstrap = curated
        batchId)
    }
  }

  /** Transactional ingest: batch-touching near-dup pairs against the
    * pre-batch snapshot ([[Dedup.incrementalEmbeddingNearDupDiag]]),
    * the corpus-wins survivor rule ([[Dedup.incrementalDropIds]]),
    * then the batch's bucket rows + journal as one commit. */
  def ingest(
      batchId: String,
      newVecs: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      maxBucket: Long = 10000L,
      maxIter: Int = 50
  ): VecIngestResult = synchronized {
    val applied = appliedVersion(batchId)
    val pre = applied.map(_ - 1)
    val (pairs, capped) = Dedup.incrementalEmbeddingNearDupDiag(
      newVecs, vecCol, idCol,
      corpusBuckets = bucketsAt(pre)
        .withColumnRenamed("id", idCol)
        .withColumnRenamed("embedding", vecCol),
      threshold = threshold, bits = bits, maxBucket = maxBucket)
    val drops = Dedup.incrementalDropIds(
      pairs, newVecs.select(col(idCol)), idCol, maxIter)
    val admitted = newVecs
      .join(drops, newVecs(idCol) === drops("_dup_id"), "left_anti")
    val ver = applied.getOrElse {
      // the survivor decision rides the index commit: one store, one
      // crash window (the SemanticIndex `admitted` contract)
      commit(
        bucketRows(newVecs, vecCol, idCol)
          .join(drops.select(col("_dup_id")),
            col("id") === col("_dup_id"), "left")
          .select(col("id"), col("bucket"), col("embedding"),
            col("_dup_id").isNull.as("admitted")),
        batchId)
    }
    VecIngestResult(pairs, admitted, capped, ver, applied.isDefined)
  }

  private def bucketRows(
      vecs: DataFrame, vecCol: String, idCol: String): DataFrame =
    graft.similarity.Ann.lshBuckets(vecs, vecCol, idCol, bits)
      .select(col(idCol).cast("long").as("id"),
        col("bucket").cast("long").as("bucket"),
        col(vecCol).cast("array<float>").as("embedding"))

  private def commit(rows: DataFrame, batchId: String): Long = {
    val nul = (t: String) => lit(null).cast(t)
    val v = rows.select(
      lit("vec").as("kind"), col("id"), col("bucket"), col("embedding"),
      col("admitted"), nul("string").as("batch_id"))
    val j = spark.range(1).select(
      lit("batch").as("kind"), nul("long").as("id"),
      nul("long").as("bucket"), nul("array<float>").as("embedding"),
      nul("boolean").as("admitted"), lit(batchId).as("batch_id"))
    store.append(v.unionByName(j))
  }

  /** Wire a STREAMING `vecs` frame (carrying `idCol` + `vecCol`) into
    * the loop: one [[ingest]] per micro-batch, batch ids from the
    * checkpointed streaming counter — the [[SemanticIndex.start]]
    * shape, completing the trilogy's streaming symmetry. Exactly-once
    * holds because there is ONE store and the survivor decision rides
    * the index commit: a redelivered batch recomputes against the
    * pre-batch snapshot and appends nothing. */
  def start(
      vecs: DataFrame,
      vecCol: String,
      idCol: String,
      checkpointDir: String,
      threshold: Double = 0.95,
      maxBucket: Long = 10000L,
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
        else {
          ingest(batchId, b, vecCol, idCol, threshold, maxBucket); ()
        }
      }
      .start()

  /** Offline maintenance — the [[DedupIndex.compact]] contract. */
  def compact(targetPartitions: Int = 8): Unit = synchronized {
    store.rewrite(
      _.repartitionByRange(targetPartitions, col("kind"), col("bucket"))
        .sortWithinPartitions("kind", "bucket", "id"))
  }

  /** MINOR maintenance — the [[DedupIndex.compactMinor]] contract:
    * version-preserving small-tail fold, replays and snapshots keep
    * working, cost bounded by the small tail. */
  def compactMinor(
      targetPartitions: Int = 8,
      maxSegmentBytes: Long = 256L << 20): Boolean = synchronized {
    store.compactSmall(Seq("kind", "bucket"), targetPartitions,
      maxSegmentBytes)
  }

  private def stateAt(pre: Option[Long]): DataFrame = pre match {
    case Some(v) if v <= 0 =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], VecDedupIndex.storeSchema)
    case Some(v) => store.readAsOf(v).drop("_ver")
    case None => store.read
  }

  private def bucketsAt(pre: Option[Long]): DataFrame =
    stateAt(pre).where(col("kind") === "vec")
      .select(col("id"), col("bucket"), col("embedding"))
}

object VecDedupIndex {

  private[dedup] val storeSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("id", LongType, nullable = true),
    StructField("bucket", LongType, nullable = true),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    StructField("admitted", BooleanType, nullable = true),
    StructField("batch_id", StringType, nullable = true)
  ))

  /** Open (or create) the index at `dir` with `bits`. Creation
    * records the width; a reopen REFUSES a mismatch. */
  def open(spark: SparkSession, dir: String, bits: Int = 8): VecDedupIndex = {
    storedBits(dir) match {
      case Some(b) =>
        require(b == bits,
          s"VecDedupIndex at $dir was built with bits=$b; open requested " +
            s"bits=$bits — signature widths must match across the " +
            "persist/probe boundary")
      case None =>
        FileIO.forPath(dir).mkdirs(dir)
        val props = new Properties()
        props.setProperty("bits", bits.toString)
        FileIO.storeProps(marker(dir), props,
          "graft VecDedupIndex signature width")
    }
    new VecDedupIndex(spark, dir,
      TableStore.open(spark, FileIO.join(dir, "store"), storeSchema),
      bits)
  }

  /** Reopen an existing index with the signature width it was built
    * with (pinned on disk at creation). */
  def reopen(spark: SparkSession, dir: String): VecDedupIndex = {
    val b = storedBits(dir).getOrElse(
      throw new IllegalArgumentException(s"no VecDedupIndex at $dir"))
    open(spark, dir, b)
  }

  private def marker(dir: String) = FileIO.join(dir, "params.properties")

  private def storedBits(dir: String): Option[Int] =
    FileIO.loadProps(marker(dir)).map(_.getProperty("bits").toInt)
}
