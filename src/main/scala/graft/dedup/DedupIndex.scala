package graft.dedup

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{FileIO, TableStore}

/** Banding/fingerprint parameters of a [[DedupIndex]]. Recorded next
  * to the index at creation and asserted on every reopen: an index
  * probed with different parameters silently produces disjoint band
  * keys (missing pairs, not an error), so the mismatch must be
  * refused at `open`, not discovered in shipped data. */
final case class DedupParams(
    numHashes: Int = 16,
    bands: Int = 4,
    shingleWidth: Int = 3,
    portableHash: Boolean = true
)

/** What one [[DedupIndex.ingest]] produced. All frames are pinned to
  * the index state BEFORE this batch's commit (their input file lists
  * resolve at creation), so they can be evaluated before or after the
  * commit — or on a replay — with identical results.
  *
  * @param exactSurvivors the batch minus exact duplicates (of the
  *   standing index and within the batch, min id canonical)
  * @param pairs batch-touching near-dup pairs `(id_a, id_b, jaccard)`
  * @param admitted `exactSurvivors` minus near-dup losers under
  *   [[Dedup.incrementalDropIds]] (corpus partner in cluster → drop;
  *   else min-id batch member survives)
  * @param capped flooded-bucket diagnostic (see
  *   [[Dedup.incrementalLshPairsDiag]])
  * @param version the index version holding this batch's commit
  * @param replayed true when the batch was already committed and this
  *   call recomputed its outputs against the pre-batch snapshot
  */
final case class IngestResult(
    exactSurvivors: DataFrame,
    pairs: DataFrame,
    admitted: DataFrame,
    capped: DataFrame,
    version: Long,
    replayed: Boolean
)

/** The standing dedup index as a FIRST-CLASS managed artifact: the
  * LSH band keys ([[Dedup.lshBandIndex]]) and exact fingerprints
  * ([[Dedup.fingerprintIndex]]) of everything the pipeline has seen,
  * stored in one [[TableStore]] with a per-batch journal — so "probe
  * the batch, emit pairs/survivors, advance the index by the batch's
  * bands + fingerprints" is ONE versioned commit instead of
  * caller-managed loose parquet.
  *
  * The crash contract is the reference's resumable-derived-view
  * discipline (SinkIndex cursor-after-apply, indexes/sinkindex.go:
  * 39-50; multilog/sink.go:46-58): the journal row rides the SAME
  * atomic manifest commit as the index rows, so
  *
  *  - a crash BEFORE the commit leaves nothing visible — re-running
  *    the batch probes the identical pre-state and recomputes the
  *    identical outputs (the whole pipeline is deterministic);
  *  - a crash AFTER the commit (before the caller persisted the
  *    batch's outputs) is detected by the journal — the replay
  *    recomputes against the PRE-batch snapshot (`readAsOf`, free
  *    point-in-time re-probes) and does NOT append again.
  *
  * Either way the next batch probes an index holding this batch
  * exactly once — the double-admit window of the loose-parquet flow
  * (crash between probe and `mode("append")`) is gone.
  *
  * What gets indexed per ingest: the bands and fingerprints of the
  * batch's EXACT survivors — including near-dup losers. An exact dup
  * adds no key its canonical didn't already contribute (identical
  * text → identical signature), but a near-dup loser has distinct
  * keys, and indexing it preserves recall for future batches (a doc
  * similar to the loser but sharing no bucket with its canonical) and
  * the pair identity `rolling ingests ≡ one batch run minus
  * corpus-internal pairs` that the spec pins. The index is therefore
  * a content index of everything SEEN; admission is the caller's
  * survivor set.
  *
  * Single-writer: `ingest`/`seed` are synchronized per handle; run
  * one ingest pipeline per index (the reference's single-owner log
  * discipline). Readers (including other processes) are unaffected —
  * they see committed manifests only.
  */
final class DedupIndex private (
    val spark: SparkSession,
    val dir: String,
    store: TableStore,
    val params: DedupParams
) {

  import DedupIndex.storeSchema

  def version: Long = store.version

  /** The standing band index `(id, band, bucket)` — the frame
    * [[Dedup.incrementalLshPairs]]-style probes semi-join against. */
  def bands: DataFrame = bandsAt(None)

  /** The standing exact-fingerprint index `(fingerprint)`. Rows are
    * distinct by construction: each commit appends only fingerprints
    * absent from the pre-commit index (one per exact-survivor). */
  def fingerprints: DataFrame = fpsAt(None)

  /** The commit version that applied `batchId`, if any. */
  def appliedVersion(batchId: String): Option[Long] =
    store.readVersioned
      .where(col("kind") === "batch" && col("batch_id") === batchId)
      .select(col("_ver"))
      .collect()
      .headOption
      .map(_.getLong(0))

  /** The caller-supplied knobs-of-record payload that rode `batchId`'s
    * journal row ([[ingest]]'s `gates`), if any — atomic with the
    * commit it describes, it survives [[compact]] (journal rows are
    * preserved by the fold), and unlike a side file it can never be
    * present without its commit or vice versa. One row by the journal
    * invariant (ingest is idempotent by batchId). */
  def recordedGates(batchId: String): Option[String] =
    store.read
      .where(col("kind") === "batch" && col("batch_id") === batchId)
      .select(col("gates"))
      .collect()
      .headOption
      .flatMap(r => Option(r.getString(0)))

  /** Bootstrap: index `docs` (bands + fingerprints) WITHOUT deduping
    * them — the already-curated standing corpus entering the managed
    * artifact. One atomic commit; idempotent by `batchId` (a replay
    * returns the original commit version and appends nothing). */
  def seed(
      batchId: String,
      docs: DataFrame,
      textCol: String,
      idCol: String
  ): Long = synchronized {
    appliedVersion(batchId).getOrElse {
      val bandRows = Dedup
        .lshBandIndex(docs, textCol, idCol, params.numHashes, params.bands,
          params.shingleWidth, params.portableHash)
        .select(col(idCol).cast("long").as("id"), col("band"), col("bucket"))
      // anti-join BOTH sides vs the standing index: a second seed over
      // an overlapping corpus (under a new batchId) must not append
      // duplicate rows — duplicated band rows would make every later
      // ingest() probe return each standing candidate twice
      commit(
        bandRows.join(bandsAt(None).select("id").distinct(),
          Seq("id"), "left_anti"),
        Dedup.fingerprintIndex(docs, textCol)
          .join(fpsAt(None), Seq("fingerprint"), "left_anti"),
        batchId, None)
    }
  }

  /** Transactional ingest of one batch: exact tier (drop docs whose
    * fingerprint the index already holds, min-id canon within the
    * batch), near tier ([[Dedup.incrementalFromBands]] probe of the
    * standing bands — the batch is banded ONCE, reused for the
    * append), survivor rule ([[Dedup.incrementalDropIds]]), then the
    * batch's bands + fingerprints + journal row as ONE commit.
    *
    * `corpusTexts` is the `(idCol, textCol)` fetch side for the
    * exact-Jaccard verify — the texts of the docs behind the standing
    * index (the index itself never stores text). Batch ids must be
    * disjoint from indexed ids. `exactTier = false` skips the exact
    * tier (pairs then cover exact dups too, at jaccard 1.0); the
    * ADMITTED set is the same either way — an exact dup is a jaccard-
    * 1.0 near-dup whose cluster fate matches its canonical's.
    *
    * Plan shape at 100 TB: unchanged from the loose-parquet flow
    * (batch-side banding, count-gated broadcast probe of the index in
    * place, capped buckets, pushed-id text fetch — nothing
    * corpus-sized moves); the commit adds one batch-sized parquet
    * write. */
  def ingest(
      batchId: String,
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      corpusTexts: DataFrame,
      threshold: Double = 0.5,
      maxBucket: Long = 10000L,
      exactTier: Boolean = true,
      maxPushedFetchIds: Long = 100000L,
      maxBroadcastProbeKeys: Long = 4000000L,
      maxIter: Int = 50,
      // opaque knobs-of-record payload for the batch's journal row
      // (see [[recordedGates]]) — the IngestDaemon's replay contract
      gates: Option[String] = None
  ): IngestResult = synchronized {
    val applied = appliedVersion(batchId)
    // pre-batch snapshot: on a replay the index already holds this
    // batch (probing it would pair the batch with itself), so read
    // strictly below the batch's own commit version
    val pre = applied.map(_ - 1)
    val idxFps = fpsAt(pre)
    val exactSurvivors =
      if (exactTier)
        Dedup.incrementalExactDedup(newDocs, textCol, idCol, idxFps)
      else newDocs
    val newBands = Dedup
      .lshBandIndex(exactSurvivors, textCol, idCol, params.numHashes,
        params.bands, params.shingleWidth, params.portableHash)
      .localCheckpoint(true)
    val (pairs, capped) = Dedup.incrementalFromBands(
      newBands, exactSurvivors.select(col(idCol), col(textCol)),
      textCol, idCol,
      bandsAt(pre).withColumnRenamed("id", idCol),
      corpusTexts, params.shingleWidth,
      threshold, maxBucket, maxPushedFetchIds, maxBroadcastProbeKeys,
      portableHash = params.portableHash)
    val drops =
      Dedup.incrementalDropIds(
        pairs, exactSurvivors.select(col(idCol)), idCol, maxIter)
    val admitted = exactSurvivors
      .join(drops, exactSurvivors(idCol) === drops("_dup_id"), "left_anti")
    val ver = applied.getOrElse {
      // the appended fingerprints are explicitly deduped — distinct
      // within the batch and anti-joined against the standing index —
      // so the fingerprint column stays globally distinct even when
      // exactTier = false left exact dups in the survivor set (or a
      // replayed corpus overlaps); with exactTier = true both legs
      // are cheap no-ops (survivors are already one per fingerprint,
      // none in the pre-index)
      commit(
        newBands.select(col(idCol).cast("long").as("id"),
          col("band"), col("bucket")),
        exactSurvivors.select(
          graft.text.TextFunctions.fingerprint(col(textCol))
            .as("fingerprint"))
          .distinct()
          .join(idxFps, Seq("fingerprint"), "left_anti"),
        batchId, gates)
    }
    IngestResult(exactSurvivors, pairs, admitted, capped, ver,
      applied.isDefined)
  }

  /** One atomic index advance: band rows + fingerprint rows + the
    * batch's journal row in a single [[TableStore]] commit. */
  private def commit(
      bandRows: DataFrame,
      fpRows: DataFrame,
      batchId: String,
      gates: Option[String]
  ): Long = {
    val nul = (t: String) => lit(null).cast(t)
    val b = bandRows.select(
      lit("band").as("kind"), col("id"),
      col("band").cast("int").as("band"), col("bucket").cast("string").as("bucket"),
      nul("string").as("fingerprint"), nul("string").as("batch_id"),
      nul("string").as("gates"))
    val f = fpRows.select(
      lit("fp").as("kind"), nul("long").as("id"), nul("int").as("band"),
      nul("string").as("bucket"), col("fingerprint").cast("string").as("fingerprint"),
      nul("string").as("batch_id"), nul("string").as("gates"))
    val j = spark.range(1).select(
      lit("batch").as("kind"), nul("long").as("id"), nul("int").as("band"),
      nul("string").as("bucket"), nul("string").as("fingerprint"),
      lit(batchId).as("batch_id"),
      gates.map(lit(_)).getOrElse(nul("string")).as("gates"))
    store.append(b.unionByName(f).unionByName(j))
  }

  /** Maintenance: fold the index's commit history into
    * `targetPartitions` range-partitioned, internally sorted segments
    * (explicit partitioning — NOT the session's shuffle.partitions,
    * so the folded layout is deterministic and small). A year of
    * daily ingests is ~365 small segment sets; folding keeps probe
    * planning O(1) in batch count and the `(kind, band, bucket)`
    * ordering makes the probe's `kind` filter and bucket joins
    * row-group-prunable.
    *
    * Contract (the TableStore snapshot contract, surfaced) — an
    * OFFLINE maintenance op, like any compaction:
    *   - run it from the single writer with no concurrent readers
    *     mid-scan: the fold deletes pre-fold segment files, so an
    *     in-flight scan planned against the old manifest (including
    *     an unevaluated pre-fold [[IngestResult]] frame) can fail
    *     with a missing file;
    *   - compact only once every prior batch's OUTPUTS are durably
    *     persisted downstream;
    *   - `appliedVersion` still DETECTS every batch (journal rows
    *     survive the fold) but reports the fold version for
    *     pre-fold batches — the original commit-version lineage is
    *     folded away with the snapshots;
    *   - a NEW batch probes the same index state (rolling identity
    *     is spec-pinned through the fold), while REPLAYING a
    *     pre-fold batch needs its pre-batch snapshot, which the fold
    *     removed: that replay fails loudly (`readAsOf` fold refusal)
    *     instead of recomputing against the wrong state.
    * Rows are preserved exactly; only layout and history change. */
  def compact(targetPartitions: Int = 8): Unit = synchronized {
    store.rewrite(
      _.repartitionByRange(targetPartitions,
          col("kind"), col("band"), col("bucket"), col("fingerprint"))
        .sortWithinPartitions("kind", "band", "bucket", "fingerprint"))
  }

  /** MINOR maintenance ([[graft.storage.TableStore.compactSmall]]):
    * fold only the small (recent-commit) segments into the probe
    * layout, PRESERVING every row's commit version — pre-fold batch
    * replays and `readAsOf` snapshots keep working, and the fold cost
    * is bounded by the small tail instead of the whole index. The
    * in-loop policy a daemon can afford on every tick; [[compact]]
    * remains the explicit offline full fold. */
  def compactMinor(
      targetPartitions: Int = 8,
      maxSegmentBytes: Long = 256L << 20): Boolean = synchronized {
    store.compactSmall(Seq("kind", "band", "bucket", "fingerprint"),
      targetPartitions, maxSegmentBytes)
  }

  /** The committed rows as of `pre` (None = current): the snapshot
    * read is the connector's `versionAsOf` planning-time prune. */
  private def stateAt(pre: Option[Long]): DataFrame = pre match {
    case Some(v) if v <= 0 =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], storeSchema)
    case Some(v) => store.readAsOf(v).drop("_ver")
    case None => store.read
  }

  private def bandsAt(pre: Option[Long]): DataFrame =
    stateAt(pre).where(col("kind") === "band")
      .select(col("id"), col("band"), col("bucket"))

  private def fpsAt(pre: Option[Long]): DataFrame =
    stateAt(pre).where(col("kind") === "fp").select(col("fingerprint"))
}

object DedupIndex {

  /** One store, three row kinds (discriminated by `kind`, a
    * dictionary-encoded constant per block): `band` rows are the LSH
    * index, `fp` rows the exact index, `batch` rows the ingest
    * journal. One store = one manifest = genuinely atomic
    * band+fingerprint+journal commits; the kind filter is a pushed
    * parquet predicate, pruned per row group. */
  private[dedup] val storeSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("id", LongType, nullable = true),
    StructField("band", IntegerType, nullable = true),
    StructField("bucket", StringType, nullable = true),
    StructField("fingerprint", StringType, nullable = true),
    StructField("batch_id", StringType, nullable = true),
    // journal rows only: the opaque knobs-of-record payload the
    // ingest's caller asked to pin with this batch's commit
    StructField("gates", StringType, nullable = true)
  ))

  /** Open (or create) the index at `dir` with `params`. Creation
    * records the parameters next to the store; a reopen asserts the
    * stored parameters equal the requested ones and REFUSES a
    * mismatch — see [[DedupParams]]. */
  def open(spark: SparkSession, dir: String, params: DedupParams): DedupIndex = {
    storedParams(dir) match {
      case Some(p) =>
        require(p == params,
          s"DedupIndex at $dir was built with $p; open requested $params — " +
            "banding parameters must match across the persist/probe boundary")
      case None =>
        FileIO.forPath(dir).mkdirs(dir)
        writeParams(dir, params)
    }
    new DedupIndex(spark, dir,
      TableStore.open(spark, FileIO.join(dir, "store"), storeSchema),
      params)
  }

  /** Reopen an existing index with the parameters it was built with. */
  def open(spark: SparkSession, dir: String): DedupIndex = {
    val p = storedParams(dir).getOrElse(
      throw new IllegalArgumentException(s"no DedupIndex at $dir"))
    open(spark, dir, p)
  }

  private def paramsPath(dir: String) = FileIO.join(dir, "params.properties")

  private def storedParams(dir: String): Option[DedupParams] =
    FileIO.loadProps(paramsPath(dir)).map(props => DedupParams(
      props.getProperty("numHashes").toInt,
      props.getProperty("bands").toInt,
      props.getProperty("shingleWidth").toInt,
      props.getProperty("portableHash").toBoolean))

  private def writeParams(dir: String, params: DedupParams): Unit = {
    val props = new Properties()
    props.setProperty("numHashes", params.numHashes.toString)
    props.setProperty("bands", params.bands.toString)
    props.setProperty("shingleWidth", params.shingleWidth.toString)
    props.setProperty("portableHash", params.portableHash.toString)
    FileIO.storeProps(paramsPath(dir), props,
      "graft DedupIndex banding parameters")
  }
}
