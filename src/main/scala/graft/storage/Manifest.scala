package graft.storage

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** One committed data segment: a single parquet file holding a dense,
  * contiguous seq range [minSeq, maxSeq].
  */
final case class Segment(path: String, minSeq: Long, maxSeq: Long, rows: Long)

/** The log's transaction manifest — the Spark-world analogue of the
  * reference's `jrnl` file (offset2/journal.go:20-66): a single small
  * record that makes a set of immutable data files atomically visible
  * and carries the committed max sequence number.
  *
  * Commit protocol: write `manifest.json.tmp` then atomically rename to
  * `manifest.json`. Readers only trust files listed here; a crash
  * mid-append leaves orphan parquet files that are invisible (and are
  * swept by checkConsistency), giving the same recovery semantics as
  * the reference's journal cross-check (offset2/log.go:217-302).
  *
  * At cluster scale this is one tiny JSON object on shared storage
  * maintained by the single committer — the one honest serialization
  * point a dense-seq append-only log requires (same discipline as the
  * reference's per-log mutex, offset2/log.go:46).
  */
final case class Manifest(
    version: Long,
    maxSeq: Long, // == Seqs.SeqEmpty (-1) when empty
    valueSchemaJson: String, // Spark DataType JSON of the value column
    segments: List[Segment],
    // high-water mark of the last committed STREAMING sink micro-batch
    // (graft-log writeStream leg): replayed batches after a restart
    // are recognized and skipped — exactly-once without a side
    // channel, because the mark commits atomically WITH the batch's
    // segments. Absent (None) on logs never written by a stream;
    // old manifests parse compatibly.
    streamBatch: Option[Long] = None,
    // the streaming QUERY the batch mark belongs to: batch ids are
    // only comparable within one query/checkpoint lineage (a NEW
    // query restarts ids at 0, and silently skipping its early
    // batches as "replays" would be data loss). A mismatched query is
    // refused loudly; ParquetLog.releaseStreamBinding rebinds.
    streamQuery: Option[String] = None,
    // TableStore only: the version a `rewrite` (delete/compact) folded
    // all prior history into. Snapshot reads (`versionAsOf`) below
    // this are unreconstructable and refused loudly; absent = never
    // folded (old manifests parse compatibly).
    foldedBelow: Option[Long] = None
)

object Manifest {
  private implicit val fmts: Formats = DefaultFormats

  def manifestPath(dir: String): Path = Paths.get(dir, "manifest.json")

  /** The committed manifest; None when no manifest file exists.
    * A PRESENT-but-unreadable manifest THROWS: callers like open()
    * must not mistake a torn/corrupt commit point for a fresh
    * directory and silently re-initialize over real data. Recovery
    * tooling that wants graceful degradation uses [[tryLoad]]. */
  def load(dir: String): Option[Manifest] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else Some(JsonMethods.parse(Files.readString(p)).extract[Manifest])
  }

  /** [[load]] that degrades a present-but-unreadable manifest to None
    * instead of throwing — ONLY for fsck's "repair refused,
    * report-only sweep" fallback, where crashing the recovery tool on
    * the very state it exists to diagnose would be self-defeating. */
  def tryLoad(dir: String): Option[Manifest] =
    try load(dir) catch { case _: Exception => None }

  /** Thrown when a stale handle tries to commit over a newer manifest
    * — the single-writer discipline made loud (the reference gets the
    * same guarantee from its in-process log mutex; across processes a
    * lost update would silently drop segments, so we refuse). */
  final case class ConcurrentWriteException(dir: String, expected: Long, found: Long)
      extends RuntimeException(
        s"manifest conflict in $dir: committing v$expected but disk has v$found — another writer is active; reopen the log")

  // per-directory JVM monitor: serializes same-process committers on
  // one dir (and prevents OverlappingFileLockException on the OS lock
  // below — FileLock is held per JVM, not per thread)
  private val dirMonitors =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Commit `m` as the new manifest — a real compare-and-swap, not an
    * optimistic check: the version test, tmp write and atomic rename
    * all run under an OS file lock (`manifest.lock`) plus a
    * per-directory JVM monitor, so two racing committers (same process
    * or not) serialize and the loser gets [[ConcurrentWriteException]]
    * instead of publishing over the winner (the lost-update + shared
    * tmp-file race a lock-free fixed-name protocol has).
    *
    * Durability: the tmp file is fsync'd before the rename and the
    * directory is fsync'd after it (best-effort where the FS supports
    * it), so an OS crash after commit() returns cannot surface an
    * empty/garbage manifest.json — rename atomicity alone only covers
    * process crashes. */
  def commit(dir: String, m: Manifest): Unit = {
    val p = manifestPath(dir)
    Files.createDirectories(p.getParent)
    val monitor = dirMonitors.getOrElseUpdate(
      p.getParent.toAbsolutePath.normalize.toString, new Object)
    monitor.synchronized {
      val lockCh = java.nio.channels.FileChannel.open(
        Paths.get(dir, "manifest.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = lockCh.lock()
        try {
          // CAS: our version must be exactly disk+1 (or the initial
          // commit) — checked INSIDE the lock, atomic with the rename
          val diskVersion = load(dir).map(_.version).getOrElse(-1L)
          if (m.version != diskVersion + 1 &&
            !(m.version == 0 && diskVersion == -1L))
            throw ConcurrentWriteException(dir, m.version, diskVersion)
          val tmp = Paths.get(dir, "manifest.json.tmp")
          val ch = java.nio.channels.FileChannel.open(
            tmp,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
          try {
            val bytes = Serialization.writePretty(m)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val buf = java.nio.ByteBuffer.wrap(bytes)
            while (buf.hasRemaining) ch.write(buf)
            ch.force(true)
          } finally ch.close()
          FaultPoints.reach("manifest.tmpWritten")
          Files.move(
            tmp,
            p,
            StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING
          )
          fsyncDir(p.getParent)
        } finally lock.release()
      } finally lockCh.close()
    }
  }

  /** Best-effort directory fsync (makes the rename itself durable on
    * Linux filesystems; unsupported platforms are a no-op). */
  private def fsyncDir(dir: Path): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(
        dir, java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () }
}
