package graft.storage

/** Shared crash-litter sweep machinery for the two manifest stores'
  * fsck implementations ([[ParquetLog.checkConsistency]],
  * [[TableStore.checkConsistency]]). One copy, because the two sweeps
  * MUST stay behavior-identical: both age-gate deletions behind
  * `minAgeMs` (young litter may belong to a live writer in another
  * process), both judge against the on-disk manifest, and a fix to
  * either discipline that missed the other would silently diverge the
  * stores' crash-recovery behavior.
  *
  * All paths are FileIO-routed strings, so the sweep works identically
  * on local POSIX dirs and URI-schemed stores (HDFS/S3/`file:`).
  * Hidden-by-convention names (`.crc` sidecars, `_SUCCESS` markers —
  * see [[FileIO.isHidden]]) are never litter: Hadoop filesystems own
  * them and delete them with their primary file. */
private[graft] object FsckSweep {

  /** Litter younger than `minAgeMs` is never deleted: it may be an
    * in-flight writer's (files landed, manifest not yet committed) —
    * sweeping it would corrupt that commit. A crashed writer's litter
    * only AGES; post-crash callers pass 0 (writer known dead). */
  def oldEnough(mtimeMs: Long, minAgeMs: Long): Boolean =
    System.currentTimeMillis() - mtimeMs >= minAgeMs

  /** Shallow listing of VISIBLE entries (hidden sidecars skipped). */
  def ls(dir: String): List[FileIO.Entry] =
    FileIO.forPath(dir).list(dir).filterNot(e => FileIO.isHidden(e.name))

  def deleteRecursively(path: String): Unit =
    FileIO.forPath(path).deleteRecursively(path)

  /** Sweep ROOT-level crash litter common to both stores: `tmp-*`
    * spill dirs (append died before cleanup), `manifest.json.tmp`
    * (commit died between staging and atomic publish — the committed
    * manifest.json is untouched either way), and — on object-store
    * backends — orphan `commit-v*.json` markers a crashed committer's
    * skipped GC left behind (only markers at least two versions below
    * the COMMITTED version are litter: the current and previous
    * markers are live protocol state, and anything newer than the
    * committed version would be another process's in-flight commit).
    * Problems are reported via `report`; deletion happens only under
    * `doRepair` AND the age gate. */
  def sweepRootLitter(
      dir: String,
      doRepair: Boolean,
      minAgeMs: Long,
      report: String => Unit,
      committedVersion: Long = Long.MinValue
  ): Unit = {
    val io = FileIO.forPath(dir)
    val Marker = raw"commit-v(\d{20})\.json".r
    ls(dir).foreach { e =>
      if (e.name.startsWith("tmp-")) {
        report(s"orphan tmp dir: ${e.name}")
        if (doRepair && oldEnough(e.mtimeMs, minAgeMs))
          io.deleteRecursively(e.path)
      } else if (e.name == "manifest.json.tmp") {
        report("torn manifest tmp (crash between write and rename)")
        if (doRepair && oldEnough(e.mtimeMs, minAgeMs)) io.delete(e.path)
      } else if (committedVersion != Long.MinValue) e.name match {
        case Marker(v) if v.toLong <= committedVersion - 2 =>
          report(s"orphan commit marker: ${e.name}")
          if (doRepair && oldEnough(e.mtimeMs, minAgeMs)) io.delete(e.path)
        case _ => ()
      }
    }
  }
}
