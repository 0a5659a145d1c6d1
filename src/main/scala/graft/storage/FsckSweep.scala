package graft.storage

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Shared crash-litter sweep machinery for the two manifest stores'
  * fsck implementations ([[ParquetLog.checkConsistency]],
  * [[TableStore.checkConsistency]]). One copy, because the two sweeps
  * MUST stay behavior-identical: both age-gate deletions behind
  * `minAgeMs` (young litter may belong to a live writer in another
  * process), both judge against the on-disk manifest, and a fix to
  * either discipline that missed the other would silently diverge the
  * stores' crash-recovery behavior. */
private[storage] object FsckSweep {

  /** Litter younger than `minAgeMs` is never deleted: it may be an
    * in-flight writer's (files landed, manifest not yet committed) —
    * sweeping it would corrupt that commit. A crashed writer's litter
    * only AGES; post-crash callers pass 0 (writer known dead). */
  def oldEnough(p: Path, minAgeMs: Long): Boolean =
    try {
      System.currentTimeMillis() -
        Files.getLastModifiedTime(p).toMillis >= minAgeMs
    } catch { case _: Exception => false }

  /** Directory listing with the stream closed (Files.list leaks an fd
    * per call otherwise). */
  def ls(p: Path): List[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList
    finally s.close()
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally w.close()
    }

  /** Sweep ROOT-level crash litter common to both stores: `tmp-*`
    * spill dirs (append died before cleanup) and `manifest.json.tmp`
    * (commit died between tmp write and atomic rename — the committed
    * manifest.json is untouched either way). Problems are reported via
    * `report`; deletion happens only under `doRepair` AND the age
    * gate. */
  def sweepRootLitter(
      dir: String,
      doRepair: Boolean,
      minAgeMs: Long,
      report: String => Unit
  ): Unit =
    ls(Paths.get(dir)).foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("tmp-")) {
        report(s"orphan tmp dir: $n")
        if (doRepair && oldEnough(p, minAgeMs)) deleteRecursively(p)
      } else if (n == "manifest.json.tmp") {
        report("torn manifest tmp (crash between write and rename)")
        if (doRepair && oldEnough(p, minAgeMs)) Files.deleteIfExists(p)
      }
    }
}
