package graft

import org.apache.spark.sql.types.IntegerType

import graft.storage.{FileIO, ParquetLog}

/** Crash-consistency contract (reference: offset2/log.go:217-344
  * checkJournal/CheckConsistency + rw_test.go:148-191 TestRecover):
  * orphan segments from a crashed append are invisible and sweepable;
  * missing files and gaps are reported.
  *
  * Runs as a STORAGE-BACKEND MATRIX over both [[FileIO]]
  * implementations (bare-path java.nio and `file:`-schemed Hadoop
  * FileSystem — the HDFS/object-store code path on local disk); all
  * crash-state construction goes through FileIO so the constructed
  * states are exactly what each backend's crashes produce.
  */
abstract class ConsistencyContract extends SparkSpec {
  import spark.implicits._

  /** "" = LocalFileIO; "file:" = HadoopFileIO over local disk. */
  def fsPrefix: String
  def tag: String
  private def storeDir(prefix: String): String = fsPrefix + tmpDir(prefix)

  private def io(dir: String) = FileIO.forPath(dir)
  private def writeFile(dir: String, rel: String, bytes: Array[Byte]): Unit =
    io(dir).writeAtomic(FileIO.join(dir, rel), bytes)
  private def exists(dir: String, rel: String): Boolean =
    io(dir).exists(FileIO.join(dir, rel))
  /** Visible (non-hidden) data/ segment entries. */
  private def dataEntries(dir: String): List[FileIO.Entry] =
    io(dir).list(FileIO.join(dir, "data"))
      .filterNot(e => FileIO.isHidden(e.name))

  test(s"[$tag] orphan data file (crashed append) detected and swept") {
    val dir = storeDir("fsck")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    // simulate a crash between segment write and manifest commit
    writeFile(dir, "data/seg-999999999999-orphan.parquet", Array[Byte](1, 2, 3))
    val problems = log.checkConsistency()
    assert(problems.exists(_.contains("orphan")))
    // orphan is invisible to reads
    assert(log.query().count() == 3)
    // repair sweeps it
    log.checkConsistency(repair = true, minAgeMs = 0L)
    assert(log.checkConsistency() == Nil)
  }

  test(s"[$tag] missing segment file reported") {
    val dir = storeDir("fsck2")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    val seg = dataEntries(dir).head
    io(dir).delete(seg.path)
    val problems = log.checkConsistency()
    assert(problems.exists(_.contains("missing segment")))
  }

  test(s"[$tag] repair truncates to the dense surviving prefix and log reopens") {
    val dir = storeDir("fsck-repair")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3)) // seqs 0..2
    log.appendValues(Seq(4, 5))    // seqs 3..4
    log.appendValues(Seq(6))       // seq  5
    // lose the tail segment (disk corruption / partial restore)
    val tail = dataEntries(dir).maxBy(_.name)
    io(dir).delete(tail.path)
    assert(log.checkConsistency().exists(_.contains("missing segment")))
    val repaired = log.checkConsistency(repair = true, minAgeMs = 0L)
    assert(repaired.exists(_.contains("repaired")))
    // truncated to the dense prefix: seqs 0..4 survive
    assert(log.seq == 4)
    assert(log.checkConsistency() == Nil)
    // a fresh handle (≙ restart) sees the repaired manifest and appends
    val log2 = ParquetLog.open(spark, dir, IntegerType)
    assert(log2.seq == 4)
    log2.appendValues(Seq(7))
    assert(log2.seq == 5)
    assert(log2.query().count() == 6)
    assert(log2.checkConsistency() == Nil)
  }

  test(s"[$tag] repair drops segments stranded past the hole") {
    val dir = storeDir("fsck-hole")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2)) // seqs 0..1
    log.appendValues(Seq(3, 4)) // seqs 2..3
    log.appendValues(Seq(5, 6)) // seqs 4..5
    // lose the MIDDLE segment (the one starting at seq 2 — each append
    // opens a new segment at its base): later segments are stranded
    // past the gap
    val mid = dataEntries(dir)
      .find(_.name.startsWith("seg-000000000002")).get
    io(dir).delete(mid.path)
    log.checkConsistency(repair = true, minAgeMs = 0L)
    assert(log.seq == 1)
    assert(log.query().count() == 2)
    assert(log.checkConsistency() == Nil)
  }

  test(s"[$tag] stale second writer handle is refused, not lost-updated") {
    val dir = storeDir("cas")
    val a = ParquetLog.open(spark, dir, IntegerType)
    val b = ParquetLog.open(spark, dir, IntegerType)
    a.appendValues(Seq(1, 2))
    intercept[graft.storage.Manifest.ConcurrentWriteException] {
      b.appendValues(Seq(3))
    }
    // A's commit is intact; a fresh handle sees it and can continue
    val c = ParquetLog.open(spark, dir, IntegerType)
    assert(c.seq == 1)
    c.appendValues(Seq(3))
    assert(c.seq == 2)
  }

  test(s"[$tag] concurrent appenders through one handle: dense seqs, nothing lost") {
    // twin of the reference's test/concurrent.go: many writers, one
    // log, every entry present exactly once with dense seqs (the
    // handle's synchronized append is the reference's log mutex)
    val dir = storeDir("conc")
    val log = ParquetLog.open(spark, dir, IntegerType)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { t =>
        pool.submit(new Runnable {
          def run(): Unit =
            (0 until 5).foreach(i => log.appendValues(Seq(t * 100 + i)))
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(log.seq == 19L)
    val rows = log.query(graft.core.QuerySpec.SeqWrap(true)).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 20L))
    val values = rows.map(_.getInt(1)).toSet
    assert(values == (0 until 4).flatMap(t => (0 until 5).map(t * 100 + _)).toSet)
    assert(log.checkConsistency() == Nil)
  }

  test(s"[$tag] young litter is reported but never swept (concurrent-writer guard)") {
    // the default minAgeMs protects an in-flight writer in ANOTHER
    // process: its segment files land in data/ before its manifest
    // commit, so a repair running in that window must not delete them
    val dir = storeDir("fsck-age")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    writeFile(dir, "data/seg-999999999999-inflight.parquet", Array[Byte](1, 2, 3))
    io(dir).mkdirs(FileIO.join(dir, "tmp-inflight"))
    writeFile(dir, "manifest.json.tmp", Array[Byte](123))
    // repair with the default 10-minute gate: everything reported,
    // nothing deleted (the litter is seconds old)
    val report = log.checkConsistency(repair = true)
    assert(report.exists(_.contains("orphan data file")))
    assert(report.exists(_.contains("orphan tmp dir")))
    assert(report.exists(_.contains("torn manifest tmp")))
    assert(exists(dir, "data/seg-999999999999-inflight.parquet"),
      "young orphan must survive gated repair")
    assert(exists(dir, "tmp-inflight"), "young tmp dir must survive gated repair")
    assert(exists(dir, "manifest.json.tmp"),
      "young manifest tmp must survive gated repair")
    // post-crash repair (writer known dead): minAgeMs = 0 sweeps it all
    log.checkConsistency(repair = true, minAgeMs = 0L)
    assert(log.checkConsistency() == Nil)
    assert(!exists(dir, "data/seg-999999999999-inflight.parquet") &&
      !exists(dir, "tmp-inflight") && !exists(dir, "manifest.json.tmp"))
  }

  test(s"[$tag] stale handle's repair never sweeps another writer's committed segments") {
    // A opens and idles; B appends and commits. A's in-memory manifest
    // is now stale — its fsck must judge orphan-ness against the
    // ON-DISK manifest, or repair would delete B's committed segment
    // once it ages past the litter gate (real data loss: the committed
    // manifest would reference a missing file)
    val dir = storeDir("fsck-stale")
    val a = ParquetLog.open(spark, dir, IntegerType)
    a.appendValues(Seq(1, 2))
    val b = ParquetLog.open(spark, dir, IntegerType)
    b.appendValues(Seq(3, 4)) // B commits; A's view is stale
    // even with the age gate fully open (crash model), B's segment is
    // NOT an orphan — the on-disk manifest owns it
    val report = a.checkConsistency(repair = true, minAgeMs = 0L)
    assert(!report.exists(_.contains("orphan data file")),
      s"stale handle misclassified a committed segment: $report")
    assert(a.checkConsistency() == Nil)
    // a fresh handle sees ALL the data intact
    val c = ParquetLog.open(spark, dir, IntegerType)
    assert(c.seq == 3)
    assert(c.query().count() == 4)
    // and A adopted the committed view during the sweep
    assert(a.seq == 3)
  }

  test(s"[$tag] corrupt manifest: open throws loudly, fsck degrades to report-only") {
    val dir = storeDir("fsck-corrupt")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    writeFile(dir, "manifest.json", "{torn garbage".getBytes("UTF-8"))
    // a fresh open must NOT mistake the corrupt commit point for a
    // fresh directory and silently re-initialize over the data
    intercept[Exception] { ParquetLog.open(spark, dir, IntegerType) }
    // the existing handle's fsck — the recovery tool for exactly this
    // state — degrades to a report-only sweep instead of crashing
    val report = log.checkConsistency(repair = true, minAgeMs = 0L)
    assert(report.exists(_.contains("repair refused")), report.toString)
    // nothing was deleted under the unreadable manifest
    assert(dataEntries(dir).nonEmpty)
  }

  test(s"[$tag] handle opened on an empty log sees another writer's commits") {
    val dir = storeDir("fsck-empty-vis")
    val a = ParquetLog.open(spark, dir, IntegerType)
    assert(a.toDF.count() == 0)
    // writer B commits; A's toDF must see it (the branch decision is
    // made from the on-disk manifest, not A's open-time snapshot)
    val b = ParquetLog.open(spark, dir, IntegerType)
    b.appendValues(Seq(1, 2, 3))
    assert(a.toDF.count() == 3)
  }

  test(s"[$tag] reopen after kill sees only committed state") {
    val dir = storeDir("fsck3")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(1, 2, 3))
    // a fresh handle (≙ process restart) reads the manifest
    val log2 = ParquetLog.open(spark, dir, IntegerType)
    assert(log2.seq == 2)
    assert(log2.checkConsistency() == Nil)
  }
}

class ConsistencySpec extends ConsistencyContract {
  def fsPrefix = ""
  def tag = "local"
}

/** The Hadoop FileSystem leg — every manifest read/commit, litter
  * sweep, and existence check through [[graft.storage.HadoopFileIO]]
  * (the HDFS/object-store deployment path), on local disk via the
  * `file:` scheme. */
class ConsistencyHadoopSpec extends ConsistencyContract {
  def fsPrefix = "file:"
  def tag = "hadoopfs"
}
