package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{FaultPoints, FileIO, Manifest, ParquetLog, TableStore}
import graft.testfs.SinglePutFileSystem

/** The marker-protocol pins the object-store contract matrix adds on
  * top of the kill matrices: over a no-atomic-rename scheme the
  * metadata plane must commit by single PUT — never by the
  * stage-then-rename pattern that is only correct where rename is
  * atomic — and an interrupted PUT must leave NOTHING visible. */
class ObjectStoreCommitSpec extends SparkSpec {

  SinglePutFileSystem.install(spark)

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  test("metadata commits over a direct-PUT scheme never stage-and-rename") {
    SinglePutFileSystem.renames.clear()
    val dir = "graftput:" + tmpDir("oscommit-") + "/log"
    // a full log lifecycle: open → two appends → null → compact → read
    val log = ParquetLog.open(spark, dir, schema.head.dataType)
    import spark.implicits._
    log.append(Seq("a", "b", "c").toDF("value"))
    log.append(Seq("d", "e").toDF("value"))
    log.nullAt(1L)
    log.compact(1)
    assert(log.toDF.count() == 5) // 5 entries; the nulled one stays a sentinel row
    val renames = SinglePutFileSystem.renames.asScala.toList
    // data-segment moves into data/ are expected (manifest-gated
    // visibility makes a non-atomic copy+delete rename safe there);
    // the `path + ".tmp" -> path` staging rename is the one pattern
    // that must NEVER appear — it is the rename-capable commit
    val staged = renames.filter { case (src, dst) => src == dst + ".tmp" }
    assert(staged.isEmpty,
      s"metadata plane stage-then-renamed on an object store: $staged")
    // and the lifecycle actually exercised metadata commits
    assert(FileIO.forPath(dir).exists(dir), "log dir missing")
  }

  test("an interrupted metadata PUT leaves nothing visible") {
    val dir = "graftput:" + tmpDir("osput-")
    val io = FileIO.forPath(dir)
    io.mkdirs(dir)
    val path = FileIO.join(dir, "manifest-test.json")
    val boom = new RuntimeException("crash between staging and publish")
    intercept[RuntimeException] {
      io.writeAtomic(path, "half-written".getBytes, () => throw boom)
    }
    assert(!io.exists(path),
      "a crashed single-PUT commit left a visible object — the " +
        "all-or-nothing close contract is broken")
    // and no staging litter either (a real store's aborted upload is
    // invisible; the emulation must not leak its internals)
    assert(io.list(dir).filterNot(e => FileIO.isHidden(e.name)).isEmpty,
      s"crash litter visible: ${io.list(dir).map(_.name)}")
    // the same path commits cleanly afterwards
    io.writeAtomic(path, "published".getBytes, () => ())
    assert(io.readString(path) == "published")
  }

  test("racing committers: the conditional marker PUT decides — the " +
      "loser refuses loudly, never clobbers") {
    import spark.implicits._
    val dir = "graftput:" + tmpDir("oscas-") + "/store"
    val store = TableStore.open(spark, dir, schema) // v0
    store.append(Seq(("a", 1L)).toDF("k", "v")) // v1
    // a FOREIGN process commits v2 between our CAS load and our
    // marker PUT (injected at the staged-but-unpublished hook — the
    // exact window the in-JVM lock cannot cover across processes)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val foreign = Manifest(2L, graft.core.Seqs.SeqEmpty, schema.json, Nil)
    val fbytes = org.json4s.jackson.Serialization.writePretty(foreign)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    @volatile var planted = false
    FaultPoints.install { p =>
      if (p == "manifest.tmpWritten" && !planted) {
        planted = true
        assert(FileIO.forPath(dir)
          .createIfAbsent(Manifest.markerPath(dir, 2L), fbytes),
          "foreign marker plant failed")
      }
    }
    val e =
      try intercept[Manifest.ConcurrentWriteException] {
        store.append(Seq(("b", 2L)).toDF("k", "v"))
      } finally FaultPoints.clear()
    assert(planted, "race window never reached")
    assert(e.getMessage.contains("another writer"))
    // the foreign commit WON: reads heal to it, the loser's segments
    // were rolled back, and a reopened handle continues from v2
    assert(Manifest.load(dir).get.version == 2L)
    val re = TableStore.open(spark, dir, schema)
    assert(re.version == 2L)
    re.append(Seq(("c", 3L)).toDF("k", "v"))
    assert(re.version == 3L)
  }

  test("a crash between marker PUT and pointer PUT is COMMITTED: reads " +
      "roll forward, the next commit repairs the pointer and GCs") {
    import spark.implicits._
    val dir = "graftput:" + tmpDir("osheal-") + "/store"
    val io = FileIO.forPath(dir)
    val store = TableStore.open(spark, dir, schema) // v0
    FaultPoints.install { p =>
      if (p == "manifest.markerPut")
        throw new RuntimeException("crash: marker durable, pointer stale")
    }
    // the commit SUCCEEDS — the marker is the commit point; pointer
    // republish is cache maintenance and must not fail the commit
    try store.append(Seq(("a", 1L)).toDF("k", "v"))
    finally FaultPoints.clear()
    assert(store.version == 1L)
    assert(io.exists(Manifest.markerPath(dir, 1L)), "marker missing")
    // the pointer is stale (v0) but every reader heals forward
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val pointer = org.json4s.jackson.JsonMethods
      .parse(io.readString(Manifest.manifestPath(dir)))
      .extract[Manifest]
    assert(pointer.version == 0L, "pointer unexpectedly fresh")
    assert(Manifest.load(dir).get.version == 1L, "load did not heal")
    val re = TableStore.open(spark, dir, schema)
    assert(re.version == 1L && re.read.count() == 1L)
    // the next commit repairs the pointer and GCs the stale marker
    re.append(Seq(("b", 2L)).toDF("k", "v"))
    val repaired = org.json4s.jackson.JsonMethods
      .parse(io.readString(Manifest.manifestPath(dir)))
      .extract[Manifest]
    assert(repaired.version == 2L, "pointer not repaired")
    assert(!io.exists(Manifest.markerPath(dir, 0L)), "marker v0 not GC'd")
    // fsck knows orphan markers (a crashed committer's skipped GC)
    val orphan = Manifest.markerPath(dir, 0L)
    io.writeAtomic(orphan, "{}".getBytes, () => ())
    val issues = re.checkConsistency(repair = true, minAgeMs = 0)
    assert(issues.exists(_.contains("commit marker")), issues.toString)
    assert(!io.exists(orphan), "orphan marker survived repair")
    // live protocol markers are never swept
    assert(io.exists(Manifest.markerPath(dir, 2L)))
  }

  test("append is refused on the object-store scheme") {
    val dir = "graftput:" + tmpDir("osappend-")
    val io = FileIO.forPath(dir)
    io.mkdirs(dir)
    val p = FileIO.join(dir, "obj")
    io.writeAtomic(p, "v1".getBytes, () => ())
    // overwrite-by-PUT is the object-store update model and must work
    io.writeAtomic(p, "v2".getBytes, () => ())
    assert(io.readString(p) == "v2")
  }
}
