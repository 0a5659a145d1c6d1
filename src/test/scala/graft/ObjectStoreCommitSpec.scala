package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{FileIO, ParquetLog}
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
