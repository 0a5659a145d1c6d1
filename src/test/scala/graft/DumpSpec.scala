package graft

import org.apache.spark.sql.types.IntegerType

import graft.indexes.KVIndex
import graft.multilog.MultiLog
import graft.storage.ParquetLog

/** The mbdump debug-tool analogue (reference:
  * multilog/roaring/badger/cmd/mbdump/main.go:21-69): every store kind
  * renders its header + entries from just the directory.
  */
class DumpSpec extends SparkSpec {
  import spark.implicits._

  test("log dump: seq header, fsck verdict, entries") {
    val dir = tmpDir("dumplog")
    val log = ParquetLog.open(spark, dir, IntegerType)
    log.appendValues(Seq(10, 20, 30))
    log.nullAt(1)
    val out = Dump.dump(spark, "log", dir)
    assert(out.startsWith("seq=2 problems=List()"))
    assert(out.contains("10") && out.contains("nulled=true"))
  }

  test("mlog dump: addr count and (addr, seq) rows") {
    val dir = tmpDir("dumpmlog")
    val mlog = MultiLog.open(spark, dir)
    mlog.appendBatch(Seq(("a", 0L), ("b", 1L), ("a", 2L)).toDF("addr", "seq"))
    val out = Dump.dump(spark, "mlog", dir)
    assert(out.startsWith("addrs=2"))
    assert(out.contains("a\t0") && out.contains("b\t1"))
  }

  test("kv dump: cursor header and current state") {
    val dir = tmpDir("dumpkv")
    val kv = KVIndex.open(spark, dir)
    kv.set("k", "v1")
    kv.set("k", "v2")
    kv.setSeq(41)
    val out = Dump.dump(spark, "kv", dir)
    assert(out.startsWith("cursor=41"))
    assert(out.contains("k\tv2") && !out.contains("v1"))
  }

  test("unknown kind reports usage") {
    assert(Dump.dump(spark, "nope", "/tmp").contains("unknown kind"))
  }
}
