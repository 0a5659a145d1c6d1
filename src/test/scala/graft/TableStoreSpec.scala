package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.TableStore

/** TableStore plan-shape and versioning contract: `_ver` is a physical
  * column, so a read stays ONE parquet scan no matter how many commits
  * built the table (the reference's batched-flush guarantee,
  * indexes/badger/index.go:138-163, without its in-memory queue).
  */
abstract class TableStoreContract extends SparkSpec {
  import spark.implicits._

  import graft.storage.FileIO

  /** "" = LocalFileIO; "file:" = HadoopFileIO over local disk — the
    * whole TableStore contract runs over both storage backends. */
  def fsPrefix: String
  def storeDir(prefix: String): String = fsPrefix + tmpDir(prefix)

  private val schema = StructType(
    Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", LongType, nullable = false)
    )
  )

  test("many small commits still plan as a single parquet scan") {
    val store = TableStore.open(spark, storeDir("ts-flat"), schema)
    (1 to 40).foreach { i =>
      store.append(Seq((s"k${i % 5}", i.toLong)).toDF("k", "v"))
    }
    val plan = store.readVersioned.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one parquet scan, got $scans:\n$plan")
    assert(!plan.contains("Union"), s"plan still unions per-commit scans:\n$plan")
  }

  test("a small multi-partition append publishes few files (byte-aware merge)") {
    val mergeDir = storeDir("ts-merge")
    val store = TableStore.open(spark, mergeDir, schema)
    val df = spark.range(2000).repartition(32)
      .select(concat(lit("k"), (col("id") % 7).cast("string")).as("k"),
        col("id").as("v"))
    store.append(df)
    // a ~40 KB staged write must not publish 32 files: the store pays
    // O(files) listing/footer cost at every plan, and a streaming
    // daemon advances it thousands of times
    assert(store.segmentCount <= 2,
      s"tiny 32-partition append published ${store.segmentCount} files")
    assert(store.read.count() == 2000)
    assert(store.read.agg(sum("v")).collect().head.getLong(0) ==
      (0L until 2000L).sum)
    // the driver-side row-group concat must carry the writer's
    // key-value footer metadata onto the merged file — INT96 rebase
    // provenance keys on org.apache.spark.version, and a merged file
    // without it would refuse ancient timestamps as "foreign"
    val io = FileIO.forPath(mergeDir)
    val dataDir = FileIO.join(mergeDir, "data")
    io.list(dataDir).filter(_.name.endsWith(".parquet")).foreach { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        io.inputFile(f.path))
      try assert(
        r.getFooter.getFileMetaData.getKeyValueMetaData
          .containsKey("org.apache.spark.version"),
        s"merged segment ${f.name} lost its Spark writer provenance")
      finally r.close()
    }
    // staged bytes that already justify their file count are left
    // alone: a tiny per-file target disables the merge entirely
    spark.conf.set("spark.graft.segmentTargetFileBytes", "1")
    try {
      val noMerge = TableStore.open(spark, storeDir("ts-nomerge"), schema)
      noMerge.append(df)
      assert(noMerge.segmentCount > 2)
      assert(noMerge.read.count() == 2000)
    } finally spark.conf.unset("spark.graft.segmentTargetFileBytes")
  }

  test("minor compaction: small-tail fold preserves rows, _ver, snapshots and pushdown exactness") {
    val dir = storeDir("ts-minor")
    val store = TableStore.open(spark, dir, schema)
    (1 to 5).foreach(i => store.append(Seq((s"k$i", i.toLong)).toDF("k", "v")))
    val preAll = store.readVersioned.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val preSnap = store.readAsOf(3L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(store.segmentCount == 5)
    assert(store.compactSmall(Seq("k"), targetPartitions = 2))
    assert(store.segmentCount <= 2)
    assert(store.version == 6L)
    // rows AND each row's physical commit version survive the fold
    assert(store.readVersioned.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == preAll)
    // a snapshot INSIDE the merged segment's version range stays
    // EXACT: the connector row-cuts `_ver <= v` inside merged files
    assert(store.readAsOf(3L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == preSnap)
    // aggregate pushdown refuses the inside-the-merge snapshot (entry
    // arithmetic would overcount) but the real scan stays correct...
    val snap = spark.read.format("graft-table")
      .option("versionAsOf", 3L).load(dir)
    assert(snap.count() == 3L)
    assert(snap.agg(max("_ver")).collect().head.getLong(0) == 3L)
    // ...and CURRENT-table pushdown stays exact over merged entries
    val cur = spark.read.format("graft-table").load(dir)
    assert(cur.count() == 5L)
    val mm = cur.agg(min("_ver"), max("_ver")).collect().head
    assert((mm.getLong(0), mm.getLong(1)) == ((1L, 5L)))
    // nothing small enough to fold -> no-op, no commit
    assert(!store.compactSmall(Seq("k"), 2, maxSegmentBytes = 1L))
    assert(store.version == 6L)
    // history is never destroyed by a minor fold
    store.append(Seq(("k6", 6L)).toDF("k", "v"))
    assert(store.read.count() == 6L)
    assert(store.readAsOf(2L).count() == 2L)
  }

  test("a scan losing a planned file to a minor fold fails loudly, never duplicates") {
    val dir = storeDir("ts-minorrace")
    val store = TableStore.open(spark, dir, schema)
    (1 to 4).foreach(i =>
      store.append(Seq((s"k$i", i.toLong)).toDF("k", "v")))
    // commit the plan to the pre-fold file set...
    val rdd = spark.read.format("graft-table").load(dir).rdd
    assert(rdd.getNumPartitions >= 1)
    // ...then a minor fold merges (and DELETES) the planned files.
    // compactSmall preserves every row's _ver but merges files whose
    // version ranges span several planned partitions: sibling-by-
    // sibling re-resolution against the folded manifest would emit
    // overlapping row sets (silent duplication) — the reader must
    // refuse loudly instead, like the full-fold refusal.
    assert(store.compactSmall(Seq("k"), targetPartitions = 1))
    val e = intercept[Exception] { rdd.collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("; ")
    assert(msgs.contains("re-run against the current table"), msgs)
    // a fresh plan against the folded table serves the exact rows
    assert(spark.read.format("graft-table").load(dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      (1 to 4).map(i => (s"k$i", i.toLong, i.toLong)).toSet)
  }

  test("stream keeps delivering exactly-once across a minor fold — even from an offset inside the merged range") {
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val store = TableStore.open(spark, storeDir("ts-minstr"), schema)
    store.append(Seq(("a", 1L)).toDF("k", "v")) // v1
    store.append(Seq(("b", 2L)).toDF("k", "v")) // v2
    val ck = tmpDir("ts-minstr-ck")
    val rows =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    def runStream(): Unit = {
      val q = store.stream
        .writeStream
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime(0))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r =>
            rows.add((r.getString(0), r.getLong(1), r.getLong(2))))
          (): Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runStream() // delivers v1, v2; offset now 2
    assert(rows.asScala.toSet == Set(("a", 1L, 1L), ("b", 2L, 2L)))
    // v3 lands UNDELIVERED, then a minor fold merges v1..v3 into one
    // spanning segment (commit v4), then v5 lands
    store.append(Seq(("c", 3L)).toDF("k", "v")) // v3
    assert(store.compactSmall(Seq("k"), targetPartitions = 1))
    store.append(Seq(("d", 4L)).toDF("k", "v")) // v5
    // the resumed stream's offset (2) is strictly INSIDE the merged
    // segment's [1,3] range: the row-level _ver cut must deliver
    // exactly v3's rows from the merged file, then v5's — the full
    // fold refuses this resume; the minor fold serves it exactly-once
    runStream()
    assert(rows.asScala.toSet == Set(
      ("a", 1L, 1L), ("b", 2L, 2L), ("c", 3L, 3L), ("d", 4L, 5L)),
      s"got ${rows.asScala.toSet}")
    assert(rows.size == 4, s"duplicate delivery: ${rows.asScala.toSeq}")
  }

  test("admission budgets charge a minor-folded spanning segment, not free-ride it") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = storeDir("ts-minadm")
    val store = TableStore.open(spark, dir, schema)
    (1 to 3).foreach(i =>
      store.append(Seq((s"k$i", i.toLong)).toDF("k", "v"))) // v1..v3
    assert(store.compactSmall(Seq("k"), targetPartitions = 1)) // v4 = fold, spans [1,3]
    store.append(Seq(("k5", 5L)).toDF("k", "v")) // v5
    store.append(Seq(("k6", 6L)).toDF("k", "v")) // v6
    val stream = new graft.sources.GraftTableMicroBatchStream(dir,
      spark.read.format("graft-table").load(dir).schema, None, None, None)
    // the merged segment spans [1,3] and still owes versions 2..3; a
    // batch over them re-scans its whole file, so a 1-byte budget
    // admits it ALONE (at-least-one liveness) and stops BELOW v5 —
    // selecting pending work by first version would instead free-ride
    // the fold's bytes and jump straight into v5's batch
    val end = stream.latestOffset(
      stream.deserializeOffset("1"), ReadLimit.maxBytes(1))
    assert(end.json() == "4", s"expected offset 4, got ${end.json()}")
    // subsequent batches pace one costed version at a time
    val end2 = stream.latestOffset(
      stream.deserializeOffset("4"), ReadLimit.maxBytes(1))
    assert(end2.json() == "5", end2.json())
    val end3 = stream.latestOffset(
      stream.deserializeOffset("5"), ReadLimit.maxBytes(1))
    assert(end3.json() == "6", end3.json())
  }

  test("table count/min/max(_ver) answered from the manifest — zero file IO") {
    import spark.implicits._
    val dir = storeDir("ts-agg")
    val store = TableStore.open(spark, dir, schema)
    val v1 = store.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    store.append(Seq(("a", 3L)).toDF("k", "v"))
    val df = spark.read.format("graft-table").load(dir)
    val counted = df.agg(count("*"))
    assert(counted.queryExecution.executedPlan.toString.contains("AGGREGATE"),
      counted.queryExecution.executedPlan.toString)
    assert(counted.collect().head.getLong(0) == 3L)
    // max(_ver) IS "current version" — a metadata probe
    assert(df.agg(max("_ver")).collect().head.getLong(0) == 2L)
    // snapshot-scoped: versionAsOf bounds the metadata arithmetic too
    val snap = spark.read.format("graft-table")
      .option("versionAsOf", v1).load(dir)
    assert(snap.count() == 2L)
    assert(snap.agg(max("_ver")).collect().head.getLong(0) == v1)
    // grouping is NOT pushed — still exact
    assert(df.groupBy("k").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap == Map("a" -> 2L, "b" -> 1L))
    // count(distinct _ver) is refused (versions repeat) — still exact
    assert(df.agg(countDistinct("_ver")).collect().head.getLong(0) == 2L)
    // a zero-row commit records a version NO row carries: metadata
    // min/max must skip it (count is unaffected)
    val v3 = store.append(Seq.empty[(String, Long)].toDF("k", "v"))
    val df2 = spark.read.format("graft-table").load(dir)
    assert(df2.count() == 3L)
    val mm = df2.agg(min("_ver"), max("_ver")).collect().head
    assert(mm.getLong(0) == 1L && mm.getLong(1) == 2L,
      s"zero-row version $v3 must not surface in min/max: $mm")
  }

  test("a fold racing a planned stream batch fails loudly, not silently empty") {
    import spark.implicits._
    val dir = storeDir("ts-fold")
    val store = TableStore.open(spark, dir, schema)
    store.append(Seq(("a", 1L)).toDF("k", "v"))
    store.append(Seq(("b", 2L)).toDF("k", "v"))
    val stream = new graft.sources.GraftTableMicroBatchStream(dir,
      spark.read.format("graft-table").load(dir).schema, None, None, None)
    // a stream that already DELIVERED v1 (lo = 1) plans (1, 2]; the
    // fold lands after offset resolution — v2's individual content is
    // gone, so the plan must refuse rather than commit a silently
    // empty batch
    val lo = stream.deserializeOffset("1")
    val hi = stream.deserializeOffset("2")
    store.rewrite(df => df) // foldedBelow = 3
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(lo, hi)
    }
    assert(e.getMessage.contains("folded"), e.getMessage)
    // a RESTORED lo = 0 is a crash-REPLAY of batch 0 (offset written,
    // commit log not), NOT a fresh start: the fold landed between the
    // original delivery and the replay, so serving it would hand the
    // at-least-once consumer a batch 0 with different rows — refused
    val e2 = intercept[IllegalStateException] {
      stream.planInputPartitions(stream.deserializeOffset("0"), hi)
    }
    assert(e2.getMessage.contains("folded"), e2.getMessage)
    // a genuinely FRESH stream (initialOffset, never restored from a
    // checkpoint) is safe: nothing was delivered before, the planned
    // span is served empty and the fold segment arrives as the next
    // batch — no refusal
    val fresh = new graft.sources.GraftTableMicroBatchStream(dir,
      spark.read.format("graft-table").load(dir).schema, None, None, None)
    assert(fresh.planInputPartitions(fresh.initialOffset(), hi).isEmpty)
  }

  test("table reads are columnar: ColumnarToRow for the _ver path, row-path A/B identical") {
    val dir = storeDir("ts-col")
    val store = TableStore.open(spark, dir, schema)
    val v1 = store.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    store.append(Seq(("a", 3L)).toDF("k", "v"))
    // current-table CONNECTOR read (readVersioned uses the parquet
    // file source, which is separately vectorized — the DSv2 path is
    // what the toggle and the RowRepackReader fallback govern):
    // wide-open bounds + atomic schema (incl. LongType _ver) →
    // vectorized path
    val df = spark.read.format("graft-table").load(dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"table connector batch scan should be vectorized:\n$plan")
    val viaColumnar = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    // versionAsOf prunes SEGMENTS at planning, not row bounds — the
    // snapshot stays columnar
    val snap = spark.read.format("graft-table")
      .option("versionAsOf", v1).load(dir)
    assert(snap.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(snap.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      == Seq(("a", 1L), ("b", 2L)))
    // A/B toggle: row path, no ColumnarToRow, identical rows
    spark.conf.set("spark.graft.columnar.enabled", "false")
    try {
      val rowDf = spark.read.format("graft-table").load(dir)
      val rowPlan = rowDf.queryExecution.executedPlan.toString
      assert(!rowPlan.contains("ColumnarToRow"),
        s"toggle off must force the row reader:\n$rowPlan")
      assert(rowDf.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._3).toSeq == viaColumnar)
    } finally spark.conf.unset("spark.graft.columnar.enabled")
  }

  test("an oversized table segment splits into row-group partitions") {
    // a single fat commit = one segment where every row shares one
    // _ver — the shared-range split regime (exact-bounds cuts are
    // impossible, and unnecessary: graft-table's only rewrite folds
    // history and trips the reader's _ver refusal before any row)
    val dir = storeDir("ts-split")
    val hconf = spark.sparkContext.hadoopConfiguration
    val prev = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 16 * 1024)
    try {
      val store = TableStore.open(spark, dir, schema)
      store.append(
        spark.range(20000)
          .select(concat(lit("k"), col("id")).as("k"), col("id").as("v"))
          .coalesce(1))
    } finally {
      if (prev == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", prev)
    }
    val df = spark.read.format("graft-table")
      .option("maxPartitionBytes", "32768").load(dir)
    val nParts = df.rdd.getNumPartitions
    assert(nParts > 1, s"oversized table segment did not split: $nParts")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(df.select("v").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 20000L))
    // row leg over the same split plan
    spark.conf.set("spark.graft.columnar.enabled", "false")
    try {
      val row = spark.read.format("graft-table")
        .option("maxPartitionBytes", "32768").load(dir)
      assert(row.rdd.getNumPartitions == nParts)
      assert(row.select("v").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 20000L))
    } finally spark.conf.unset("spark.graft.columnar.enabled")
  }

  test("_ver carries the commit version per row (last-write-wins order)") {
    val store = TableStore.open(spark, storeDir("ts-ver"), schema)
    val v1 = store.append(Seq(("a", 1L)).toDF("k", "v"))
    val v2 = store.append(Seq(("a", 2L), ("b", 1L)).toDF("k", "v"))
    assert(v2 == v1 + 1)
    val rows = store.readVersioned
      .orderBy("_ver", "k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 1L, v1), ("a", 2L, v2), ("b", 1L, v2)))
    // latest value for "a" resolves by max _ver
    val latest = store.readVersioned
      .groupBy("k")
      .agg(max_by(col("v"), col("_ver")).as("v"))
      .where(col("k") === "a")
      .collect()
      .head
      .getLong(1)
    assert(latest == 2L)
  }

  test("version-offset stream: commits arrive atomically, in order, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val store = TableStore.open(spark, storeDir("tstr"), schema)
    store.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    store.append(Seq(("c", 3L)).toDF("k", "v"))
    // each foreachBatch batch = whole commit versions, never a split
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[(String, Long, Long)]]()
    val q = store.stream
      .writeStream
      .option("checkpointLocation", tmpDir("tstrck"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.orderBy("_ver", "k").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        if (rows.nonEmpty) batches.add(rows)
        (): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      val caught = batches.asScala.toSeq
      // a version never straddles two batches
      val versAcross = caught.map(_.map(_._3).toSet)
      assert(versAcross.flatten.size == versAcross.map(_.size).sum,
        s"a commit version straddled batches: $versAcross")
      assert(caught.flatten == Seq(("a", 1L, 1L), ("b", 2L, 1L), ("c", 3L, 2L)))
      // live commits keep flowing, exactly once
      store.append(Seq(("d", 4L)).toDF("k", "v"))
      q.processAllAvailable()
      assert(batches.asScala.toSeq.flatten ==
        Seq(("a", 1L, 1L), ("b", 2L, 1L), ("c", 3L, 2L), ("d", 4L, 3L)))
    } finally q.stop()
  }

  test("a FRESH stream on a rewritten table starts cleanly; a resumed one past the fold refuses") {
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val store = TableStore.open(spark, storeDir("tsfold"), schema)
    store.append(Seq(("a", 1L)).toDF("k", "v"))
    store.append(Seq(("a", 2L), ("b", 5L)).toDF("k", "v"))
    store.rewrite(df => df.groupBy("k").agg(max("v").as("v"))) // fold
    // nothing was delivered before the fold, and the fold segment
    // carries all surviving history — a NEW stream must start (the
    // old guard refused every fresh stream on any ever-rewritten
    // table, making its own "restart" advice impossible)
    val rows =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = store.stream
      .writeStream
      .option("checkpointLocation", tmpDir("tsfoldck"))
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => rows.add((r.getString(0), r.getLong(1))))
        (): Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(rows.asScala.toSet == Set(("a", 2L), ("b", 5L)))
      // and live commits keep flowing on the fresh stream
      store.append(Seq(("c", 7L)).toDF("k", "v"))
      q.processAllAvailable()
      assert(rows.asScala.toSet == Set(("a", 2L), ("b", 5L), ("c", 7L)))
    } finally q.stop()
    // a stream that DELIVERED versions and then sees a fold past its
    // cursor still refuses (those versions are unreconstructable)
    val store2 = TableStore.open(spark, storeDir("tsfold2"), schema)
    store2.append(Seq(("a", 1L)).toDF("k", "v"))
    val ck2 = tmpDir("tsfold2ck")
    val q2 = store2.stream.writeStream
      .option("checkpointLocation", ck2)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    try { q2.processAllAvailable() } finally q2.stop() // committed v1
    store2.append(Seq(("b", 2L)).toDF("k", "v"))
    store2.append(Seq(("c", 3L)).toDF("k", "v"))
    store2.rewrite(df => df) // folds v2..v3 away, foldedBelow = 4
    val q3 = store2.stream.writeStream
      .option("checkpointLocation", ck2)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      def msg(t: Throwable): String =
        if (t == null) "" else t.getMessage + " " + msg(t.getCause)
      assert(msg(e).contains("folded"), msg(e))
    } finally if (q3.isActive) q3.stop()
  }

  test("versionAsOf snapshots: exact history cut, loud after a fold") {
    val store = TableStore.open(spark, storeDir("ts-asof"), schema)
    val v1 = store.append(Seq(("a", 1L)).toDF("k", "v"))
    val v2 = store.append(Seq(("a", 2L), ("b", 1L)).toDF("k", "v"))
    val v3 = store.append(Seq(("c", 3L)).toDF("k", "v"))
    // snapshot at v2: exactly versions 1..2, with _ver intact
    val snap = store.readAsOf(v2)
      .orderBy("_ver", "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(snap.toSeq == Seq(("a", 1L, v1), ("a", 2L, v2), ("b", 1L, v2)))
    // pruning happens at PLANNING time: the snapshot's statistics
    // see 3 rows, not the 4 of the live table
    val stats = store.readAsOf(v2).queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(3)),
      s"snapshot stats should see 3 rows, got ${stats.rowCount}")
    // at the latest version ≡ the live read; at 0 ≡ empty
    assert(store.readAsOf(v3).count() == 4)
    assert(store.readAsOf(0L).count() == 0)
    // nonexistent future version: loud
    intercept[Exception](store.readAsOf(v3 + 1).count())
    // a stream must not silently accept the snapshot option (the
    // refusal surfaces on the stream thread, not at start())
    val sq = spark.readStream.format("graft-table")
      .option("versionAsOf", v2).load(store.dir)
      .writeStream.format("noop")
      .option("checkpointLocation", tmpDir("ts-asof-ck")).start()
    try {
      val se = intercept[Exception](sq.processAllAvailable())
      assert(se.getMessage.contains("versionAsOf"), se.getMessage)
    } finally if (sq.isActive) sq.stop()
    // fold: snapshots below the rewrite version are GONE and refused
    store.rewrite(df => df.groupBy("k").agg(max("v").as("v")))
    val e = intercept[Exception](store.readAsOf(v2).count())
    assert(e.getMessage.contains("folded"), e.getMessage)
    // the post-fold version itself still serves
    assert(store.readAsOf(store.version).count() == 3) // a, b, c
  }

  test("a planned _ver read racing a rewrite fails loudly, never emits empty") {
    import graft.sources.{GraftLogReaderFactory, LogSegmentPartition}
    val store = TableStore.open(spark, storeDir("ts-race"), schema)
    store.append(Seq(("a", 1L)).toDF("k", "v"))
    store.append(Seq(("b", 2L)).toDF("k", "v"))
    // plan against the CURRENT manifest (what a micro-batch or
    // snapshot scan does), resolving absolute segment paths
    val m = graft.storage.Manifest.load(store.dir).get
    val planned = m.segments.map(s => FileIO.join(store.dir, s.path))
    val part = LogSegmentPartition(store.dir, planned, 1L, 2L)
    // the rewrite folds versions 1-2 into version 3 and DELETES the
    // planned files — serving the stale plan from the folded segment
    // would deliver nothing and silently commit the stream offset
    store.rewrite(df => df)
    val diskSchema = StructType(
      schema.fields :+ StructField("_ver", LongType, nullable = false))
    val factory = new GraftLogReaderFactory(diskSchema, filterCol = "_ver")
    val e = intercept[IllegalStateException](factory.createReader(part))
    assert(e.getMessage.contains("folded"), e.getMessage)
  }

  test("checkConsistency sweeps crash litter, reports real loss, repairs safely") {
    val store = TableStore.open(spark, storeDir("ts-fsck"), schema)
    val io = FileIO.forPath(store.dir)
    def exists(rel: String) = io.exists(FileIO.join(store.dir, rel))
    store.append(Seq(("a", 1L)).toDF("k", "v"))
    store.append(Seq(("b", 2L)).toDF("k", "v"))
    assert(store.checkConsistency() == Nil) // clean table
    // simulate a crash mid-append: orphan tmp spill dir + an orphan
    // moved file the manifest never committed
    io.mkdirs(FileIO.join(store.dir, "tmp-deadbeef"))
    io.writeAtomic(FileIO.join(store.dir, "tmp-deadbeef/part-0.parquet"),
      "junk".getBytes("UTF-8"))
    io.writeAtomic(
      FileIO.join(store.dir, "data/seg-99999999-orphan.parquet"),
      "junk".getBytes("UTF-8"))
    val found = store.checkConsistency()
    assert(found.exists(_.contains("tmp-deadbeef")), found.toString)
    assert(found.exists(_.contains("seg-99999999-orphan")), found.toString)
    // orphans are INVISIBLE to readers before and after repair
    assert(store.readVersioned.count() == 2)
    // YOUNG litter is reported but NOT deleted (it may be another
    // process's in-flight append): default minAge protects it
    store.checkConsistency(repair = true)
    assert(exists("tmp-deadbeef") && exists("data/seg-99999999-orphan.parquet"))
    // aged litter (minAgeMs = 0 simulates age) is swept
    store.checkConsistency(repair = true, minAgeMs = 0L)
    assert(store.checkConsistency() == Nil)
    assert(!exists("tmp-deadbeef") &&
      !exists("data/seg-99999999-orphan.parquet"))
    assert(store.readVersioned.count() == 2)
    // another handle's commit is never litter: the sweep judges
    // against the DISK manifest, not this handle's stale view
    val other = TableStore.open(spark, store.dir, schema)
    other.append(Seq(("c", 3L)).toDF("k", "v"))
    val afterOther = store.checkConsistency(repair = true, minAgeMs = 0L)
    assert(!afterOther.exists(_.contains("orphan")), afterOther.toString)
    assert(other.readVersioned.count() == 3)
    // a missing COMMITTED file is loss: reported, never auto-deleted
    val committed = graft.storage.Manifest.load(store.dir).get.segments.head
    io.delete(FileIO.join(store.dir, committed.path))
    val loss = store.checkConsistency(repair = true)
    assert(loss.exists(_.contains("MISSING")), loss.toString)
  }

  test("reopening with a different schema is refused loudly") {
    val dir = storeDir("ts-schema")
    val store = TableStore.open(spark, dir, schema)
    store.append(Seq(("a", 1L)).toDF("k", "v"))
    // renamed column: forced .schema() would read it back all-null
    val renamed = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val e = intercept[IllegalArgumentException] {
      TableStore.open(spark, dir, renamed)
    }
    assert(e.getMessage.contains("would misread"))
    // retyped column: same refusal
    val retyped = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", StringType, nullable = false)))
    intercept[IllegalArgumentException] {
      TableStore.open(spark, dir, retyped)
    }
    // nullability-only drift is benign and admitted
    val nullableDrift = StructType(Seq(
      StructField("k", StringType, nullable = true),
      StructField("v", LongType, nullable = true)))
    val re = TableStore.open(spark, dir, nullableDrift)
    assert(re.read.count() == 1)
  }

  test("reopening with trailing nullable columns widens in place (upgrade migration)") {
    val dir = storeDir("ts-widen")
    val store = TableStore.open(spark, dir, schema)
    store.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    val verBefore = store.version
    // a software upgrade appends a nullable column (the daemon's seen
    // store gaining dsir_logw): the reopen must absorb it without a
    // data rewrite — old rows read the column as null
    val widened = StructType(schema.fields :+
      StructField("w", DoubleType, nullable = true))
    val up = TableStore.open(spark, dir, widened)
    assert(up.version == verBefore + 1,
      "the schema upgrade is one manifest commit")
    val old = up.read.orderBy("v").collect()
    assert(old.length == 2 && old.forall(_.isNullAt(2)),
      s"pre-migration rows must read the added column as null: ${old.toSeq}")
    // new appends carry the column; mixed-era reads see both
    up.append(Seq(("c", 3L, 0.5)).toDF("k", "v", "w"))
    val rows = up.read.orderBy("v").collect()
    assert(rows.length == 3 && rows(2).getDouble(2) == 0.5)
    assert(rows(0).isNullAt(2))
    // the store's pinned identity follows the new shape: reopening
    // with the ORIGINAL schema is now a (refused) narrowing
    intercept[IllegalArgumentException] { TableStore.open(spark, dir, schema) }
    // a NON-NULLABLE addition is refused — old rows cannot satisfy it
    val nonNull = StructType(widened.fields :+
      StructField("z", LongType, nullable = false))
    intercept[IllegalArgumentException] { TableStore.open(spark, dir, nonNull) }
    // a REORDER of stored columns is refused — indistinguishable from
    // a rename-pair, it would misread real data
    val reordered = StructType(widened.fields.reverse)
    intercept[IllegalArgumentException] {
      TableStore.open(spark, dir, reordered)
    }
    // inserting a nullable column BETWEEN stored columns is a legal
    // widening too (the daemon's dsir_logw landed before batch_id):
    // by-name reads make position irrelevant
    val inserted = StructType(
      widened.fields.take(1) ++
        Seq(StructField("mid", StringType, nullable = true)) ++
        widened.fields.drop(1))
    val up2 = TableStore.open(spark, dir, inserted)
    val r2 = up2.read.orderBy("v").collect()
    assert(r2.length == 3 && r2.forall(_.isNullAt(1)),
      s"inserted column must read null on pre-migration rows: ${r2.toSeq}")
    assert(r2(2).getDouble(3) == 0.5, "stored columns misread after insert")
  }

  test("refresh() sees commits made through another handle") {
    val dir = storeDir("ts-refresh")
    val a = TableStore.open(spark, dir, schema)
    val b = TableStore.open(spark, dir, schema)
    a.append(Seq(("a", 1L)).toDF("k", "v"))
    a.append(Seq(("b", 2L)).toDF("k", "v"))
    // b's view is frozen at open (manifest-snapshot isolation) ...
    assert(b.version == 0 && b.read.count() == 0)
    // ... until it refreshes from disk
    assert(b.refresh() == a.version)
    assert(b.read.count() == 2)
    assert(b.segmentCount == a.segmentCount)
    // refresh is monotonic and idempotent
    assert(b.refresh() == a.version)
  }

  test("rewrite collapses history into one version") {
    val store = TableStore.open(spark, storeDir("ts-rw"), schema)
    (1 to 5).foreach(i => store.append(Seq(("a", i.toLong)).toDF("k", "v")))
    store.rewrite(df => df.groupBy("k").agg(max("v").as("v")))
    val rows = store.readVersioned.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 5L)
    val vers = store.readVersioned.select("_ver").distinct().collect()
    assert(vers.length == 1)
  }
}

class TableStoreSpec extends TableStoreContract {
  def fsPrefix = ""
}

/** The Hadoop FileSystem leg of the TableStore contract (`file:`
  * scheme on local disk — the HDFS/object-store code path). */
class TableStoreHadoopSpec extends TableStoreContract {
  def fsPrefix = "file:"
}

/** The OBJECT-STORE leg: the same contract over the emulated
  * no-atomic-rename, single-PUT-on-close filesystem
  * ([[graft.testfs.SinglePutFileSystem]]), so the direct-PUT commit
  * path of FileIO.writeAtomic carries the whole matrix — not just the
  * rename-capable schemes. */
class TableStoreObjectStoreSpec extends TableStoreContract {
  graft.testfs.SinglePutFileSystem.install(spark)
  def fsPrefix = "graftput:"
}
