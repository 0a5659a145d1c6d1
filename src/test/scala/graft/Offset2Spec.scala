package graft

import java.io.DataOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.compat.Offset2

/** Byte-level compat with the reference's offset2 triple
  * (`data`/`ofst`/`jrnl`; format `offset2/log.go:5-27`): golden
  * bytes pin the BigEndian frame layout, the DSv2 source reads in
  * parallel with seq clipping, export round-trips, and the journal
  * check recovers exactly the crash window the reference recovers
  * (`offset2/log.go:256-277`). */
class Offset2Spec extends SparkSpec {
  import spark.implicits._

  /** Hand-write an offset2 triple: values (nulled via None). */
  private def golden(dir: String, entries: Seq[Option[String]]): Unit = {
    val data = new DataOutputStream(
      Files.newOutputStream(Paths.get(dir, "data")))
    val ofst = new DataOutputStream(
      Files.newOutputStream(Paths.get(dir, "ofst")))
    var off = 0L
    entries.foreach { e =>
      ofst.writeLong(off)
      e match {
        case Some(s) =>
          val b = s.getBytes(UTF_8)
          data.writeLong(b.length.toLong); data.write(b)
          off += 8 + b.length
        case None => // nulled: negative size, zeroed payload
          data.writeLong(-3L); data.write(new Array[Byte](3))
          off += 8 + 3
      }
    }
    data.close(); ofst.close()
    val jrnl = new DataOutputStream(
      Files.newOutputStream(Paths.get(dir, "jrnl")))
    jrnl.writeLong(entries.length - 1L); jrnl.close()
  }

  test("golden bytes: a hand-written reference triple reads exactly") {
    val dir = tmpDir("o2-golden")
    golden(dir, Seq(Some("""{"a":1}"""), Some("hi"), None, Some("")))
    assert(Offset2.checkConsistency(dir).isEmpty)
    val rows = spark.read.format("graft-offset2").load(dir)
      .orderBy("seq")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(b => new String(r.getAs[Array[Byte]](1), UTF_8)),
        r.getBoolean(2)))
      .toSeq
    assert(rows == Seq(
      (0L, Some("""{"a":1}"""), false),
      (1L, Some("hi"), false),
      (2L, None, true),
      (3L, Some(""), false)))
  }

  test("export round-trips: read-back equals the source, bytes are a valid triple") {
    val dir = tmpDir("o2-rt")
    val src = Seq(
      (0L, """{"k":"a"}""", false),
      (1L, "", false),
      (2L, "payload-two", true), // nulled: value bytes are NOT exported
      (3L, "last", false)
    ).toDF("seq", "value", "nulled")
    Offset2.export(src, dir)
    assert(Offset2.checkConsistency(dir).isEmpty)
    val back = spark.read.format("graft-offset2").load(dir)
      .orderBy("seq")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(b => new String(r.getAs[Array[Byte]](1), UTF_8)),
        r.getBoolean(2)))
      .toSeq
    assert(back == Seq(
      (0L, Some("""{"k":"a"}"""), false),
      (1L, Some(""), false),
      (2L, None, true),
      (3L, Some("last"), false)))
    // byte-level: jrnl holds the LAST seq, ofst has one long per entry
    val jrnl = java.nio.ByteBuffer
      .wrap(Files.readAllBytes(Paths.get(dir, "jrnl"))).getLong
    assert(jrnl == 3L)
    assert(Files.size(Paths.get(dir, "ofst")) == 4 * 8)
  }

  test("an empty triple (zero-byte jrnl) reads as an empty table") {
    val dir = tmpDir("o2-empty")
    for (f <- Seq("data", "ofst", "jrnl")) Files.createFile(Paths.get(dir, f))
    assert(Offset2.check(dir).count == 0L)
    assert(spark.read.format("graft-offset2").load(dir).count() == 0)
    // ...but an empty journal with data present is the reference's
    // loud inconsistency, not an empty read
    val dir2 = tmpDir("o2-empty2")
    golden(dir2, Seq(Some("x")))
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(dir2, "jrnl"), StandardOpenOption.WRITE)
    try ch.truncate(0) finally ch.close()
    val e = intercept[java.io.IOException](Offset2.check(dir2))
    assert(e.getMessage.contains("journal empty"))
  }

  test("point get is the reference's two-seek read: value, nulled, OOB") {
    val dir = tmpDir("o2-get")
    golden(dir, Seq(Some("zero"), None, Some("two")))
    assert(Offset2.get(dir, 0).map(new String(_, UTF_8)) == Some("zero"))
    assert(Offset2.get(dir, 1).isEmpty) // nulled -> reference ErrNulled
    assert(Offset2.get(dir, 2).map(new String(_, UTF_8)) == Some("two"))
    intercept[NoSuchElementException](Offset2.get(dir, 3))
    intercept[NoSuchElementException](Offset2.get(dir, -1))
  }

  test("export refuses gapped or non-dense seqs") {
    val dir = tmpDir("o2-gap")
    val gapped = Seq((0L, "a", false), (2L, "c", false))
      .toDF("seq", "value", "nulled")
    val e = intercept[IllegalArgumentException](Offset2.export(gapped, dir))
    assert(e.getMessage.contains("dense"))
  }

  test("journal-ahead crash window recovers; journal-behind is loud") {
    val dir = tmpDir("o2-jrnl")
    golden(dir, Seq(Some("one"), Some("two")))
    // crash window: jrnl bumped (to 2) before ofst/data were written
    val jp = Paths.get(dir, "jrnl")
    val ch = java.nio.channels.FileChannel.open(jp, StandardOpenOption.WRITE)
    try {
      val b = java.nio.ByteBuffer.allocate(8).putLong(2L); b.flip()
      ch.write(b, 0)
    } finally ch.close()
    val meta = Offset2.check(dir) // recovers
    assert(meta.lastSeq == 1L)
    assert(java.nio.ByteBuffer
      .wrap(Files.readAllBytes(jp)).getLong == 1L) // journal rewritten
    assert(spark.read.format("graft-offset2").load(dir).count() == 2)
    // journal BEHIND the offset file: refuse, like the reference
    val ch2 = java.nio.channels.FileChannel.open(jp, StandardOpenOption.WRITE)
    try {
      val b = java.nio.ByteBuffer.allocate(8).putLong(0L); b.flip()
      ch2.write(b, 0)
    } finally ch2.close()
    val e = intercept[java.io.IOException](Offset2.check(dir))
    assert(e.getMessage.contains("does not match"))
  }

  test("a truncated data file is a loud error") {
    val dir = tmpDir("o2-trunc")
    golden(dir, Seq(Some("one"), Some("twotwo")))
    val dp = Paths.get(dir, "data")
    val ch = java.nio.channels.FileChannel.open(dp, StandardOpenOption.WRITE)
    try ch.truncate(Files.size(dp) - 2) finally ch.close()
    val e = intercept[java.io.IOException](Offset2.check(dir))
    assert(e.getMessage.contains("size difference"))
  }

  test("corrupted ofst entries are caught by the full-scan fsck") {
    val dir = tmpDir("o2-fsck")
    golden(dir, Seq(Some("one"), Some("two"), Some("three")))
    val op = Paths.get(dir, "ofst")
    val ch = java.nio.channels.FileChannel.open(op, StandardOpenOption.WRITE)
    try {
      val b = java.nio.ByteBuffer.allocate(8).putLong(5L); b.flip()
      ch.write(b, 8) // ofst[1] now wrong (but jrnl/data untouched)
    } finally ch.close()
    val problems = Offset2.checkConsistency(dir)
    assert(problems.exists(_.contains("offset mismatch at seq 1")))
  }

  test("scans parallelize by byte-balanced ranges; seq bounds clip partitions") {
    val dir = tmpDir("o2-par")
    val n = 5000
    Offset2.export(
      spark.range(n).select(col("id").as("seq"),
        concat(lit("v"), col("id")).as("value"), lit(false).as("nulled")),
      dir)
    val df = spark.read.format("graft-offset2")
      .option("maxPartitionBytes", "4096").load(dir)
    val total = df.rdd.getNumPartitions
    assert(total > 4, s"expected many partitions, got $total")
    assert(df.select(sum(col("seq"))).as[Long].head() ==
      n.toLong * (n - 1) / 2)
    // a bounded scan plans only the clipped ranges, and exact rows
    val bounded = df.where(col("seq") >= 100 && col("seq") < 120)
    assert(bounded.rdd.getNumPartitions < total)
    assert(bounded.select("seq").as[Long].collect().sorted.toSeq ==
      (100L until 120L))
    // point lookup: one partition, one row
    val point = df.where(col("seq") === 4999)
    assert(point.rdd.getNumPartitions == 1)
    val r = point.collect().head
    assert(new String(r.getAs[Array[Byte]](1), UTF_8) == "v4999")
  }

  test("top-N/limit pushdown clips the plan to head/tail frame bytes (partial: residual sort kept)") {
    val dir = tmpDir("o2-topn")
    val n = 5000
    Offset2.export(
      spark.range(n).select(col("id").as("seq"),
        concat(lit("v"), col("id")).as("value"), lit(false).as("nulled")),
      dir)
    val df = spark.read.format("graft-offset2")
      .option("maxPartitionBytes", "4096").load(dir)
    val full = df.rdd.getNumPartitions
    // latest-100: the scan plans only the tail seq range; Spark's
    // residual Sort+Limit orders the n survivors
    val tail = df.orderBy(col("seq").desc).limit(100)
    assert(tail.rdd.getNumPartitions < full,
      s"tail read should clip partitions (full=$full)")
    assert(tail.collect().map(_.getLong(0)).toSeq ==
      (n - 100L until n.toLong).reverse)
    // head-100 and plain limit clip to the head range
    val head = df.orderBy(col("seq")).limit(100)
    assert(head.collect().map(_.getLong(0)).toSeq == (0L until 100L))
    assert(df.limit(7).collect().map(_.getLong(0)).sorted.toSeq == (0L until 7L))
    // non-seq ordering is refused → full plan, correct rows
    val byVal = df.orderBy(col("nulled")).limit(3)
    assert(byVal.collect().length == 3)
  }

  test("count/min/max over seq answered from ofst metadata — no data scan") {
    val dir = tmpDir("o2-agg")
    Offset2.export(
      spark.range(500).select(col("id").as("seq"),
        concat(lit("v"), col("id")).as("value"), lit(false).as("nulled")),
      dir)
    val df = spark.read.format("graft-offset2").load(dir)
    val counted = df.agg(count("*"))
    assert(counted.queryExecution.executedPlan.toString.contains("AGGREGATE"),
      counted.queryExecution.executedPlan.toString)
    assert(counted.collect().head.getLong(0) == 500L)
    assert(df.agg(min("seq"), max("seq")).collect().head.toSeq == Seq(0L, 499L))
    // value aggregates still scan, still exact
    assert(df.agg(count("value")).collect().head.getLong(0) == 500L)
  }

  test("the default packing target follows the session parallelism heuristic") {
    val dir = tmpDir("o2-heur")
    Offset2.export(
      spark.range(2000).select(col("id").as("seq"),
        concat(lit("value-"), col("id")).as("value"), lit(false).as("nulled")),
      dir)
    spark.conf.set("spark.sql.files.openCostInBytes", "512")
    try {
      val df = spark.read.format("graft-offset2").load(dir)
      assert(df.rdd.getNumPartitions > 1)
      assert(df.count() == 2000)
    } finally spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  /** One reference-order append: jrnl bumped FIRST, then the data
    * frame, then the ofst entry (`offset2/log.go:425-462`). */
  private def appendGolden(dir: String, value: String): Unit = {
    val jp = Paths.get(dir, "jrnl")
    val prev =
      if (Files.size(jp) == 0) -1L
      else java.nio.ByteBuffer.wrap(Files.readAllBytes(jp)).getLong
    val jb = java.nio.ByteBuffer.allocate(8).putLong(prev + 1); jb.flip()
    val jch = java.nio.channels.FileChannel.open(jp, StandardOpenOption.WRITE)
    try jch.write(jb, 0) finally jch.close()
    val off = Files.size(Paths.get(dir, "data"))
    val b = value.getBytes(UTF_8)
    val data = new DataOutputStream(Files.newOutputStream(
      Paths.get(dir, "data"), StandardOpenOption.APPEND))
    try { data.writeLong(b.length.toLong); data.write(b) } finally data.close()
    val ofst = new DataOutputStream(Files.newOutputStream(
      Paths.get(dir, "ofst"), StandardOpenOption.APPEND))
    try ofst.writeLong(off) finally ofst.close()
  }

  test("a live writer's in-flight append is tolerated and NEVER 'recovered'") {
    val dir = tmpDir("o2-live")
    golden(dir, Seq(Some("a"), Some("b")))
    // mid-append instant: jrnl already bumped (to 2), data frame
    // partially written, ofst not yet — exactly what a reader racing
    // the reference process sees
    val jp = Paths.get(dir, "jrnl")
    val jb = java.nio.ByteBuffer.allocate(8).putLong(2L); jb.flip()
    val jch = java.nio.channels.FileChannel.open(jp, StandardOpenOption.WRITE)
    try jch.write(jb, 0) finally jch.close()
    val data = new DataOutputStream(Files.newOutputStream(
      Paths.get(dir, "data"), StandardOpenOption.APPEND))
    try { data.writeLong(9L); data.write("par".getBytes(UTF_8)) } // truncated
    finally data.close()
    val before = Files.readAllBytes(jp).toSeq
    // read-only meta sees the committed prefix only
    val meta = Offset2.checkReadOnly(dir)
    assert(meta.count == 2)
    // a batch scan reads exactly the committed entries...
    val rows = spark.read.format("graft-offset2").load(dir)
      .select("seq").as[Long].collect().sorted.toSeq
    assert(rows == Seq(0L, 1L))
    // ...and the journal was NOT rewritten under the live writer
    assert(Files.readAllBytes(jp).toSeq == before)
    // the explicit open/migration check stays the reference's loud
    // torn-frame error (and is the one allowed to touch jrnl)
    val e = intercept[java.io.IOException](Offset2.check(dir))
    assert(e.getMessage.contains("size difference"))
  }

  test("streaming tail: delivers committed entries, then appends, exactly once") {
    val dir = tmpDir("o2-tail")
    golden(dir, Seq(Some("e0"), Some("e1"), Some("e2")))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format("graft-offset2").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          seen.add((r.getLong(0), new String(r.getAs[Array[Byte]](1), UTF_8))))
        ()
      }
      .option("checkpointLocation", tmpDir("o2-tail-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(seen.toArray.toSeq ==
        Seq((0L, "e0"), (1L, "e1"), (2L, "e2")))
      // the reference process keeps writing; the tail picks it up
      appendGolden(dir, "e3")
      appendGolden(dir, "e4")
      q.processAllAvailable()
      assert(seen.toArray.toSeq.asInstanceOf[Seq[(Long, String)]]
        .map(_._1) == (0L to 4L))
    } finally q.stop()
  }

  test("tail admission control paces catch-up under Trigger.AvailableNow") {
    val dir = tmpDir("o2-pace")
    golden(dir, (0 until 9).map(i => Some(s"entry-$i")))
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[Long]]
    val q = spark.readStream.format("graft-offset2")
      .option("maxEntriesPerTrigger", "2").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = df.select("seq").collect().map(_.getLong(0)).sorted.toSeq
        batches.synchronized { batches += b }
        ()
      }
      .option("checkpointLocation", tmpDir("o2-pace-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val all = batches.synchronized(batches.toList)
    assert(all.filter(_.nonEmpty).forall(_.size <= 2),
      s"a batch exceeded the 2-entry budget: $all")
    assert(all.flatten.sorted == (0L until 9L), s"delivery mismatch: $all")
    assert(all.count(_.nonEmpty) >= 5, s"expected paced batches, got: $all")
  }

  test("migration: offset2 -> graft-log preserves order and nulls") {
    val dir = tmpDir("o2-mig")
    golden(dir, Seq(Some("""{"n":0}"""), None, Some("""{"n":2}""")))
    val imported = spark.read.format("graft-offset2").load(dir)
    // nulled history cannot be appended into another log's seq space
    // (same contract as graft-log's write leg); live rows migrate
    val logDir = tmpDir("o2-mig-log") + "/log"
    val log = graft.storage.ParquetLog.open(
      spark, logDir, org.apache.spark.sql.types.StringType)
    log.append(imported.where(!col("nulled")).orderBy("seq")
      .select(col("value").cast("string")))
    val out = spark.read.format("graft-log").load(logDir)
      .orderBy("seq").select(col("value").cast("string")).as[String].collect()
    assert(out.toSeq == Seq("""{"n":0}""", """{"n":2}"""))
  }

  test("first-append crash (jrnl bumped, ofst empty) recovers to the empty log") {
    val dir = tmpDir("o2-firstcrash")
    // the exact crash window: jrnl written (seq 0), data partially
    // written, ofst never touched — the most basic recoverable state
    val jrnl = new DataOutputStream(
      Files.newOutputStream(Paths.get(dir, "jrnl")))
    jrnl.writeLong(0L); jrnl.close()
    Files.write(Paths.get(dir, "data"), Array[Byte](0, 0, 0)) // torn frame
    Files.createFile(Paths.get(dir, "ofst"))
    // default check stays loud — these bytes are also what a live
    // writer mid-FIRST-append looks like; chopping needs the same
    // explicit ownership claim as the mid-append case
    val e = intercept[java.io.IOException](Offset2.check(dir))
    assert(e.getMessage.contains("size difference"))
    val meta = Offset2.check(dir, recover = true, chopInFlight = true)
    assert(meta.lastSeq == Offset2.SeqEmpty && meta.dataSize == 0L)
    // recovery restored the FORMAT's empty state: zero-byte jrnl and
    // the torn frame truncated away — the reference reopens it clean
    assert(Files.size(Paths.get(dir, "jrnl")) == 0L)
    assert(Files.size(Paths.get(dir, "data")) == 0L)
    assert(Offset2.check(dir).lastSeq == Offset2.SeqEmpty)
  }

  test("first-append crash before any data byte: journal-only recovery") {
    // jrnl bumped, nothing in data/ofst yet — no in-flight bytes, so
    // plain recover=true suffices (journal rewrite only, no chop)
    val dir = tmpDir("o2-firstcrash-clean")
    val jrnl = new DataOutputStream(
      Files.newOutputStream(Paths.get(dir, "jrnl")))
    jrnl.writeLong(0L); jrnl.close()
    Files.createFile(Paths.get(dir, "data"))
    Files.createFile(Paths.get(dir, "ofst"))
    val meta = Offset2.check(dir)
    assert(meta.lastSeq == Offset2.SeqEmpty && meta.dataSize == 0L)
    assert(Files.size(Paths.get(dir, "jrnl")) == 0L)
  }

  test("mid-append crash: jrnl recovered AND the in-flight frame chopped") {
    // crash windows after "ab" was committed, append #3 in flight:
    // (a) torn frame bytes, (b) a complete frame that never reached
    // ofst (ofst is the commit point) — both chop back to committed
    for ((tail, name) <- Seq(
        Array[Byte](0, 0, 0, 9, 1) -> "torn",
        (java.nio.ByteBuffer.allocate(8 + 2).putLong(2L)
          .put("zz".getBytes(UTF_8)).array()) -> "complete-uncommitted")) {
      val dir = tmpDir(s"o2-midcrash-$name")
      golden(dir, Seq(Some("a"), Some("ab")))
      val committed = Files.size(Paths.get(dir, "data"))
      val jrnl = new DataOutputStream(Files.newOutputStream(
        Paths.get(dir, "jrnl"), StandardOpenOption.TRUNCATE_EXISTING))
      jrnl.writeLong(2L); jrnl.close() // append #3 bumped the journal
      Files.write(Paths.get(dir, "data"), tail,
        StandardOpenOption.APPEND)
      // the DEFAULT open stays the reference's loud size-difference
      // error: these bytes are indistinguishable from a live writer
      // mid-append, so the chop needs an explicit ownership claim
      val e = intercept[java.io.IOException](Offset2.check(dir))
      assert(e.getMessage.contains("size difference"), name)
      val meta = Offset2.check(dir, recover = true, chopInFlight = true)
      assert(meta.lastSeq == 1L && meta.dataSize == committed, name)
      assert(Files.size(Paths.get(dir, "data")) == committed, name)
      assert(Offset2.checkConsistency(dir).isEmpty, name)
      assert(Offset2.get(dir, 1).map(new String(_, UTF_8)) == Some("ab"), name)
    }
  }

  test("a torn COMMITTED frame (real data loss) stays loud") {
    val dir = tmpDir("o2-dataloss")
    golden(dir, Seq(Some("a"), Some("abcdef")))
    // chop INTO the committed last frame and mark the crash window:
    // the committed end is now past EOF — unrecoverable, must refuse
    val dc = java.nio.channels.FileChannel.open(
      Paths.get(dir, "data"), StandardOpenOption.WRITE)
    try dc.truncate(Files.size(Paths.get(dir, "data")) - 3) finally dc.close()
    val jrnl = new DataOutputStream(Files.newOutputStream(
      Paths.get(dir, "jrnl"), StandardOpenOption.TRUNCATE_EXISTING))
    jrnl.writeLong(2L); jrnl.close()
    // even the opt-in chop refuses: the committed end is PAST the
    // file, so bytes of a committed entry are gone — unrecoverable
    intercept[java.io.IOException] {
      Offset2.check(dir, recover = true, chopInFlight = true)
    }
  }

  test("get() never rewrites the journal under a live writer") {
    val dir = tmpDir("o2-liveget")
    golden(dir, Seq(Some("a"), Some("b")))
    // simulate the reference mid-append: jrnl bumped one ahead of ofst
    val jrnl = new DataOutputStream(Files.newOutputStream(
      Paths.get(dir, "jrnl"), StandardOpenOption.TRUNCATE_EXISTING))
    jrnl.writeLong(2L); jrnl.close()
    // a point read serves the COMMITTED entries and leaves jrnl alone
    assert(Offset2.get(dir, 0).map(new String(_, UTF_8)) == Some("a"))
    val after = java.nio.ByteBuffer
      .wrap(Files.readAllBytes(Paths.get(dir, "jrnl"))).getLong
    assert(after == 2L, "get() must not recover (rewrite jrnl) — " +
      "the writer may be live")
  }
}
