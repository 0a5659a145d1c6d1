package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.core.QuerySpec._
import graft.indexes.{KVIndex, MultiLogSink, SinkIndex}
import graft.multilog.MultiLog
import graft.storage.ParquetLog

/** End-to-end smoke driver for the library surface: ingest real
  * testdata events into a ParquetLog, run the QuerySpec algebra,
  * redact, fan out a multilog, build a KV index with resume, live-tail.
  * Run: sbt "runMain graft.Demo [sfDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("graft-demo").toString
    println(s"== workdir $work")

    // 1. Ingest events as a log of JSON values (dynamic-schema mode).
    val events = Tables.load(spark, sfDir, "events").orderBy("event_id")
    val log = ParquetLog.open(spark, s"$work/log", StringType)
    val first = log.append(events.select(to_json(struct(events.columns.map(col): _*)).as("value")))
    println(s"== appended ${log.seq + 1} events, first seq=$first, log.seq=${log.seq}")

    // 2. QuerySpec algebra.
    val ranged = log.query(Gte(10), Lt(15), SeqWrap(true)).collect()
    println(s"== query(Gte(10),Lt(15)) -> ${ranged.map(_.getLong(0)).mkString(",")}")
    val top3 = log.query(Reverse(true), Limit(3), SeqWrap(true)).collect()
    println(s"== reverse top3 seqs -> ${top3.map(_.getLong(0)).mkString(",")}")

    // 3. Point read, redaction, replace.
    println(s"== get(5) = ${log.get(5).getString(1).take(60)}")
    log.nullAt(5)
    val nulledRead =
      try { log.get(5); "NOT-NULLED" }
      catch { case _: GraftErrors.ErrNulled => "ErrNulled" }
    println(s"== after nullAt(5): get(5) -> $nulledRead")
    val streamRow = log
      .query(Gte(5), Lte(5), SeqWrap(true))
      .collect()
      .head
    println(
      s"== stream semantics at 5: nulled=${streamRow.getBoolean(2)} value=${streamRow.isNullAt(1)}"
    )
    log.replace(5, lit("""{"replaced":true}"""))
    println(s"== after replace(5): get(5) = ${log.get(5).getString(1)}")
    println(s"== checkConsistency -> ${log.checkConsistency()}")

    // 4. MultiLog fan-out by event_type with resume cursor.
    val mlog = MultiLog.open(spark, s"$work/mlog")
    val cursor = KVIndex.open(spark, s"$work/mlog-cursor")
    val n = MultiLogSink.pump(
      log,
      mlog,
      cursor,
      batch =>
        batch.select(
          get_json_object(col("value"), "$.event_type").as("addr"),
          col("seq")
        )
    )
    println(s"== multilog pump consumed $n entries")
    println(s"== sublog addrs: ${mlog.list().collect().map(_.getString(0)).sorted.mkString(",")}")
    val sub = mlog.sublog(mlog.list().collect().head.getString(0))
    println(s"== sublog '${sub.addr}' card-1=${sub.seq}, rank0->parentSeq=${sub.get(0)}")
    val again = MultiLogSink.pump(log, mlog, cursor, b => b.select(lit("x").as("addr"), col("seq")))
    println(s"== resume pump consumed $again (expect 0: nothing new)")

    // 5. KV index: last event json per user.
    val kv = KVIndex.open(spark, s"$work/kv")
    SinkIndex.pump(
      log,
      kv,
      batch =>
        batch.select(
          get_json_object(col("value"), "$.user_id").as("addr"),
          col("value")
        )
    )
    val someUser = kv.current.limit(1).collect().head
    println(s"== kv[${someUser.getString(0)}] = ${someUser.getString(1).take(60)}")

    // 6. Live tail: append after subscribe, observe delivery.
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = graft.live.LiveTail.push(
      log,
      Seq(Gt(log.seq), Live(true), SeqWrap(true)),
      s"$work/ckpt",
      r => { seen.add(r.getLong(0)); () }
    )
    import spark.implicits._
    log.appendValues(Seq("""{"live":1}""", """{"live":2}"""))
    q.processAllAvailable()
    q.stop()
    println(s"== live tail delivered seqs: ${seen.toArray.mkString(",")}")

    // 7. Per-key watch: notified on set, unset on tombstone.
    val notes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val w = kv.watch("demo-key")(v => { notes.add(v.getOrElse("<unset>")); () })
    kv.set("demo-key", "v1")
    kv.delete("demo-key")
    w.cancel()
    println(s"== watch(demo-key) saw: ${notes.toArray.mkString(" -> ")}")

    // 8. Live rank-space sublog query (bounded, self-terminating).
    val ranks = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val rq = graft.live.SublogTail.push(
      mlog, sub.addr, Seq(Lt(3), Live(true)), s"$work/rankckpt",
      (rank, pseq) => { ranks.add((rank, pseq)); () })
    rq.awaitTermination(60000)
    println(s"== sublog rank tail (ranks 0..2): ${ranks.toArray.mkString(",")}")

    // 9. Wire codecs: msgpack/CBOR frame round-trip of the log head.
    val head = log.query(Limit(3), SeqWrap(true)).select(col("seq"), col("value"))
    for (codec <- Seq(graft.codec.MsgPackCodec, graft.codec.CborCodec)) {
      val back = graft.codec.Codecs
        .decodeWire(graft.codec.Codecs.encodeWire(head, codec), head.schema, codec)
      println(s"== ${codec.name} round-trip rows: ${back.count()}")
    }

    // 10. In-memory backend: same contract, no files.
    val mem = graft.storage.MemLog.open(spark, IntegerType)
    mem.appendValues(Seq(1, 2, 3))
    mem.nullAt(1)
    println(s"== memlog seq=${mem.seq} rows=${mem.query(SeqWrap(true)).count()}")

    // 11. offset2 migration both ways: export the log head as the
    // reference's own data/ofst/jrnl triple, fsck it, read it back
    // through the graft-offset2 connector.
    val o2 = s"$work/offset2"
    log.nullAt(3) // carry a redacted entry across the migration
    graft.compat.Offset2.export(
      log.query(Lt(7), SeqWrap(true))
        .select(col("seq"), col("value").cast("string").as("value"),
          col("nulled")), o2)
    val fsck = graft.compat.Offset2.checkConsistency(o2)
    val o2back = spark.read.format("graft-offset2").load(o2)
    println(s"== offset2 export+import: rows=${o2back.count()} " +
      s"nulled=${o2back.where(col("nulled")).count()} fsck=$fsck")

    // 12. Steady-state ingest-curation daemon: documents stream in on
    // a graft-log, each micro-batch is gated + incrementally deduped
    // against the standing index, survivors land transactionally —
    // killed and resumed mid-corpus to show the checkpoint contract.
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val docLog = ParquetLog.open(spark, s"$work/doclog", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val dcfg = graft.streaming.IngestConfig(minQuality = 0.0, minTokens = 1,
      threshold = 0.35,
      params = graft.dedup.DedupParams(numHashes = 8, bands = 4))
    val daemon = graft.streaming.IngestDaemon.open(spark, s"$work/daemon", dcfg)
    def docStream = spark.readStream.format("graft-log").load(docLog.dir)
      .select(col("value.doc_id").as("doc_id"), col("value.text").as("text"))
    docLog.append(docs.where(col("doc_id") < 250)
      .select(struct(col("doc_id"), col("text")).as("value")))
    val dq1 = daemon.start(docStream, s"$work/daemonckpt")
    dq1.processAllAvailable(); dq1.stop()
    val mid = daemon.corpus.count()
    // second half arrives while the daemon is down; a fresh handle on
    // the same checkpoint resumes without re-deciding a document
    docLog.append(docs.where(col("doc_id") >= 250)
      .select(struct(col("doc_id"), col("text")).as("value")))
    val daemon2 = graft.streaming.IngestDaemon.open(spark, s"$work/daemon", dcfg)
    val dq2 = daemon2.start(docStream, s"$work/daemonckpt")
    dq2.processAllAvailable(); dq2.stop()
    println(s"== ingest daemon: corpus $mid -> ${daemon2.corpus.count()} " +
      s"docs across a restart, index v${daemon2.index.version}")

    // 13. The VECTOR managed artifacts run the same checkpointed
    // kill/resume loop: SemDeDup (SemanticIndex, pinned codebook) and
    // embedding near-dup (VecDedupIndex, pinned signature width).
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val vecLog = ParquetLog.open(spark, s"$work/veclog", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    def vecStream = spark.readStream.format("graft-log").load(vecLog.dir)
      .select(col("value.vec_id").as("vec_id"),
        col("value.embedding").as("embedding"))
    val semCents = emb.where(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    val sem = graft.dedup.SemanticIndex.open(spark, s"$work/semidx", semCents)
    val vec = graft.dedup.VecDedupIndex.open(spark, s"$work/vecidx", bits = 8)
    vecLog.append(emb.where(col("vec_id") < 300)
      .select(struct(col("vec_id"), col("embedding")).as("value")))
    val sq1 = sem.start(vecStream, "embedding", "vec_id",
      s"$work/semckpt", threshold = 0.3)
    sq1.processAllAvailable(); sq1.stop()
    val vq1 = vec.start(vecStream, "embedding", "vec_id",
      s"$work/vecckpt", threshold = 0.3, maxBucket = 1000L)
    vq1.processAllAvailable(); vq1.stop()
    val semMid = sem.corpus.count()
    val vecMid = vec.corpus.count()
    // the rest arrives while both loops are DOWN; fresh handles on the
    // same checkpoints resume without re-deciding a vector
    vecLog.append(emb.where(col("vec_id") >= 300)
      .select(struct(col("vec_id"), col("embedding")).as("value")))
    val sem2 = graft.dedup.SemanticIndex.open(spark, s"$work/semidx")
    val sq2 = sem2.start(vecStream, "embedding", "vec_id",
      s"$work/semckpt", threshold = 0.3)
    sq2.processAllAvailable(); sq2.stop()
    val vec2 = graft.dedup.VecDedupIndex.open(spark, s"$work/vecidx", bits = 8)
    val vq2 = vec2.start(vecStream, "embedding", "vec_id",
      s"$work/vecckpt", threshold = 0.3, maxBucket = 1000L)
    vq2.processAllAvailable(); vq2.stop()
    // the streamed SemDeDup corpus must equal the flat one-shot rule
    val semWant = graft.dedup.Dedup
      .semanticDedup(emb, "embedding", "vec_id", (0L until 8L).toSeq,
        threshold = 0.3).count()
    val semGot = sem2.corpus.count()
    require(semGot == semWant,
      s"semdedup stream != one-shot: $semGot vs $semWant")
    println(s"== semantic index: corpus $semMid -> $semGot vectors " +
      s"across a restart (one-shot rule holds), v${sem2.version}")
    println(s"== vec dedup index: corpus $vecMid -> ${vec2.corpus.count()} " +
      s"admitted of ${vec2.buckets.count()} seen, v${vec2.version}")

    // 14. The standing corpus PROFILE as the same kind of managed
    // artifact: each micro-batch lands its counter+sketch rows
    // journal-keyed; the profile is the merge fold over all batches —
    // killed and resumed on the same checkpoint like the rest.
    val pdocs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "n_chars")
    val profLog = ParquetLog.open(spark, s"$work/proflog", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("n_chars", LongType))))
    def profStream = spark.readStream.format("graft-log").load(profLog.dir)
      .select(col("value.doc_id").as("doc_id"),
        col("value.text").as("text"), col("value.lang").as("lang"),
        col("value.n_chars").as("n_chars"))
    def profWave(w: org.apache.spark.sql.DataFrame): Unit =
      profLog.append(w.select(
        struct(col("doc_id"), col("text"), col("lang"),
          col("n_chars").cast("long").as("n_chars")).as("value")))
    val prof = graft.sketch.ProfileIndex
      .open(spark, s"$work/profidx", 64, "lang", "text",
        valueCol = Some("n_chars"))
    profWave(pdocs.where(col("doc_id") < 250))
    val pq1 = prof.start(profStream, s"$work/profckpt")
    pq1.processAllAvailable(); pq1.stop()
    val profMid = prof.profile.agg(sum("docs")).collect()(0).getLong(0)
    profWave(pdocs.where(col("doc_id") >= 250))
    val prof2 = graft.sketch.ProfileIndex.open(spark, s"$work/profidx")
    val pq2 = prof2.start(profStream, s"$work/profckpt")
    pq2.processAllAvailable(); pq2.stop()
    val profEst = prof2.profileEstimates
    val profDocs = profEst.agg(sum("docs")).collect()(0).getLong(0)
    require(profDocs == pdocs.count(),
      s"profile counted $profDocs docs of ${pdocs.count()}")
    val pq = profEst
      .select("n_chars_p50", "n_chars_p90").collect()
    require(pq.forall(r => r.getDouble(0) <= r.getDouble(1)),
      "standing quantiles out of order")
    println(s"== profile index: $profMid -> $profDocs docs across a " +
      s"restart, ${profEst.count()} strata (standing n_chars p50<=p90 " +
      s"on each), v${prof2.version}")

    // 15. The remaining managed artifacts, driven batch-style across
    // a reopen: the Hamming-tier fingerprint index (simhash32 dedup —
    // the pHash media case is the same machinery) and the standing
    // boilerplate gram-df dictionary.
    val fps = graft.dedup.Dedup
      .simhash32(pdocs.select("doc_id", "text"), "text", "doc_id")
      .toDF("doc_id", "h")
    val fpIdx = graft.dedup.FingerprintIndex
      .open(spark, s"$work/fpidx", bands = 4, bits = 32)
    fpIdx.ingest("w1", fps.where(col("doc_id") < 250), "h", "doc_id",
      maxHamming = 2)
    val fpMid = fpIdx.corpus.count()
    val fpIdx2 = graft.dedup.FingerprintIndex.open(spark, s"$work/fpidx")
    fpIdx2.ingest("w2", fps.where(col("doc_id") >= 250), "h", "doc_id",
      maxHamming = 2)
    println(s"== fingerprint index: corpus $fpMid -> " +
      s"${fpIdx2.corpus.count()} admitted of " +
      s"${fpIdx2.bandRows.count() / 4} seen across a reopen, " +
      s"v${fpIdx2.version}")
    val bIdx = graft.pipeline.BoilerplateIndex
      .open(spark, s"$work/boilidx", width = 3)
    bIdx.ingest("w1", pdocs.where(col("doc_id") < 250), "text", "doc_id")
    bIdx.ingest("w2", pdocs.where(col("doc_id") >= 250), "text", "doc_id")
    val bDict = bIdx.boilerplateGrams(minDocs = 3L).count()
    val bHot = bIdx.ratio(pdocs, "text", "doc_id", minDocs = 3L)
      .where(col("boiler_ratio") > 0.5).count()
    println(s"== boilerplate index: $bDict standing grams at df>=3, " +
      s"$bHot docs over 50% boilerplate, v${bIdx.version}")

    // 16. The round-18 artifacts, driven across a reopen like their
    // siblings: the standing DSIR model (target ingested once, raw
    // accumulated in two waves, every batch scored against the
    // standing dictionary) and the versioned eval-set dictionary
    // (two suites registered, the corpus decontaminated against the
    // union).
    val dsirIdx = graft.pipeline.DsirIndex
      .open(spark, s"$work/dsiridx", buckets = 256, alpha = 0.5)
    dsirIdx.ingestTarget("tgt",
      pdocs.where(col("doc_id") % 5 === 0), "text")
    dsirIdx.ingestRaw("w1",
      pdocs.where(col("doc_id") % 5 =!= 0 && col("doc_id") < 250), "text")
    val dsirIdx2 = graft.pipeline.DsirIndex.open(spark, s"$work/dsiridx")
    dsirIdx2.ingestRaw("w2",
      pdocs.where(col("doc_id") % 5 =!= 0 && col("doc_id") >= 250), "text")
    val scored = dsirIdx2.score(
      pdocs.where(col("doc_id") % 5 =!= 0), "text", "doc_id")
    require(scored.where(col("dsir_logw").isNull).count() == 0,
      "unscored raw doc")
    println(s"== dsir index: ${scored.count()} docs scored against the " +
      s"standing dictionary across a reopen, v${dsirIdx2.version}")
    val evIdx = graft.pipeline.EvalIndex
      .open(spark, s"$work/evalidx", width = 3)
    evIdx.ingest("suite-a", pdocs.where(col("doc_id") % 10 === 0), "text")
    evIdx.ingest("suite-b", pdocs.where(col("doc_id") % 10 === 5), "text")
    val evCorpus =
      pdocs.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val evClean = evIdx
      .decontaminate(evCorpus, "text", "doc_id", minOverlap = 4)
      .count()
    require(evIdx.appliedVersion("suite-a").isDefined &&
      evIdx.appliedVersion("suite-b").isDefined, "suite journal missing")
    println(s"== eval index: ${evIdx.keys.count()} standing grams from " +
      s"2 suites, corpus ${evCorpus.count()} -> $evClean clean at " +
      s"overlap>=4, v${evIdx.version}")

    println("== DEMO OK")
    spark.stop()
  }
}
