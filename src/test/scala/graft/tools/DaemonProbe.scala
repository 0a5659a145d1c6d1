package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.DedupParams
import graft.streaming.{IngestConfig, IngestDaemon}

/** Steady-state cost of the managed ingest loop (VERDICT r14 task 2's
  * scale leg): per-batch wall time of [[IngestDaemon.processBatch]] —
  * gates + incremental exact/LSH dedup + TWO journaled commits — as
  * the standing corpus grows, vs the loose-parquet
  * `curateIncremental` lower bound from IncrementalScaleProbe. The
  * contract under test: batch cost is BATCH-bound (the standing
  * corpus never rescans or shuffles), so per-batch time stays flat as
  * the index grows from empty to `batches × batchSize` docs.
  *
  * Run manually: `Test/runMain graft.tools.DaemonProbe [batchSize]
  * [batches] [vec] [profile] [fp] [boil]`; the optional arg `vec` composes the
  * embedding near-dup tier (config.vecCol) into the measured loop:
  * each doc carries a deterministic hash-derived 32-dim embedding, a
  * SEPARATE 2% of each batch is planted as a VECTOR near-dup of the
  * previous batch (text-unique, so the text tier admits it and the
  * vector tier must drop it), and `vecBits = 16` sizes the bucket
  * geometry so per-bucket populations stay batch-bound (at 8 bits a
  * random 50k batch touches all 256 buckets and the probe fetch
  * approaches corpus-sized — the bits knob IS the scale story).
  * The optional arg `profile` composes the statistics tier
  * (config.profileStrataCol over 8 synthetic strata, k=1024): one
  * more batch-bound pass + a strata-sized commit per batch.
  * `fp` composes the HAMMING tier (config.fpCol, 64-bit hash-derived
  * fingerprints, a disjoint 2% planted hamming-1 vs the previous
  * batch so only this tier drops them); `boil` the standing
  * boilerplate dictionary. With all four flags the loop advances SIX
  * journaled stores (text index, vec index, profile, fingerprint,
  * boilerplate, seen) in one exactly-once step per batch.
  * Results recorded in BASELINE.md.
  */
object DaemonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batchSize = args.headOption.map(_.toLong).getOrElse(50000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val withVec = args.contains("vec")
    val withProfile = args.contains("profile")
    val withFp = args.contains("fp")
    val withBoil = args.contains("boil")
    // `rep` composes the Gopher repetition gate (one more native text
    // walk fused into the gate scan — the synthetic bodies pass its
    // thresholds, so it measures gate COST, not drops); `dsir`
    // composes the standing-DSIR tier at the production hash config
    // (xxhash64, B=8192, plain-sum scoring): per batch, one raw-side
    // count commit + one broadcast-scored pass over the admitted set.
    // With all six flags the loop advances SEVEN journaled stores +
    // seen in one exactly-once step per batch.
    val withRep = args.contains("rep")
    val withDsir = args.contains("dsir")
    // `compactEvery=N` composes the AUTOMATED MAINTENANCE policy into
    // the measured loop (r18 verdict task 1's long-run leg): the
    // segment/journal growth story the 8-large-batch legs cannot show
    // — run hundreds of SMALL batches with and without it and compare
    // the per-batch slope, the corpus read cost and the seen-store
    // file count at the end
    val compactEvery = args.collectFirst {
      case a if a.startsWith("compactEvery=") => a.split("=")(1).toInt
    }
    // `minor` switches the policy to version-preserving small-tail
    // folds (TableStore.compactSmall) — the fold cost should stay
    // batch-bound as the corpus grows, where the full fold's cost is
    // corpus-bound per trigger
    val minor = args.contains("minor")
    // `smallBytes=N` sets the minor-fold graduation threshold: folded
    // segments past it are never rewritten again, so fold cost
    // flattens once the standing corpus outgrows it (the property the
    // default 256 MB can't show at probe scale)
    val smallBytes = args.collectFirst {
      case a if a.startsWith("smallBytes=") => a.split("=")(1).toLong
    }

    // synthetic crawl: each doc is 40 hash-derived tokens (docs share
    // essentially NO shingles — a shared-boilerplate fixture would
    // make everything a near-dup of everything and measure the cap,
    // not the loop), plus a planted 2% near-dup rate against the
    // PREVIOUS batch (same body + a one-token suffix: jaccard ≈ 0.93,
    // found via the standing index — the steady-state dedup work)
    // every 4th token is an English marker word (so the language gate
    // admits the doc) surrounded by hash-derived tokens (so any
    // trigram still carries ≥2 doc-unique tokens — docs share no
    // shingles and the dedup work stays batch-bound)
    def body(seed: org.apache.spark.sql.Column) = concat_ws(" ",
      transform(sequence(lit(0), lit(39)), i =>
        when(pmod(i, lit(4)) === 0,
          element_at(
            array(lit("the"), lit("and"), lit("of"), lit("to")),
            (pmod(i, lit(16)) / 4 + 1).cast("int")))
          .otherwise(pmod(xxhash64(seed, i), lit(99991)).cast("string"))))
    // hash-derived 32-dim embedding of a seed id — deterministic, and
    // identical seeds give identical vectors (cosine 1.0), which is
    // how the vector plants pair with the previous batch
    def embedding(seed: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(31)), d =>
        ((pmod(xxhash64(seed, d), lit(2001)) - 1000).cast("double") / 1000.0)
          .cast("float"))
    def batchDf(b: Int) = {
      val lo = b.toLong * batchSize
      val base = spark.range(lo, lo + batchSize).select(
        col("id").as("doc_id"),
        // plant seed id-batchSize+1: that id is ≢0 mod 50, so the
        // previous batch holds its RAW body (a plant-of-a-plant would
        // chase a seed that never appeared)
        when(pmod(col("id"), lit(50)) === 0 && col("id") >= batchSize,
          concat(body(col("id") - batchSize + 1), lit(" trailing variant")))
          .otherwise(body(col("id")))
          .as("text"))
      val withSrc =
        if (!withProfile) base
        // 8 strata: the statistics tier sketches each batch per src
        else base.withColumn("src",
          concat(lit("s"), pmod(col("doc_id"), lit(8)).cast("string")))
      val withFph =
        if (!withFp) withSrc
        // a THIRD disjoint 2% (id ≡ 37 mod 50) carries a hamming-1
        // variant of a previous-batch id's raw fingerprint —
        // text-unique and vector-unique, only the Hamming tier drops it
        else withSrc.withColumn("fph",
          when(pmod(col("doc_id"), lit(50)) === 37 &&
              col("doc_id") >= batchSize,
            xxhash64(col("doc_id") - batchSize + 3, lit("fp"))
              .bitwiseXOR(lit(1L)))
            .otherwise(xxhash64(col("doc_id"), lit("fp"))))
      if (!withVec) withFph
      else withFph.withColumn("embedding",
        // a DISJOINT 2% (id ≡ 25 mod 50) reuses the embedding seed of
        // a previous-batch id that is ≢ 25 mod 50 (its vector is raw):
        // text-unique, vector-identical — only the vec tier drops it
        when(pmod(col("doc_id"), lit(50)) === 25 &&
            col("doc_id") >= batchSize,
          embedding(col("doc_id") - batchSize + 2))
          .otherwise(embedding(col("doc_id"))))
    }

    val dir = java.nio.file.Files.createTempDirectory("daemon-probe-").toString
    val daemon = IngestDaemon.open(spark, dir, IngestConfig(
      minQuality = 0.0, minTokens = 1, threshold = 0.35,
      params = DedupParams(numHashes = 8, bands = 4),
      vecCol = if (withVec) Some("embedding") else None,
      vecThreshold = 0.95, vecBits = 16,
      profileStrataCol = if (withProfile) Some("src") else None,
      profileK = 1024,
      fpCol = if (withFp) Some("fph") else None,
      fpMaxHamming = 2, fpBands = 4, fpBits = 64,
      boilerplate = withBoil,
      repetition = withRep,
      dsir = withDsir, dsirPortable = false, dsirDeterministic = false,
      compactEvery = compactEvery, compactTargetPartitions = 4,
      compactMinor = minor,
      compactSmallBytes = smallBytes.getOrElse(256L << 20)))
    // the DSIR target model: one out-of-band ingest of a synthetic
    // trusted corpus (distinct seed range), scanned exactly once ever
    if (withDsir)
      daemon.dsirIndex.get.ingestTarget("target",
        spark.range(-20000L, 0L).select(col("id").as("doc_id"),
          body(col("id")).as("text")),
        "text")
    println(s"== daemon probe: $batches batches x $batchSize docs" +
      (if (withVec) " + composed vector tier (bits=16)" else "") +
      (if (withProfile) " + composed profile tier (k=1024)" else "") +
      (if (withFp) " + composed fingerprint tier (4x16-bit bands)" else "") +
      (if (withBoil) " + composed boilerplate tier (width=3)" else "") +
      (if (withRep) " + composed repetition gate (Gopher thresholds)" else "") +
      (if (withDsir) " + composed DSIR tier (B=8192, xxhash64)" else ""))
    compactEvery.foreach(n => println(s"== auto-compact every $n batches" +
      (if (minor) " (MINOR: version-preserving small-tail folds)" else "")))
    println(f"${"batch"}%6s ${"corpus"}%9s ${"secs"}%7s ${"admitted"}%9s")
    val perBatch = new Array[Double](batches)
    // long runs (the maintenance leg) print every 10th batch; the
    // classic short legs keep their per-batch rows
    val stride = if (batches > 20) 10 else 1
    for (b <- 0 until batches) {
      val df = batchDf(b).localCheckpoint(true)
      val t0 = System.nanoTime()
      daemon.processBatch(s"b$b", df)
      perBatch(b) = (System.nanoTime() - t0) / 1e9
      if (b % stride == 0 || b == batches - 1 ||
          compactEvery.exists(b % _ == 0)) {
        val n = daemon.corpus.count()
        println(f"$b%6d $n%9d ${perBatch(b)}%7.2f ${n}%9d")
      }
    }
    if (batches > 20) {
      def med(a: Seq[Double]) = a.sorted.apply(a.size / 2)
      val q = batches / 4
      println(f"== per-batch medians by quarter: " +
        f"${med(perBatch.slice(0, q))}%.2f " +
        f"${med(perBatch.slice(q, 2 * q))}%.2f " +
        f"${med(perBatch.slice(2 * q, 3 * q))}%.2f " +
        f"${med(perBatch.slice(3 * q, batches))}%.2f s")
      val seenFiles = java.nio.file.Files
        .list(java.nio.file.Paths.get(dir, "seen", "data")).count()
      val t0 = System.nanoTime()
      val n = daemon.corpus.count()
      val readS = (System.nanoTime() - t0) / 1e9
      println(f"== end state: $seenFiles seen segment files, " +
        f"corpus read ($n docs) in $readS%.2f s")
    }
    println(s"== final index version ${daemon.index.version}, " +
      s"corpus ${daemon.corpus.count()} docs")
    daemon.fpIndex.foreach { fi =>
      println(s"== standing fingerprint index: ${fi.bandRows.count()} " +
        s"band rows, ${fi.corpus.count()} admitted, v${fi.version}")
    }
    daemon.boilIndex.foreach { bi =>
      println(s"== standing boilerplate dictionary: " +
        s"${bi.boilerplateGrams(2).count()} grams at df>=2, v${bi.version}")
    }
    daemon.profileIndex.foreach { pi =>
      val est = pi.profileEstimates
        .agg(sum("docs"), round(sum("est_distinct_docs"), 1)).collect()(0)
      println(s"== standing profile: ${est.getLong(0)} docs across " +
        s"${pi.profile.count()} strata, est distinct ${est.getDouble(1)}")
    }
    daemon.dsirIndex.foreach { di =>
      val scored = daemon.corpus.where(col("dsir_logw").isNotNull).count()
      println(s"== standing DSIR model: v${di.version}, " +
        s"$scored corpus docs carry weights")
    }
    spark.stop()
  }
}
