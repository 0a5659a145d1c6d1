package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{Ann, Quantize}

/** Recall-vs-cost curves for the approximate ANN tiers (VERDICT r14
  * task 3) — the number a user tuning a 100-TB index asks for first:
  * recall@10 against exact [[Ann.cosineTopK]] ground truth, per
  * `nprobe` for [[Ann.ivfTopK]] and per `(bits, probeHamming)` for
  * [[Ann.lshTopK]], alongside the fraction of the corpus each config
  * actually scans (the cost the recall buys).
  *
  * TWO corpus geometries, because recall curves are geometry, not
  * implementation:
  *
  *  - `fixture`: the sf0.1 embeddings table tiled 10× (20k vectors)
  *    with small deterministic jitter, queries' own replica families
  *    excluded from truth. The fixture is measured ISOTROPIC (mean
  *    same-label cosine ≈ 0, top-10 neighbor cosine ≈ 0.35), so this
  *    is the worst-case regime — on near-random vectors NO bucketing
  *    scheme beats `recall ≈ scanned fraction` by much; the curve
  *    records how much residual lift the tiers still extract.
  *  - `clustered`: [[Ann.clusteredCorpus]] (64 hash-derived cluster
  *    centers, tunable noise) — the regime real embedding corpora
  *    live in and the one a recall floor can be pinned in
  *    (AnnIndexSpec pins recall@10 at the documented defaults on this
  *    geometry).
  *
  * Run manually (`Test/runMain graft.tools.AnnProbe [mode] [sigma]`);
  * results recorded in BASELINE.md.
  */
object AnnProbe {

  private val K = 10

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = args.headOption.getOrElse("both")
    val sigma = args.drop(1).headOption.map(_.toDouble).getOrElse(0.8)
    if (mode == "fixture" || mode == "both") runFixture(spark)
    if (mode == "clustered" || mode == "both") runClustered(spark, sigma)
    if (mode == "production") runProductionPq(spark, sigma)
    spark.stop()
  }

  /** PQ at PRODUCTION geometry — m=16, ksub=256 on 256-dim vectors
    * (VERDICT r15 task 3): 4096 sub-centroids exercise the native
    * [[graft.functions.PqCodes]] encode fork (default literalMax=128)
    * and [[Quantize.pqTopKBatch]]'s Q×M×ksub closure LUTs; the bytes
    * table is the 100 TB story (16 code bytes/vec vs 256 int8 vs 1024
    * float32). */
  private def runProductionPq(spark: SparkSession, sigma: Double): Unit = {
    val n = 20000L
    val dims = 256
    val (m, ksub) = (16, 256)
    val k = K
    val corpus = Ann
      .clusteredCorpus(spark, n, clusters = 64, dims = dims, sigma = sigma)
      .localCheckpoint(true)
    println(s"== PRODUCTION PQ: $n vectors, $dims dims, 64 clusters, " +
      s"sigma=$sigma; m=$m ksub=$ksub (${m * ksub} sub-centroids, " +
      s"native encode); bytes/vec: float32=${dims * 4} int8=$dims pq=$m")
    val queries = Ann
      .clusteredCorpus(spark, n + 25, clusters = 64, dims = dims,
        sigma = sigma)
      .where(col("vec_id") >= n)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val truth = Ann
      .cosineTopKBatch(corpus, "embedding", "vec_id", queries, k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    def recallOf(f: Seq[Float] => Set[Long]): Double =
      queries.map { case (q, qv) =>
        f(qv).intersect(truth(q)).size.toDouble / k
      }.sum / queries.size
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cents = Ann.kmeansTrain(corpus, "embedding", "vec_id",
      (0L until 64L).toSeq, 5)
    val sorted = cents.toSeq.sortBy(_._1)
    val tTrain = timed {
      Quantize.pqTrain(corpus, "embedding", "vec_id", sorted, m, ksub,
        iters = 2)
    }
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id", sorted,
      m, ksub, iters = 2)
    val encoded = Quantize
      .pqEncode(corpus, "embedding", "vec_id", sorted, books)
      .localCheckpoint(true)
    val int8 = Quantize.int8(corpus, "embedding", "vec_id")
      .localCheckpoint(true)
    println(f"== train $tTrain%.1f s (m=$m subspaces, iters=2)")
    val int8Recall = recallOf(qv =>
      Quantize.cosineTopKInt8(int8, "q", "vec_id", qv, k)
        .collect().map(_.getLong(0)).toSet)
    println(f"${"int8 full-scan"}%22s recall@10 $int8Recall%6.3f " +
      f"(${dims} B/vec, whole corpus)")
    println(f"${"config"}%22s ${"recall@10"}%10s")
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val adc = recallOf(qv =>
        Quantize.pqTopK(encoded, "vec_id", qv, k, cents, books, nprobe)
          .collect().map(_.getLong(0)).toSet)
      val rr = recallOf(qv =>
        Quantize.pqTopKRerank(encoded, corpus, "embedding", "vec_id",
            qv, k, cents, books, nprobe)
          .collect().map(_.getLong(0)).toSet)
      val rr40 = recallOf(qv =>
        Quantize.pqTopKRerank(encoded, corpus, "embedding", "vec_id",
            qv, k, cents, books, nprobe, shortlist = 40 * k)
          .collect().map(_.getLong(0)).toSet)
      println(f"${s"pq adc nprobe=$nprobe"}%22s $adc%10.3f")
      println(f"${s"pq rerank nprobe=$nprobe"}%22s $rr%10.3f")
      println(f"${s"pq rerank400 nprobe=$nprobe"}%22s $rr40%10.3f")
    }
    // batched ADC: Q queries, each query's 16×256 LUT in the closure
    val seq = timed(queries.foreach { case (_, qv) =>
      Quantize.pqTopK(encoded, "vec_id", qv, k, cents, books, 2).collect()
    })
    val bat = timed(
      Quantize.pqTopKBatch(encoded, "vec_id", queries, k, cents, books, 2)
        .collect())
    println(f"== batched PQ probe: ${queries.size} queries sequential " +
      f"$seq%.2f s vs one batch pass $bat%.2f s (${seq / bat}%.1fx; " +
      f"${queries.size}x${m}x$ksub LUT doubles in the closure)")
  }

  /** Shared curve runner: exact truth once, then the IVF and LSH
    * sweeps. `familyOf` maps an id to its replica family (ground truth
    * and results exclude the query's own family; identity = keep
    * everything). */
  private def runCurves(
      spark: SparkSession,
      corpus: DataFrame,
      queries: Seq[(Long, Seq[Float])],
      familyOf: Long => Long,
      queryFamily: Long => Long
  ): Unit = {
    val nTotal = corpus.count()
    val fetch = K + 16 // headroom for family exclusion
    def topK(qid: Long, rows: Seq[(Long, Double)]): Set[Long] =
      rows.filter(r => familyOf(r._1) != queryFamily(qid))
        .sortBy { case (id, s) => (-s, id) }
        .take(K).map(_._1).toSet
    val truth = Ann
      .cosineTopKBatch(corpus, "embedding", "vec_id", queries, fetch)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> topK(q, rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq)
      }
    def recallOf(got: Map[Long, Set[Long]]): Double =
      queries.map { case (qid, _) =>
        got.getOrElse(qid, Set.empty)
          .intersect(truth(qid)).size.toDouble / K
      }.sum / queries.size
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ── IVF: recall@10 vs nprobe ─────────────────────────────────────
    val kCells = 64
    val init = corpus.select("vec_id").orderBy("vec_id")
      .limit(kCells).collect().map(_.getLong(0)).toSeq
    val cents = Ann.kmeansTrain(corpus, "embedding", "vec_id", init, 5)
    val assigned = Ann
      .ivfAssignVectors(corpus, "embedding", "vec_id",
        cents.toSeq.sortBy(_._1))
      .localCheckpoint(true)
    val cellSizes = assigned.groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"== IVF k=$kCells cells, ${cellSizes.size} occupied")
    println(f"${"nprobe"}%8s ${"recall@10"}%10s ${"scanned"}%9s ${"s/query"}%8s")
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    for (nprobe <- Seq(1, 2, 4, 8, 16, 32)) {
      val (got, secs) = timed {
        queries.map { case (qid, qv) =>
          qid -> topK(qid, Ann
            .ivfTopK(assigned, "embedding", "vec_id", qv, fetch, cents,
              nprobe)
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
        }.toMap
      }
      val scanned = queries.map { case (_, qv) =>
        cents.toSeq.sortBy { case (cid, cv) => (d2(qv, cv), cid) }
          .take(nprobe).map(c => cellSizes.getOrElse(c._1, 0L)).sum.toDouble
      }.sum / queries.size / nTotal
      println(f"$nprobe%8d ${recallOf(got)}%10.3f ${scanned}%9.3f " +
        f"${secs / queries.size}%8.3f")
    }

    // ── LSH: recall@10 vs (bits, probeHamming) ───────────────────────
    for (bits <- Seq(8, 12, 16)) {
      val bucketed = Ann.lshBuckets(corpus, "embedding", "vec_id", bits)
        .localCheckpoint(true)
      val bSizes = bucketed.groupBy("bucket").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"== LSH bits=$bits, ${bSizes.size} occupied buckets")
      println(f"${"probeH"}%8s ${"recall@10"}%10s ${"scanned"}%9s ${"s/query"}%8s")
      for (probeH <- Seq(0, 1, 2)) {
        val (got, secs) = timed {
          queries.map { case (qid, qv) =>
            qid -> topK(qid, Ann
              .lshTopK(bucketed, "embedding", "vec_id", qv, fetch, bits,
                probeH)
              .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
          }.toMap
        }
        val scanned = queries.map { case (_, qv) =>
          val sig = Ann.signatureOf(qv, bits)
          Ann.hammingNeighbors(sig, bits, probeH)
            .map(b => bSizes.getOrElse(b, 0L)).sum.toDouble
        }.sum / queries.size / nTotal
        println(f"$probeH%8d ${recallOf(got)}%10.3f ${scanned}%9.3f " +
          f"${secs / queries.size}%8.3f")
      }
    }
  }

  private def runFixture(spark: SparkSession): Unit = {
    val replicas = 10
    val nQueries = 25
    val base = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val nBase = base.count()
    // replica r of vector v: id = v + r*nBase; each dim jittered by a
    // hash-derived offset in [-0.01, 0.01] — noise well inside
    // neighbor spacing, so replicas are near-duplicates
    val corpus = base
      .crossJoin(spark.range(replicas).select(col("id").as("_r")))
      .select(
        (col("vec_id") + col("_r") * nBase).as("vec_id"),
        transform(col("embedding"),
          (x, d) =>
            (x + when(col("_r") === 0, lit(0.0f)).otherwise(
              (pmod(col("vec_id") * 131 + col("_r") * 31 + d * 17, lit(21))
                - 10).cast("float") / 1000.0f)).cast("float")
        ).as("embedding"))
      .localCheckpoint(true)
    println(s"== FIXTURE corpus: ${corpus.count()} vectors " +
      s"($replicas x $nBase), isotropic geometry")
    val stride = (nBase / nQueries).max(1)
    val queries = base
      .where(pmod(col("vec_id"), lit(stride)) === 0 &&
        col("vec_id") < stride * nQueries)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq
    runCurves(spark, corpus, queries,
      familyOf = _ % nBase, queryFamily = _ % nBase)
  }

  private def runClustered(spark: SparkSession, sigma: Double): Unit = {
    val n = 20000L
    val corpus = Ann
      .clusteredCorpus(spark, n, clusters = 64, dims = 64, sigma = sigma)
      .localCheckpoint(true)
    println(s"== CLUSTERED corpus: $n vectors, 64 clusters, sigma=$sigma")
    // held-out queries: same generator, ids past the corpus (fresh
    // noise draws around the same centers)
    val queries = Ann
      .clusteredCorpus(spark, n + 25, clusters = 64, dims = 64,
        sigma = sigma)
      .where(col("vec_id") >= n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq
    runCurves(spark, corpus, queries,
      familyOf = identity, queryFamily = _ => -1L)

    // ── batched probes: Q queries in one pass vs Q sequential jobs ──
    {
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val cents0 = Ann.kmeansTrain(corpus, "embedding", "vec_id",
        (0L until 64L).toSeq, 5)
      val assigned0 = Ann
        .ivfAssignVectors(corpus, "embedding", "vec_id",
          cents0.toSeq.sortBy(_._1))
        .localCheckpoint(true)
      val seq = timed(queries.foreach { case (_, qv) =>
        Ann.ivfTopK(assigned0, "embedding", "vec_id", qv, 10, cents0, 2)
          .collect()
      })
      val bat = timed(
        Ann.ivfTopKBatch(assigned0, "embedding", "vec_id", queries, 10,
          cents0, 2).collect())
      println(f"== batched IVF probe: ${queries.size} queries " +
        f"sequential $seq%.2f s vs one batch pass $bat%.2f s " +
        f"(${seq / bat}%.1fx)")
    }

    // ── compressed tiers: IVF-PQ (ADC + reranked) vs int8 ───────────
    // recall@10 per byte of vector read: int8 full-scan reads
    // dims bytes/vector over the WHOLE corpus; PQ reads M code bytes
    // over the probed cells only, + dims×4 bytes for the reranked
    // shortlist
    val k = K
    val fetch = K
    val truth = Ann
      .cosineTopKBatch(corpus, "embedding", "vec_id", queries, k)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    def recallOf(f: Seq[Float] => Set[Long]): Double =
      queries.map { case (q, qv) =>
        f(qv).intersect(truth(q)).size.toDouble / k
      }.sum / queries.size
    val cents = Ann.kmeansTrain(corpus, "embedding", "vec_id",
      (0L until 64L).toSeq, 5)
    val centsSorted = cents.toSeq.sortBy(_._1)
    val (m, ksub) = (8, 64)
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      centsSorted, m, ksub, iters = 2)
    val encoded = Quantize
      .pqEncode(corpus, "embedding", "vec_id", centsSorted, books)
      .localCheckpoint(true)
    val int8 = Quantize.int8(corpus, "embedding", "vec_id")
      .localCheckpoint(true)
    println(s"== compressed tiers (64 dims): int8 = 64 B/vec full scan; " +
      s"PQ m=$m ksub=$ksub = $m B/vec probed cells only")
    val int8Recall = recallOf(qv =>
      Quantize.cosineTopKInt8(int8, "q", "vec_id", qv, fetch)
        .collect().map(_.getLong(0)).toSet)
    println(f"${"int8 full-scan"}%22s recall@10 $int8Recall%6.3f")
    println(f"${"config"}%22s ${"recall@10"}%10s")
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val adc = recallOf(qv =>
        Quantize.pqTopK(encoded, "vec_id", qv, fetch, cents, books, nprobe)
          .collect().map(_.getLong(0)).toSet)
      val rr = recallOf(qv =>
        Quantize.pqTopKRerank(encoded, corpus, "embedding", "vec_id",
            qv, k, cents, books, nprobe)
          .collect().map(_.getLong(0)).toSet)
      val rr40 = recallOf(qv =>
        Quantize.pqTopKRerank(encoded, corpus, "embedding", "vec_id",
            qv, k, cents, books, nprobe, shortlist = 40 * k)
          .collect().map(_.getLong(0)).toSet)
      println(f"${s"pq adc nprobe=$nprobe"}%22s $adc%10.3f")
      println(f"${s"pq rerank nprobe=$nprobe"}%22s $rr%10.3f")
      println(f"${s"pq rerank400 nprobe=$nprobe"}%22s $rr40%10.3f")
    }
  }
}
