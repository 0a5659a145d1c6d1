package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, Quantize}

/** IVF-PQ tier: codebook shapes, the ADC-score/reconstruction
  * identity (the arithmetic contract the q112 oracle replays in SQL),
  * and a recall floor against exact cosine on clustered geometry.
  */
class PqSpec extends SparkSpec {

  private val dims = 32
  private val m = 8
  private val ksub = 16

  private lazy val corpus = Ann
    .clusteredCorpus(spark, 4000L, clusters = 32, dims = dims, sigma = 0.8)
    .localCheckpoint(true)

  private lazy val cents = Ann
    .kmeansTrain(corpus, "embedding", "vec_id", (0L until 32L).toSeq, 3)

  test("pqTrain: codebook shape, deterministic across invocations") {
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    assert(books.size == m)
    assert(books.forall(_.size == ksub))
    assert(books.forall(_.forall(_.size == dims / m)))
    val again = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    assert(books == again, "training is deterministic — no RNG state")
  }

  test("ADC score is exactly the reconstruction dot over the norms") {
    // the numerator of every pqTopK score must equal
    // dot(q, cent(cell) ++ books(codes)) — the identity that makes the
    // compressed tier's arithmetic auditable (and SQL-replayable)
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    val encoded = Quantize.pqEncode(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), books).localCheckpoint(true)
    val qv = corpus.where(col("vec_id") === 4001L % 4000L)
      .select("embedding").head().getSeq[Float](0)
    val qNorm = math.sqrt(qv.map(v => v.toDouble * v.toDouble).sum)
    val got = Quantize
      .pqTopK(encoded, "vec_id", qv, 50, cents, books, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    val rows = encoded
      .where(col("vec_id").isin(got.keys.toSeq: _*))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2),
        r.getDouble(3)))
    assert(rows.length == got.size)
    rows.foreach { case (id, cell, codes, vnorm) =>
      val recon = Quantize.pqReconstruct(cell, codes, cents, books)
      val num = qv.indices.map(d => qv(d).toDouble * recon(d)).sum
      val want = BigDecimal(num / (vnorm * qNorm))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == want,
        s"ADC score for $id diverges: got ${got(id)}, want $want")
    }
  }

  test("native PqCodes equals the literal argmin bit-for-bit, flat plan") {
    // the production encode (books as ONE float[][][] reference
    // object, all m codes in one residual pass) must agree with the
    // literal struct-argmin oracle surface on every row — including
    // ties, which both break to the LOWEST code — and keep the plan
    // flat in m×ksub where the literal form carries every
    // sub-centroid as plan text
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    def run(litMax: Int) = Quantize
      .pqEncode(corpus, "embedding", "vec_id", cents.toSeq.sortBy(_._1),
        books, literalMax = litMax)
    val literal = run(Int.MaxValue)
    val native = run(0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList,
        r.getDouble(3))).toSet
    assert(rows(native) == rows(literal),
      "native PqCodes diverges from the literal argmin")
    val natPlan = native.queryExecution.executedPlan.toString
    val litPlan = literal.queryExecution.executedPlan.toString
    assert(natPlan.contains("pq_codes"), s"native path not planned:\n$natPlan")
    // both plans share the residual subtree; the literal form adds
    // m×ksub sub-centroids of plan text on top (here ~4× total, and
    // growing linearly in ksub where the native form is constant)
    assert(natPlan.length < litPlan.length / 2,
      s"native plan not flat: ${natPlan.length} vs literal ${litPlan.length}")
  }

  test("pqTopKBatch equals per-query pqTopK, including ties") {
    // one pass over the union of probed cells, per-query ADC LUTs in
    // the closure — results must be row-identical to pqTopK (same
    // probe rule, same ADC accumulation order, same rounding/ties)
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    val encoded = Quantize.pqEncode(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), books).localCheckpoint(true)
    val queries = Ann
      .clusteredCorpus(spark, 4005L, clusters = 32, dims = dims, sigma = 0.8)
      .where(col("vec_id") >= 4000L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val batch = Quantize
      .pqTopKBatch(encoded, "vec_id", queries, 7, cents, books, nprobe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1)).toSeq
      }
    queries.foreach { case (qid, qv) =>
      val single = Quantize
        .pqTopK(encoded, "vec_id", qv, 7, cents, books, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single,
        s"batch diverges from pqTopK for query $qid")
    }
  }

  test("pq codes are in range and encode covers every row") {
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 0)
    val encoded = Quantize.pqEncode(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), books)
    val stats = encoded.select(
      count(lit(1)).as("n"),
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi"),
      min(size(col("codes"))).as("mlo"),
      max(size(col("codes"))).as("mhi")).head()
    assert(stats.getLong(0) == 4000L)
    assert(stats.getInt(1) >= 0 && stats.getInt(2) < ksub)
    assert(stats.getInt(3) == m && stats.getInt(4) == m)
  }

  test("pqIndexTopK matches in-memory pqTopK and prunes partitions") {
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    val path = tmpDir("pqidx") + "/idx"
    Quantize.writePqIndex(corpus, "embedding", "vec_id", path,
      cents.toSeq.sortBy(_._1), books)
    val qv = corpus.where(col("vec_id") === 7L)
      .select("embedding").head().getSeq[Float](0)
    val mem = Quantize
      .pqTopK(Quantize.pqEncode(corpus, "embedding", "vec_id",
          cents.toSeq.sortBy(_._1), books),
        "vec_id", qv, 10, cents, books, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val disk = Quantize.pqIndexTopK(spark, path, "vec_id", qv, 10,
      cents, books, nprobe = 2)
    assert(disk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == mem)
    // the probed cells must reach the scan as PartitionFilters: the
    // plan reads 2 of 32 cell directories, never the whole index
    val plan = disk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell probe not pushed to partition pruning:\n$plan")
    val scanned = disk.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.exists(_ <= 2), s"scanned $scanned partitions, want <=2")
  }

  test("recall@10 floor vs exact cosine on clustered geometry") {
    // the compressed tier must still FIND the neighbors: with M=8
    // sub-bytes standing in for 32 floats (16× fewer vector bytes than
    // float32, 4× fewer than int8), recall@10 at nprobe=4 measures
    // ≈0.9+ on this deterministic corpus; 0.8 floors a real break
    // (wrong residual, wrong LUT indexing, wrong probe rule) without
    // riding the quantization noise
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    val encoded = Quantize.pqEncode(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), books).localCheckpoint(true)
    val queries = Ann
      .clusteredCorpus(spark, 4010L, clusters = 32, dims = dims, sigma = 0.8)
      .where(col("vec_id") >= 4000L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val truth = Ann
      .cosineTopKBatch(corpus, "embedding", "vec_id", queries, 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recallOf(f: Seq[Float] => Set[Long]): Double =
      queries.map { case (q, qv) =>
        f(qv).intersect(truth(q)).size.toDouble / 10
      }.sum / queries.size
    // raw ADC: quantization distortion reorders close neighbors —
    // measures ≈0.5 here; 0.35 floors total breakage (wrong residual,
    // wrong LUT indexing, wrong probe rule) without riding the noise
    val adc = recallOf(qv =>
      Quantize.pqTopK(encoded, "vec_id", qv, 10, cents, books, nprobe = 4)
        .collect().map(_.getLong(0)).toSet)
    assert(adc >= 0.35, s"raw ADC recall@10 fell to $adc")
    // the production finish — ADC shortlist, exact re-rank of the
    // survivors only — must recover plain-IVF recall at the same
    // nprobe (measures ≈1.0 here)
    val reranked = recallOf(qv =>
      Quantize.pqTopKRerank(encoded, corpus, "embedding", "vec_id",
          qv, 10, cents, books, nprobe = 4)
        .collect().map(_.getLong(0)).toSet)
    assert(reranked >= 0.9, s"reranked pq recall@10 fell to $reranked")
    assert(reranked >= adc, "rerank made recall WORSE")
    // the shortlist fetch tiers (pushed IN literal vs broadcast
    // semi-join above the gate) must return identical rows
    val (qid, qv) = queries.head
    def rerank(gate: Int) = Quantize
      .pqTopKRerank(encoded, corpus, "embedding", "vec_id", qv, 10,
        cents, books, nprobe = 4, maxInLiteralIds = gate)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rerank(0) == rerank(1000),
      "shortlist fetch tiers diverge")
  }

  test("over-gate rerank plans ONE ADC scan (shortlist from checkpoint)") {
    // the shortlist frame is localCheckpointed inside pqTopKRerank, so
    // the over-gate broadcast semi-join's build side is a scan of the
    // checkpointed blocks — NOT a second planning of the probed-cell
    // ADC pipeline (which the gate-count collect already executed).
    // The ADC's signature in a plan is the per-row `codes` lookup
    // arithmetic; the exact-rerank tier scores with the native float
    // dot (printed `floatvecdot`) instead, so the final plan must
    // carry the latter and none of the former.
    val books = Quantize.pqTrain(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), m, ksub, iters = 1)
    val encoded = Quantize.pqEncode(corpus, "embedding", "vec_id",
      cents.toSeq.sortBy(_._1), books).localCheckpoint(true)
    val qv = corpus.where(col("vec_id") === 7L)
      .select("embedding").head().getSeq[Float](0)
    val out = Quantize.pqTopKRerank(encoded, corpus, "embedding",
      "vec_id", qv, 10, cents, books, nprobe = 4,
      maxInLiteralIds = 0) // force the over-gate branch
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"over-gate build side is not the checkpointed shortlist:\n$plan")
    assert(!plan.contains("codes"),
      s"ADC pipeline re-planned under the semi-join:\n$plan")
    assert(plan.contains("floatvecdot"),
      s"exact rerank tier missing from the final plan:\n$plan")
    assert(out.count() == 10L)
  }

  test("production geometry (m=16, ksub=256, 256 dims): native encode " +
      "by default, batch ≡ per-query, rerank recall floor") {
    // the scaladoc sells m=16/ksub=256 on high-dim vectors; this pins
    // that geometry end to end: 4096 sub-centroids sit far above the
    // default literalMax, so the DEFAULT encode path is the native
    // PqCodes expression, and pqTopKBatch ships Q×16×256 closure LUTs
    val pDims = 256
    val pM = 16
    val pKsub = 256
    val pCorpus = Ann
      .clusteredCorpus(spark, 4000L, clusters = 32, dims = pDims,
        sigma = 0.8)
      .localCheckpoint(true)
    val pCents = Ann.kmeansTrain(pCorpus, "embedding", "vec_id",
      (0L until 32L).toSeq, 1)
    val sorted = pCents.toSeq.sortBy(_._1)
    val books = Quantize.pqTrain(pCorpus, "embedding", "vec_id",
      sorted, pM, pKsub, iters = 1)
    assert(books.size == pM && books.forall(_.size == pKsub))
    val encFrame = Quantize.pqEncode(pCorpus, "embedding", "vec_id",
      sorted, books) // default literalMax
    assert(encFrame.queryExecution.executedPlan.toString
        .contains("pq_codes"),
      "default encode at 4096 sub-centroids must take the native path")
    val encoded = encFrame.localCheckpoint(true)
    val queries = Ann
      .clusteredCorpus(spark, 4025L, clusters = 32, dims = pDims,
        sigma = 0.8)
      .where(col("vec_id") >= 4000L)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // batched ADC ≡ per-query ADC at production codebook scale
    val bat = Quantize
      .pqTopKBatch(encoded, "vec_id", queries, 10, pCents, books,
        nprobe = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.map(r => (r.getLong(1), r.getDouble(2))).toSet
      }
    queries.foreach { case (qid, qv) =>
      val one = Quantize
        .pqTopK(encoded, "vec_id", qv, 10, pCents, books, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(bat(qid) == one, s"batch diverges from pqTopK for $qid")
    }
    // the production finish holds its floor at production geometry
    val truth = Ann
      .cosineTopKBatch(pCorpus, "embedding", "vec_id", queries, 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val rerankRecall = queries.map { case (q, qv) =>
      Quantize.pqTopKRerank(encoded, pCorpus, "embedding", "vec_id",
          qv, 10, pCents, books, nprobe = 4)
        .collect().map(_.getLong(0)).toSet
        .intersect(truth(q)).size.toDouble / 10
    }.sum / queries.size
    assert(rerankRecall >= 0.9,
      s"rerank recall@10 at production geometry fell to $rerankRecall")
  }
}
