package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Importance

/** DSIR importance weights + resample: exact agreement with an
  * independent driver-side reference implementation, degenerate
  * inputs, direction sanity, and the broadcast/top-k plan shape. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64
  private val Alpha = 0.5

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def md5Hash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  private def grams(text: String): Seq[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    toks ++ (if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
             else Nil)
  }

  /** The reference: same formulas, none of the engine code. */
  private def refWeights(
      raw: Seq[(Long, String)], target: Seq[(Long, String)]
  ): Map[Long, Double] = {
    def buckets(docs: Seq[(Long, String)]): Seq[Long] =
      docs.filter(_._2.trim.nonEmpty)
        .flatMap(d => grams(d._2))
        .map(g => md5Hash(g + ":dsir") % B)
    val tb = buckets(target).groupBy(identity).map { case (k, v) => k -> v.size }
    val rb = buckets(raw).groupBy(identity).map { case (k, v) => k -> v.size }
    val tDen = tb.values.sum + Alpha * B
    val rDen = rb.values.sum + Alpha * B
    def lr(b: Long): Double = round6(
      math.log((tb.getOrElse(b, 0) + Alpha) / tDen) -
        math.log((rb.getOrElse(b, 0) + Alpha) / rDen))
    raw.filter(_._2.trim.nonEmpty)
      .filter(d => grams(d._2).nonEmpty)
      .map { case (id, text) =>
        val lrs = grams(text).map(g => lr(md5Hash(g + ":dsir") % B))
        id -> round6(lrs.sorted.foldLeft(0.0)(_ + _))
      }.toMap
  }

  private val targetDocs = Seq(
    100L -> "alpha beta gamma delta epsilon",
    101L -> "alpha beta gamma again and again",
    102L -> "beta gamma delta prose flows nicely here")
  private val rawDocs = Seq(
    1L -> "alpha beta gamma delta", // target-like
    2L -> "zzz qqq vvv kkk jjj xxx", // junk
    3L -> "alpha beta gamma again", // target-like
    4L -> "mixed bag alpha zzz beta qqq",
    5L -> " ", // blank: never scored
    6L -> "alpha") // single token: unigram feature only

  test("dsirLogWeights equals the driver-side reference exactly") {
    val got = Importance.dsirLogWeights(
      rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
      "text", "doc_id", buckets = B, bigrams = true, alpha = Alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refWeights(rawDocs, targetDocs)
    assert(got == want)
    // direction sanity: the target clone outranks pure junk
    assert(got(1L) > got(2L))
  }

  test("the plain-sum production path agrees with the sorted fold") {
    val det = Importance.dsirLogWeights(
      rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
      "text", "doc_id", buckets = B, alpha = Alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = Importance.dsirLogWeights(
      rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
      "text", "doc_id", buckets = B, alpha = Alpha, deterministic = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(det.keySet == fast.keySet)
    det.foreach { case (id, w) =>
      assert(math.abs(fast(id) - w) < 1e-6, s"doc $id: $w vs ${fast(id)}")
    }
  }

  test("empty target or empty raw → the empty frame, loudly typed") {
    val raw = rawDocs.toDF("doc_id", "text")
    val blank = Seq(9L -> "  ").toDF("doc_id", "text")
    val a = Importance.dsirLogWeights(raw, blank, "text", "doc_id",
      buckets = B, alpha = Alpha)
    assert(a.columns.toSeq == Seq("doc_id", "dsir_logw") && a.count() == 0)
    val b = Importance.dsirLogWeights(blank, raw, "text", "doc_id",
      buckets = B, alpha = Alpha)
    assert(b.count() == 0)
  }

  test("a persisted dictionary scores batches identically to the one-shot") {
    val raw = rawDocs.toDF("doc_id", "text")
    val target = targetDocs.toDF("doc_id", "text")
    val dict = Importance.dsirDict(raw, target, "text",
      buckets = B, alpha = Alpha).get
    // round-trip through parquet — the steady-state ingest shape
    val dir = tmpDir("dsir-dict-")
    dict.write.mode("overwrite").parquet(dir)
    val standing = spark.read.parquet(dir)
    val oneShot = Importance.dsirLogWeights(raw, target, "text", "doc_id",
      buckets = B, alpha = Alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scored whole and in two batches — identical either way (a
    // batch's weight depends on nothing but the batch and the dict)
    val whole = Importance.dsirScoreWith(raw, standing, "text", "doc_id",
      buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(whole == oneShot)
    val batched = Seq(0, 1).flatMap { p =>
      Importance.dsirScoreWith(raw.where(col("doc_id") % 2 === p),
        standing, "text", "doc_id", buckets = B)
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
    }.toMap
    assert(batched == oneShot)
    // no model → None, loudly
    assert(Importance.dsirDict(raw, raw.where(lit(false)), "text",
      buckets = B, alpha = Alpha).isEmpty)
    // mismatched knobs are refused, not silently mis-bucketed
    intercept[IllegalArgumentException](
      Importance.dsirScoreWith(raw, standing, "text", "doc_id",
        buckets = B * 2))
    intercept[IllegalArgumentException](
      Importance.dsirScoreWith(raw, standing, "text", "doc_id",
        buckets = B, seed = "other"))
  }

  test("dsirSample draws the k smallest log-space priorities") {
    val w = refWeights(rawDocs, targetDocs)
    val want = w.toSeq.map { case (id, lw) =>
      val u = (md5Hash(id + ":s0") + 1).toDouble / 4294967296.0
      (round6(math.log(u)) - lw, id)
    }.sorted.take(3).map(_._2).sorted
    val got = Importance.dsirSample(
      rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
      "text", "doc_id", k = 3, buckets = B, alpha = Alpha)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // k beyond the population → every scored doc (blank never scored)
    val all = Importance.dsirSample(
      rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
      "text", "doc_id", k = 100, buckets = B, alpha = Alpha)
    assert(all.count() == w.size)
  }

  test("plan shape: broadcast dictionary, top-k sample, no cartesian") {
    val wPlan = Importance.dsirLogWeights(
      rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
      "text", "doc_id", buckets = B, alpha = Alpha)
      .queryExecution.executedPlan.toString
    assert(wPlan.contains("BroadcastHashJoin"),
      s"dict join is not broadcast:\n$wPlan")
    assert(!wPlan.contains("CartesianProduct"))
    val sPlan = Importance.dsirSample(
      rawDocs.toDF("doc_id", "text"), targetDocs.toDF("doc_id", "text"),
      "text", "doc_id", k = 3, buckets = B, alpha = Alpha)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("TakeOrderedAndProject"),
      s"sample is not a planned top-k:\n$sPlan")
  }
}
