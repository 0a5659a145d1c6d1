package graft

import org.apache.spark.sql.functions._

import graft.sketch.Kmv

/** KMV distinct-count sketch: the sketch vs an independent Scala
  * reference, the merge law (union ≡ merged parts, exactly), estimate
  * accuracy on both branches, the mergeable-profile identity, and the
  * map-side-combine plan shape. */
class KmvSpec extends SparkSpec {

  /** Independent 60-bit hash: first 15 md5 hex chars, computed with
    * MessageDigest (not Spark). */
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  private def refSketch(vals: Seq[String], k: Int): Seq[Long] =
    vals.map(refHash).distinct.sorted.take(k)

  test("sketch equals the k smallest distinct reference hashes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicates on purpose: 400 draws from 150 distinct values
    val vals = Seq.fill(400)(s"doc-${rnd.nextInt(150)}")
    val df = vals.toDF("v").withColumn("g", lit("a"))
    val got = Kmv.sketch(df, Seq("g"), col("v"), k = 32)
      .select("kmv").as[Array[Long]].head().toSeq
    assert(got == refSketch(vals, 32))
    // below k the sketch holds every distinct hash
    val small = Kmv.sketch(df.limit(20), Seq("g"), col("v"), 1000)
      .select("kmv").as[Array[Long]].head().toSeq
    assert(small == refSketch(vals.take(20), 1000))
  }

  test("merge law: merged part sketches == sketch of the union, exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val parts = Seq.tabulate(3)(p =>
      // overlapping value ranges so the parts share hashes
      Seq.fill(300)((s"g${rnd.nextInt(2)}", s"v-${rnd.nextInt(500) + p * 100}")))
    val k = 64
    val partSketches = parts.map(rows =>
      Kmv.sketch(rows.toDF("g", "v"), Seq("g"), col("v"), k))
    val merged = Kmv.mergeSketches(
      partSketches.reduce(_ unionAll _), Seq("g"), "kmv", k)
      .orderBy("g").as[(String, Array[Long])].collect()
    val whole = Kmv.sketch(
      parts.flatten.toDF("g", "v"), Seq("g"), col("v"), k)
      .orderBy("g").as[(String, Array[Long])].collect()
    assert(merged.length == whole.length)
    merged.zip(whole).foreach { case ((g1, a), (g2, b)) =>
      assert(g1 == g2 && a.toSeq == b.toSeq, s"stratum $g1 diverges")
    }
  }

  test("estimate: exact below k, within KMV error bounds at k") {
    import spark.implicits._
    val k = 256
    // 20k distinct values: estimate branch; relative error should be
    // well inside 3/sqrt(k-2) ≈ 0.188
    val big = (0 until 20000).map(i => s"item-$i").toDF("v")
      .withColumn("g", lit("big"))
    val est = Kmv.sketch(big, Seq("g"), col("v"), k)
      .select(Kmv.estimate(col("kmv"), k)).as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15,
      s"estimate $est too far from 20000")
    // 100 distinct < k: exact
    val small = (0 until 100).map(i => s"s-$i").toDF("v")
      .withColumn("g", lit("small"))
    val exact = Kmv.sketch(small, Seq("g"), col("v"), k)
      .select(Kmv.estimate(col("kmv"), k)).as[Double].head()
    assert(exact == 100.0)
  }

  test("profile merge: per-batch profiles fold to the whole-corpus profile") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val docs = Seq.tabulate(600) { i =>
      (i.toLong, s"tok${rnd.nextInt(40)} tok${rnd.nextInt(40)} shared text ${rnd.nextInt(80)}",
        s"s${i % 3}")
    }.toDF("doc_id", "text", "src")
    val k = 48
    val parts = Seq(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 1))
    val merged = Kmv.mergeProfileSketches(
      parts.map(Kmv.profileSketch(_, "text", "src", k)).reduce(_ unionAll _),
      "src", k)
    val whole = Kmv.profileSketch(docs, "text", "src", k)
    val m = merged.orderBy("src")
      .as[(String, Long, Long, Array[Long], Array[Long])].collect()
    val w = whole.orderBy("src")
      .as[(String, Long, Long, Array[Long], Array[Long])].collect()
    assert(m.length == 3 && w.length == 3)
    m.zip(w).foreach { case ((s1, d1, t1, c1, v1), (s2, d2, t2, c2, v2)) =>
      assert(s1 == s2 && d1 == d2 && t1 == t2, s"counters diverge at $s1")
      assert(c1.toSeq == c2.toSeq, s"content sketch diverges at $s1")
      assert(v1.toSeq == v2.toSeq, s"vocab sketch diverges at $s1")
    }
  }

  test("sketch aggregation combines map-side (two-stage ObjectHashAggregate)") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (s"g${i % 4}", s"v$i")).toDF("g", "v")
      .repartition(4)
    val plan = Kmv.sketch(df, Seq("g"), col("v"), 32)
      .queryExecution.executedPlan.toString
    // partial + final: raw rows never cross the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2,
      s"expected two-stage object-hash aggregation:\n$plan")
  }
}
