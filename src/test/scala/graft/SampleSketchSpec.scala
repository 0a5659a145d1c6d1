package graft

import org.apache.spark.sql.functions._

import graft.sketch.SampleSketch

/** Bottom-k value-sample sketch: reference agreement, the exact merge
  * law, quantile/mean estimation, null handling, and the two-stage
  * map-side-combine plan shape. */
class SampleSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Independent 60-bit hash (MessageDigest, not Spark). */
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  /** Reference bottom-k: smallest k id-hashes with min-value ties. */
  private def refSample(rows: Seq[(Long, Double)], k: Int): (Seq[Long], Seq[Double]) = {
    val byHash = rows
      .groupBy { case (id, _) => refHash(id.toString) }
      .map { case (h, vs) => h -> vs.map(_._2).min }
      .toSeq.sortBy(_._1).take(k)
    (byHash.map(_._1), byHash.map(_._2))
  }

  test("sketch equals the bottom-k reference, truncated and sorted") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map(i => i -> rnd.nextDouble() * 100)
    val df = rows.toDF("id", "v").withColumn("g", lit("a"))
    val got = SampleSketch
      .valueSketch(df, Seq("g"), col("id"), col("v"), k = 64)
      .collect().head
    val (wh, wv) = refSample(rows, 64)
    assert(got.getSeq[Long](1) == wh)
    assert(got.getSeq[Double](2) == wv)
    // below k the sample is the (hash-sorted) whole population
    val small = SampleSketch
      .valueSketch(df.limit(10), Seq("g"), col("id"), col("v"), k = 64)
      .collect().head
    assert(small.getSeq[Long](1).size == 10)
  }

  test("merge law: folded halves equal the whole-corpus sketch exactly") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 500L).map(i =>
      (i, rnd.nextDouble() * 50, if (i % 3 == 0) "x" else "y"))
    val df = rows.toDF("id", "v", "g")
    val k = 32
    val whole = SampleSketch
      .valueSketch(df, Seq("g"), col("id"), col("v"), k)
      .orderBy("g").collect()
    val halves = SampleSketch
      .valueSketch(df.where(col("id") % 2 === 0), Seq("g"), col("id"), col("v"), k)
      .unionByName(SampleSketch
        .valueSketch(df.where(col("id") % 2 =!= 0), Seq("g"), col("id"), col("v"), k))
    val merged = SampleSketch.mergeValueSketches(halves, Seq("g"), k)
      .orderBy("g").collect()
    assert(merged.map(_.toSeq).toSeq == whole.map(_.toSeq).toSeq)
  }

  test("quantile interpolation and mean match hand math; empty → null") {
    val df = Seq((1L, Array(4.0, 1.0, 3.0, 2.0))).toDF("id", "vs")
    def est(q: Double): Double = df
      .select(SampleSketch.estimateQuantile(col("vs"), q)).collect().head.getDouble(0)
    assert(est(0.0) == 1.0)
    assert(est(1.0) == 4.0)
    assert(est(0.5) == 2.5) // pos 1.5 → 2 + 0.5·(3−2)
    assert(est(0.25) == 1.75) // pos 0.75 → 1 + 0.75·(2−1)
    val mean = df.select(SampleSketch.estimateMean(col("vs")))
      .collect().head.getDouble(0)
    assert(mean == 2.5)
    val empty = Seq((1L, Array.empty[Double])).toDF("id", "vs")
      .select(
        SampleSketch.estimateQuantile(col("vs"), 0.5),
        SampleSketch.estimateMean(col("vs")))
      .collect().head
    assert(empty.isNullAt(0) && empty.isNullAt(1))
  }

  test("null ids and null values contribute nothing") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Double.valueOf(5.0)),
      (null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(9.0)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double]))
      .toDF("id", "v").withColumn("g", lit("a"))
    val got = SampleSketch
      .valueSketch(df, Seq("g"), col("id"), col("v"), k = 8)
      .collect().head
    assert(got.getSeq[Long](1) == Seq(refHash("1")))
    assert(got.getSeq[Double](2) == Seq(5.0))
  }

  test("aggregation combines map-side (two-stage ObjectHashAggregate)") {
    val df = spark.range(0, 1000, 1, 8)
      .select(col("id"), (col("id") % 7).cast("double").as("v"),
        (col("id") % 3).cast("string").as("g"))
    val plan = SampleSketch
      .valueSketch(df, Seq("g"), col("id"), col("v"), 16)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2,
      s"expected two-stage object-hash aggregation:\n$plan")
  }
}
