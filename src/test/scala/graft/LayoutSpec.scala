package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Layout

/** Z-order clustered layout: key correctness vs a bit-twiddling
  * reference, block contiguity (the property the layout relies on),
  * and the actual payoff — file-level pruning measured from footer
  * stats on clustered vs unclustered writes of the same grid. */
class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave, written independently of the
    * Column construction (per-bit loop over longs). */
  private def refZ(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (i <- vals.indices; b <- 0 until bits)
      z |= ((vals(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("zvalue matches the reference interleave on random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    val got = pts.toDF("x", "y", "w")
      .select(Layout.zvalue(Seq(col("x"), col("y"), col("w")), 10).as("z"))
      .as[Long].collect()
    val want = pts.map(p => refZ(Seq(p._1, p._2, p._3), 10))
    assert(got.toSeq == want)
    // low-bits semantics: out-of-range input reads as its low bits
    val wide = Seq((1025L, 3L)).toDF("x", "y")
      .select(Layout.zvalue(Seq(col("x"), col("y")), 10).as("z"))
      .as[Long].head()
    assert(wide == refZ(Seq(1025L & 1023L, 3L), 10))
  }

  test("aligned 2^k blocks are contiguous key ranges") {
    import spark.implicits._
    // 64x64 grid; every aligned 8x8 block must map to exactly 64
    // consecutive key values — the property that makes one range
    // shuffle cluster BOTH dimensions at once.
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"),
        (col("id") / 64).cast("long").as("y"))
    val blocks = grid
      .select(Layout.zvalue(Seq(col("x"), col("y")), 6).as("z"),
        (col("x") / 8).cast("long").as("bx"),
        (col("y") / 8).cast("long").as("by"))
      .groupBy("bx", "by")
      .agg(min("z").as("lo"), max("z").as("hi"),
        countDistinct("z").as("n"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(blocks.length == 64)
    blocks.foreach { case (bx, by, lo, hi, n) =>
      assert(n == 64 && hi - lo == 63,
        s"block ($bx,$by) not contiguous: lo=$lo hi=$hi n=$n")
    }
  }

  test("z-ordered layout prunes an aligned box to a few files; unclustered touches all") {
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"),
        (col("id") / 64).cast("long").as("y"),
        col("id").as("payload"))

    val zDir = tmpDir("layout-z")
    Layout.writeZOrdered(grid, Seq("x", "y"), zDir, numFiles = 16, bits = 6)
    val naiveDir = tmpDir("layout-naive")
    grid.repartition(16).write.mode("overwrite").parquet(naiveDir)

    // query box: x in [16,23], y in [32,39] — an aligned 8x8 block,
    // i.e. one contiguous 64-key z run; its rows can cross at most
    // one range boundary of the ~256-key-wide file ranges.
    def overlapping(dir: String): (Long, Long) = {
      val st = Layout.fileStats(spark, dir, Seq("x", "y"))
      val hit = st.where(
        col("x_min") <= 23 && col("x_max") >= 16 &&
          col("y_min") <= 39 && col("y_max") >= 32)
      (hit.count(), st.count())
    }
    val (zHit, zTotal) = overlapping(zDir)
    val (nHit, nTotal) = overlapping(naiveDir)
    assert(zTotal >= 12, s"range write produced too few files: $zTotal")
    assert(zHit <= 3, s"z layout: box overlaps $zHit of $zTotal files")
    assert(nHit >= 12, s"unclustered layout unexpectedly tight: $nHit of $nTotal")

    // the layout must not change the data: same rows back
    val got = spark.read.parquet(zDir)
      .where(col("x").between(16, 23) && col("y").between(32, 39))
      .count()
    assert(got == 64L)
    assert(spark.read.parquet(zDir).count() == 64L * 64)
  }

  test("exact rank buckets match a Scala percent_rank reference (ties, skew)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // heavy ties + skew: 300 draws from {0,1,2,3} squared plus a tail
    val vals = Seq.fill(300)(math.pow(rnd.nextInt(4).toDouble, 2)) ++
      Seq(900.0, 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val bits = 4
    val got = Layout.withZRank(df, Seq("v"), bits, exact = true)
      .select("id", "_zrank").as[(Long, Long)].collect().toMap
    // reference: percent_rank = (rank-1)/(n-1), rank = 1 + count(strictly less)
    val n = vals.size
    val below = vals.sorted
    def ref(v: Double): Long = {
      val rank = below.indexWhere(_ == v) + 1
      val pr = (rank - 1).toDouble / (n - 1)
      math.min(math.floor(pr * (1 << bits)).toLong, (1 << bits) - 1)
    }
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == ref(v), s"row $i v=$v")
    }
  }

  test("scale path agrees with exact path when quantiles are exact") {
    import spark.implicits._
    // distinct uniform values + tiny relErr: GK boundaries are exact,
    // so the two paths must assign identical buckets
    val df = scala.util.Random.shuffle((0 until 512).toList)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
      .toDF("id", "v")
    val ex = Layout.withZRank(df, Seq("v"), bits = 4, exact = true)
      .select("id", "_zrank").as[(Long, Long)].collect().toMap
    val ap = Layout.withZRank(df, Seq("v"), bits = 4, exact = false,
      relErr = 0.0001)
      .select("id", "_zrank").as[(Long, Long)].collect().toMap
    assert(ex == ap)
  }

  test("ranked layout prunes a quantile box on skewed doubles; naive touches all") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // lognormal-ish skew in both dims: raw zvalue cannot even apply
    // (doubles, unbounded domain); ranks spread the curve uniformly
    val rows = Seq.fill(4096)(
      (math.exp(rnd.nextGaussian() * 2), math.exp(rnd.nextGaussian() * 2)))
    val df = rows.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "price", "score")

    val zDir = tmpDir("layout-ranked")
    Layout.writeZOrderedRanked(df, Seq("price", "score"), zDir,
      numFiles = 16, bits = 6)
    val naiveDir = tmpDir("layout-ranked-naive")
    df.repartition(16).write.mode("overwrite").parquet(naiveDir)

    // query box: the inter-quartile hot region in both dims — the
    // worst case for a skewed raw-value layout, routine for ranks
    val pB = rows.map(_._1).sorted
    val sB = rows.map(_._2).sorted
    val (pLo, pHi) = (pB(1024), pB(2047))
    val (sLo, sHi) = (sB(1024), sB(2047))
    def hits(dir: String): (Long, Long) = {
      val st = Layout.fileStats(spark, dir, Seq("price", "score"))
      (st.where(col("price_min") <= pHi && col("price_max") >= pLo &&
          col("score_min") <= sHi && col("score_max") >= sLo).count(),
        st.count())
    }
    val (zHit, zN) = hits(zDir)
    val (nHit, nN) = hits(naiveDir)
    assert(zN >= 12, s"too few files: $zN")
    assert(zHit <= zN / 2,
      s"ranked layout: box overlaps $zHit of $zN files")
    assert(nHit >= 12, s"naive unexpectedly tight: $nHit of $nN")
    // correctness: same matching rows from both layouts
    def matched(dir: String): Long = spark.read.parquet(dir)
      .where(col("price").between(pLo, pHi) &&
        col("score").between(sLo, sHi)).count()
    assert(matched(zDir) == matched(naiveDir))
  }
}
