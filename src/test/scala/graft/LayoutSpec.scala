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
}
