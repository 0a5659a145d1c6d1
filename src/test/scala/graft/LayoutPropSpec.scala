package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.pipeline.Layout

/** Property tests for the z-order layout math: the Morton key against
  * a Scala model over random dimensionalities, and — the safety
  * property the partitioned layout's PRUNING rests on — zBoxFilter's
  * block decomposition returning exactly the plain box filter's rows
  * for random grids, boxes, bits and dirBits. A decomposition bug
  * here silently LOSES ROWS from query results, so it gets the
  * adversarial treatment, not one hand-picked box. */
class LayoutPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  private def refZ(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (i <- vals.indices; b <- 0 until bits)
      z |= ((vals(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("zvalue == the Scala model over random dims/bits/points") {
    import spark.implicits._
    val gen = for {
      dims <- Gen.choose(1, 4)
      bits <- Gen.choose(1, 62 / dims)
      pts <- Gen.listOfN(30, Gen.listOfN(dims,
        Gen.choose(0L, (1L << math.min(bits, 30)) - 1)))
    } yield (dims, bits, pts)
    samples(gen, 25).foreach { case (dims, bits, pts) =>
      val df = pts.zipWithIndex
        .map { case (p, i) => (i.toLong, p.toArray) }
        .toDF("i", "p")
      val cols = (0 until dims).map(d => element_at(col("p"), d + 1))
      val got = df.select(col("i"), Layout.zvalue(cols, bits).as("z"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      pts.zipWithIndex.foreach { case (p, i) =>
        assert(got(i.toLong) == refZ(p, bits),
          s"dims=$dims bits=$bits point=$p")
      }
    }
  }

  test("zBoxFilter decomposition == plain box filter for random grids/boxes") {
    import spark.implicits._
    val gen = for {
      bits <- Gen.choose(2, 5)
      dims <- Gen.choose(1, 3)
      dirBits <- Gen.choose(1, math.min(8, bits * dims))
      n = 1 << bits
      bounds <- Gen.listOfN(dims, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
      } yield (math.min(a, b), math.max(a, b)))
      rows <- Gen.listOfN(200, Gen.listOfN(dims, Gen.choose(0L, n - 1L)))
    } yield (bits, dims, dirBits, bounds, rows)
    samples(gen, 30).foreach { case (bits, dims, dirBits, bounds, rows) =>
      val cols = (0 until dims).map(d => s"c$d")
      val df = rows.zipWithIndex
        .map { case (r, i) => (i.toLong, r.toArray) }
        .toDF("i", "p")
        .select(col("i") +:
          cols.zipWithIndex.map { case (c, d) =>
            element_at(col("p"), d + 1).as(c)
          }: _*)
      val shift = bits * dims - dirBits
      val withZb = df.withColumn("_zb",
        shiftright(Layout.zvalue(cols.map(col), bits), shift))
      val got = withZb
        .where(Layout.zBoxFilter(cols, bounds, bits, dirBits))
        .select("i").as[Long].collect().toSet
      val want = rows.zipWithIndex.collect {
        case (r, i) if r.indices.forall(d =>
          r(d) >= bounds(d)._1 && r(d) <= bounds(d)._2) => i.toLong
      }.toSet
      assert(got == want,
        s"bits=$bits dims=$dims dirBits=$dirBits bounds=$bounds: " +
          s"missing=${want -- got}, extra=${got -- want}")
    }
  }
}
