package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.pipeline.Sampling
import graft.query.{AsOf, RangeJoin}

/** Property tests for the temporal joins and sampling gates: random
  * instances compared against naive model formulations (same
  * manual-sampling style as QuerySpecPropSpec — no scalatestplus
  * bridge in the offline cache).
  */
class TemporalPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("asof join equals the naive latest-prior model on random histories") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 30)
      nr <- Gen.choose(0, 30)
      lefts <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      rights <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
    } yield (lefts, rights)

    samples(gen, 12).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "ts")
      val rRows = rights.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
      val r = rRows.toDF("k", "ts", "rid")
      val got = AsOf
        .join(l, r, "k", "ts", Seq("rid"), rightOrder = Some("rid"))
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(3)) -1L else row.getLong(3)))
        .toMap
      // model: per left row, the max-(ts, rid) right with ts <= left.ts
      lefts.zipWithIndex.foreach { case ((k, t), i) =>
        val want = rRows
          .filter { case (rk, rt, _) => rk == k && rt <= t }
          .sortBy { case (_, rt, rid) => (rt, rid) }
          .lastOption.map(_._3).getOrElse(-1L)
        assert(got(i.toLong) == want, s"left $i (k=$k, t=$t)")
      }
    }
  }

  test("range join equals the naive containment model on random intervals") {
    import spark.implicits._
    val gen = for {
      np <- Gen.choose(1, 25)
      ni <- Gen.choose(1, 15)
      pts <- Gen.listOfN(np, Gen.choose(0L, 200L))
      ivs <- Gen.listOfN(ni, for {
        lo <- Gen.choose(0L, 200L); len <- Gen.choose(0L, 80L)
      } yield (lo, lo + len))
      width <- Gen.oneOf(7L, 10L, 64L)
    } yield (pts, ivs, width)

    samples(gen, 12).foreach { case (pts, ivs, width) =>
      val p = pts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("pid", "pt")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = RangeJoin
        .pointInInterval(p, "pt", iv, "lo", "hi", width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (t, i) <- pts.zipWithIndex
        ((lo, hi), j) <- ivs.zipWithIndex
        if t >= lo && t <= hi
      } yield (i.toLong, j.toLong)).toSet
      assert(got == want, s"width=$width")
    }
  }

  test("hash sampling gates are nested: sample(r1) ⊆ sample(r2) for r1 <= r2") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val s20 = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s40 = Sampling.hashSample(docs, "doc_id", 0.4).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s40)) // same hash, higher gate — strictly nested
    assert(s20.size < s40.size)
  }
}
