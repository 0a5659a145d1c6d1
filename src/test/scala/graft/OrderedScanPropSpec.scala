package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.IntegerType
import org.scalacheck.Gen

import graft.storage.ParquetLog

/** Property tests for the round-10 read paths: random segment
  * layouts × random (bounds, limit, direction, projection) plans,
  * connector results checked against a naive Scala model — on BOTH
  * the vectorized path (positional slicing, struct/atomic decode,
  * pushed top-N with reversed readers) and the row path
  * (`spark.graft.columnar.enabled=false` A/B). One partition per
  * segment (`maxPartitionBytes=1`) so partition-order and
  * boundary-slice logic are exercised, not planned away. */
class OrderedScanPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  private case class Case(
      segs: List[Int], // rows per segment
      lower: Option[Long], // inclusive
      upper: Option[Long], // inclusive
      limit: Option[Int],
      desc: Boolean,
      valueOnly: Boolean
  ) {
    def total: Int = segs.sum
  }

  private val genCase: Gen[Case] = for {
    nSegs <- Gen.chooseNum(2, 6)
    segs <- Gen.listOfN(nSegs, Gen.chooseNum(1, 12))
    n = segs.sum
    lower <- Gen.option(Gen.chooseNum(-2L, n + 2L))
    upper <- Gen.option(Gen.chooseNum(-2L, n + 2L))
    limit <- Gen.option(Gen.chooseNum(0, n + 3))
    desc <- Gen.oneOf(true, false)
    valueOnly <- Gen.oneOf(true, false)
  } yield Case(segs, lower, upper, limit, desc, valueOnly)

  /** Naive model over seqs 0..n-1 (value = seq as Int). */
  private def model(c: Case): Seq[Long] = {
    var seqs: Seq[Long] = (0L until c.total).toVector
    c.lower.foreach(l => seqs = seqs.filter(_ >= l))
    c.upper.foreach(u => seqs = seqs.filter(_ <= u))
    val ordered = if (c.desc) seqs.reverse else seqs
    c.limit.fold(ordered)(ordered.take)
  }

  test("getMany equals the model across tiers for random seq sets") {
    import spark.implicits._
    val log = ParquetLog.open(spark, tmpDir("gmprop") + "/log", IntegerType)
    val n = 2500
    log.appendValues((0 until n).toSeq)
    // sizes straddle every tier boundary: direct (≤128), ranges (≤64
    // runs), isin (≤1000), broadcast (>1000)
    val genSet: Gen[Seq[Long]] = for {
      k <- Gen.oneOf(3, 100, 140, 600, 1200)
      mode <- Gen.oneOf("runs", "scatter", "mixed")
      base <- Gen.chooseNum(-5L, n + 5L)
      step <- Gen.chooseNum(1L, 7L)
    } yield mode match {
      case "runs" => (0 until k).map(i => base + i) // one long run
      case "scatter" => (0 until k).map(i => (base + i * step * 13) % (n + 40))
      case "mixed" =>
        (0 until k / 2).map(i => base + i) ++
          (0 until k - k / 2).map(i => (i * 17L + base) % (n + 40))
    }
    // one GUARANTEED broadcast-tier case (odd stride is coprime with
    // the modulus → 1200 distinct seqs > MaxInLiteralSeqs); the
    // generated cases may or may not reach it depending on stride/gcd
    val guaranteedBroadcast = (0 until 1200).map(i => (i * 2L + 1) % (n + 40))
    (samples(genSet, 12) :+ guaranteedBroadcast).foreach { seqs =>
      val got = log.getMany(seqs)
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = seqs.distinct.filter(s => s >= 0 && s < n)
        .map(s => s -> s.toInt).toMap
      assert(got == want, s"k=${seqs.length} head=${seqs.take(5)}")
    }
  }

  test("random layouts × plans: connector equals the model, columnar and row paths") {
    import spark.implicits._
    samples(genCase, 20).zipWithIndex.foreach { case (c, i) =>
      val dir = tmpDir(s"ordprop$i") + "/log"
      val log = ParquetLog.open(spark, dir, IntegerType)
      var next = 0
      c.segs.foreach { k =>
        log.appendValues((next until next + k).toSeq); next += k
      }
      def run(): Seq[Long] = {
        var df = spark.read.format("graft-log")
          .option("maxPartitionBytes", "1").load(dir)
        c.lower.foreach(l => df = df.where(col("seq") >= l))
        c.upper.foreach(u => df = df.where(col("seq") <= u))
        df = if (c.desc) df.orderBy(col("seq").desc) else df.orderBy(col("seq"))
        c.limit.foreach(n => df = df.limit(n))
        if (c.valueOnly)
          df.select("value").collect().map(_.getInt(0).toLong).toSeq
        else df.collect().map(_.getLong(0)).toSeq
      }
      val expect = model(c)
      assert(run() == expect, s"case=$c (columnar)")
      spark.conf.set("spark.graft.columnar.enabled", "false")
      try assert(run() == expect, s"case=$c (row path)")
      finally spark.conf.set("spark.graft.columnar.enabled", "true")
    }
  }
}
