package graft

import org.apache.spark.sql.functions._

import graft.sketch.Drift

/** Profile drift: the exact two-sample KS statistic against an
  * independent reference, tie handling, and the per-stratum report
  * (ratios, appearing/vanishing strata, null legs). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def refKs(a: Seq[Double], b: Seq[Double]): Double = {
    val grid = (a ++ b).distinct
    val d = grid.map(x =>
      math.abs(a.count(_ <= x).toDouble / a.size -
        b.count(_ <= x).toDouble / b.size)).max
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("ksStat is the exact two-sample KS, ties handled at value ends") {
    // hand case: F_a(2)=0.5, F_b(2)=0 → D = 0.5
    val df = Seq(("s", Array(1.0, 2.0, 3.0, 4.0), Array(3.0, 4.0, 5.0, 6.0)))
      .toDF("g", "a", "b")
    val got = Drift.ksStat(df, "g", "a", "b").collect().head.getDouble(1)
    assert(got == 0.5)
    // identical samples → 0 (ALL ties — the RANGE frame must evaluate
    // CDFs after the whole tie group, or this reads spuriously > 0)
    val same = Seq(("s", Array(1.0, 2.0, 2.0, 3.0), Array(1.0, 2.0, 2.0, 3.0)))
      .toDF("g", "a", "b")
    assert(Drift.ksStat(same, "g", "a", "b")
      .collect().head.getDouble(1) == 0.0)
    // random arrays equal the independent reference, several strata
    val rnd = new scala.util.Random(5)
    val rows = (0 until 8).map { i =>
      val a = Array.fill(3 + rnd.nextInt(40))(rnd.nextInt(30).toDouble)
      val b = Array.fill(3 + rnd.nextInt(40))(rnd.nextInt(30).toDouble)
      (s"g$i", a, b)
    }
    val got2 = Drift.ksStat(rows.toDF("g", "a", "b"), "g", "a", "b")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { case (g, a, b) =>
      assert(got2(g) == refKs(a.toSeq, b.toSeq), s"stratum $g")
    }
  }

  test("profileDrift: ratios, status, and the distribution leg") {
    def prof(rows: (String, Long, Long, Double, Array[Double])*) =
      rows.toDF("lang", "docs", "tokens", "est_distinct_docs", "vs_values")
    val before = prof(
      ("en", 100L, 5000L, 95.0, Array(10.0, 20.0, 30.0, 40.0)),
      ("de", 50L, 2000L, 48.0, Array(5.0, 6.0, 7.0)),
      ("fr", 10L, 300L, 10.0, Array(1.0, 2.0)))
    val after = prof(
      ("en", 150L, 7500L, 142.5, Array(10.0, 20.0, 30.0, 40.0)), // same dist
      ("de", 50L, 2000L, 48.0, Array(50.0, 60.0, 70.0)), // shifted wholesale
      ("ja", 5L, 100L, 5.0, Array(9.0))) // appeared
    val got = Drift.profileDrift(before, after, "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("en").getString(1) == "both")
    assert(got("en").getDouble(2) == 1.5) // docs_ratio
    assert(got("en").getDouble(3) == 1.5) // tokens_ratio
    assert(got("en").getDouble(4) == 1.5) // distinct_ratio
    assert(got("en").getDouble(5) == 0.0) // identical distribution
    assert(got("de").getDouble(5) == 1.0) // disjoint supports
    assert(got("ja").getString(1) == "new" && got("ja").isNullAt(2))
    assert(got("fr").getString(1) == "gone" && got("fr").isNullAt(2))
    // no value samples → no ks column
    val noVals = Drift.profileDrift(
      before.drop("vs_values"), after.drop("vs_values"), "lang")
    assert(!noVals.columns.contains("ks"))
  }

  test("end to end over real profiles: same-corpus halves barely drift") {
    import graft.sketch.{Kmv, ProfileIndex}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "n_chars")
    def idx(dir: String, part: Int) = {
      val p = ProfileIndex.open(spark, dir, 64, "lang", "text",
        valueCol = Some("n_chars"))
      p.ingest("b0", docs.where(col("doc_id") % 2 === part))
      p
    }
    val a = idx(tmpDir("drift-a-"), 0)
    val b = idx(tmpDir("drift-b-"), 1)
    val drift = Drift.profileDrift(
      a.profileEstimates, b.profileEstimates, "lang").collect()
    assert(drift.nonEmpty)
    drift.foreach { r =>
      assert(r.getString(1) == "both", s"stratum split uneven: $r")
      // two halves of one synthetic corpus: distributions agree well
      assert(r.getDouble(5) < 0.5, s"implausible drift: $r")
    }
  }
}
