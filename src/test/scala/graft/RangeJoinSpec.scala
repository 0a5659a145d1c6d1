package graft

import org.apache.spark.sql.functions._

import graft.query.RangeJoin

/** Bucketized keyless interval join: exact containment semantics,
  * each pair exactly once, and an equi-join plan (no nested loop). */
class RangeJoinSpec extends SparkSpec {

  test("matches containment exactly once, including bucket-spanning intervals") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L))
      .toDF("pid", "pt")
    val intervals = Seq(
      (100L, 0L, 9L),   // covers pt 5
      (101L, 5L, 30L),  // spans 3 buckets of width 10 -> pts 5, 10, 25
      (102L, 50L, 60L)  // matches nothing
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin
      .pointInInterval(points, "pt", intervals, "lo", "hi", bucketWidth = 10L)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(out.toSeq == Seq((1L, 100L), (1L, 101L), (2L, 101L), (3L, 101L)))
  }

  test("plans as an equi-join on buckets, not a nested loop") {
    import spark.implicits._
    val points = (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("pid", "pt")
    val intervals = (0L until 100L).map(i => (i, i * 10, i * 10 + 25))
      .toDF("iid", "lo", "hi")
    val j = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 50L)
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"nested loop in plan:\n$plan")
    // correctness vs the naive crossJoin formulation
    val naive = points.crossJoin(intervals)
      .where(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .count()
    assert(j.count() == naive)
  }

  test("an interval spanning too many buckets is refused loudly") {
    import spark.implicits._
    val points = Seq((1L, 100L)).toDF("pid", "pt")
    // open-ended sentinel interval: would explode to ~Long.MaxValue/10
    // sequence elements without the guard
    val intervals = Seq((1L, 0L, Long.MaxValue)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 10L)
        .collect()
    }
    def msg(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + msg(t.getCause)
    assert(msg(e).contains("buckets"), msg(e))
    // intervals under the cap still join fine alongside
    val ok = Seq((2L, 90L, 190L)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, "pt", ok, "lo", "hi", 10L)
      .count() == 1L)
    // a (MinValue, MaxValue) sentinel overflows a plain hiB-loB span
    // subtraction (wrapping to -1 and BYPASSING the guard) — it must
    // still refuse with the same friendly message
    val extreme = Seq((3L, Long.MinValue, Long.MaxValue)).toDF("iid", "lo", "hi")
    val e2 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", extreme, "lo", "hi", 1L)
        .collect()
    }
    assert(msg(e2).contains("buckets"), msg(e2))
    // NULL bounds keep their drop-the-row behavior, not a guard trip
    val nulls = Seq((4L, Option.empty[Long], Option(5L)))
      .toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, "pt", nulls, "lo", "hi", 10L)
      .count() == 0L)
    // INVERTED intervals (hi < lo — a data bug) are EMPTY, not a
    // descending-sequence explosion: sequence(start, stop) generates
    // DESCENDING when start > stop, so without the inversion drop this
    // (1e12, 0) interval would ask for ~1e11 bucket elements — the
    // negative span sails past the `span >= max` guard
    val inverted = Seq((5L, 1000000000000L, 0L), (6L, 90L, 190L))
      .toDF("iid", "lo", "hi")
    val inv = RangeJoin
      .pointInInterval(points, "pt", inverted, "lo", "hi", 10L)
      .collect()
    assert(inv.length == 1 && inv.head.getAs[Long]("iid") == 6L,
      s"inverted interval must drop, valid sibling must match: " +
        inv.mkString(", "))
  }
}
