package graft

import org.apache.spark.sql.functions._

import graft.query.AsOf

/** As-of join semantics on a hand-computed fixture. */
class AsOfSpec extends SparkSpec {

  test("asof picks latest prior-or-equal right; no-match is null; ties break by order col") {
    import spark.implicits._
    val clicks = Seq(
      (100L, 1L, 10L), // before any purchase -> null
      (101L, 1L, 20L), // at the same ts as purchase 500 -> visible
      (102L, 1L, 35L), // after purchases at 20 and 30 -> latest (30)
      (103L, 2L, 50L), // user 2 has no purchases -> null
      (104L, 3L, 40L)  // two purchases at the SAME ts 15 -> higher order col wins
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (500L, 1L, 20L),
      (501L, 1L, 30L),
      (502L, 3L, 15L),
      (503L, 3L, 15L)
    ).toDF("p_id", "user_id", "ts")
      .select(col("user_id"), col("ts"), col("p_id"))

    val out = AsOf
      .join(clicks, purchases, "user_id", "ts", Seq("p_id"),
        rightOrder = Some("p_id"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))

    assert(out.toSeq == Seq(
      (100L, -1L),  // nothing at ts<=10
      (101L, 500L), // same-ts purchase visible
      (102L, 501L), // latest of {500@20, 501@30}
      (103L, -1L),  // user without purchases
      (104L, 503L)  // tie at ts=15 -> highest rightOrder
    ))
    // every left row survives (left-join semantics)
    assert(out.length == 5)
  }

  test("asof returns the whole latest right row — NULL fields not back-filled from older rows") {
    import spark.implicits._
    // r1(ts=10, a=1, b=2), r2(ts=20, a=3, b=NULL): a left row at ts=25
    // must see (a=3, b=NULL) — the latest row verbatim — not a stitch
    // of a=3 from r2 and b=2 from r1.
    val left = Seq((1L, 25L)).toDF("k", "ts")
    val right = Seq(
      (1L, 10L, Some(1L), Some(2L)),
      (1L, 20L, Some(3L), None: Option[Long])
    ).toDF("k", "ts", "a", "b")
    val out = AsOf
      .join(left, right, "k", "ts", Seq("a", "b"), rightOrder = Some("ts"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 3L, "a must come from the latest right row")
    assert(out(0).isNullAt(3), "b is genuinely NULL in the latest right row")
  }

  test("asof plan is one shuffle (no range-join cartesian)") {
    import spark.implicits._
    val l = (0L until 100L).map(i => (i, i % 5, i)).toDF("id", "k", "ts")
    val r = (0L until 50L).map(i => (i % 5, i, i + 1000)).toDF("k", "ts", "v")
    val j = AsOf.join(l, r, "k", "ts", Seq("v"), rightOrder = Some("v"))
    j.collect()
    // AQE's toString prints final AND initial plans — count only the
    // final section
    val plan = j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    // exactly one shuffle: the window's hash partitioning on the key
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
  }
}
