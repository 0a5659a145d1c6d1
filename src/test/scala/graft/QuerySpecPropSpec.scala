package graft

import org.scalacheck.Gen

import graft.core._
import graft.core.QuerySpec._

/** Property tests for the QuerySpec algebra (ScalaCheck generators,
  * sampled manually — no scalatestplus bridge in the offline cache;
  * the reference has only fixed vectors, SURVEY §5 calls for
  * properties on top): the folded plan is equivalent to a naive model
  * evaluator over a small in-memory log for arbitrary legal spec
  * combinations.
  */
class QuerySpecPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  private val N = 30L // model log: seqs 0..29, value(seq) = seq * 10

  /** Naive reference model: apply plan semantics to Vector directly. */
  private def model(p: QueryPlan): Seq[Long] = {
    var seqs: Seq[Long] = (0L until N).toVector
    p.lower.foreach(l => seqs = seqs.filter(_ >= l))
    p.upper.foreach(u => seqs = seqs.filter(_ < u))
    val ordered = if (p.reverse) seqs.reverse else seqs
    if (p.limit >= 0) ordered.take(p.limit.toInt) else ordered
  }

  private val genSpecs: Gen[List[QuerySpec]] = for {
    lower <- Gen.option(
      Gen.oneOf(
        Gen.chooseNum(-2L, N + 2).map(Gt(_): QuerySpec),
        Gen.chooseNum(-2L, N + 2).map(Gte(_): QuerySpec)
      )
    )
    upper <- Gen.option(
      Gen.oneOf(
        Gen.chooseNum(-2L, N + 2).map(Lt(_): QuerySpec),
        Gen.chooseNum(-2L, N + 2).map(Lte(_): QuerySpec)
      )
    )
    limit <- Gen.option(Gen.chooseNum(0L, N + 5).map(Limit(_)))
    rev <- Gen.oneOf(true, false)
    wrap <- Gen.oneOf(true, false)
  } yield List(
    lower.toList,
    upper.toList,
    limit.toList,
    if (rev) List(Reverse(true)) else Nil,
    if (wrap) List(SeqWrap(true)) else Nil
  ).flatten

  test("plan fold: single-set bounds always rejected on repeat") {
    samples(Gen.zip(Gen.chooseNum(0L, N), Gen.chooseNum(0L, N)), 50).foreach {
      case (a, b) =>
        assert(QueryPlan.fromSpecs(Seq(Gt(a), Gte(b))).isLeft)
        assert(QueryPlan.fromSpecs(Seq(Lt(a), Lte(b))).isLeft)
        assert(QueryPlan.fromSpecs(Seq(Live(true), Reverse(true))).isLeft)
    }
  }

  test("plan fold: legal spec lists always produce a plan") {
    samples(genSpecs, 200).foreach { specs =>
      assert(QueryPlan.fromSpecs(specs).isRight, s"specs=$specs")
    }
  }

  test("engine query equals the naive model for arbitrary specs") {
    import spark.implicits._
    val log = graft.storage.ParquetLog
      .open(spark, tmpDir("prop"), org.apache.spark.sql.types.LongType)
    log.appendValues((0L until N).map(_ * 10))
    // sample a bounded number of cases: each case is a full Spark query
    val cases = samples(genSpecs, 25)
    cases.foreach { specs =>
      val plan = QueryPlan.of(specs: _*)
      val got = log
        .query(specs :+ SeqWrap(true): _*)
        .collect()
        .map(_.getLong(0))
        .toSeq
      assert(got == model(plan), s"specs=$specs")
    }
  }
}
