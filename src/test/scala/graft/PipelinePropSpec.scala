package graft

import org.scalacheck.Gen

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Property tests for the round-6 corpus-rewriting ops: random
  * instances compared against naive model formulations (manual Gen
  * sampling like TemporalPropSpec — no scalatestplus bridge in the
  * offline cache).
  */
class PipelinePropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("dedupLines equals the naive cross-doc line model on random corpora") {
    import spark.implicits._
    // small line vocabulary → cross-doc duplicates are common; blank
    // lines mixed in to exercise the always-keep rule
    val lineGen = Gen.oneOf(
      "alpha beta", "gamma", "delta epsilon zeta", "", "  ", "eta theta")
    val gen = for {
      nd <- Gen.choose(1, 8)
      docs <- Gen.listOfN(nd, Gen.choose(0, 6).flatMap(Gen.listOfN(_, lineGen)))
      minDocs <- Gen.choose(2, 3)
    } yield (docs, minDocs)

    samples(gen, 10).foreach { case (docLines, minDocs) =>
      val df = docLines.zipWithIndex
        .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
        .toDF("doc_id", "text")
      // model: df per trimmed nonblank line over SPLIT text (split on
      // \n of the joined text, matching the operator's view)
      val split = docLines.zipWithIndex.map { case (ls, i) =>
        i.toLong -> ls.mkString("\n").split("\n", -1).toSeq
      }.toMap
      val lineDf = split.toSeq
        .flatMap { case (id, ls) =>
          ls.filter(_.trim.nonEmpty).map(_.trim).distinct.map(_ -> id)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val expect = split.map { case (id, ls) =>
        val kept = ls.filter(l =>
          l.trim.isEmpty || lineDf.getOrElse(l.trim, 0) < minDocs)
        id -> ((kept.mkString("\n"), ls.size.toLong, (ls.size - kept.size).toLong))
      }
      // BOTH hash configs × BOTH rebuild legs must equal the model:
      // the line-key hash is an internal identity, never a semantics
      // knob, and the count gate (gate=0 forces the over-gate join
      // leg; the default admits the narrow collected-dict leg) must
      // be invisible in the output
      for (portable <- Seq(true, false); gate <- Seq(1000000L, 0L)) {
        val got = Dedup
          .dedupLines(df, "text", "doc_id", minDocs = minDocs.toLong,
            maxBroadcastKeys = gate, portableHash = portable)
          .collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
          .toMap
        assert(got == expect,
          s"portable=$portable gate=$gate minDocs=$minDocs docs=$docLines")
      }
    }
  }

  test("stripRepeatedSpans: narrow rebuild equals the join leg on random corpora") {
    import spark.implicits._
    // tiny token vocabulary → repeated width-grams are common, both
    // within and across docs; the join leg is the executable spec and
    // the narrow collected-dictionary leg must match it row-for-row
    val tokGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val gen = for {
      nd <- Gen.choose(1, 6)
      docs <- Gen.listOfN(nd, Gen.choose(0, 12).flatMap(Gen.listOfN(_, tokGen)))
      width <- Gen.choose(2, 4)
      minCount <- Gen.choose(2, 3)
    } yield (docs, width, minCount)
    samples(gen, 8).foreach { case (docToks, width, minCount) =>
      val df = docToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      def run(gate: Long) = Dedup
        .stripRepeatedSpans(df, "text", "doc_id", width, minCount.toLong,
          maxBroadcastKeys = gate)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      val narrow = run(1000000L)
      val joinLeg = run(0L)
      assert(narrow == joinLeg,
        s"width=$width minCount=$minCount docs=$docToks")
    }
  }

  test("narrow gram scoring equals the join legs on random corpora") {
    import spark.implicits._
    // boilerplateRatio and overlapCounts: the collected-dictionary
    // expression leg vs the join/regroup legs, over random corpora
    // with heavy cross-doc gram sharing and degenerate short docs
    val tokGen = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = Gen.choose(0, 8).flatMap(Gen.listOfN(_, tokGen))
    val gen = for {
      nd <- Gen.choose(1, 6)
      docs <- Gen.listOfN(nd, docGen)
      ne <- Gen.choose(1, 3)
      evals <- Gen.listOfN(ne, docGen)
    } yield (docs, evals)
    samples(gen, 8).foreach { case (docToks, evalToks) =>
      val corpus = docToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val evalSet = evalToks.zipWithIndex
        .map { case (ts, i) => (100L + i, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      def boiler(gate: Long) = graft.pipeline.Boilerplate
        .boilerplateRatio(corpus, "text", "doc_id", width = 2,
          minDocs = 2L, maxBroadcastKeys = gate)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(boiler(1000000L) == boiler(0L), s"docs=$docToks")
      def overlap(gate: Long) = graft.pipeline.Decontaminate
        .overlapCounts(corpus, evalSet, "text", "doc_id", width = 2,
          maxCollectedKeys = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(overlap(1000000L) == overlap(0L),
        s"docs=$docToks evals=$evalToks")
    }
  }

  test("connectedComponents equals union-find on random graphs " +
      "(round 11: the star-contraction rewrite)") {
    import spark.implicits._
    // random multigraphs over a small id space: self-loops, parallel
    // edges, both orientations, several components — every shape the
    // canonicalization and the contraction must absorb
    val gen = for {
      n <- Gen.choose(1, 40)
      m <- Gen.choose(0, 60)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield edges

    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical root = min member id, which find() yields because
      // unions always attach the larger root under the smaller
      parent.keys.map(k => k -> find(k)).toMap
    }

    samples(gen, 12).filter(_.nonEmpty).foreach { edges =>
      val model = unionFind(edges)
      // BOTH paths must match the model: the distributed star
      // contraction (localThreshold = 0) and the driver fast path
      for (thr <- Seq(0L, 100000L)) {
        val got = Dedup
          .connectedComponents(edges.toDF("id_a", "id_b"),
            localThreshold = thr)
          .collect()
          .map(r => r.getLong(0) -> r.getLong(1))
          .toMap
        assert(got == model, s"thr=$thr edges=$edges")
      }
    }
  }

  test("reflowLines: split-rejoin recovers the token stream, widths bound") {
    import spark.implicits._
    val tokGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val gen = for {
      n <- Gen.choose(0, 23)
      toks <- Gen.listOfN(n, tokGen)
      w <- Gen.choose(1, 7)
    } yield (toks, w)

    samples(gen, 15).foreach { case (toks, w) =>
      val df = Seq(Tuple1(toks.mkString(" "))).toDF("t")
      val out = df
        .select(TextFunctions.reflowLines(org.apache.spark.sql.functions.col("t"), w))
        .collect().head.getString(0)
      if (toks.isEmpty) assert(out == "")
      else {
        val lines = out.split("\n", -1).toSeq
        // every line holds exactly w tokens except a shorter last
        assert(lines.init.forall(_.split(" ").length == w), s"w=$w out=$out")
        assert(lines.last.split(" ").length <= w)
        // rejoining recovers the original token stream
        assert(lines.flatMap(_.split(" ")).toList == toks, s"w=$w")
      }
    }
  }
}
