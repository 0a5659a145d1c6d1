package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Boilerplate, Curation, Decontaminate}

/** Corpus-level curation operators: benchmark decontamination,
  * boilerplate-gram detection, adaptive quality gating. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("decontamination flags exactly the docs sharing an eval n-gram") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over dogs", // shares "quick brown fox"
      2L -> "completely unrelated words here now",
      3L -> "we say quick brown fox twice quick brown fox", // distinct-gram count
      4L -> "ab" // degenerate (<3 tokens): whole text is the shingle
    )
    val eval = docs(
      100L -> "a quick brown fox appeared",
      101L -> "ab"
    )
    // all three scoring legs must agree: the narrow collected-dict
    // expression (default), the over-gate broadcast join
    // (maxCollectedKeys = 0) and the unbroadcast join
    // (broadcastEval = false)
    for ((bc, gate) <- Seq((true, 1000000L), (true, 0L), (false, 1000000L))) {
      val got = Decontaminate
        .overlapCounts(corpus, eval, "text", "doc_id",
          broadcastEval = bc, maxCollectedKeys = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // doc 3 contains "quick brown fox" twice but shingles are
      // distinct per doc → overlap counts distinct shared grams, not
      // occurrences
      assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 1L),
        s"broadcastEval=$bc gate=$gate")
    }

    val clean = Decontaminate
      .decontaminate(corpus, eval, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("decontamination scores the corpus in one narrow pass") {
    val corpus = docs(1L -> "a b c d e", 2L -> "f g h i j")
    val eval = docs(9L -> "a b c")
    // default config: the collected eval grams ride the scoring
    // expression — the corpus side must plan NO join, NO aggregation
    // and NO exchange at all (the eval-gram job runs separately at
    // build time; this plan is the corpus scan alone)
    val plan = Decontaminate
      .overlapCounts(corpus, eval, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("gram_set_overlap"),
      s"expected the narrow scoring expression in:\n$plan")
    for (bad <- Seq("Join", "Exchange", "Aggregate"))
      assert(!plan.contains(bad), s"unexpected $bad in:\n$plan")
    // the over-gate fallback still broadcasts the eval side
    val joinPlan = Decontaminate
      .overlapCounts(corpus, eval, "text", "doc_id", maxCollectedKeys = 0L)
      .queryExecution.executedPlan.toString
    assert(joinPlan.contains("BroadcastExchange") ||
        joinPlan.contains("BroadcastHashJoin"),
      s"expected broadcast eval side in:\n$joinPlan")
  }

  test("boilerplate ratio counts corpus-frequent grams per doc") {
    // "x y z" appears in docs 1,2,3 (df=3 >= minDocs=3); every other
    // gram is unique to its doc
    val corpus = docs(
      1L -> "x y z only here a",
      2L -> "x y z other words b",
      3L -> "prefix words x y z",
      4L -> "nothing shared at all"
    )
    // both scoring legs (narrow collected-dict default; gate 0 forces
    // the semi-join leg) must agree exactly
    for (gate <- Seq(1000000L, 0L)) {
      val out = Boilerplate
        .boilerplateRatio(corpus, "text", "doc_id", width = 3,
          minDocs = 3L, maxBroadcastKeys = gate)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      // docs 1-2: 6 tokens -> 4 distinct 3-grams; doc 3: 5 tokens -> 3
      assert(out(1L) == ((4L, 1L, 0.25)), s"gate=$gate")
      assert(out(2L) == ((4L, 1L, 0.25)), s"gate=$gate")
      assert(out(3L) == ((3L, 1L, 0.333333)), s"gate=$gate")
      assert(out(4L) == ((2L, 0L, 0.0)), s"gate=$gate") // zero boilerplate
      assert(out.size == 4, s"gate=$gate")
    }

    val dict = Boilerplate
      .boilerplateGrams(corpus, "text", "doc_id", width = 3, minDocs = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dict == Seq(("x y z", 3L)))
  }

  test("quality gate: exact and approx paths agree on distinct scores") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("doc_id", "score")
    val exact = Curation
      .qualityGate(df, "score", "doc_id", 0.2, exact = true)
      .select("doc_id").as[Long].collect().toSet
    // percent_rank < 0.2 over desc order: ranks 0..19 of 100 → top 20
    assert(exact == (81L to 100L).toSet)
    val approx = Curation
      .qualityGate(df, "score", "doc_id", 0.2, relErr = 0.0001)
      .select("doc_id").as[Long].collect().toSet
    // the approx cut may land one element either side of the exact one
    assert(exact.subsetOf(approx))
    assert(approx.size - exact.size <= 1, s"approx kept ${approx.size}")
    // keepFrac = 1 is the identity, invalid fractions fail fast
    assert(Curation.qualityGate(df, "score", "doc_id", 1.0).count() == 100)
    intercept[IllegalArgumentException] {
      Curation.qualityGate(df, "score", "doc_id", 0.0)
    }
  }

  test("semantic dedup: keep-first within cells, cross-cell twins both live") {
    import graft.dedup.Dedup
    // 2-d embeddings, centroids = rows 0 (x-axis) and 1 (y-axis)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // centroid cell 0
      (1L, Seq(0.0f, 1.0f)),   // centroid cell 1
      (2L, Seq(0.9f, 0.1f)),   // cell 0, cos(id0)≈0.994 → dominated
      (3L, Seq(0.95f, 0.05f)), // cell 0, dominated by id0 too
      (4L, Seq(-1.0f, 0.2f)),  // argmin → cell 1, cos(id1)≈0.20 → survives
      (5L, Seq(0.1f, 0.9f))    // cell 1, cos(id1)≈0.994 → dominated
    ).toDF("vec_id", "embedding")
    val out = Dedup
      .semanticDedup(emb, "embedding", "vec_id", Seq(0L, 1L), threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // dominated ids are gone entirely
    assert(!out.contains(2L) && !out.contains(3L) && !out.contains(5L))
    // centroids survive (nothing below their id), as does the
    // anti-aligned vector: same cell as something, but cosine < 0.95
    assert(out.keySet == Set(0L, 1L, 4L))
  }

  test("unigram LM: in-vocab log-probs, OOV pseudo-count, empty docs dropped") {
    val corpus = docs(
      1L -> "a a b",
      2L -> "b c",
      3L -> "   " // empty after trim: no score row
    )
    // counts: a=2, b=2, c=1; total=5; vocab(2) by (count desc, tok asc)
    // = {a, b}; c is OOV
    val got = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 2, oovCount = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = r6(math.log(2.0 / 5.0)) // both a and b
    val pOov = r6(math.log(0.5 / 5.0))
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == r6((pAB + pAB + pAB) / 3.0))
    assert(got(2L) == r6((pAB + pOov) / 2.0))
  }

  test("unigram LM vocab cut is deterministic and bounds the broadcast") {
    val corpus = docs(
      1L -> "x x y y z z w", // x,y,z tie at 2; w=1
      2L -> "w v"
    )
    // vocabSize=2 with a 4-way tie at count 2 (w,x,y,z): the
    // (count desc, tok asc) cut takes {w, x}; y, z, v are OOV —
    // scores must reflect exactly that deterministic cut
    val got = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = 9.0
    val pIn = r6(math.log(2.0 / t))
    val pOov = r6(math.log(0.5 / t))
    assert(got(2L) == r6((pIn + pOov) / 2.0)) // w in vocab, v OOV
    assert(got(1L) == r6((3 * pIn + 4 * pOov) / 7.0)) // x,x,w in; y,y,z,z out
  }

  test("corpusProfile: per-stratum docs/tokens/distinct/dup-ratio/vocab") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c", "A"),
      (2L, "a  b   c", "A"), // same fingerprint as 1 (whitespace collapse)
      (3L, "d e", "A"),
      (4L, "x y", "B")
    ).toDF("doc_id", "text", "source")
    val got = Curation
      .corpusProfile(corpus, "text", "doc_id", "source")
      .orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .toList
    assert(got == List(
      // A: 3 docs, 8 tokens, 2 distinct contents, dup 1/3, vocab {a,b,c,d,e}
      ("A", 3L, 8L, 2L, BigDecimal(1.0 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 5L),
      ("B", 1L, 2L, 1L, 0.0, 2L)
    ))
  }

  test("unigram LM scale path agrees with the deterministic path") {
    val corpus = docs(
      1L -> "a b c a b a",
      2L -> "c d e f",
      3L -> "a a a a"
    )
    val det = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val fast = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 3,
        deterministic = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(det.keySet == fast.keySet)
    det.foreach { case (id, v) =>
      assert(math.abs(v - fast(id)) < 1e-9, s"doc $id: $v vs ${fast(id)}")
    }
  }

  test("stripEvalSpans removes exactly the eval-covered spans; both legs agree") {
    import graft.pipeline.Decontaminate
    val eval = docs(100L -> "the secret benchmark answer sequence")
    val corpus = docs(
      1L -> "intro text the secret benchmark answer sequence outro text",
      2L -> "clean document with no overlap at all",
      3L -> "the secret benchmark unrelated continuation")
    def run(maxKeys: Long) = Decontaminate
      .stripEvalSpans(corpus, eval, "text", "doc_id", width = 3,
        maxBroadcastKeys = maxKeys)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val narrow = run(1000000L)
    assert(narrow == Seq(
      // covered: tokens 2..6 (union of the three matching 3-grams)
      (1L, "intro text outro text", 5L),
      (2L, "clean document with no overlap at all", 0L),
      // only "the secret benchmark" matches: tokens 0..2
      (3L, "unrelated continuation", 3L)))
    // the over-gate join leg is the executable twin
    assert(run(0L) == narrow, "join leg diverged from the narrow leg")
  }

  test("nfcNormalize: decomposed forms compose, NFC passes through, nulls stay null") {
    import spark.implicits._
    val rows = Seq(
      (1L, "cafe\u0301"),        // e + combining acute
      (2L, "caf\u00e9"),         // already NFC
      (3L, "A\u030A u\u0308ber"), // ring and diaeresis from marks
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String]))
    val got = rows.toDF("id", "t")
      .select(col("id"), graft.text.TextFunctions.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "caf\u00e9")
    assert(got(2L) == "caf\u00e9")
    // identical bytes after normalization: the dedup-key property
    assert(got(1L) == got(2L))
    assert(got(3L) == "\u00c5 \u00fcber")
    assert(got(4L) == "plain ascii")
    assert(got(5L) == null)
    // fingerprints unify the two byte forms once normalized
    val fps = rows.take(2).toDF("id", "t")
      .select(graft.text.TextFunctions.fingerprint(
        graft.text.TextFunctions.nfcNormalize(col("t"))).as("fp"))
      .distinct().count()
    assert(fps == 1L, "normalized fingerprints did not unify")
  }

  test("cross-corpus unigram LM: self-trained identity, reference ranking, empty reference") {
    val corpus = docs(
      1L -> "a b c a b a",
      2L -> "c d e f",
      3L -> "a a a a"
    )
    // ref == corpus: the model is identical, so unigramLmFrom must
    // reproduce unigramLm exactly (same vocab cut, same rounding)
    val self = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val from = graft.text.TextFunctions
      .unigramLmFrom(corpus, corpus, "text", "doc_id", vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(from == self)
    // reference-trained ranking: a doc matching the reference's
    // language outscores rare-token soup
    val ref = docs(10L -> "a b a b a b a b", 11L -> "a b c")
    val scored = graft.text.TextFunctions
      .unigramLmFrom(ref, corpus, "text", "doc_id", vocabSize = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(scored(1L) > scored(2L),
      s"reference-like doc 1 (${scored(1L)}) should outscore " +
        s"OOV-heavy doc 2 (${scored(2L)})")
    // empty reference: no model — score NOTHING, loudly droppable
    val empty = docs()
    assert(graft.text.TextFunctions
      .unigramLmFrom(empty, corpus, "text", "doc_id").count() == 0L)
  }

  test("cross-corpus bigram LM: hand-checked logprobs, order sensitivity, empty reference") {
    // reference: bigrams "a b" x2, "b a" x1; unigrams a:2(+1 trailing)=3? count:
    // "a b a b" -> tokens a,b,a,b: bigrams (a b),(b a),(a b); cu: a=2? no: a appears 2x, b 2x; V=2
    val ref = docs(10L -> "a b a b")
    val scored = graft.text.TextFunctions
      .bigramLmFrom(ref, docs(
        1L -> "a b",      // one bigram, seen twice in ref
        2L -> "b a",      // one bigram, seen once
        3L -> "b b",      // unseen bigram, seen context
        4L -> "z q"       // unseen bigram, unseen context
      ), "text", "doc_id", alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // V=2, cu(a)=2, cu(b)=2: doc1 = ln((2+.5)/(2+1)); doc2 = ln(1.5/3);
    // doc3 = ln(.5/3); doc4 = ln(.5/1)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(scored(1L) == r6(math.log(2.5 / 3.0)), scored.toString)
    assert(scored(2L) == r6(math.log(1.5 / 3.0)))
    assert(scored(3L) == r6(math.log(0.5 / 3.0)))
    assert(scored(4L) == r6(math.log(0.5 / 1.0)))
    // in-order beats shuffled: the property a unigram model CANNOT
    // express (both docs have identical token counts)
    assert(scored(1L) > scored(3L))
    // single-token docs have no bigrams: absent from the output
    assert(!graft.text.TextFunctions
      .bigramLmFrom(ref, docs(7L -> "a"), "text", "doc_id")
      .collect().map(_.getLong(0)).contains(7L))
    // empty reference: no model — score nothing
    assert(graft.text.TextFunctions
      .bigramLmFrom(docs(), docs(1L -> "a b"), "text", "doc_id")
      .count() == 0L)
  }

  test("unigram LM and token-budget handle an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.text.TextFunctions
      .unigramLm(empty, "text", "doc_id").count() == 0)
    assert(graft.pipeline.Sampling
      .tokenBudgetSample(empty, "text", "doc_id", 100L).count() == 0)
    assert(graft.pipeline.Sampling
      .tokenBudgetSample(empty, "text", "doc_id", 100L, exact = true)
      .count() == 0)
    // bm25's corpus constants (N, avgdl, dfs) come back as one row —
    // on an empty corpus avgdl is SQL NULL; must yield empty, not NPE
    assert(graft.text.TextFunctions
      .bm25(empty, "text", "doc_id", Seq("zebra")).count() == 0)
    // approxQuantile returns no quantiles on empty input — the gate
    // must yield empty, not a MatchError
    val emptyScored = Seq.empty[(Long, Double)].toDF("doc_id", "score")
    assert(Curation.qualityGate(emptyScored, "score", "doc_id", 0.3)
      .count() == 0)
  }

  test("malformed parameters are refused loudly") {
    val corpus = docs(1L -> "some text here")
    intercept[IllegalArgumentException] {
      graft.pipeline.Sampling.hashSample(corpus, "doc_id", -0.1)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Sampling.hashSample(corpus, "doc_id", Double.NaN)
    }
    intercept[IllegalArgumentException] {
      graft.similarity.Quantize.cosineTopKInt8(
        corpus.select(col("doc_id"), array().as("q")), "q", "doc_id",
        Seq.empty[Float], 5)
    }
  }

  test("unigram LM scores in one narrow pass; join twin agrees exactly") {
    val corpus = docs(1L -> "a b c d e", 2L -> "a a f g h")
    // default: the collected vocab rides the scoring expression — the
    // scoring side plans no join, no aggregation, no exchange (the
    // count/vocab jobs run at build time; this is the scoring plan)
    val out = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("unigram_score"),
      s"expected the narrow scoring expression in:\n$plan")
    for (bad <- Seq("Join", "Exchange", "Aggregate"))
      assert(!plan.contains(bad), s"unexpected $bad in:\n$plan")
    // the join leg (the executable twin) must produce the identical
    // deterministic scores, including the OOV pseudo-count rows
    val narrow = out.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val joined = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 4,
        narrowScoring = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(narrow == joined)
    // the twin still broadcasts its vocab probe side
    val joinPlan = graft.text.TextFunctions
      .unigramLm(corpus, "text", "doc_id", vocabSize = 4,
        narrowScoring = false)
      .queryExecution.executedPlan.toString
    assert(joinPlan.contains("BroadcastExchange") ||
      joinPlan.contains("BroadcastHashJoin"),
      s"expected broadcast vocab side in:\n$joinPlan")
    // and on the real corpus, with a tight vocab forcing many OOV
    // rows, the legs still agree to the last bit
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def leg(narrow: Boolean) = graft.text.TextFunctions
      .unigramLm(real, "text", "doc_id", vocabSize = 64,
        narrowScoring = narrow)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(leg(true) == leg(false))
  }

  test("bm25 scores match the formula and skip non-matching docs") {
    import graft.text.TextFunctions
    val corpus = docs(
      1L -> "zebra runs fast",
      2L -> "the cat sat on the mat",
      3L -> "cat and zebra"
    )
    val out = TextFunctions
      .bm25(corpus, "text", "doc_id", Seq("zebra", "cat"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // hand-computed: N=3, avgdl=(3+6+3)/3=4, k1=1.2, b=0.75
    def idf(df: Double) = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, dl: Double, idfV: Double) =
      idfV * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 4.0))
    val exp1 = BigDecimal(w(1, 3, idf(2))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp3 = BigDecimal(w(1, 3, idf(2)) + w(1, 3, idf(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == exp1)      // one zebra hit, dl=3
    assert(out(3L) == exp3)      // zebra + cat, dl=3, both df=2
    assert(out(2L) > 0 && out(2L) < out(3L)) // one common-term hit
  }

  test("approx quality gate plan has no global sort") {
    val df = (1L to 1000L).map(i => (i, (i % 37).toDouble)).toDF("doc_id", "score")
    val gated = Curation.qualityGate(df, "score", "doc_id", 0.3)
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"approx gate must not sort:\n$plan")
    assert(!plan.contains("Window"), s"approx gate must not window:\n$plan")
  }

  test("repetition gate drops repetitive docs, keeps prose, stays a filter") {
    val corpus = Seq(
      // clean prose, LONG enough that a once-occurring 4-gram stays
      // under 16% of the chars (the panel measures share-of-doc, so
      // very short docs trip the top-n cuts — Gopher pairs this gate
      // with its min-length gate for exactly that reason)
      1L -> ("many different words appear here and nothing repeats " +
        "because each clause says something new about the subject " +
        "while later sentences keep introducing fresh vocabulary so " +
        "every window over this document covers only a small part " +
        "of its total character count as real prose generally does"),
      // duplicated-line page: dup_line_frac 2/3 > 0.30
      2L -> "same footer line\nsame footer line\nactual content here",
      // 2-gram loop: top_2gram_char_frac ≈ 1 > 0.20
      3L -> ("click here click here click here click here click here"),
      4L -> "" // empty: all signals 0.0 → passes
    ).toDF("doc_id", "text")
    val kept = Curation.repetitionGate(corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"gate kept $kept")
    // custom thresholds: loosening the gram cuts readmits doc 3 (its
    // periodic text trips the dup-n mass signals too, so both families
    // must open for it to pass)
    val loose = Curation.repetitionGate(corpus, "text",
      maxTopNgramCharFrac = Seq(1.0, 1.0, 1.0),
      maxDupNgramCharFrac = Seq.fill(6)(1.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(loose == Set(1L, 3L, 4L))
    // wrong threshold arity is refused
    intercept[IllegalArgumentException](
      Curation.repetitionGate(corpus, "text", maxTopNgramCharFrac = Seq(0.2)))
    // a pure filter: no shuffle, no aggregate
    val plan = Curation.repetitionGate(corpus, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Aggregate"),
      s"repetition gate must stay a narrow filter:\n$plan")
  }

  test("native repetition gate ≡ the composed eleven-threshold panel " +
      "filter on real and adversarial docs") {
    import graft.text.TextFunctions
    // real corpus + constructed near-threshold docs: the one-walk
    // boolean (graft.functions.RepetitionGate) must admit EXACTLY the
    // docs the panel-threshold predicate admits, at the defaults and
    // at tight custom thresholds
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val edge = Seq(
      900001L -> "x\nx\nx y z w v u t s r q p o n m l k j i h g f e d",
      900002L -> Seq.fill(40)("loop the loop").mkString(" "),
      900003L -> "",
      900004L -> "one two three four five six seven eight nine ten"
    ).toDF("doc_id", "text")
    val corpus = real.unionByName(edge)
    val families = Seq(
      (0.30, 0.20, Seq(0.20, 0.18, 0.16),
        Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)),
      (0.05, 0.05, Seq(0.08, 0.06, 0.05),
        Seq(0.10, 0.09, 0.08, 0.07, 0.06, 0.05)))
    for ((dl, dlc, top, dup) <- families) {
      val native = Curation.repetitionGate(corpus, "text", dl, dlc, top, dup)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val rs = TextFunctions.repetitionStats(col("text"))
      val checks = Seq(
        rs.getField("dup_line_frac") <= dl,
        rs.getField("dup_line_char_frac") <= dlc) ++
        top.zipWithIndex.map { case (t, i) =>
          rs.getField(s"top_${i + 2}gram_char_frac") <= t
        } ++
        dup.zipWithIndex.map { case (t, i) =>
          rs.getField(s"dup_${i + 5}gram_char_frac") <= t
        }
      val composed = corpus.where(checks.reduce(_ && _))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(native == composed,
        s"native gate diverged at ($dl,$dlc,$top,$dup): " +
          s"extra=${native -- composed}, missing=${composed -- native}")
    }
  }
}
