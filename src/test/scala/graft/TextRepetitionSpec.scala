package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Gopher-style repetition signals: hand-computed vectors, degenerate
  * shapes, a brute-force explode+groupBy twin, and the narrow-plan
  * guarantee (the whole panel is per-row algebra — no shuffle). */
class TextRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: DataFrame, c: org.apache.spark.sql.Column): Double =
    df.select(c).collect().head.getDouble(0)

  private def doc(text: String): DataFrame = Seq(text).toDF("text")

  test("dupLineFrac / dupLineCharFrac count duplicated line instances") {
    // 4 content lines: "aa" twice (dup), "b", "cc" — 2/4 instances dup;
    // chars: dup 4 of total 7
    val d = doc("aa\nb\n\naa\ncc")
    assert(one(d, TextFunctions.dupLineFrac(col("text"))) == 0.5)
    assert(one(d, TextFunctions.dupLineCharFrac(col("text"))) == 0.571429)
    // no duplicated line
    val u = doc("x\ny\nz")
    assert(one(u, TextFunctions.dupLineFrac(col("text"))) == 0.0)
    // blank-ish lines are structure, not content: "  " never counts
    val blanks = doc("  \n  \nreal line")
    assert(one(blanks, TextFunctions.dupLineFrac(col("text"))) == 0.0)
    // empty text
    assert(one(doc(""), TextFunctions.dupLineFrac(col("text"))) == 0.0)
    assert(one(doc(""), TextFunctions.dupLineCharFrac(col("text"))) == 0.0)
  }

  test("topNgramCharFrac: count × chars over text chars, clamped") {
    // "to be or not to be" → top 2-gram "to be" ×2, 5 chars;
    // text = 18 chars → 10/18
    val d = doc("to be or not to be")
    assert(one(d, TextFunctions.topNgramCharFrac(col("text"), 2)) ==
      0.555556)
    // degenerate overlap oversubscribes → clamp at 1.0
    val aa = doc("a a a a a a")
    assert(one(aa, TextFunctions.topNgramCharFrac(col("text"), 2)) == 1.0)
    // fewer than n tokens → no full n-gram → 0.0
    assert(one(doc("single"), TextFunctions.topNgramCharFrac(col("text"), 2))
      == 0.0)
    // tie-break: equal counts resolve to the lexicographically
    // LARGEST gram — "x b" wins among {"a x", "x b", "b z"}, all ×1
    val tie = doc("a x b z")
    assert(one(tie, TextFunctions.topNgramCharFrac(col("text"), 2)) ==
      0.428571) // 3 chars / 7
  }

  test("dupNgramCharFrac: duplicated gram mass over total gram mass") {
    // "a b c d e a b c d e f g h i j": 15 toks → 11 5-grams, only
    // "a b c d e" (positions 1 and 6; 9 chars) repeats.
    // dup mass 2×9 = 18; total mass 11×9 = 99 → 18/99
    val d = doc("a b c d e a b c d e f g h i j")
    assert(one(d, TextFunctions.dupNgramCharFrac(col("text"), 5)) ==
      0.181818)
    // fully periodic text: EVERY 5-gram repeats (period 5) → 1.0
    assert(one(doc(("a b c d e " * 3).trim),
      TextFunctions.dupNgramCharFrac(col("text"), 5)) == 1.0)
    // all-unique grams → 0
    assert(one(doc("q w e r t y u"),
      TextFunctions.dupNgramCharFrac(col("text"), 5)) == 0.0)
    // below n tokens → 0
    assert(one(doc("a b c"),
      TextFunctions.dupNgramCharFrac(col("text"), 5)) == 0.0)
  }

  test("panel equals the individual signals and explode-groupBy twins") {
    val corpus = Seq(
      1L -> "the cat sat\nthe cat sat\nsomething else entirely here",
      2L -> "no repeats at all in this short document",
      3L -> ("spam spam spam spam spam " * 4).trim,
      4L -> "",
      5L -> "one two three four five six seven eight one two three four",
      6L -> "x\n\nx\n  \ny y y"
    ).toDF("doc_id", "text")

    val panel = corpus
      .select(col("doc_id"),
        TextFunctions.repetitionStats(col("text")).as("rs"))
      .select("doc_id", "rs.*")
      .orderBy("doc_id")
      .collect()

    // twin 1: the INDEPENDENT Column-algebra implementation (sorted-
    // array adjacency / run extraction) — bit-identical to the native
    // one-walk expression
    val composed = corpus
      .select(col("doc_id"),
        TextFunctions.repetitionStatsComposed(col("text")).as("rs"))
      .select("doc_id", "rs.*")
      .orderBy("doc_id")
      .collect()
    assert(panel.map(_.toSeq).toSeq == composed.map(_.toSeq).toSeq)

    // twin 2: set-theoretic recomputation (explode + groupBy counts —
    // the oracle's shape) for the line signals and one gram size each
    val lines = corpus
      .select(col("doc_id"),
        explode(split(col("text"), "\n")).as("ln"))
      .where(length(trim(col("ln"))) > 0)
      .groupBy("doc_id", "ln").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        round(
          sum(when(col("c") >= 2, col("c")).otherwise(0L)).cast("double") /
            sum(col("c")), 6).as("dlf"),
        round(
          sum(when(col("c") >= 2, col("c") * length(col("ln")))
            .otherwise(0L)).cast("double") /
            sum(col("c") * length(col("ln"))), 6).as("dlcf"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    panel.foreach { r =>
      val (dlf, dlcf) = lines.getOrElse(r.getLong(0), (0.0, 0.0))
      assert(r.getDouble(1) == dlf, s"doc ${r.getLong(0)} dup_line_frac")
      assert(r.getDouble(2) == dlcf, s"doc ${r.getLong(0)} dup_line_char_frac")
    }

    val dup5 = corpus
      .where(size(TextFunctions.tokens(col("text"))) >= 5)
      .select(col("doc_id"),
        explode(TextFunctions.ngramsAll(col("text"), 5)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(
        sum(when(col("c") >= 2, col("c") * length(col("g"))).otherwise(0L))
          .cast("double") /
          sum(col("c") * length(col("g"))), 6).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    panel.foreach { r =>
      assert(r.getDouble(6) == dup5.getOrElse(r.getLong(0), 0.0),
        s"doc ${r.getLong(0)} dup_5gram_char_frac")
    }
  }

  test("random corpora: native walk ≡ Column-algebra twin, incl. unicode") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("the", "cat", "sat", "mat", "dog", "ran", "far",
      "zebra", "café", "naïve", "日本", "a")
    def randDoc(): String = {
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        val w = vocab(rnd.nextInt(vocab.size))
        // sprinkle newlines and stray whitespace between tokens
        val sep = rnd.nextInt(10) match {
          case 0 => "\n"
          case 1 => "\n\n"
          case 2 => "  "
          case 3 => "\t"
          case _ => " "
        }
        w + sep
      }.mkString
    }
    // surrogate-pair doc pins code-point (not UTF-16-unit) counting
    val docs = (0 until 40).map(i => (i.toLong, randDoc())) :+
      (40L -> "x 😀😀 y\nx 😀😀 y\nz 😀 w") :+
      (41L -> "line one\nline one\n\t\nline two")
    val df = docs.toDF("doc_id", "text")
    val native = df
      .select(col("doc_id"),
        TextFunctions.repetitionStats(col("text")).as("rs"))
      .select("doc_id", "rs.*").orderBy("doc_id").collect()
    val composed = df
      .select(col("doc_id"),
        TextFunctions.repetitionStatsComposed(col("text")).as("rs"))
      .select("doc_id", "rs.*").orderBy("doc_id").collect()
    native.zip(composed).foreach { case (n, c) =>
      assert(n.toSeq == c.toSeq, s"doc ${n.getLong(0)} diverged:\n$n\n$c")
    }
  }

  test("ngramsAll (zipped shifted slices) equals the positional reference") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "single", "", "  spaced   out\ttokens\nhere  ",
      ("x " * 40).trim)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- 1 to 5) {
      val got = df.orderBy("id")
        .select(TextFunctions.ngramsAll(col("text"), n))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
      val want = texts.map { t =>
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.size >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
        else Seq(toks.mkString(" "))
      }
      assert(got == want, s"n=$n diverged from the positional reference")
    }
  }

  test("the panel plans NARROW: no Exchange, no Aggregate, no Join") {
    // spark.range (not a LocalRelation — ConvertToLocalRelation would
    // fold the project away and the assert would pass vacuously)
    val plan = spark.range(8)
      .select(col("id"),
        TextFunctions.repetitionStats(
          concat(lit("w w x y z line\nline "), col("id"))).as("rs"))
      .queryExecution.executedPlan.toString
    for (bad <- Seq("Exchange", "Aggregate", "Join", "Sort "))
      assert(!plan.contains(bad), s"repetition panel plans a $bad:\n$plan")
  }
}
