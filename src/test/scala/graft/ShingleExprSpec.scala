package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.ShingleExpr

/** WordShingles must be exactly equivalent to the composed built-in
  * shingle expression — on the real document corpus and on
  * adversarial whitespace/empty edge cases.
  */
class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(c: org.apache.spark.sql.Column) = Dedup.shingles(c, 3)

  test("equivalent to built-in on the sf0.001 documents corpus") {
    ShingleExpr.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs
      .select(
        builtin(col("text")).as("a"),
        call_function("word_shingles", col("text"), lit(3)).as("b")
      )
      .where(not(col("a") === col("b")))
      .count()
    assert(diff == 0)
  }

  test("equivalent on whitespace edge cases") {
    ShingleExpr.register(spark)
    val edge = Seq(
      "", " ", "  ", "a", "a b", "a b c", "a b c d",
      " a b c ", "a\tb\nc", "a  b\t\tc", "\ta b c\t",
      "A B C D", "x\u000By z\fw\rq", "one", "one two"
    ).toDF("text")
    val rows = edge
      .select(
        col("text"),
        builtin(col("text")).as("a"),
        call_function("word_shingles", col("text"), lit(3)).as("b")
      )
      .collect()
    rows.foreach { r =>
      assert(
        r.getSeq[String](1) == r.getSeq[String](2),
        s"input=${r.getString(0).replace("\t", "\\t").replace("\n", "\\n")}"
      )
    }
  }

  test("native quality stats equal the composed score bit-for-bit") {
    // qualityScore's counters come from ONE native walk; the score
    // formula is identical Column algebra, so doubles must match the
    // composed multi-pass twin exactly — corpus plus an edge matrix
    // heavy on the class boundaries (punct runs, digit runs, unicode,
    // supplementary chars, token-free whitespace, nulls)
    import graft.text.TextFunctions
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edge = Seq(
      "", " ", "\t", "a.b,c;d:e!f?g", "'\"()[]{}-", "123 4567 89",
      "the and of to is", "THE AND OF", "99 bottles. of beer!",
      "é ü ß 漢字 カナ", "emoji 😀 text", "a-b-c-d",
      "   spaced   out   ", "one\ntwo\nthree", null
    ).toDF("text").union(docs.select(col("text")))
    val rows = edge.select(
      TextFunctions.qualityScore(col("text")).as("native"),
      TextFunctions.qualityScoreComposed(col("text")).as("composed"),
      col("text")).collect()
    rows.foreach { r =>
      val n = if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
      val c = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      assert(n == c, s"text=${r.get(2)}")
    }
    // the struct is read five times by the formula but must be
    // evaluated ONCE per row: the plan prints a single quality_stats
    val plan = docs
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("quality_stats"), s"missing native expr:\n$plan")
  }

  test("shingle hashes equal the composed transform(shingles, xxhash64)") {
    import org.apache.spark.sql.functions.{transform => arrTransform, xxhash64}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edge = Seq("", " ", "a", "a b", "a b c d", "A  B\tc", null)
      .toDF("text").union(docs.select(col("text")))
    val rows = edge.select(
      graft.functions.ShingleHashes.column(col("text"), 3).as("native"),
      arrTransform(
        graft.dedup.Dedup.shinglesNative(edge, col("text"), 3),
        s => xxhash64(s)).as("composed"),
      col("text")).collect()
    rows.foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getSeq[Long](0)
      val c = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      assert(n == c, s"text=${r.get(2)}")
    }
  }

  test("native lang-marker hits equal the composed per-language filters") {
    import graft.text.TextFunctions
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edge = Seq(
      "", " ", "the cat sat", "der hund ist da", "le chat est la",
      "el perro es la", "la la la", "que sera sera", // fr/es overlaps
      "THE DER LE EL", "xyzzy plugh", null
    ).toDF("text").union(docs.select(col("text")))
    val rows = edge.select(
      TextFunctions.langId(col("text")).as("native"),
      TextFunctions.langIdComposed(col("text")).as("composed"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"text=${r.get(2)}")
    }
  }

  test("native minhash signature equals the composed explode+agg form") {
    // the narrow expression must be BIT-identical to the composed
    // pipeline (the oracle-checkable executable spec) on the corpus
    // and on the whitespace/degenerate edge matrix, for BOTH hash
    // configs (md5-portable and xxhash64-production)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text"))
    val edge = Seq(
      1L -> "", 2L -> " ", 3L -> "a", 4L -> "a b", 5L -> "a b c",
      6L -> "a b c d e f", 7L -> " a\tb\nc ", 8L -> "A B C a b c",
      9L -> "x\u000By z\fw\rq", 10L -> "dup dup dup dup dup"
    ).toDF("id", "text")
    for {
      corpus <- Seq(docs.limit(200), edge)
      portable <- Seq(true, false)
    } {
      val a = Dedup
        .minhashSignatures(corpus, "text", "id", 16, 3, portable)
        .select(col("id"), col("signature").as("sig_native"))
      val b = Dedup
        .minhashSignaturesComposed(corpus, "text", "id", 16, 3, portable)
        .select(col("id"), col("signature").as("sig_composed"))
      val joined = a.join(b, Seq("id"), "full_outer")
      val diff = joined
        .where(col("sig_native").isNull || col("sig_composed").isNull ||
          not(col("sig_native") === col("sig_composed")))
        .count()
      assert(diff == 0, s"portable=$portable: $diff signatures diverge")
    }
    // null text: the composed form's explode dropped the row; the
    // native path must preserve that row-set contract
    val withNull = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    assert(Dedup.minhashSignatures(withNull, "text", "id", 8, 3, true)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("native simhash equals the composed explode+vote-agg form") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text"))
    // duplicate tokens matter (SimHash is frequency-weighted) — the
    // matrix includes docs where dedup'd votes would flip bits
    val edge = Seq(
      1L -> "a", 2L -> "a a a b", 3L -> "A a\tB b\nc",
      4L -> " xy z\fw\rq ", 5L -> "one two three four five",
      6L -> "dup dup unique"
    ).toDF("id", "text")
    for (corpus <- Seq(docs.limit(200), edge)) {
      val cases = Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
        Dedup.simhash32(corpus, "text", "id") ->
          Dedup.simhash32Composed(corpus, "text", "id"),
        Dedup.simhash64(corpus, "text", "id") ->
          Dedup.simhash64Composed(corpus, "text", "id"))
      cases.foreach { case (native, composed) =>
        val diff = native.select(col("id"), col("simhash").as("a"))
          .join(composed.select(col("id"), col("simhash").as("b")),
            Seq("id"), "full_outer")
          .where(col("a").isNull || col("b").isNull ||
            col("a") =!= col("b"))
          .count()
        assert(diff == 0, s"$diff fingerprints diverge")
      }
    }
    // blank and null docs drop from the output, matching the composed
    // token-explode row-set
    val degenerate = Seq(
      (1L, "a b"), (2L, ""), (3L, "  \n "),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    assert(Dedup.simhash64(degenerate, "text", "id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("native signature plans are NARROW: zero exchanges, zero aggregates") {
    // the point of the native expressions: fingerprints and signatures
    // stream at scan speed — the composed forms' doc-keyed shuffle and
    // wide aggregation must be gone from the physical plan, so the
    // first exchange of any dedup pipeline is its band-bucket join
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    for (df <- Seq(
        Dedup.simhash32(docs, "text", "doc_id"),
        Dedup.simhash64(docs, "text", "doc_id"),
        Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3,
          portableHash = true),
        Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3,
          portableHash = false))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(!plan.contains("Aggregate"), s"unexpected aggregate:\n$plan")
    }
  }

  test("native signature stages stay inside WholeStageCodegen") {
    // the expressions codegen via a reference-object call (their work
    // is md5/string-bound either way), so the scan→project stage must
    // remain FUSED: a CodegenFallback would demote the whole stage to
    // interpreted row processing — at 100 TB that costs the scan, the
    // null filter and every co-resident expression their codegen, not
    // just the signature itself
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    for (df <- Seq(
        Dedup.simhash64(docs, "text", "doc_id"),
        Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3,
          portableHash = true))) {
      import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
      val plan = df.queryExecution.executedPlan
      val fusedProjects = plan.collect {
        case w: WholeStageCodegenExec =>
          w.collect { case p: ProjectExec => p }.size
      }.sum
      val allProjects = plan.collect { case p: ProjectExec => p }.size
      assert(allProjects > 0, s"no Project in plan:\n$plan")
      assert(fusedProjects == allProjects,
        s"signature Project fell out of WholeStageCodegen:\n$plan")
    }
  }
}
