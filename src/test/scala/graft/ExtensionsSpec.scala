package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.query.Skew

/** SparkSessionExtensions registration (SQL-text access to the native
  * expressions), JSONL interchange, and skew helpers.
  */
class ExtensionsSpec extends SparkSpec {

  test("extensions expose native functions to SQL text") {
    // the injector must apply cleanly to a fresh extensions object
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the same builders, installed on a live session's registry,
    // must resolve from SQL text (getOrCreate would silently ignore
    // spark.sql.extensions when a session already exists in this JVM,
    // so the runtime path is what's testable here)
    val s2 = spark.newSession()
    GraftExtensions.registerAll(s2)
    val r = s2
      .sql(
        """SELECT vec_dot_f(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
          |  vec_norm_f(array(3.0F, 4.0F)) AS n,
          |  word_shingles('a b c d', 3) AS sh""".stripMargin
      )
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getSeq[String](2) == Seq("a b c", "b c d"))
    // the round-14 data-free natives resolve from SQL text too, and
    // match their programmatic twins exactly
    val r2 = s2
      .sql(
        """SELECT lsh_signature(array(1.0F, -1.0F), 4, 2) AS sig,
          |  shingle_hashes('a b c d', 3) AS sh,
          |  distinct_line_keys('x\ny\nx', false) AS lk""".stripMargin
      )
      .collect()(0)
    val progSig = graft.similarity.Ann.signatureOf(Seq(1.0f, -1.0f), 4)
    assert(r2.getLong(0) == progSig)
    assert(r2.getSeq[Long](1).length == 2) // "a b c", "b c d"
    assert(r2.getSeq[Long](2).length == 2) // x, y — within-doc distinct
    // the repetition panel resolves from SQL text and matches the
    // programmatic form field-for-field
    val r3 = s2
      .sql("SELECT repetition_stats('aa\naa\nbb') AS rs")
      .collect()(0).getStruct(0)
    assert(r3.getDouble(0) == 0.666667) // dup_line_frac: 2 of 3
    assert(r3.getDouble(1) == 0.666667) // dup chars 4 of 6
  }

  test("table-valued functions query logs from SQL text") {
    import spark.implicits._
    val dir = tmpDir("tvf")
    val log = graft.storage.ParquetLog
      .open(spark, s"$dir/log", org.apache.spark.sql.types.IntegerType)
    log.appendValues(Seq(10, 20, 30, 40))
    val mlog = graft.multilog.MultiLog.open(spark, s"$dir/mlog")
    mlog.appendBatch(
      Seq(("a", 0L), ("b", 1L), ("a", 2L)).toDF("addr", "seq"))

    val s2 = spark.newSession()
    GraftExtensions.registerAll(s2)
    // seq predicate composes through the view like any subquery
    val rows = s2
      .sql(s"SELECT seq, value FROM graft_log('$dir/log') WHERE seq >= 2 ORDER BY seq")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((2L, 30), (3L, 40)))
    val sub = s2
      .sql(s"SELECT seq, value FROM graft_sublog('$dir/mlog', 'a') ORDER BY seq")
      .collect()
    assert(sub.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 2L))) // ranks 0,1 → parent seqs 0,2
  }

  test("jsonl export/import round-trips a log") {
    import spark.implicits._
    val log = graft.storage.ParquetLog
      .open(spark, tmpDir("jl"), org.apache.spark.sql.types.StringType)
    log.appendValues(Seq("""{"a":1}""", """{"a":2}"""))
    val out = tmpDir("jlout")
    graft.codec.Codecs.exportJsonl(log, out)
    val back = graft.codec.Codecs.importJsonl(spark, out)
    assert(back.count() == 2)
    val parsed = spark.read.json(back.as[String])
    assert(parsed.select(sum("seq")).collect()(0).getLong(0) == 1L)
  }

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    // skewed: key "hot" holds 90% of rows
    val df = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val salted = Skew
      .saltedAgg(df, col("k"), 8,
        partial = Seq(count(lit(1)).as("n"), sum("v").as("s")),
        merge = Seq(sum("n").as("n"), sum("s").as("s")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(salted == plain)
  }

  test("bucket capping splits mega-buckets out") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("big", i)) ++ (1 to 5).map(i => ("small", i)))
      .toDF("b", "x")
    val (within, over) = Skew.capBuckets(df, Seq("b"), maxBucket = 10)
    assert(within.select("b").distinct().collect().map(_.getString(0)).toSeq == Seq("small"))
    assert(over.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("big", 100L)))
  }
}
