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
}
