package graft

import org.apache.spark.sql.functions._

import graft.multilog.{BitmapIndex, MultiLog}

/** The bitmap-compressed materialization must agree with the row-table
  * form: cardinality, rank-select, and membership (the reference's
  * Set/Select/GetCardinality surface, multilog/roaring/sublog.go).
  */
class BitmapIndexSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap table agrees with row table on card/select/contains") {
    val mlog = MultiLog.open(spark, tmpDir("bmp"))
    val rows = for {
      k <- 2 to 5
      seq <- (0L until 100L) if seq % k == 0
    } yield (k.toString, seq)
    mlog.appendBatch(rows.toDF("addr", "seq"))

    val bt = BitmapIndex.fromTable(mlog.table).cache()
    val cards = bt.select("addr", "card").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (k <- 2 to 5) {
      assert(cards(k.toString) == (0L until 100L).count(_ % k == 0))
    }
    // rank select matches window-ranked sublog reads
    val sel = bt
      .where(col("addr") === "3")
      .select(
        BitmapIndex.bitmapSelect(col("bitmap"), lit(0L)).as("r0"),
        BitmapIndex.bitmapSelect(col("bitmap"), lit(7L)).as("r7"),
        BitmapIndex.bitmapSelect(col("bitmap"), lit(999L)).as("oob")
      )
      .collect()(0)
    assert(sel.getLong(0) == 0L && sel.getLong(1) == 21L && sel.isNullAt(2))
    assert(sel.getLong(1) == mlog.sublog("3").get(7))
    // membership
    val mem = bt
      .where(col("addr") === "5")
      .select(
        BitmapIndex.bitmapContains(col("bitmap"), lit(45L)),
        BitmapIndex.bitmapContains(col("bitmap"), lit(46L))
      )
      .collect()(0)
    assert(mem.getBoolean(0) && !mem.getBoolean(1))
    // compression sanity: serialized bitmaps are small
    val sizes = bt.select(length(col("bitmap"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ < 4096))
  }

  test("bitmap reads stay inside WholeStageCodegen (no UDF demotion)") {
    // select/card/contains are native expressions (BitmapExpr): the
    // roaring work is library code either way, but the former UDFs
    // demoted every CONSUMING projection to interpreted row
    // processing — the stage must stay fused and plan no ScalaUDF
    val mlog = MultiLog.open(spark, tmpDir("bmpcg"))
    mlog.appendBatch(
      (0L until 50L).map(s => ("a", s)).toDF("addr", "seq"))
    val df = BitmapIndex.fromTable(mlog.table)
      .select(col("addr"), col("card"),
        BitmapIndex.bitmapSelect(col("bitmap"), lit(3L)).as("r3"),
        BitmapIndex.bitmapContains(col("bitmap"), lit(7L)).as("has7"))
    assert(df.collect().length == 1)
    // the executed (adaptive) final plan, as printed: every Project
    // line must carry the WholeStageCodegen stage star `*(n)`
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!fin.contains("UDF"), s"ScalaUDF in plan:\n$fin")
    val projLines = fin.linesIterator.filter(_.contains("Project [")).toList
    assert(projLines.nonEmpty, s"no Project in plan:\n$fin")
    assert(projLines.forall(_.contains("*(")),
      s"bitmap Project fell out of WholeStageCodegen:\n$fin")
  }
}
