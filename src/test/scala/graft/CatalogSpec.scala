package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.{ParquetLog, TableStore}

/** The SQL catalog surface: `graft.log.`<path>`` / `graft.table.
  * `<path>`` must resolve to the SAME DSv2 tables the format readers
  * build — identical rows, pushdown intact — and every DDL verb must
  * refuse loudly (stores are created by their owning APIs, whose
  * open-time contracts SQL DDL would bypass). */
class CatalogSpec extends SparkSpec {

  spark.conf.set("spark.sql.catalog.graft",
    classOf[graft.sources.GraftCatalog].getName)

  private val valueType = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  test("SQL over a log by path == the format reader, pushdown intact") {
    import spark.implicits._
    val dir = tmpDir("cat-log-") + "/log"
    val log = ParquetLog.open(spark, dir, valueType)
    log.append((0L until 100L).map(i => (s"k$i", i)).toDF("k", "v")
      .select(struct(col("k"), col("v")).as("value")))
    val viaSql = spark.sql(
      s"SELECT seq, value.k AS k, value.v AS v FROM graft.log.`$dir` " +
        "WHERE seq >= 90 ORDER BY seq")
    val viaFormat = spark.read.format("graft-log").load(dir)
      .where(col("seq") >= 90)
      .select(col("seq"), col("value.k").as("k"), col("value.v").as("v"))
      .orderBy("seq")
    assert(viaSql.collect().toSeq == viaFormat.collect().toSeq)
    assert(viaSql.count() == 10)
    // the seq bound is pushed into the scan, exactly like the format
    // leg (same ScanBuilder behind the resolver)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("Sort"),
      s"unexpected plan shape:\n$plan")
  }

  test("SQL over a change table by path, with _ver served") {
    import spark.implicits._
    val dir = tmpDir("cat-table-") + "/store"
    val store = TableStore.open(spark, dir, valueType)
    store.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    store.append(Seq(("a", 3L)).toDF("k", "v"))
    val rows = spark.sql(
      s"SELECT k, v, _ver FROM graft.table.`$dir` ORDER BY _ver, k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq ==
      Seq(("a", 1L, 1L), ("b", 2L, 1L), ("a", 3L, 2L)))
  }

  test("unknown namespaces and missing paths resolve to TABLE_OR_VIEW_NOT_FOUND; DDL refuses") {
    val missing = intercept[Exception](
      spark.sql(s"SELECT * FROM graft.log.`${tmpDir("cat-none-")}/absent`")
        .collect())
    assert(missing.getMessage.contains("not") ||
      missing.getMessage.contains("NOT_FOUND"), missing.getMessage)
    val badNs = intercept[Exception](
      spark.sql("SELECT * FROM graft.nope.`/tmp/x`").collect())
    assert(badNs.getMessage.nonEmpty)
    val ddl = intercept[Exception](
      spark.sql(s"CREATE TABLE graft.log.`${tmpDir("cat-ddl-")}/t` (x INT)"))
    assert(ddl.getMessage.contains("read-resolution") ||
      ddl.getMessage.toLowerCase.contains("not supported"), ddl.getMessage)
    val drop = intercept[Exception](
      spark.sql(s"DROP TABLE graft.log.`/tmp/never`"))
    assert(drop.getMessage.nonEmpty)
    // the two fixed namespaces list
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet
    assert(ns == Set("log", "table"), ns.toString)
  }
}
