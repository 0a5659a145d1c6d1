package graft
import org.apache.spark.sql.SparkSession
import graft.core.QuerySpec._

/** Scratch: where does append_events time go? */
object ProfAppend {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.load(spark, "/root/testdata/sf0.1", "events")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    println("== rows: " + events.count())
    val v = EngineFixtures.eventValue(events)
    t("fixture_transform_count")(v.count())
    t("fixture_transform_count2")(v.count())
    val work = java.nio.file.Files.createTempDirectory("profapp").toString
    val log = graft.storage.ParquetLog.open(spark, s"$work/log",
      v.schema.head.dataType)
    t("append_total")(log.append(v))
    val log2 = graft.storage.ParquetLog.open(spark, s"$work/log2",
      v.schema.head.dataType)
    t("append_total2")(log2.append(v))
    t("scan_back")(log.query(SeqWrap(true)).count())
    spark.stop()
  }
}
