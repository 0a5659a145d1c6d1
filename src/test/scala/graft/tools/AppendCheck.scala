package graft.tools
import org.apache.spark.sql.SparkSession
object AppendCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = graft.Tables.load(spark, "/root/testdata/sf0.1", "events")
    val n = events.count()
    val work = java.nio.file.Files.createTempDirectory("appendcheck").toString
    val vt = graft.EngineFixtures.eventValue(events).schema.head.dataType
    val log = graft.storage.ParquetLog.open(spark, s"$work/log", vt)
    log.append(graft.EngineFixtures.eventValue(events))
    println(s"== events=$n logSeq=${log.seq} logRows=${log.toDF.count()}")
    spark.stop()
  }
}
