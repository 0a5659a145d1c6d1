package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated name substrings — run only the
    // matching queries (local iteration; the driver always runs all)
    val filter = args.drop(2).headOption.map(_.split(",").toSeq)
    def selected(name: String): Boolean =
      filter.forall(_.exists(name.contains))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val toRun = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected(q._1))
    val succeeded = scala.collection.mutable.ArrayBuffer.empty[String]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    toRun.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      // drop any prior run's output for this query FIRST: if this run
      // then fails, no stale parquet is left to masquerade as fresh
      val out = Paths.get(s"$outDir/$name")
      if (Files.exists(out)) {
        import scala.jdk.CollectionConverters._
        val w = Files.walk(out)
        try w.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally w.close()
      }
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        succeeded += name
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // a filtered (partial) or partially-failed run into an outDir
    // holding a prior full run would silently mix fresh and stale
    // results — the manifest, written AFTER the loop, records exactly
    // which queries THIS run produced (and which failed), so a compare
    // can tell fresh output from leftovers
    def arr(names: Seq[String]) = names.map("\"" + _ + "\"").mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/run_manifest.json"),
      s"""{"partial": ${filter.isDefined || failed.nonEmpty}, """ +
        s""""queries": ${arr(succeeded.toSeq)}, "failed": ${arr(failed.toSeq)}}""")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
