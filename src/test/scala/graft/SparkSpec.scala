package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one local SparkSession per suite, temp dirs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // JVM-exit ordering guard: stop any still-active streaming query
    // BEFORE SparkContext's own shutdown hook tears the executor pool
    // down. A query alive at exit (a leak, or an external timeout
    // SIGTERM-ing a long run) otherwise races the pool shutdown and
    // storms RejectedExecutionException / lost-task warnings — the
    // r20 driver verify's red tail.
    org.apache.spark.graftcompat.TestShutdown.beforeSparkStops { () =>
      s.streams.active.foreach(q =>
        try q.stop() catch { case _: Throwable => () })
    }
    s
  }
}
