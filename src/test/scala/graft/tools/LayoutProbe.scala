package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Layout

/** Z-order layout payoff on real data: write lineitem clustered on
  * (l_partkey, l_suppkey) vs naively partitioned, then measure (a)
  * how many files a two-dimensional box predicate overlaps by footer
  * stats — the file-skipping lever a stats-aware catalog uses at
  * 100 TB — and (b) the local wall-clock of the box query on each
  * layout (row-group-level parquet pruning). Write costs reported so
  * the maintenance price is on the record next to the payoff.
  * Run: sbt "Test/runMain graft.tools.LayoutProbe [sfDir] [numFiles]"
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numFiles = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.load(spark, sfDir, "lineitem")
    val work = Files.createTempDirectory("layout-probe").toString
    val zDir = s"$work/z"
    val nDir = s"$work/naive"

    def timeIt[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val (tz, _) = timeIt(
      Layout.writeZOrdered(li, Seq("l_partkey", "l_suppkey"), zDir,
        numFiles, bits = 15))
    val (tn, _) = timeIt(
      li.repartition(numFiles).write.mode("overwrite").parquet(nDir))
    println(f"== write: zorder $tz%.2f s, naive $tn%.2f s ($numFiles files)")

    // box: ~5% of the partkey range x ~5% of the suppkey range
    val (pLo, pHi, sLo, sHi) = (4000L, 4999L, 250L, 299L)
    def overlap(dir: String): (Long, Long) = {
      val st = Layout.fileStats(spark, dir, Seq("l_partkey", "l_suppkey"))
      (st.where(col("l_partkey_min") <= pHi && col("l_partkey_max") >= pLo &&
          col("l_suppkey_min") <= sHi && col("l_suppkey_max") >= sLo).count(),
        st.count())
    }
    val (zHit, zN) = overlap(zDir)
    val (nHit, nN) = overlap(nDir)
    println(s"== box-overlap by footer stats: zorder $zHit/$zN files, " +
      s"naive $nHit/$nN files")

    def scanMin3(dir: String): (Double, Long) = {
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 0 until 3) {
        val (t, r) = timeIt {
          spark.read.parquet(dir)
            .where(col("l_partkey").between(pLo, pHi) &&
              col("l_suppkey").between(sLo, sHi))
            .agg(count(lit(1)), sum(col("l_extendedprice"))).collect()
        }
        best = math.min(best, t)
        rows = spark.read.parquet(dir)
          .where(col("l_partkey").between(pLo, pHi) &&
            col("l_suppkey").between(sLo, sHi)).count()
      }
      (best, rows)
    }
    val (zT, zRows) = scanMin3(zDir)
    val (nT, nRows) = scanMin3(nDir)
    println(f"== box scan (min of 3): zorder $zT%.3f s, naive $nT%.3f s " +
      s"($zRows rows both: ${zRows == nRows})")

    // the PARTITIONED variant: planning-time directory pruning via
    // zBoxFilter — report dirs scanned / total and the scan time
    val pDir = s"$work/zpart"
    val (tp, _) = timeIt(Layout.writeZOrderedPartitioned(
      li, Seq("l_partkey", "l_suppkey"), pDir, bits = 15, dirBits = 8))
    val boxed = spark.read.parquet(pDir)
      .where(Layout.zBoxFilter(Seq("l_partkey", "l_suppkey"),
        Seq((pLo, pHi), (sLo, sHi)), bits = 15, dirBits = 8))
    val dirsScanned = boxed.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.getOrElse(-1)
    var pBest = Double.MaxValue
    var pRows = 0L
    for (_ <- 0 until 3) {
      val (t, _) = timeIt(
        boxed.agg(count(lit(1)), sum(col("l_extendedprice"))).collect())
      pBest = math.min(pBest, t)
    }
    pRows = boxed.count()
    println(f"== partitioned (write $tp%.2f s): box plans $dirsScanned of " +
      f"256 dirs, scan $pBest%.3f s ($pRows rows, matches: ${pRows == zRows})")
    spark.stop()
  }
}
