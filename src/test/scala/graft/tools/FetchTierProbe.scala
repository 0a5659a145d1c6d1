package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Slope of the candidate-text fetch's TOP tier (r18 verdict task 5):
  * when an ingest batch's candidate-id set exceeds
  * `maxPushedFetchIds`, the verify fetch falls back from the
  * broadcast-semi prune to a columnar pass over the corpus texts —
  * the ONE per-batch cost left in the incremental loop that scales
  * with the corpus, previously claimed rare by design prose only.
  * This probe forces the tier (`maxPushedFetchIds = 1`) at growing
  * corpus sizes and measures it against the normal pushed tier,
  * in BOTH candidate shapes:
  *
  *   - '''clustered''': plants pair the batch with the most RECENT
  *     corpus ids (the steady-state shape — near-dups concentrate in
  *     fresh data). The id-envelope fence (pushed BETWEEN over the
  *     candidates' id range, Dedup.incrementalFromBands) should hold
  *     this flat over an id-sorted corpus via row-group pruning.
  *   - '''spread''': plants pair uniformly across the whole corpus —
  *     the envelope covers everything and the tier degrades to the
  *     honest corpus-linear pass (the pre-fence behavior's floor).
  *
  * Run manually: `Test/runMain graft.tools.FetchTierProbe
  * [corpusSizes...]`; results recorded in BASELINE.md.
  */
object FetchTierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizes =
      if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(250000L, 1000000L, 2000000L)
    val batchSize = 5000L

    // DaemonProbe's synthetic crawl: 40 hash-derived tokens per doc,
    // no cross-doc shingle sharing except the plants
    def body(seed: org.apache.spark.sql.Column) = concat_ws(" ",
      transform(sequence(lit(0), lit(39)), i =>
        pmod(xxhash64(seed, i), lit(99991)).cast("string")))

    for (n <- sizes) {
      val work = java.nio.file.Files
        .createTempDirectory(s"fetch-probe-$n-").toString
      // id-sorted corpus layout (the seen store's compact order):
      // row-group min/max on doc_id is what the envelope fence prunes
      spark.range(n).select(col("id").as("doc_id"),
          body(col("id")).as("text"))
        .repartitionByRange(16, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.parquet(s"$work/corpus")
      val corpus = spark.read.parquet(s"$work/corpus")
      Dedup.lshBandIndex(corpus, "text", "doc_id",
          numHashes = 8, bands = 4)
        .write.parquet(s"$work/bands")
      val bands = spark.read.parquet(s"$work/bands")

      // batch of 5k fresh ids; 20% plants so the candidate set is
      // comfortably past maxPushedFetchIds=1 in the forced runs
      def batchOf(spreadPlants: Boolean): DataFrame = {
        val plantSeed =
          if (spreadPlants) pmod(xxhash64(col("id")), lit(n))
          else lit(n) - 1 - pmod(xxhash64(col("id")), lit(10000L))
        spark.range(n, n + batchSize).select(
          col("id").as("doc_id"),
          when(pmod(col("id"), lit(5)) === 0,
            concat(body(plantSeed), lit(" x")))
            .otherwise(body(col("id"))).as("text"))
          .localCheckpoint(true)
      }

      def run(batch: DataFrame, gate: Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val (pairs, _) = Dedup.incrementalLshPairsDiag(
          batch, "text", "doc_id", bands, corpus,
          numHashes = 8, bands = 4, threshold = 0.35,
          maxPushedFetchIds = gate)
        val np = pairs.count()
        ((System.nanoTime() - t0) / 1e9, np)
      }

      println(s"== corpus $n docs, batch $batchSize (20% plants)")
      for (shape <- Seq("clustered", "spread")) {
        val batch = batchOf(shape == "spread")
        val (warmS, _) = run(batch, 100000L) // plan/codegen warm
        val (pushedS, np) = run(batch, 100000L)
        val (forcedS, np2) = run(batch, 1L)
        assert(np == np2, s"tier changed the answer: $np vs $np2")
        println(f"   $shape%-9s pairs=$np%6d pushed=$pushedS%6.2f s " +
          f"forced-top=$forcedS%6.2f s (warm $warmS%5.2f)")
      }
    }
    spark.stop()
  }
}
