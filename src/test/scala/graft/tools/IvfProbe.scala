package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Ann

/** A/B probe for the two ivfAssignVectors plans (VERDICT r10 task 2):
  * literal-codebook argmin vs the native CodebookArgmin expression,
  * at increasing k, over a synthetic corpus. Reports plan size and
  * wall time per arm; run manually, results recorded in BASELINE.md. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dims = 32
    val nRows = args.headOption.map(_.toLong).getOrElse(200000L)
    val corpus = spark.range(nRows).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (pmod(col("id") * 31 + d * 7, lit(997)) / 99.7).cast("float")
      ).as("embedding")
    ).localCheckpoint(true)
    def codebook(k: Int) = (0L until k.toLong).map { c =>
      (c, (0 until dims).map(d => (((c * 131 + d * 17) % 997).toFloat / 99.7f))
      )
    }
    def t(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"== $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // arg 2 "sampled" skips the legacy literal-vs-native k-loop (its
    // literal arms are deliberately pathological and corpus-linear)
    val sampledOnly = args.drop(1).headOption.contains("sampled")
    for (k <- Seq(256, 1024, 4096) if !sampledOnly) {
      val cb = codebook(k)
      val nat = Ann.ivfAssignVectors(corpus, "embedding", "vec_id", cb)
      println(s"   k=$k native plan chars: " +
        nat.queryExecution.executedPlan.toString.length)
      t(s"k=$k native")(nat.select(count_distinct(col("cell"))).collect())
      if (k <= 1024) {
        val lit0 = Ann.ivfAssignVectors(
          corpus, "embedding", "vec_id", cb, literalMax = 100000)
        println(s"   k=$k literal plan chars: " +
          lit0.queryExecution.executedPlan.toString.length)
        t(s"k=$k literal")(lit0.select(count_distinct(col("cell"))).collect())
      }
    }
    // sampled-training arm (VERDICT r11 task 7): k=8192 Lloyd rounds on
    // the full 200k-row corpus vs a ~25%/~50% hash-gate sample (≈6/12
    // points per centroid here — at production scale the fraction is
    // chosen for 100-1000×k points; the PROBE measures the training
    // wall-time slope, while cell coverage shows how much codebook the
    // sample can actually refresh)
    val k8 = 8192
    val init8 = (0L until k8.toLong).toSeq
    var full: Map[Long, Seq[Float]] = null
    var samp: Map[Long, Seq[Float]] = null
    t(s"k=$k8 train full(1 iter)") {
      full = Ann.kmeansTrain(corpus, "embedding", "vec_id", init8, 1)
    }
    t(s"k=$k8 train sampled 50% (1 iter)") {
      samp = Ann.kmeansTrainSampled(
        corpus, "embedding", "vec_id", init8, 1, 0.5)
    }
    t(s"k=$k8 train sampled 25% (1 iter)") {
      samp = Ann.kmeansTrainSampled(
        corpus, "embedding", "vec_id", init8, 1, 0.25)
    }
    println(s"   codebook sizes: full=${full.size} sampled=${samp.size}")
    // assignment of the FULL corpus under each codebook: cell coverage
    def coverage(cb: Map[Long, Seq[Float]]): Long =
      Ann.ivfAssignVectors(corpus, "embedding", "vec_id", cb.toSeq.sortBy(_._1))
        .select(count_distinct(col("cell"))).head().getLong(0)
    println(s"   full-corpus coverage: full=${coverage(full)} " +
      s"sampled=${coverage(samp)} of $k8")
    spark.stop()
  }
}
