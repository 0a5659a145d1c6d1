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
    val nRows = 200000L
    val corpus = spark.range(nRows).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(col("id") * 31 + d * 7, lit(997)).cast("float") / 99.7f
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
    for (k <- Seq(256, 1024, 4096)) {
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
    spark.stop()
  }
}
