package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"== $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val pairs = t("lsh pairs")(Dedup.minhashLshPairs(docs, "text", "doc_id", 8, 4, 3, 0.35))
    println("   pairs=" + pairs.count())
    val cc = t("connectedComponents")(Dedup.connectedComponents(pairs))
    t("collect")(println("   nodes=" + cc.count()))
    // Round-11 deep-graph arms (star contraction is O(log n) rounds):
    // a PATH of n nodes is the worst case the retired min-label
    // propagation could not do at all past 20 hops (silently split
    // components); here it must converge and label every node 0.
    // The clique-batch arm is the realistic near-dup shape (many
    // small dense clusters) at 100k scale.
    for (n <- Seq(10000L, 100000L); thr <- Seq(0L, 100000L)) {
      val chain = spark.range(n - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val arm = if (thr == 0L) "distributed" else "auto"
      val labels = t(s"chain n=$n [$arm]")(
        Dedup.connectedComponents(chain, localThreshold = thr)
          .agg(count(lit(1)), max("component")).collect())
      println(s"   nodes=${labels.head.getLong(0)} maxComp=${labels.head.getLong(1)}")
    }
    val cliques = spark.range(100000L)
      .select(expr("id div 10").as("g"), col("id"))
      .select(col("g") * 10 + pmod(col("id"), lit(10)).cast("long"),
        col("g") * 10 + pmod(col("id") + 1, lit(10)).cast("long"))
      .toDF("id_a", "id_b") // 10k rings of 10 (diameter 5 per ring)
    for (thr <- Seq(0L, 100000L)) {
      val arm = if (thr == 0L) "distributed" else "auto"
      val r = t(s"10k rings of 10 (100k nodes) [$arm]")(
        Dedup.connectedComponents(cliques, localThreshold = thr)
          .agg(count_distinct(col("component"))).collect())
      println(s"   components=${r.head.getLong(0)}")
    }
    spark.stop()
  }
}
