package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, Quantize}
import graft.storage.Bucketed

/** Int8 quantization fidelity + bucketed co-located join plan shape. */
class QuantizeBucketedSpec extends SparkSpec {

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("int8 codes are in range and invert to ~the original vector") {
    val q = Quantize.int8(emb, "embedding", "vec_id")
    val codes = q.select(explode(col("q")).as("c"))
    val mm = codes.agg(min("c"), max("c")).head()
    assert(mm.getInt(0) >= -127 && mm.getInt(1) <= 127)
    // reconstruction cosine vs the original: near-1 for every vector
    val joined = q.join(emb, "vec_id")
    val worst = joined
      .select(
        Ann.cosine(
          Quantize.dequantize(col("q"), col("scale")),
          col("embedding").cast("array<double>")
        ).as("cos")
      )
      .agg(min("cos"))
      .head()
      .getDouble(0)
    assert(worst > 0.995, s"worst reconstruction cosine $worst")
  }

  test("quantized top-k recalls the exact top-k") {
    val qv = emb.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0)
    val exact = Ann.cosineTopK(emb, "embedding", "vec_id", qv, 10)
      .collect().map(_.getLong(0)).toSet
    val quant = Quantize.cosineTopKInt8(
      Quantize.int8(emb, "embedding", "vec_id"), "q", "vec_id", qv, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & quant).size / 10.0
    assert(recall >= 0.8, s"recall@10 $recall")
  }

  test("bucketed equi-join runs with zero exchange and matches unbucketed") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val work = tmpDir("bkt")
    Bucketed.write(orders, "t_orders_b", "o_custkey", 8, s"$work/orders")
    Bucketed.write(customer, "t_customer_b", "c_custkey", 8, s"$work/customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark
        .table("t_orders_b")
        .join(spark.table("t_customer_b"),
          col("o_custkey") === col("c_custkey"))
      val n = j.count()
      assert(n == orders.join(customer,
        col("o_custkey") === col("c_custkey")).count())
      val bj = spark
        .table("t_orders_b")
        .join(spark.table("t_customer_b"),
          col("o_custkey") === col("c_custkey"))
      bj.collect()
      val plan = bj.queryExecution.executedPlan.toString
      // the whole point: both sides pre-bucketed on the key -> the
      // sort-merge join reads co-located buckets, no shuffle at all
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
