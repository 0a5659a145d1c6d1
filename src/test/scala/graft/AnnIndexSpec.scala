package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** On-disk partitioned ANN index: results match the in-memory path
  * and probes are served by partition pruning, not a full scan. */
class AnnIndexSpec extends SparkSpec {

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("indexTopK matches in-memory lshTopK and prunes partitions") {
    val path = tmpDir("annidx") + "/idx"
    Ann.writeBucketedIndex(emb, "embedding", "vec_id", path, bits = 4)
    val qv = emb.where(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0)

    val mem = Ann.lshTopK(
      Ann.lshBuckets(emb, "embedding", "vec_id", bits = 4),
      "embedding", "vec_id", qv, 5, bits = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val disk = Ann.indexTopK(spark, path, "embedding", "vec_id", qv, 5, bits = 4)
    val diskRows = disk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(diskRows == mem)

    // the probe set must reach the scan as PartitionFilters: the plan
    // reads the probed bucket directories only (5 of 16 at hamming 1)
    val plan = disk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket probe not pushed to partition pruning:\n$plan")
    val scanned = disk.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.exists(_ <= 5), s"scanned $scanned partitions, want <=5")
  }
}
