package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard export: the curated corpus as size-targeted JSONL
  * shards — the handoff format most training stacks consume (one
  * JSON object per line, shards of a few hundred MB each, documents
  * shuffled so a sequential reader sees a mixed stream, not one
  * source then the next).
  *
  * The reference stops at its own stores (a consumer reads frames
  * back out of the log, offset2/log.go:5-27); this is the missing
  * last mile of the pipeline tier. Everything is one pass + one
  * range shuffle:
  *
  *   - shard COUNT from a size TARGET: one narrow aggregation
  *     measures the corpus's actual serialized bytes
  *     (`to_json(struct(*))` lengths — the exact bytes the writer
  *     will emit, not a row-count guess), `ceil(total / target)`
  *     shards;
  *   - deterministic SHUFFLE: rows are range-partitioned and sorted
  *     by a 60-bit md5 hash of the id — the same retry-stable
  *     hash-ordering trick as [[Sampling.interleave]], so a re-run
  *     writes byte-identical shard CONTENTS (no RNG, no
  *     nondeterministic round-robin), every shard draws uniformly
  *     from the whole corpus, and within a shard the order is fixed;
  *   - the shard key is DROPPED before the write — shards carry only
  *     the caller's columns.
  *
  * At 100 TB: the measuring pass is scan-narrow (no shuffle), the
  * range shuffle is the unavoidable cost of sized output files (AQE
  * skew-splittable like any sort), and `targetShardBytes` is the
  * lever — size it to the trainer's reader, not to Spark.
  */
object Shards {

  /** Write `df` as shuffled JSONL shards under `outDir`, sized to
    * `targetShardBytes` of serialized JSON each (or exactly
    * `numShards` if given). Returns the shard count. */
  def writeJsonlShards(
      df: DataFrame,
      idCol: String,
      outDir: String,
      targetShardBytes: Long = 256L << 20,
      numShards: Int = 0): Int = {
    require(numShards >= 0, s"numShards must be >= 0 (got $numShards)")
    require(targetShardBytes > 0,
      s"targetShardBytes must be > 0 (got $targetShardBytes)")
    require(!df.columns.contains("_skey"),
      "writeJsonlShards reserves the _skey column name")
    val n =
      if (numShards > 0) numShards
      else {
        // the writer emits exactly to_json(struct(*)) + "\n" per row;
        // measure THOSE bytes, not an avg-row-size guess
        val total = df
          .agg(sum(
            octet_length(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
              + lit(1L)))
          .collect().head
        if (total.isNullAt(0)) 1
        else math.max(1L,
          math.ceil(total.getLong(0).toDouble / targetShardBytes).toLong)
          .min(Int.MaxValue).toInt
      }
    df.withColumn("_skey",
        conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .repartitionByRange(n, col("_skey"))
      .sortWithinPartitions("_skey")
      .drop("_skey")
      .write
      .mode(SaveMode.Overwrite)
      .json(outDir)
    n
  }
}
