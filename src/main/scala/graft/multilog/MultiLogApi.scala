package graft.multilog

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QuerySpec

/** The multilog contract — the reference's `multilog.MultiLog`
  * interface (multilog/multilog.go:21-31), which its conformance
  * registry runs over every backend (multilog/test/registry.go:11-47).
  * Here the matrix has two members: the durable [[MultiLog]] (bucketed
  * parquet index table) and the driver-memory [[MemMultiLog]] — the
  * same backend plurality collapse as the Log (ParquetLog/MemLog) and
  * KV (TableStore/MemKV) layers. */
trait MultiLogApi {
  def spark: SparkSession

  /** The deduplicated index table `(addr, seq)`. */
  def table: DataFrame

  /** Fan a batch of `(addr, seq)` rows into the index; idempotent on
    * (addr, seq) like bitmap `Set`. */
  def appendBatch(df: DataFrame): Unit

  def append(addr: String, parentSeq: Long): Unit

  /** Open a sublog handle (creates-on-write semantics). */
  def sublog(addr: String): SublogApi

  /** Non-empty sublog addresses. */
  def list(): DataFrame

  def has(addr: String): Boolean

  /** Drop a sublog and poison open handles. */
  def delete(addr: String): Unit

  def flush(): Unit

  def compact(): Unit
}

/** A rank-addressed view of one sublog (bitmap `Select` semantics):
  * entry `rank` holds the parent log seq. */
trait SublogApi {
  def addr: String

  /** Cardinality - 1, or SeqEmpty (-1) when empty. */
  def seq: Long

  /** Rank → parent seq. */
  def get(rank: Long): Long

  /** `(seq, value, nulled)` rows where seq = rank, value = parent seq. */
  def toDF: DataFrame

  /** QuerySpec query over ranks. */
  def query(specs: QuerySpec*): DataFrame

  /** Resolve entries back to parent-log values: `(rank, seq, value,
    * nulled)`. */
  def resolve(log: graft.storage.Log): DataFrame
}
