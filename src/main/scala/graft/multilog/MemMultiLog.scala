package graft.multilog

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core._

/** Driver-memory [[MultiLogApi]] backend — the reference's
  * `multilog/mem` (roaring-in-heap, no persistence) member of the
  * conformance registry (multilog/test/registry.go:11-47): per-addr
  * sorted seq sets behind the same interface. Like [[graft.storage
  * .MemLog]], this backend IS the driver's heap by design; queries
  * still go through the shared QuerySpec → DataFrame lowering, so
  * plan-level behavior matches the durable backend — only storage
  * differs. */
final class MemMultiLog(val spark: SparkSession) extends MultiLogApi {

  // insertion-ordered addrs, sorted deduped seqs per addr — exactly a
  // bitmap per sublog
  private val subs = mutable.LinkedHashMap.empty[String, mutable.TreeSet[Long]]
  private val deletedEpoch = mutable.Map.empty[String, Long]
  private var epoch = 0L

  override def table: DataFrame = synchronized {
    val rows = subs.iterator.flatMap { case (a, seqs) =>
      seqs.iterator.map(s => Row(a, s))
    }.toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 1024)),
      StructType(Seq(
        StructField("addr", StringType, nullable = false),
        StructField("seq", LongType, nullable = false))))
  }

  override def appendBatch(df: DataFrame): Unit = {
    val rows = df
      .select(
        col(df.columns(0)).cast(StringType).as("addr"),
        col(df.columns(1)).cast(LongType).as("seq"))
      .where(col("addr").isNotNull) // null route = "don't index"
      .collect()
    synchronized {
      rows.foreach { r =>
        subs.getOrElseUpdate(r.getString(0), mutable.TreeSet.empty[Long])
          .add(r.getLong(1))
      }
      epoch += 1
    }
  }

  override def append(addr: String, parentSeq: Long): Unit = synchronized {
    subs.getOrElseUpdate(addr, mutable.TreeSet.empty[Long]).add(parentSeq)
    epoch += 1
  }

  override def sublog(addr: String): SublogApi = synchronized {
    new MemSublog(addr, epoch)
  }

  override def list(): DataFrame = table.select("addr").distinct()

  override def has(addr: String): Boolean = synchronized {
    subs.get(addr).exists(_.nonEmpty)
  }

  override def delete(addr: String): Unit = synchronized {
    subs.remove(addr)
    deletedEpoch.put(addr, epoch)
    epoch += 1
  }

  override def flush(): Unit = ()
  override def compact(): Unit = ()

  private final class MemSublog(val addr: String, handleEpoch: Long)
      extends SublogApi {

    private def guard(): Unit = MemMultiLog.this.synchronized {
      if (deletedEpoch.get(addr).exists(_ >= handleEpoch))
        throw GraftErrors.ErrSublogDeleted(addr)
    }

    private def ranks: IndexedSeq[Long] = MemMultiLog.this.synchronized {
      subs.get(addr).map(_.toIndexedSeq).getOrElse(IndexedSeq.empty)
    }

    override def seq: Long = { guard(); ranks.length - 1L }

    override def get(rank: Long): Long = {
      guard()
      val r = ranks
      if (rank < 0 || rank >= r.length) throw GraftErrors.ErrOutOfBounds(rank)
      r(rank.toInt)
    }

    override def toDF: DataFrame = {
      guard()
      val rows = ranks.zipWithIndex.map { case (s, i) => Row(i.toLong, s, false) }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.length / 1024)),
        StructType(Seq(
          StructField("seq", LongType, nullable = false),
          StructField("value", LongType, nullable = false),
          StructField("nulled", org.apache.spark.sql.types.BooleanType,
            nullable = false))))
    }

    override def query(specs: QuerySpec*): DataFrame = {
      guard()
      val plan = QueryPlan.of(specs: _*)
      require(!plan.live, "live sublog queries go through LiveTail")
      graft.query.QueryBuilder.build(toDF, plan)
    }

    override def resolve(log: graft.storage.Log): DataFrame = {
      guard()
      val sub = toDF.select(col("seq").as("rank"), col("value").as("seq"))
      log.toDF.join(sub, Seq("seq")).select("rank", "seq", "value", "nulled")
    }
  }
}

object MemMultiLog {
  def open(spark: SparkSession): MemMultiLog = new MemMultiLog(spark)
}
