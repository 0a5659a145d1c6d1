package graft.indexes

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Driver-memory [[KV]] backend — the twin of the reference's
  * `mapidx` (indexes/mapidx/map.go: a Go map behind the same Index
  * interface, used to run the full index conformance suite without
  * touching disk). Same contract as [[KVIndex]], state in a TrieMap:
  * nothing survives the JVM, reads cost no Spark job. The conformance
  * matrix (KVContract) runs identically over both.
  */
final class MemKV(val spark: SparkSession) extends KV {

  // addr -> (value, tombstone); last write wins on apply order
  private val state =
    scala.collection.concurrent.TrieMap.empty[String, Option[String]]
  @volatile private var cursor: Long = graft.core.Seqs.SeqEmpty

  def applyBatch(df: DataFrame): Unit = {
    val (ticket, deliveries) = synchronized {
      val cols = df.columns
      require(cols.length >= 2,
        s"applyBatch needs (addr, value[, tombstone][, useq]) columns, " +
          s"got ${cols.mkString("(", ", ", ")")}")
      var out = df
      if (!cols.contains("tombstone"))
        out = out.withColumn("tombstone", lit(false))
      if (!cols.contains("useq"))
        out = out.withColumn("useq", lit(0L))
      val rows = out
        .select(
          col(cols(0)).cast("string").as("addr"),
          col(cols(1)).cast("string").as("value"),
          col("tombstone").cast("boolean"),
          col("useq").cast("long")
        )
        .where(col("addr").isNotNull)
        .collect()
        .sortBy(_.getLong(3)) // useq orders within the batch
      rows.foreach { r =>
        val v = if (r.getBoolean(2)) None else Option(r.getString(1))
        state.put(r.getString(0), v)
      }
      // notify per final state, like KVIndex's winning-row notify —
      // computed inside the monitor, invoked outside it (KV contract);
      // ticket taken LAST so a throw here can't orphan it
      val deliveries =
        rows.groupBy(_.getString(0)).toSeq.flatMap { case (addr, _) =>
          watcherReg.getOrElse(addr, Nil).map(_ -> state(addr))
        }
      (takeDeliveryTicket(), deliveries)
    }
    deliverOrdered(ticket, deliveries)
  }

  def set(addr: String, value: String): Unit = {
    import spark.implicits._
    applyBatch(Seq((addr, value, false)).toDF("addr", "value", "tombstone"))
  }

  def delete(addr: String): Unit = {
    import spark.implicits._
    applyBatch(
      Seq((addr, null.asInstanceOf[String], true))
        .toDF("addr", "value", "tombstone")
    )
  }

  def get(addr: String): Option[String] = state.get(addr).flatten

  def current: DataFrame = {
    val rows = state.toSeq.collect { case (a, Some(v)) => Row(a, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(
        StructField("addr", StringType, nullable = false),
        StructField("value", StringType, nullable = true)
      ))
    )
  }

  def watch(addr: String)(cb: Option[String] => Unit): KV.Watcher =
    registerWatcher(addr, cb)

  def setSeq(seq: Long): Unit = cursor = seq
  def getSeq: Long = cursor

  /** The map IS its own compacted form. */
  def compact(): Unit = ()
}

object MemKV {
  def open(spark: SparkSession): MemKV = new MemKV(spark)
}
