package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over event streams — beyond the
  * reference's surface (margaret has no event time: ordering is total
  * by seq, SURVEY §2.6), but core to a Spark-native pipeline engine:
  * watermarked windowed aggregation and custom sessionization state.
  *
  * All operators take a DataFrame that may be batch or streaming (the
  * plans are identical; tests drive them with MemoryStream and the
  * driver's events table).
  */
object EventStreamOps {

  /** Tumbling-window counts/sums per event type with a watermark for
    * late-data eviction: the canonical readStream → window → agg shape.
    * `ts` must be a TIMESTAMP column. */
  def windowedCounts(
      events: DataFrame,
      window_ : String = "5 minutes",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"),
        col("n"),
        round(col("total"), 6).as("total")
      )

  case class SessionIn(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionOut(
      user_id: Long,
      n_events: Int,
      start_ms: Long,
      end_ms: Long,
      closed_by: String
  )

  /** Session state: event count + bounds, closed when idle past the
    * gap. The flatMapGroupsWithState shape of the reference's
    * "arbitrary per-entry state machine" extension point
    * (StreamProcFunc), with Spark owning state storage + recovery. */
  def sessionize(
      events: Dataset[SessionIn],
      gapMs: Long
  ): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Int, Long, Long), SessionOut](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (uid, rows, state: GroupState[(Int, Long, Long)]) =>
        // batch-at-a-time: fold sorted events into sessions, emitting
        // each closed session; keep the open one in state
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var (n, start, end) =
          state.getOption.getOrElse((0, Long.MaxValue, Long.MinValue))
        val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (n > 0 && t - end > gapMs) {
            out += SessionOut(uid, n, start, end, "gap")
            n = 0; start = Long.MaxValue; end = Long.MinValue
          }
          n += 1
          start = math.min(start, t)
          end = math.max(end, t)
        }
        if (n > 0) state.update((n, start, end)) else state.remove()
        out.iterator
      }
  }

  /** Drain any open sessions from a batch run of [[sessionize]] — for
    * batch analytics the open session is also a session. */
  def sessionizeBatch(
      spark: SparkSession,
      events: DataFrame,
      gapMs: Long
  ): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(
        col("user_id").cast("long"),
        col("ts").cast("timestamp"),
        col("event_type")
      )
      .as[SessionIn]
    // batch path: plain groupBy + sort + fold via flatMapGroups
    typed
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, rows) =>
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
        var n = 0
        var start = Long.MaxValue
        var end = Long.MinValue
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (n > 0 && t - end > gapMs) {
            out += SessionOut(uid, n, start, end, "gap")
            n = 0; start = Long.MaxValue; end = Long.MinValue
          }
          n += 1
          start = math.min(start, t)
          end = math.max(end, t)
        }
        if (n > 0) out += SessionOut(uid, n, start, end, "open")
        out.iterator
      }
      .toDF()
  }
}
