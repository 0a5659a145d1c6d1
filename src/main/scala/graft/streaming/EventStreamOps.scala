package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Shared session aggregation: native `session_window` grouping.
    *
    * This is the scale-critical choice: the state store merges window
    * state incrementally per (user, session) — no operator ever holds
    * one user's event list in memory, so a hot user (bot traffic, 10⁷
    * events) costs one state row, not one task's heap. The previous
    * formulation (`flatMapGroups` + per-group `toSeq.sortBy`) had
    * exactly that OOM profile and is gone.
    *
    * Gap semantics: the reference fold closes a session when
    * `t - end > gapMs` (boundary-inclusive merge). `session_window`
    * merges while `diff < gap`, so we pass `gapMs + 1` — merge iff
    * `diff <= gapMs`, bit-identical to the gaps-and-islands oracle. */
  private def sessionAgg(events: DataFrame, gapMs: Long): DataFrame =
    events
      .groupBy(
        session_window(col("ts"), s"${gapMs + 1} milliseconds"),
        col("user_id")
      )
      .agg(
        count(lit(1)).cast("int").as("n_events"),
        unix_millis(min(col("ts"))).as("start_ms"),
        unix_millis(max(col("ts"))).as("end_ms")
      )

  /** Streaming sessionization: watermarked `session_window` state.
    * Sessions emit (append mode) once the watermark passes their
    * close; every emitted session was closed by its inactivity gap, so
    * `closed_by` is always "gap" — open sessions live in the state
    * store until more events or the watermark closes them. */
  def sessionize(
      events: Dataset[SessionIn],
      gapMs: Long,
      watermark: String = "0 seconds"
  ): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    sessionAgg(events.toDF().withWatermark("ts", watermark), gapMs)
      .select(
        col("user_id"),
        col("n_events"),
        col("start_ms"),
        col("end_ms"),
        lit("gap").as("closed_by")
      )
      .as[SessionOut]
  }

  /** Batch sessionization — the same aggregation without a watermark;
    * the open tail session of each user is just another group. Returns
    * `(user_id, n_events, start_ms, end_ms)`. */
  def sessionizeBatch(
      spark: SparkSession,
      events: DataFrame,
      gapMs: Long
  ): DataFrame =
    sessionAgg(
      events.select(
        col("user_id").cast("long"),
        col("ts").cast("timestamp"),
        col("event_type")
      ),
      gapMs
    ).select("user_id", "n_events", "start_ms", "end_ms")

  /** Streaming dedup on arbitrary key columns: keep the first row per
    * key, with state BOUNDED by the watermark horizon — a key's state
    * row is evicted once the watermark passes its event time, so a
    * 100 TB/day ingest holds hours of keys, not the corpus's. (Global
    * `dropDuplicates` on a stream never evicts: unbounded state, the
    * scale-killer this wrapper exists to avoid. Re-ingests farther
    * apart than the horizon deduplicate in the BATCH tier —
    * [[graft.dedup.Dedup.exactDedup]] — which holds the full corpus
    * key set as a shuffle, not as streaming state.) */
  def dedupWithinWatermark(
      rows: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "10 minutes"
  ): DataFrame = {
    require(keyCols.nonEmpty, "dedupWithinWatermark needs >= 1 key column")
    rows
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Ingest-time CONTENT dedup: the streaming twin of exact-doc dedup,
    * keyed on the whitespace-normalized md5 fingerprint
    * ([[graft.text.TextFunctions.fingerprint]] — the same key the
    * batch tier and its q20/q21 oracles use, so stream-then-batch
    * passes agree on what "exact duplicate" means). */
  def streamingContentDedup(
      docs: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermark: String = "10 minutes"
  ): DataFrame =
    dedupWithinWatermark(
      docs.withColumn("_fp",
        graft.text.TextFunctions.fingerprint(col(textCol))),
      Seq("_fp"), tsCol, watermark)
      .drop("_fp")
}
