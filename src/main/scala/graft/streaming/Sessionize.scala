package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked streaming sessionization — the historical stateful query
  * recovered from the reference's checkpoint (SURVEY.md §2.9: 1-minute
  * tumbling windows keyed by user, 10-minute watermark, collect_list
  * aggregate, append-mode emission) plus the idiomatic `session_window`
  * gap upgrade. The same functions run in batch mode (identical semantics,
  * minus the watermark) — that equivalence is what the streaming tests
  * assert.
  *
  * Scale notes: state is keyed by (user, window) and dropped at watermark
  * expiry (append mode); the event list is capped (SURVEY §7.4.3 —
  * unbounded per-key buffers are the 100 TB hazard); for production state
  * stores, RocksDB replaces the default HDFS-backed provider via conf, no
  * code change.
  */
object Sessionize {

  /** Session shaping per the reference's serving DDL
    * (spark_stream.py:116-131): start/end/duration/count/first/last/json.
    */
  private def sessionAggs(cap: Int): Seq[Column] = Seq(
    min(col("timestamp")).as("session_start_time"),
    max(col("timestamp")).as("session_end_time"),
    (unix_timestamp(max(col("timestamp"))) - unix_timestamp(min(col("timestamp"))))
      .as("session_duration_seconds"),
    count(col("event_type")).as("number_of_events"),
    min_by(col("event_type"), col("timestamp")).as("first_event_type"),
    max_by(col("event_type"), col("timestamp")).as("last_event_type"),
    to_json(slice(array_sort(collect_list(struct(
      col("timestamp").cast("long").as("ts"),
      col("event_type"), col("url"), col("utm_source")))), 1, cap))
      .as("events_json"))

  /** ST2-ST6 parity: 1-minute tumbling windows per user with a 10-minute
    * event-time watermark, emitting once the watermark passes window end
    * (append mode). Works on streaming and batch frames (watermark is a
    * no-op in batch).
    */
  def tumbling(events: DataFrame,
      windowLength: String = "1 minute",
      watermarkDelay: String = "10 minutes",
      eventCap: Int = 100): DataFrame = {
    val aggs = sessionAggs(eventCap)
    events
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowLength), col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("user_id"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("session_start_time"), col("session_end_time"),
        col("session_duration_seconds"), col("number_of_events"),
        col("first_event_type"), col("last_event_type"), col("events_json"))
  }

  /** Gap-based sessionization via `session_window` — the domain-correct
    * upgrade (a "session" ends after `gap` of inactivity, not at minute
    * boundaries).
    */
  def gapSession(events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes",
      eventCap: Int = 100): DataFrame = {
    val aggs = sessionAggs(eventCap)
    events
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(session_window(col("timestamp"), gap), col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("user_id"),
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("session_start_time"), col("session_end_time"),
        col("session_duration_seconds"), col("number_of_events"),
        col("first_event_type"), col("last_event_type"), col("events_json"))
  }
}
