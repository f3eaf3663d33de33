package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the stream-side member of the dedup
  * family (operators.Dedup covers batch). State holds one entry per dedup
  * key, bounded by the watermark: state older than the watermark is
  * evicted.
  *
  * Two variants:
  *  - [[byKeyAndTime]]: dedup key = (keys..., exact event time) — a
  *    redelivered row only dedups if its timestamp is byte-identical.
  *    Including the event-time column is what lets the watermark expire
  *    state (classic streaming dropDuplicates pattern);
  *  - [[withinWatermark]]: Spark's dropDuplicatesWithinWatermark — dedups
  *    on the keys ALONE (re-stamped timestamps still dedup) and expires
  *    key state once the watermark passes first-seen + delay. The right
  *    call for at-least-once sources that re-stamp on redelivery.
  */
object StreamDedup {

  def byKeyAndTime(events: DataFrame, tsCol: String, watermark: String,
      keys: String*): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  def withinWatermark(events: DataFrame, tsCol: String, watermark: String,
      keys: String*): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Batch counterpart with identical call shape. */
  def batch(events: DataFrame, keys: String*): DataFrame =
    events.dropDuplicates(keys)
}
