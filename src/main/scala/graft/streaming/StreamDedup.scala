package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the stream-side member of the dedup
  * family (operators.Dedup covers batch). State holds one entry per key;
  * the watermark bounds it: duplicates arriving within the watermark delay
  * are dropped, state for older keys is evicted.
  *
  * Two variants:
  *  - [[byKey]]: key state never expires within the watermark window and
  *    duplicates later than the watermark may REAPPEAR (classic
  *    dropDuplicates semantics);
  *  - [[withinWatermark]]: Spark's dropDuplicatesWithinWatermark — expires
  *    key state once the watermark passes the first-seen event time +
  *    delay, the right call when duplicates cluster in time (at-least-once
  *    sources), keeping state strictly bounded.
  */
object StreamDedup {

  def byKey(events: DataFrame, tsCol: String, watermark: String,
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
