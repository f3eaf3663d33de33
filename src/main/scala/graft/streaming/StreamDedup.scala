package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

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

  /** Streaming NEAR-dup ingest gate — the stream-side face of
    * [[graft.operators.Dedup.incrementalNearDupAgainst]]: every
    * micro-batch of (doc_id, text) documents is MinHash-banded against
    * the parquet HISTORY; near-dup hits (exact Jaccard ≥ `threshold`
    * against an owned document) are routed to `onHits`, and only the
    * CLEAN documents append to the history — so the lake stays near-dup
    * free without ever shuffling it (the q83/q116 zero-history-shuffle
    * contract, executed per trigger via foreachBatch, the same pattern
    * the reference uses for its JDBC sink).
    *
    * Exactly-once note: the history append is idempotent per batch only
    * if the caller keys the checkpoint to the sink (standard foreachBatch
    * discipline); the spec drives it with MemoryStream + processAll. In
    * [[MaintainedTable]] merge-law terms the history is MONOTONE (a
    * growing near-dup-free document set) kept at APPEND grain for scale —
    * the compacted overwrite-swap form of the same law is
    * [[KeySetMaintain]].
    */
  def nearDupIngestGate(docs: DataFrame, historyDir: String,
      checkpointDir: String, onHits: DataFrame => Unit,
      threshold: Double = 0.7): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val history =
          try spark.read.parquet(historyDir)
          catch { case _: Throwable => // first batch: no history yet
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], batch.schema)
          }
        val hits = graft.operators.Dedup
          .incrementalNearDupAgainst(batch.toDF(), history, threshold)
          .localCheckpoint() // one computation: consumed twice below
        onHits(hits)
        batch.toDF()
          .join(hits.select(col("batch_doc")).distinct(),
            batch("doc_id") === col("batch_doc"), "left_anti")
          .write.mode("append").parquet(historyDir)
        ()
      }
      .start()
}
