package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained per-user activity BITMAPS — the streaming
  * twin of the q346 bitmap-index retention. Each micro-batch collapses
  * to (user, epoch-word, bits) and ORs into the store; the merge is
  * associative AND idempotent (x | x = x), which is the property the
  * q333 sum-merge does NOT have: a replayed or double-delivered
  * micro-batch leaves this store byte-identical, where an additive gold
  * table would silently double-count. That makes the bitmap store safe
  * under at-least-once delivery with no dedup bookkeeping at all.
  *
  * Day indexes anchor to a PINNED epoch (2024-01-01) in 63-bit words
  * (word = idx div 63, bit = idx mod 63), so the store needs no span
  * scan up front and spans of any length shard across words — the
  * multi-word generalization the q346 scaladoc promises.
  *
  * Scale shape per batch: one map-side-combinable bit_or aggregate on
  * (user, word), one full-outer OR-merge against the store keyed the
  * same way.
  */
object BitmapMaintain {

  private val Epoch = "2024-01-01"

  /** (user_id, word, bits) rollup of an events (micro-)batch. */
  def dayBitsOf(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit(Epoch))).as("idx"))
      .where(col("idx") >= 0)
      .select(col("user_id"), expr("idx div 63").cast("long").as("word"),
        expr("shiftleft(1L, idx % 63)").as("b"))
      .groupBy(col("user_id"), col("word"))
      .agg(expr("bit_or(b)").as("bits"))

  /** BASE ∨ DELTA: the idempotent OR-merge. */
  def mergeBits(base: DataFrame, delta: DataFrame): DataFrame =
    base.join(delta.withColumnRenamed("bits", "d_bits"),
        Seq("user_id", "word"), "full_outer")
      .select(col("user_id"), col("word"),
        (coalesce(col("bits"), lit(0L))
          .bitwiseOR(coalesce(col("d_bits"), lit(0L)))).as("bits"))

  /** foreachBatch body maintaining a parquet-backed bitmap store. Law:
    * [[MaintainedTable.Idempotent]] — the OR-merge converges under
    * replayed delivery with no fence; the harness still resolves the
    * store through the Hadoop FileSystem (HDFS/S3-safe) and swaps
    * atomically.
    */
  def maintainParquet(path: String)(batch: DataFrame, batchId: Long): Unit =
    MaintainedTable.maintainParquet(path, MaintainedTable.Idempotent)(
      dayBitsOf, mergeBits)(batch, batchId)

  /** Explode a bitmap store back to the distinct (user_id, day) grain —
    * the inverse that lets every day-set consumer (retention, DAU,
    * cohorting) read the compacted index as if it were the raw table.
    */
  def daysOf(store: DataFrame): DataFrame =
    store
      .select(col("user_id"), col("word"),
        explode(expr(
          "filter(sequence(0L, 62L), i -> (shiftright(bits, cast(i as int)) & 1) = 1)"))
          .as("bit"))
      .select(col("user_id"),
        date_add(to_date(lit(Epoch)),
          (col("word") * 63 + col("bit")).cast("int")).as("day"))
}
