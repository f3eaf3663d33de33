package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental gold-table maintenance (q333's BASE ⊕ DELTA merge law run
  * as a stream): the reference rebuilds its gold tables with a full daily
  * overwrite (spark_batch_job.py:138-148); this is the incremental
  * upgrade — each micro-batch aggregates to the day grain and merges
  * algebraically into the stored rollup, so only the DELTA ever scans at
  * row grain. q333 is the correctness gate for exactly this maintenance
  * (merge result ≡ single-pass recompute, checksum-exact);
  * GoldMaintainSpec replays that equality over a MemoryStream.
  *
  * Only algebraic aggregates (sum, count — anything with an associative ⊕
  * on partial states) are safe to maintain this way; a non-algebraic
  * metric (median, distinct) must either keep a mergeable sketch (the
  * q210/q215 KMV/HLL path) or fall back to the reference's recompute.
  *
  * Scale shape: the micro-batch aggregate is map-side-combinable; the
  * merge is a calendar-day-grain full-outer join (metadata-sized both
  * sides); the store write/swap/fence protocol is [[MaintainedTable]]'s
  * (tmp-write + rename, batchId fence — sums are NOT replay-safe). At
  * 100 TB the store is a real table (Delta/Iceberg MERGE or the JDBC
  * gold table) — the ⊕ stays identical.
  */
object GoldMaintain {

  /** Day-grain rollup of an orders (micro-)batch — the q333 cents
    * contract: exact integer cents, map-side-combinable sums.
    */
  def dayGrainOf(orders: DataFrame): DataFrame =
    orders
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .groupBy(col("day"))
      .agg(sum(col("c")).as("cents"), count(lit(1)).as("n_orders"))

  /** BASE ⊕ DELTA: the full-outer coalesce merge — the ONLY merge shape
    * that is safe to run incrementally (q333 audits it against the
    * recompute).
    */
  def mergeDayGrain(base: DataFrame, delta: DataFrame): DataFrame =
    base.join(delta.withColumnRenamed("cents", "d_cents")
        .withColumnRenamed("n_orders", "d_n"), Seq("day"), "full_outer")
      .select(col("day"),
        (coalesce(col("cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
          .as("cents"),
        (coalesce(col("n_orders"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"))

  /** foreachBatch body maintaining a parquet-backed gold rollup at
    * `goldPath`. Law: [[MaintainedTable.Additive]] — the sum-merge is NOT
    * replay-safe, so the harness fences replayed batchIds (at-least-once
    * foreachBatch would otherwise double-count) and swaps the store
    * atomically. Usage:
    * {{{
    * orders.writeStream.foreachBatch(GoldMaintain.maintainParquet(goldPath) _)
    * }}}
    * `appId` follows the [[MaintainedTable]] fence contract: keep it
    * across checkpoint-resuming restarts, change it with a fresh
    * checkpoint.
    */
  def maintainParquet(goldPath: String, appId: String = "gold")(
      batch: DataFrame, batchId: Long): Unit =
    MaintainedTable.maintainParquet(goldPath, MaintainedTable.Additive, appId)(
      dayGrainOf, mergeDayGrain)(batch, batchId)
}
