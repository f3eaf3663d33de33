package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Incrementally maintained DISTINCT-KEY registry — the
  * [[MaintainedTable.Monotone]] instantiation of the maintenance
  * contract: each micro-batch collapses to its distinct key tuples and
  * set-unions into the store. The merge is union-at-set-grain, so it is
  * idempotent (replays converge) and monotone (the store only grows) —
  * no fence, no dedup bookkeeping. This is the compacted form of the
  * exact-dedup history [[StreamDedup.nearDupIngestGate]] keeps at
  * document grain: a seen-key set any ingest gate can anti-join against.
  *
  * Scale shape per batch: one map-side-combinable distinct on the batch
  * (delta-sized), one full-outer-shaped union-distinct against the store
  * keyed the same way. The store is distinct-key-sized by contract; at
  * 100 TB it graduates to a bucketed table or a Bloom/KMV sketch (the
  * q74/q210 paths) — the LAW stays the contract.
  */
object KeySetMaintain {

  /** Distinct key tuples of a (micro-)batch. */
  def keysOf(keys: Seq[String])(batch: DataFrame): DataFrame =
    batch.select(keys.map(col): _*).distinct()

  /** BASE ∪ DELTA: the monotone set-union merge. */
  def mergeKeys(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta).distinct()

  /** foreachBatch body maintaining a parquet-backed key-set store. */
  def maintainParquet(path: String, keys: String*)(
      batch: DataFrame, batchId: Long): Unit =
    MaintainedTable.maintainParquet(path, MaintainedTable.Monotone)(
      keysOf(keys), mergeKeys)(batch, batchId)
}
