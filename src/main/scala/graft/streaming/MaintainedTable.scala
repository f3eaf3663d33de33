package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** The shared contract behind every stream-maintained table in this
  * engine (GoldMaintain's additive rollup, BitmapMaintain's OR-store,
  * KeySetMaintain's monotone set store): a maintained table states its
  * MERGE LAW
  * and gets the same foreachBatch body — Hadoop-FS-resolved store
  * discovery (works on HDFS/S3, not just the local filesystem), a
  * batch-id fence for laws that are NOT replay-safe, and an atomic
  * tmp-write + rename swap so a crash mid-write can never corrupt or
  * lose the store.
  *
  * Merge laws (the property the replay test checks):
  *  - [[Additive]]   — x ⊕ x ≠ x (sum/count merges). foreachBatch is
  *    at-least-once, so a batch replayed after a crash between the store
  *    write and the stream checkpoint commit would be summed in TWICE;
  *    the harness persists the last applied batchId as an
  *    `_applied_<appId>_<id>` marker inside the store directory (swapped
  *    atomically with the data it fences) and no-ops a replay.
  *  - [[Idempotent]] — x ∨ x = x (bit-OR, max, min). Replays converge
  *    byte-identically with no bookkeeping; no fence needed.
  *  - [[Monotone]]   — set-union growth (distinct-key stores, dedup
  *    histories). Idempotent at set grain; replays converge.
  *
  * Swap protocol (per batch): write merged output to `<path>.tmp`, drop
  * the marker in, rename `<path>` → `<path>.bak`, rename tmp → path,
  * delete bak. Recovery on entry covers every crash window: a stale tmp
  * is deleted (its batch will replay); a bak with no live store is
  * renamed back (crash between the two renames); a bak beside a live
  * store is dropped (crash before cleanup). The store the merge READS is
  * never the path being written, so no mid-write scan race exists.
  *
  * Scale shape: the store is metadata-sized by contract (day grain, user
  * bitmap words, distinct keys) — `coalesce(1)` and a driver-side rename
  * are deliberate; at 100 TB the store graduates to a transactional
  * table format (Delta/Iceberg MERGE) and the LAW stays the contract.
  */
object MaintainedTable {

  /** The algebraic property of the store's merge — names the replay
    * behavior the law test asserts.
    */
  sealed abstract class MergeLaw(val name: String, val replaySafe: Boolean)
  /** x ⊕ x ≠ x: replays double-count → fenced by batchId. */
  case object Additive extends MergeLaw("additive", replaySafe = false)
  /** x ∨ x = x: replays converge byte-identically. */
  case object Idempotent extends MergeLaw("idempotent", replaySafe = true)
  /** set-union growth: replays converge at set grain. */
  case object Monotone extends MergeLaw("monotone", replaySafe = true)

  private val MarkerPrefix = "_applied_"

  /** foreachBatch body template. Usage:
    * {{{
    * stream.writeStream.foreachBatch(
    *   MaintainedTable.maintainParquet(path, Additive)(dayGrainOf, mergeDayGrain) _)
    * }}}
    *
    * `appId` scopes the fence to one logical stream incarnation (the
    * Delta `txnAppId` contract): a restart that RESUMES the checkpoint
    * keeps its appId — batch numbering continues monotonically and a
    * replayed id fences correctly; a FRESH checkpoint writing into an
    * existing store must pass a NEW appId, because its batch numbering
    * restarts at 0 and would otherwise be mistaken for replays and
    * silently dropped. Replay-safe laws ignore the fence entirely.
    */
  def maintainParquet(path: String, law: MergeLaw, appId: String = "default")(
      deltaOf: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val store = new Path(path)
    val tmp = new Path(path + ".tmp")
    val bak = new Path(path + ".bak")
    val fs = store.getFileSystem(spark.sessionState.newHadoopConf())

    // recovery: resolve whatever a previous crash left behind
    if (fs.exists(tmp)) fs.delete(tmp, true) // un-committed write: replay covers it
    if (fs.exists(bak)) {
      if (fs.exists(store)) fs.delete(bak, true) // crash before cleanup
      else require(fs.rename(bak, store), // crash between the two renames
        s"maintainParquet: recovery rename $bak -> $store failed")
    }

    val exists = fs.exists(store)
    if (!law.replaySafe && exists && batchId <= lastApplied(fs, store, appId))
      return

    val delta = deltaOf(batch)
    val merged = if (exists) merge(spark.read.parquet(path), delta) else delta
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // the fence travels INSIDE the directory it fences, so data + marker
    // swap atomically together (underscore files are invisible to
    // readers); replay-safe laws never consult a fence, so they don't
    // write one
    if (!law.replaySafe)
      fs.create(new Path(tmp, s"$MarkerPrefix${appId}_$batchId")).close()
    // Hadoop rename reports failure by RETURNING false, not throwing — a
    // silently-failed swap would strand the store on the old data while
    // the stream checkpoint commits the batch (silent loss). Fail loudly;
    // the recovery block above makes any crash here safe to retry.
    if (exists) require(fs.rename(store, bak),
      s"maintainParquet: rename $store -> $bak failed")
    require(fs.rename(tmp, store),
      s"maintainParquet: rename $tmp -> $store failed")
    if (fs.exists(bak)) fs.delete(bak, true)
    ()
  }

  /** The highest batchId marker for `appId` inside the store, −1 if none
    * (a store predating the fence, or written by another incarnation, is
    * treated as never-applied — correct for the fresh-store case and for
    * the new-appId restart contract). The batchId is parsed from AFTER
    * the last underscore, so an appId that is itself an underscore-prefix
    * of another appId's marker (e.g. "gold" vs "gold_2") neither crashes
    * nor mis-parses: "gold" vs marker `_applied_gold_2_0` takes "0", and
    * the appId-exactness check below rejects it.
    */
  private def lastApplied(fs: org.apache.hadoop.fs.FileSystem,
      store: Path, appId: String): Long =
    fs.listStatus(store).iterator.map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix))
      .flatMap { rest => // rest = "<appId>_<batchId>", appId may contain _
        val cut = rest.lastIndexOf('_')
        if (cut == appId.length && rest.take(cut) == appId)
          rest.drop(cut + 1).toLongOption
        else None
      }
      .foldLeft(-1L)(math.max)
}
