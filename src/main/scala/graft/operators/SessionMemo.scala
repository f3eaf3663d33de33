package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo of expensive, multiply-consumed curation tables
  * (LSH pair lists, resolved components, decontamination verdicts).
  *
  * Spark's CacheManager already shares InMemoryRelations between IDENTICAL
  * analyzed plans, but the composed curation queries rebuild their
  * sub-pipelines through fresh `localCheckpoint`/iteration boundaries that
  * never canonicalize equal — so q61 used to cost ~q50 + q56 even right
  * after both ran. Memoizing the RESULT DataFrame per (session, arguments)
  * lets every consumer in the session share one persisted computation;
  * results are deterministic, so sharing cannot change any query's output.
  *
  * Sessions are keyed by OBJECT IDENTITY (SparkSession does not override
  * equals), so one session's cache can never answer another's — unlike a
  * hash-derived string key, which could collide. A WeakHashMap would NOT
  * reclaim anything here: the memoized DataFrames strongly reference
  * their own session (value → key), which pins WeakHashMap entries
  * forever. Instead the per-session maps live in a small access-ordered
  * LRU (64 sessions); an evicted session's tables are unpersisted — any
  * still-held DataFrame stays correct and simply recomputes. Values are
  * persisted
  * MEMORY_AND_DISK — all memoized tables are pair/doc-count-sized, orders
  * of magnitude below the corpus. The benign race (two threads building
  * the same key once each) is accepted over `computeIfAbsent`, whose
  * reentrancy ban a nested memoized build (components → pairs) would trip;
  * the losing thread's already-persisted DataFrame is unpersisted so the
  * race cannot leak a CacheManager registration.
  *
  * ASSUMPTION: the data under a memo key (the parquet files of an sfDir)
  * is immutable for the session — keys carry the inputs' PATHS and
  * parameters, not content hashes. A session that rewrites its input
  * fixtures in place must call [[invalidate]] to drop the stale entries
  * (the specs that regenerate fixtures do exactly this).
  */
private[graft] object SessionMemo {
  private val MaxSessions = 64

  private val bySession =
    new java.util.LinkedHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, ConcurrentHashMap[String, DataFrame]]): Boolean = {
        val evict = size() > MaxSessions
        if (evict) e.getValue.forEach { (_, df) =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () }
        }
        evict
      }
    }

  private def sessionTables(spark: SparkSession): ConcurrentHashMap[String, DataFrame] =
    bySession.synchronized {
      val existing = bySession.get(spark)
      if (existing != null) existing
      else {
        val m = new ConcurrentHashMap[String, DataFrame]()
        bySession.put(spark, m)
        m
      }
    }

  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val tables = sessionTables(spark)
    val existing = tables.get(key)
    if (existing != null) existing
    else {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = tables.putIfAbsent(key, df)
      if (prev != null) {
        // lost the benign build race: release this thread's persist so the
        // CacheManager holds exactly one registration per key
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
        prev
      } else {
        // materialize NOW and log the build cost: the cache fills with the
        // full plan output either way (InMemoryRelation doesn't prune per
        // consumer), and an attributed "[memo] built <key>" line is what
        // lets a cold-pass regression be traced to the memo that grew
        // instead of to whichever query happened to touch it first
        // (PERF.md memo-build table). Nested builds log their own lines.
        val t0 = System.nanoTime()
        try {
          val n = df.count()
          System.err.println(f"[memo] built $key: $n rows in " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch { case _: Throwable => () } // consumer's action will re-throw
        df
      }
    }
  }

  /** Drop (and unpersist) every memoized table of `spark` — for sessions
    * that rewrite the data under a previously-memoized sfDir in place.
    */
  def invalidate(spark: SparkSession): Unit = {
    val tables = bySession.synchronized(bySession.remove(spark))
    if (tables != null) tables.forEach { (_, df) =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }
}
