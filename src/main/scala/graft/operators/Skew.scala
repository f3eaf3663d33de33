package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Manual skew mitigation for equality joins — the fallback when AQE's
  * runtime skew-join split isn't available (e.g. the skew is known ahead of
  * time, or the build side must stay a shuffle join).
  *
  * Salting: the skewed (big) side scatters each key into `salt` sub-keys;
  * the other side replicates every row `salt` times, once per sub-key. The
  * join key becomes (key, salt_bucket), so one hot key's rows spread over
  * `salt` reducers instead of one. Replication multiplies the small side by
  * `salt` — keep it for dimension-sized right sides.
  *
  * Placement in the toolbox (in preference order): (1) `broadcast(dim)` —
  * a small dimension makes the problem vanish; (2) AQE skew-join — splits
  * oversized sort-merge partitions at runtime, covering value-level skew
  * on high-cardinality keys; (3) salting — for what both miss: the dim is
  * too big to broadcast AND the key's CARDINALITY is below the shuffle
  * parallelism (AQE can split a giant partition, but a hash join on a
  * 5-value key still has at most 5 distinct hash targets), or a
  * reproducible layout is required.
  *
  * Two scatter strategies, picked by what the fact rows look like:
  * [[saltedJoin]] (seeded rand) spreads even BYTE-IDENTICAL duplicate rows;
  * [[saltedJoinBy]] (pinned hash of a fact column) is deterministic under
  * any input order — required when the output feeds a hash-gated /
  * reproducibility-audited pipeline and the facts carry a unique id.
  */
object Skew {

  /** Shared body of the two salting strategies: scatter the big side with
    * `saltExpr`, replicate the small side once per bucket, join on
    * (key, bucket). Bucket values must land in [0, salt) as longs.
    */
  private def saltedJoinWith(big: DataFrame, small: DataFrame, key: String,
      saltExpr: Column, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol = "__graft_salt"
    val bigSalted = big.withColumn(saltCol, saltExpr.cast("long"))
    val smallReplicated = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigSalted.join(smallReplicated, Seq(key, saltCol), "inner").drop(saltCol)
  }

  /** Inner equi-join `big ⋈ small` on `key`, with the big side salted into
    * `salt` buckets. Result equals the unsalted join (row-for-row).
    *
    * Per-row scatter via seeded rand(): identical duplicate rows (the
    * common cause of a hot key in raw event logs) must land in DIFFERENT
    * buckets, which a row-content hash cannot do. rand(seed) is
    * deterministic per (seed, partition, row position), so task retries
    * reproduce the same buckets given deterministic input partitioning.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame =
    saltedJoinWith(big, small, key, floor(rand(20260812L) * salt), salt)

  /** [[saltedJoin]] with a DETERMINISTIC scatter: the salt is a pinned
    * hash of `saltSource`, a high-cardinality big-side column (the fact's
    * primary key). Identical-content rows with distinct ids still spread;
    * the bucket assignment is reproducible under any input order or retry
    * — rand() depends on row position, a hash of an id column does not.
    */
  def saltedJoinBy(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, salt: Int = 16): DataFrame =
    saltedJoinWith(big, small, key, pmod(xxhash64(saltSource), lit(salt.toLong)), salt)

  /** The q80 fixture: every event enriched with its event-type's global
    * stats — a 5-distinct-value join key, the canonical low-cardinality
    * skew shape. The dim side (5 rows) would of course broadcast in
    * production; the entry disables auto-broadcast on its own session to
    * force the shuffle path and exercise the salted plan the way it runs
    * when the dim side is join-table-sized. Oracle: the plain unsalted
    * join (salting is a pure partitioning change — bit-identical output,
    * which is also why the deterministic [[saltedJoinBy]] variant is the
    * one under the hash gate).
    */
  def eventTypeStatsSalted(spark: SparkSession, sfDir: String,
      salts: Int = 16): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val events = Tables.events(s, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_type_events"),
        round(round(sum(col("value")), 2) / count(lit(1)), 6).as("type_mean_value"))
    saltedJoinBy(events, stats, "event_type", col("event_id"), salts)
      .select(col("event_id"), col("event_type"),
        col("n_type_events"), col("type_mean_value"))
  }

  /** Top-n most frequent values of a column — the cheap skew probe to run
    * before choosing a mitigation (one pass + small shuffle).
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(topN)
}
