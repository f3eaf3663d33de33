package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Key-salting for skewed shuffles — the partitioning escape hatch when a
  * join key has so few (or so imbalanced) distinct values that hashing it
  * concentrates the work on a handful of reducers.
  *
  * Placement in the toolbox (in preference order):
  *   1. `broadcast(dim)` — a small dimension side makes the problem vanish;
  *      always first choice.
  *   2. AQE skew-join (`spark.sql.adaptive.skewJoin.*`, on in
  *      GraftSession) — splits oversized partitions of sort-merge joins at
  *      runtime. Handles value-level skew on high-cardinality keys well.
  *   3. Explicit salting (this file) — for the cases the first two can't
  *      reach: the dimension is too big to broadcast AND the key's
  *      CARDINALITY itself is below the shuffle parallelism (AQE can split
  *      a giant partition, but a hash join on a 5-value key still has at
  *      most 5 distinct hash targets for the build side), or a
  *      deterministic layout is required.
  *
  * Mechanics: the fact side gets a deterministic salt in [0, salts) hashed
  * from a high-cardinality column; the dim side is replicated once per
  * salt value via `explode(sequence(...))`; the join key becomes
  * (key, salt), multiplying the distinct shuffle targets by `salts`.
  * Exactly-once semantics are preserved because each fact row carries ONE
  * salt and the dim side covers every salt once. Replication cost:
  * |dim| × salts rows — pick `salts` ≈ shuffle parallelism / |hot keys|.
  */
object SkewJoins {

  /** Inner equi-join of `fact` to `dim` on `key`, salted `salts` ways.
    * `saltSource` must be a deterministic high-cardinality fact column
    * (e.g. the fact's primary key) — a pinned hash of it spreads each hot
    * key's rows evenly; nondeterministic salts (rand()) would break
    * shuffle-retry consistency.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = fact.withColumn("__graft_salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)))
    val replicated = dim.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__graft_salt")).drop("__graft_salt")
  }

  /** The q80 fixture: every event enriched with its event-type's global
    * stats — a 5-distinct-value join key, the canonical low-cardinality
    * skew shape. The dim side (5 rows) would of course broadcast in
    * production; the entry disables auto-broadcast on its own session to
    * force the shuffle path and exercise the salted plan the way it runs
    * when the dim side is join-table-sized. Oracle: the plain unsalted
    * join (salting is a pure partitioning change — bit-identical output).
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
    saltedEquiJoin(events, stats, "event_type", col("event_id"), salts)
      .select(col("event_id"), col("event_type"),
        col("n_type_events"), col("type_mean_value"))
  }
}
