package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the role of the reference's `create_spark`
  * (/root/reference/spark_jobs/spark_stream.py:7-22) but tuned for a modern
  * Spark: AQE on, UTC session timezone, shuffle partitions sized to the
  * machine instead of the legacy default 200
  * (the reference ran 200 — see /root/reference/tmp/offsets/0 conf).
  *
  * ANSI mode is disabled: the reference ran PySpark 3.5 with ANSI off and
  * relies on permissive implicit casts (e.g. summing a string-typed price
  * column, spark_batch_job.py:48). We keep explicit casts in our own code but
  * pin the flag so semantics are stable across Spark upgrades.
  */
object GraftSession {

  /** Shared config applied to every session (local dev, Verify, Bench).
    * Registers [[graft.plans.GraftExtensions]]: the graft_cosine SQL
    * function and the (off-by-default) approx-distinct rewrite rule.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    // Parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark's vectorized
    // reader; read as long and convert in Tables.events (integer ns→µs).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    .config("spark.ui.enabled", "false")

  /** Local session used by tests and ad-hoc mains. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", math.max(cores, 4).toString)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
