package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Sequential funnel and cohort-retention analytics — the real versions of
  * the reference's commented-out funnel report (spark_batch_job.py:102-119
  * counted distinct users per step with no ordering; a funnel requires the
  * steps to happen IN ORDER).
  *
  * Funnel shape: 3 aggregation passes (one per step), each a hash-shuffle
  * on user_id; step N's pass filters on step N-1's first-occurrence time.
  * At scale the per-step frames are aggregates (one row per user), so the
  * chained joins are small and AQE broadcasts them.
  */
object Funnels {

  /** First-occurrence ordered funnel view → click → purchase: per user the
    * earliest time of each step that occurs strictly after the previous
    * step's first occurrence, and the resulting depth 0-3.
    */
  def funnelDepth(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val t1 = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"))
    val t2 = ev.join(t1, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click" && col("ts") > col("t_view"),
        col("ts"))).as("t_click"))
    val t3 = ev.join(t2, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
        col("ts"))).as("t_purchase"))
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (when(col("t_view").isNotNull, 1).otherwise(0)
          + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
          .cast("int").as("funnel_depth"))
  }

  /** Weekly cohort retention: users grouped by first-activity week, counted
    * in each subsequent week they were active. One pass to anchor each
    * user's cohort (aggregate + broadcast-joinable), one to count
    * (cohort_week, week_offset) cells.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.distinct().join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }
}
