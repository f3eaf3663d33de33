package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's daily batch job on its OWN schema — the direct
  * re-expression of /root/reference/spark_jobs/spark_batch_job.py over the
  * silver eCommerce table (9 ingest columns + enrichment, sessions keyed by
  * the pre-assigned `user_session` id). The testdata-backed queries (q11+)
  * prove the operators against the DuckDB oracle; this module proves the
  * reference's exact query shapes and output columns on its schema.
  *
  * Deliberate deviations (SURVEY §7.4.1, each intended semantics):
  *  - session start/end use min/max, not order-nondeterministic first/last;
  *  - favorite-category ties break on category_code;
  *  - the string `price` column is cast explicitly.
  */
object EcommerceBatch {

  private def isPurchase: Column = col("event_type") === "purchase"

  /** session_level_df — spark_batch_job.py:27-41. */
  def sessionLevel(events: DataFrame): DataFrame =
    events.groupBy(col("user_session"))
      .agg(
        (unix_timestamp(max(col("event_time"))) - unix_timestamp(min(col("event_time"))))
          .as("session_duration_seconds"),
        count(col("event_type")).as("number_of_events"),
        countDistinct(col("product_id")).as("item_view_in_session"),
        max(when(isPurchase, 1).otherwise(0)).as("is_purchase"))

  /** user_level_df core aggregates — spark_batch_job.py:44-50. */
  def userLevel(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        sum(when(isPurchase, 1).otherwise(0)).cast("long").as("total_purchases"),
        sum(when(isPurchase && col("price").isNotNull,
          col("price").cast("double"))).as("total_spent"),
        max(when(isPurchase, col("event_time"))).as("last_purchase_date"))

  /** favorite category per user — spark_batch_job.py:54-63. */
  def favoriteCategory(events: DataFrame): DataFrame = {
    val counts = events
      .filter(col("category_code").isNotNull)
      .groupBy(col("user_id"), col("category_code"))
      .agg(count(lit(1)).as("interaction_count"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("interaction_count").desc, col("category_code"))
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
      .select(col("user_id"), col("category_code").as("favorite_category"))
  }

  /** user_level_df final shape — spark_batch_job.py:67-85: join favorite
    * category, days-since-last-purchase against the table's max date
    * (broadcast instead of the reference's driver collect), -1 sentinel,
    * drop the raw timestamp.
    */
  def userEnriched(events: DataFrame): DataFrame = {
    val anchor = events.agg(max(to_date(col("event_time"))).as("anchor_date"))
    userLevel(events)
      .join(favoriteCategory(events), Seq("user_id"), "left")
      .crossJoin(broadcast(anchor))
      .withColumn("days_since_last_purchase",
        when(col("last_purchase_date").isNotNull,
          datediff(col("anchor_date"), to_date(col("last_purchase_date"))))
          .otherwise(lit(-1)).cast("int"))
      .drop("last_purchase_date", "anchor_date")
  }
}
