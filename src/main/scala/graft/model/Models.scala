package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Typed models for the two event schemas the reference processes
  * (SURVEY.md §0) plus the session/user aggregate shapes, with the explicit
  * StructTypes used at ingest boundaries (the reference declares fixed
  * schemas at every boundary — spark_stream.py:44-54,
  * spark_batch_job.py:102-107 — and so do we).
  */
object Models {

  /** eCommerce ingest event — reference spark_stream.py:44-54. `price` is
    * deliberately a string at ingest (the reference quirk P16); downstream
    * sums cast explicitly.
    */
  final case class EcommerceEvent(
      user_id: String,
      event_type: Option[String],
      product_id: Option[String],
      event_time: Option[Timestamp],
      category_id: Option[String],
      category_code: Option[String],
      brand: Option[String],
      price: Option[String],
      user_session: Option[String])

  val ecommerceSchema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("event_type", StringType),
    StructField("product_id", StringType),
    StructField("event_time", TimestampType),
    StructField("category_id", StringType),
    StructField("category_code", StringType),
    StructField("brand", StringType),
    StructField("price", StringType),
    StructField("user_session", StringType)))

  /** Synthetic web event — the historical streaming schema recovered from
    * the reference checkpoint (kafka_stream.py:23-40; tmp/state schema).
    */
  final case class WebEvent(
      user_id: String,
      event_type: String,
      url: String,
      timestamp: Timestamp,
      utm_source: String)

  val webEventSchema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("event_type", StringType),
    StructField("url", StringType),
    StructField("timestamp", TimestampType),
    StructField("utm_source", StringType)))

  /** Session record — the 14-column Postgres DDL the historical streaming
    * job served (spark_stream.py:116-131).
    */
  final case class SessionRecord(
      user_id: String,
      session_start_time: Timestamp,
      session_end_time: Timestamp,
      session_duration_seconds: Long,
      number_of_events: Long,
      first_event_type: Option[String],
      last_event_type: Option[String],
      events_json: String)
}
