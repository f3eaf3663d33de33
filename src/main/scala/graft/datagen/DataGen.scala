package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Models

/** Producer-side tooling re-expressed Spark-first: the reference's CSV→Kafka
  * replay loop (S3/K1, dags/kafka_stream.py:58-85) and synthetic web-event
  * generator (S5, kafka_stream.py:23-40).
  *
  * The replay is a bounded batch job (`limit(n)` = the producer's record
  * cap); the generator maps Spark's rate source, so a sustained load test is
  * `rateEvents(spark, rowsPerSecond).writeStream...` — no driver-side loop,
  * no sleep throttling: admission control belongs to the source.
  */
object DataGen {

  /** S3: CSV replay — read the eCommerce CSV with the declared schema and
    * cap the record count (the reference caps at num_records=5000).
    */
  def csvReplay(spark: SparkSession, path: String, numRecords: Int = 5000): DataFrame =
    spark.read
      .option("header", "true")
      .schema(Models.ecommerceSchema)
      .csv(path)
      .limit(numRecords)

  /** Serialize rows to the Kafka-value JSON shape (K1's json.dumps). */
  def toKafkaPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*))
      .cast("binary").as("value"))

  /** K1: Kafka producer sink builder (batch). Untestable without a broker;
    * the payload shaping above is the testable part.
    */
  def writeKafka(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    toKafkaPayload(df).write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  private val EventTypes = Seq("page_view", "click", "add_to_cart", "purchase")
  private val Urls = Seq("/home", "/products/1", "/products/2", "/cart", "/checkout")
  private val UtmSources = Seq("facebook", "google", "tiktok_ads", "organic")

  private def pick(choices: Seq[String], key: org.apache.spark.sql.Column) =
    element_at(array(choices.map(lit): _*), (pmod(key, lit(choices.size)) + 1).cast("int"))

  /** S5: deterministic synthetic web events from a numbered row — same
    * domains as the reference generator (user_0..49, 4 event types, 5 urls,
    * 4 utm sources), derived from the row id via hashing instead of RNG so
    * fixtures are reproducible.
    */
  def syntheticEvents(spark: SparkSession, n: Long): DataFrame =
    shapeEvents(spark.range(n).toDF("id"),
      // session-TZ (UTC) literal — a java.sql.Timestamp would shift with
      // the machine zone and break fixture reproducibility
      col("id"), to_timestamp(lit("2024-01-01 00:00:00")))

  /** Streaming variant over the rate source (rowsPerSecond admission). */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    shapeEvents(rate, col("value"), col("timestamp"))
  }

  private def shapeEvents(df: DataFrame, id: org.apache.spark.sql.Column,
      baseTs: org.apache.spark.sql.Column): DataFrame =
    df.select(
      concat(lit("user_"), pmod(xxhash64(id), lit(50))).as("user_id"),
      pick(EventTypes, xxhash64(id, lit(1))).as("event_type"),
      pick(Urls, xxhash64(id, lit(2))).as("url"),
      timestamp_seconds(unix_timestamp(baseTs) + pmod(xxhash64(id, lit(3)), lit(3600)))
        .as("timestamp"),
      pick(UtmSources, xxhash64(id, lit(4))).as("utm_source"))
}
