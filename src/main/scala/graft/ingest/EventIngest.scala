package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.model.Models

/** Kafka-payload decode + enrichment — the reference's streaming transform
  * chain P1-P11 (/root/reference/spark_jobs/spark_stream.py:40-91),
  * re-expressed as composable DataFrame stages so the same code runs on a
  * batch DataFrame, a Kafka stream, or a file stream.
  *
  * All stages are narrow projections (no shuffle) and codegen-friendly, so
  * at 100 TB the whole chain fuses into the scan's WholeStageCodegen.
  */
object EventIngest {

  /** P1-P3: binary Kafka value → JSON string → struct → flat columns.
    * PERMISSIVE parse: malformed JSON yields a null struct, hence null
    * columns — identical to the reference's from_json behavior.
    */
  def decodeJson(kafkaDf: DataFrame, schema: StructType = Models.ecommerceSchema): DataFrame =
    kafkaDf
      .selectExpr("CAST(value AS STRING) AS json_str")
      .select(from_json(col("json_str"), schema).as("data"))
      .select(col("data.*"))

  /** P9 fixed: split `category_code` on a LITERAL dot. The reference passes
    * "." to split(), which is a regex matching every char and yields empty
    * strings (SURVEY §7.4.1) — we implement the intended semantics.
    * [[quirkCompatSplit]] preserves the bug for behavioral comparison.
    */
  def mainCategory(categoryCode: Column): Column =
    when(categoryCode.isNotNull, split(categoryCode, "\\.").getItem(0))
      .otherwise("unknown")

  def subCategory(categoryCode: Column): Column =
    when(categoryCode.isNotNull, split(categoryCode, "\\.").getItem(1))
      .otherwise("unknown")

  /** The reference's actual (buggy) split — regex dot. Kept only as a
    * documented quirk for tests.
    */
  def quirkCompatSplit(categoryCode: Column): Column =
    split(categoryCode, ".").getItem(0)

  /** P4-P11: enrichment — processing-date stamp (partition key), event-date
    * derivations, category split, final column ordering
    * (spark_stream.py:62-91).
    */
  def enrich(df: DataFrame): DataFrame =
    df
      .withColumn("extracted_date", current_date())
      .withColumn("date", to_date(col("event_time")))
      .withColumn("date_of_week", date_format(col("event_time"), "EEEE"))
      .withColumn("hour_of_day", hour(col("event_time")))
      .withColumn("main_category", mainCategory(col("category_code")))
      .withColumn("sub_category", subCategory(col("category_code")))
      .select("user_id", "event_type", "product_id", "event_time",
        "category_id", "category_code", "main_category", "sub_category",
        "brand", "price", "user_session",
        "date", "date_of_week", "hour_of_day", "extracted_date")

  /** Full chain on a Kafka-shaped frame (streaming or batch). */
  def pipeline(kafkaDf: DataFrame): DataFrame = enrich(decodeJson(kafkaDf))

  /** S1: Kafka streaming source with the reference's admission-control
    * options (spark_stream.py:29-36). Untestable without a broker — the
    * builder is kept separate from the transform chain for exactly that
    * reason.
    */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
      topic: String, maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()

  /** JSON file streaming source with the same schema — the broker-free
    * stand-in used by tests and local runs.
    */
  def jsonFileSource(spark: SparkSession, path: String,
      schema: StructType = Models.ecommerceSchema): DataFrame =
    spark.readStream.schema(schema).json(path)
}
