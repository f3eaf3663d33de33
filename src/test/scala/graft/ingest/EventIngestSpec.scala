package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Decode + enrichment chain (reference P1-P11), including the documented
  * quirk deviations (SURVEY §7.4.1).
  */
class EventIngestSpec extends SparkTestBase {

  private def kafkaShaped(values: String*) = {
    val s = spark
    import s.implicits._
    values.toDF("v").select(col("v").cast("binary").as("value"))
  }

  private val goodJson =
    """{"user_id":"u1","event_type":"view","product_id":"p9",
      |"event_time":"2019-10-01 12:34:56 UTC","category_id":"c1",
      |"category_code":"electronics.smartphone.apple","brand":"apple",
      |"price":"1081.98","user_session":"s-123"}""".stripMargin.replaceAll("\n", "")

  test("decodeJson parses the 9-field event and accepts ' UTC' timestamps") {
    val row = EventIngest.decodeJson(kafkaShaped(goodJson)).collect().head
    assert(row.getAs[String]("user_id") === "u1")
    assert(row.getAs[String]("price") === "1081.98") // string at ingest (P16)
    assert(row.getAs[java.sql.Timestamp]("event_time")
      === java.sql.Timestamp.valueOf("2019-10-01 12:34:56"))
  }

  test("malformed JSON yields null columns (PERMISSIVE), not a failure") {
    val rows = EventIngest.decodeJson(kafkaShaped("{not json", goodJson)).collect()
    assert(rows.length === 2)
    assert(rows.count(_.isNullAt(0)) === 1)
  }

  test("enrich splits category on a literal dot and defaults null to unknown") {
    val out = EventIngest.pipeline(kafkaShaped(
      goodJson,
      goodJson.replace(""""category_code":"electronics.smartphone.apple",""", "")))
    val rows = out.select("main_category", "sub_category", "hour_of_day", "date_of_week").collect()
    val withCat = rows.find(_.getString(0) == "electronics").get
    assert(withCat.getString(1) === "smartphone")
    assert(withCat.getInt(2) === 12)
    assert(withCat.getString(3) === "Tuesday") // 2019-10-01
    assert(rows.exists(r => r.getString(0) == "unknown" && r.getString(1) == "unknown"))
  }

  test("string-typed price sums via explicit cast (reference P16/A8)") {
    val df = EventIngest.decodeJson(kafkaShaped(
      goodJson,
      goodJson.replace("1081.98", "18.02"),
      goodJson.replace(""""price":"1081.98"""", """"price":"oops""""))) // non-numeric → null
    val total = df.agg(sum(col("price").cast("double"))).collect().head.getDouble(0)
    assert(math.abs(total - 1100.0) < 1e-9)
  }

  test("quirk-compat: the reference's regex-dot split yields empty strings") {
    val s = spark
    import s.implicits._
    val r = Seq("electronics.smartphone").toDF("category_code")
      .select(EventIngest.quirkCompatSplit(col("category_code")).as("m"))
      .collect().head.getString(0)
    assert(r === "") // documents the reference bug we deliberately fixed
  }
}
