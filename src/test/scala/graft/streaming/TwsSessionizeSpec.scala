package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.model.Models.WebEvent

class TwsSessionizeSpec extends SparkTestBase {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private def ev(user: String, minute: Int, sec: Int = 0,
      etype: String = "click"): WebEvent =
    WebEvent(user, etype, "/home", ts(minute, sec), "organic")

  test("transformWithState sessionizer closes by timer and matches semantics") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[WebEvent]
    val q = TwsSessionize.sessionize(spark, input.toDS(), gapMs = 5 * 60 * 1000L)
      .writeStream.format("memory").queryName("tws")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_tws").toString)
      .start()
    try {
      input.addData(ev("u1", 0, 0, "page_view"), ev("u1", 2, 0, "purchase"))
      q.processAllAvailable()
      assert(spark.table("tws").count() === 0)
      // push the watermark past 10:02 + 5 min so the timer fires
      input.addData(ev("u9", 30)); q.processAllAvailable()
      input.addData(ev("u9", 31)); q.processAllAvailable()
      val rows = spark.table("tws").collect()
        .filter(_.getAs[String]("user_id") == "u1")
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getAs[Long]("number_of_events") === 2L)
      assert(r.getAs[Long]("session_duration_seconds") === 120L)
      assert(r.getAs[String]("first_event_type") === "page_view")
      assert(r.getAs[String]("last_event_type") === "purchase")
      assert(r.getAs[String]("closed_by") === "timeout")
    } finally { q.stop(); spark.conf.unset(key) }
  }
}
