package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase

class StreamJoinsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream join matches purchases within the time bound only") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp, Long)]
    val purchases = MemoryStream[(String, Timestamp, Long, Double)]
    val joined = StreamJoins.clickToPurchase(
      clicks.toDF().toDF("user_id", "click_ts", "click_id"),
      purchases.toDF().toDF("user_id", "purchase_ts", "purchase_id", "amount"),
      maxDelay = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData(("u1", ts(0), 1L), ("u2", ts(5), 2L))
      purchases.addData(
        ("u1", ts(20), 100L, 9.99),  // within 30 min of click 1 → match
        ("u1", ts(45), 101L, 5.00),  // 45 min after click 1 → no match
        ("u3", ts(10), 102L, 1.00))  // no click → no match
      q.processAllAvailable()
      val out = spark.table("ssj").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
      assert(out.toSet === Set((1L, 100L)))
    } finally q.stop()
  }
}
