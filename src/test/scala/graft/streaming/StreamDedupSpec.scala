package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase

class StreamDedupSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("dropDuplicatesWithinWatermark suppresses cross-batch duplicates") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamDedup.withinWatermark(
      input.toDF().toDF("event_id", "ts", "payload"), "ts", "10 minutes", "event_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "a"), (1L, ts(0), "a-dup"), (2L, ts(1), "b"))
      q.processAllAvailable()
      input.addData((1L, ts(2), "a-late-dup"), (3L, ts(3), "c"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L), "duplicate event_id=1 must emit once")
    } finally q.stop()
  }

  test("batch dedup keeps one row per key") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("event_id", "v")
    assert(StreamDedup.batch(df, "event_id").count() === 2)
  }
}
