package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

/** The media decode stage on the STREAMING ingest path: payloads arriving
  * as a readStream decode micro-batch by micro-batch through the exact
  * batch definition ([[Multimodal.decodeMetaOf]] is a stateless narrow
  * projection, so one definition serves both), with results identical to
  * the batch decode of the same records — the StreamCurate discipline
  * applied to the multimodal family.
  */
class StreamMediaSpec extends SparkTestBase {

  private def rec(id: Long, text: String): MediaRecord =
    MediaRecord(id, text.getBytes("UTF-8"), s"image/fake-src${id % 3}")

  private val records = Seq(
    rec(1L, "a tiny payload"),
    rec(2L, "a somewhat longer payload with more bytes in it to decode"),
    rec(3L, ""), // empty payload: decode must flag ok=false, not throw
    rec(4L, Seq.fill(100)("frame bytes").mkString(" ")))

  test("streaming decode emits the batch metadata for every micro-batch") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[MediaRecord]
    val q = Multimodal.decodeMetaOf(input.toDS())
      .writeStream.format("memory").queryName("smedia")
      .outputMode("append").start()
    try {
      input.addData(records(0), records(1))
      q.processAllAvailable()
      input.addData(records(2), records(3))
      q.processAllAvailable()
      val streamed = spark.table("smedia").as[MediaMeta].collect()
        .sortBy(_.doc_id)
      val batch = Multimodal.decodeMetaOf(records.toDS()).collect()
        .sortBy(_.doc_id)
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.map(_.doc_id).toSeq === Seq(1L, 2L, 3L, 4L))
      assert(!streamed(2).ok && streamed(2).n_bytes === 0L)
    } finally q.stop()
  }
}
