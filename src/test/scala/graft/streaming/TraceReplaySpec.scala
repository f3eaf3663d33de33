package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.model.Models.WebEvent

/** Replays the reference's own committed streaming checkpoint
  * (`/root/reference/tmp`, decoded by [[CheckpointTrace]]) against this
  * engine's [[Sessionize.tumbling]] — the SURVEY §5/§7.4.2 gate that the
  * recovered stateful query's semantics are reproduced on its own golden
  * trace, not just on synthetic MemoryStream data.
  *
  * The trace: 7 micro-batches, 50 users, 1,445 initial (user, 1-min window)
  * keys, watermark jumping 0 → 1754404809000 in batch 1 (emitting the
  * 1,311-window backlog) and creeping to 1754405027000 by batch 6 with no
  * further emissions (live windows all end after the final watermark).
  *
  * Replay construction: per reference batch b, one event per state key
  * touched in b (at its window start — emission timing depends only on key
  * existence and watermark) plus one event at the batch's maximum event
  * time M_b = watermark(b+1) + 10 min, assigned to a key whose window
  * contains M_b — so the replay's per-batch watermark progression is
  * forced to match the reference's exactly.
  */
class TraceReplaySpec extends SparkTestBase {

  import CheckpointTrace._

  private lazy val offs = offsets
  private lazy val touches = keyTouches

  test("trace structure: 7 batches, monotone offsets/watermarks, 1-min aligned windows") {
    assert(offs.map(_.id) === (0 until 7))
    assert(offs.sliding(2).forall { case Seq(a, b) =>
      a.watermarkMs <= b.watermarkMs && a.endOffset <= b.endOffset })
    assert(touches.nonEmpty)
    assert(touches.forall(t => t.winEndMs - t.winStartMs === 60000L),
      "recovered windows must be 1-minute tumbling")
    assert(touches.forall(t => t.winStartMs % 60000L === 0L),
      "recovered windows must be minute-aligned")
    // generator domain: user_0 … user_49 (kafka_stream.py:23-40)
    val users = touches.map(_.user).distinct
    assert(users.size === 50)
    assert(users.forall(_.matches("user_\\d+")))
  }

  test("trace semantics: append-mode evictions happen exactly when watermark passes window end") {
    val wmOf = offs.map(o => o.id -> o.watermarkMs).toMap
    val tombs = touches.filter(_.tombstone)
    assert(tombs.size > 1000, "the backlog flush must be present in the trace")
    // every eviction strictly after its window closed under that batch's watermark
    assert(tombs.forall(t => t.winEndMs < wmOf(t.batch)))
    // completeness: nothing overdue is still alive at the end of the trace
    val tombKeys = tombs.map(t => (t.user, t.winStartMs)).toSet
    val live = touches.filter(!_.tombstone).map(t => (t.user, t.winStartMs, t.winEndMs))
      .distinct.filterNot(t => tombKeys((t._1, t._2)))
    val finalWm = offs.last.watermarkMs
    assert(live.forall(_._3 >= finalWm),
      "every non-evicted key's window must still be open at the final watermark")
  }

  test("replaying the trace through Sessionize.tumbling reproduces watermark progression and emitted windows") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val wmOf = offs.map(o => o.id -> o.watermarkMs).toMap
    val byBatch = touches.groupBy(_.batch)
    // reference cumulative emissions after each of its batches
    val refEmittedThrough: Map[Int, Set[(String, Long)]] = {
      val sorted = touches.filter(_.tombstone).groupBy(_.batch)
      (0 until Batches).map { b =>
        b -> (0 to b).flatMap(i => sorted.getOrElse(i, Nil))
          .map(t => (t.user, t.winStartMs)).toSet
      }.toMap
    }

    val input = MemoryStream[WebEvent]
    val q = Sessionize.tumbling(input.toDF())
      .writeStream.format("memory").queryName("trace_replay")
      .outputMode("append").start()
    try {
      val inputBatches = (0 until 6) // batch 6 had no new offsets
      for (b <- inputBatches) {
        val touched = byBatch.getOrElse(b, Nil).filter(!_.tombstone)
          .map(t => (t.user, t.winStartMs, t.winEndMs)).distinct
        val impliedMax = wmOf(b + 1) + WatermarkDelayMs
        // a batch that does not advance the watermark has no key containing
        // impliedMax (that event belonged to an earlier batch) — skip the
        // carrier then; the watermark needs no re-advancing
        val maxCarrier = touched
          .filter(t => t._2 <= impliedMax && impliedMax < t._3)
          .sortBy(t => (t._1, t._2)).headOption
        val evs = touched.map(t =>
          WebEvent(t._1, "page_view", "/home", new Timestamp(t._2), "organic")) ++
          maxCarrier.map(c => WebEvent(c._1, "click", "/home",
            new Timestamp(impliedMax), "organic"))
        input.addData(evs)
        q.processAllAvailable()

        // our watermark after batch b == the reference's batch-(b+1) watermark
        val ourWm = Option(q.lastProgress)
          .flatMap(p => Option(p.eventTime.get("watermark")))
          .map(ts => java.time.Instant.parse(ts).toEpochMilli)
        assert(ourWm === Some(wmOf(b + 1)),
          s"batch $b: replay watermark must match the reference trace")

        // our cumulative emissions == reference cumulative tombstones
        // through its batch b+1 (reference emits our batch-b maturities in
        // ITS next batch, which ran under the same watermark)
        val ours = spark.table("trace_replay")
          .select($"user_id", $"window_start")
          .collect()
          .map(r => (r.getString(0), r.getTimestamp(1).getTime)).toSet
        assert(ours === refEmittedThrough(b + 1),
          s"batch $b: emitted (user, window) set must match the trace")
      }
      // end state: the full backlog emitted, nothing else
      val total = spark.table("trace_replay").count()
      assert(total === touches.count(_.tombstone).toLong)
    } finally q.stop()
  }
}
