package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Models.WebEvent

/** Custom-state sessionization via flatMapGroupsWithState — the
  * KeyValueGroupedDataset path for session semantics the built-in
  * `session_window` can't express (per-session event cap enforced inside
  * the state, custom emission payloads, early flush on size).
  *
  * State: one CONSTANT-SIZE entry per user (start/last times, count,
  * first/last types — no event buffer). Emission: when the event-time
  * watermark passes the session's last activity + gap (EventTimeTimeout),
  * or immediately when the event count hits `maxEventsPerSession` (bounds
  * session length, forcing a flush on runaway keys).
  *
  * Scale notes: state is per-user (hash-distributed), O(1) per entry;
  * timeouts garbage-collect state exactly like watermarked aggregations.
  * Per micro-batch, one group's events are materialized and sorted for the
  * deterministic gap scan — bounded by source admission control
  * (maxOffsetsPerTrigger), not by this operator.
  */
object StatefulSessionize {

  case class SessionState(
      start: Long, lastTs: Long, count: Long,
      firstType: String, lastType: String)

  case class SessionOut(
      user_id: String,
      session_start_time: Timestamp,
      session_end_time: Timestamp,
      session_duration_seconds: Long,
      number_of_events: Long,
      first_event_type: String,
      last_event_type: String,
      closed_by: String)

  def sessionize(spark: SparkSession, events: Dataset[WebEvent],
      gapMs: Long = 30 * 60 * 1000L,
      maxEventsPerSession: Int = 10000): Dataset[SessionOut] = {
    import spark.implicits._

    def emit(user: String, s: SessionState, closedBy: String): SessionOut =
      SessionOut(user,
        new Timestamp(s.start), new Timestamp(s.lastTs),
        (s.lastTs - s.start) / 1000L, s.count,
        s.firstType, s.lastType, closedBy)

    def update(user: String, it: Iterator[WebEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit(user, _, "timeout")).toList
        state.remove()
        return out.iterator
      }
      var cur = state.getOption
      val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
      // Sort the micro-batch's events for this group by event time so the
      // gap-splitting scan is deterministic. This materializes one group ×
      // one micro-batch in memory — bounded upstream by source admission
      // control (maxOffsetsPerTrigger), NOT by eventCap (which bounds
      // state across batches).
      def freshSession(t: Long, etype: String): Option[SessionState] = {
        val s = SessionState(t, t, 1, etype, etype)
        if (maxEventsPerSession <= 1) { out += emit(user, s, "cap"); None }
        else Some(s)
      }
      it.toSeq.sortBy(e => (e.timestamp.getTime, e.event_type)).foreach { e =>
        val t = e.timestamp.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapMs =>
            out += emit(user, s, "gap")
            cur = freshSession(t, e.event_type)
          case Some(s) =>
            // order-robust merge: a late event earlier than the session
            // start must lower start/firstType, and lastType only changes
            // when the event is the temporally-latest seen
            val next = SessionState(
              start = math.min(s.start, t),
              lastTs = math.max(s.lastTs, t),
              count = s.count + 1,
              firstType = if (t < s.start) e.event_type else s.firstType,
              lastType = if (t >= s.lastTs) e.event_type else s.lastType)
            if (next.count >= maxEventsPerSession) {
              out += emit(user, next, "cap")
              cur = None
            } else cur = Some(next)
          case None =>
            cur = freshSession(t, e.event_type)
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          // close when the watermark passes last activity + gap
          state.setTimeoutTimestamp(s.lastTs + gapMs)
        case None => state.remove()
      }
      out.iterator
    }

    events
      .withWatermark("timestamp", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
