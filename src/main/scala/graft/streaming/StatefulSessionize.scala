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
  * State: one open session per user (events buffered up to `eventCap`,
  * counts always exact). Emission: when the event-time watermark passes the
  * session's last activity + gap (EventTimeTimeout), or immediately when
  * the buffered count hits `maxEventsPerSession` (guarding state size — the
  * SURVEY §7.4.3 unbounded-buffer hazard handled at the state layer).
  *
  * Scale notes: state is per-user (hash-distributed), each entry O(cap);
  * timeouts garbage-collect state exactly like watermarked aggregations.
  */
object StatefulSessionize {

  case class SessionState(
      start: Long, lastTs: Long, count: Long,
      firstType: String, lastType: String, types: Seq[String])

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
      // process in event-time order within the micro-batch for determinism
      it.toSeq.sortBy(e => (e.timestamp.getTime, e.event_type)).foreach { e =>
        val t = e.timestamp.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapMs =>
            out += emit(user, s, "gap")
            cur = Some(SessionState(t, t, 1, e.event_type, e.event_type, Seq(e.event_type)))
          case Some(s) =>
            val next = s.copy(
              lastTs = math.max(s.lastTs, t), count = s.count + 1,
              lastType = e.event_type)
            if (next.count >= maxEventsPerSession) {
              out += emit(user, next, "cap")
              cur = None
            } else cur = Some(next)
          case None =>
            cur = Some(SessionState(t, t, 1, e.event_type, e.event_type, Seq(e.event_type)))
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
