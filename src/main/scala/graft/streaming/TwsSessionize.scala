package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._
import graft.model.Models.WebEvent
import graft.streaming.StatefulSessionize.{SessionOut, SessionState}

/** Gap sessionization on Spark 4's transformWithState — the successor API
  * to flatMapGroupsWithState ([[StatefulSessionize]]): typed named state
  * (`ValueState`), explicit timer registration per key, and RocksDB-only
  * state backing. Semantics match StatefulSessionize (constant-size state,
  * gap close via event-time timer, cap-forced flush).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` (enforced by the engine when this operator
  * runs — transformWithState does not support the HDFS-backed store).
  */
object TwsSessionize {

  class SessionProcessor(gapMs: Long, maxEventsPerSession: Int)
      extends StatefulProcessor[String, WebEvent, SessionOut] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    private def emit(user: String, s: SessionState, closedBy: String): SessionOut =
      SessionOut(user,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastTs),
        (s.lastTs - s.start) / 1000L, s.count, s.firstType, s.lastType,
        closedBy)

    override def handleInputRows(user: String, rows: Iterator[WebEvent],
        timers: TimerValues): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
      var cur = Option(session.get())

      def open(t: Long, etype: String): Option[SessionState] = {
        val s = SessionState(t, t, 1, etype, etype)
        if (maxEventsPerSession <= 1) { out += emit(user, s, "cap"); None }
        else Some(s)
      }

      rows.toSeq.sortBy(e => (e.timestamp.getTime, e.event_type)).foreach { e =>
        val t = e.timestamp.getTime
        cur match {
          case Some(s) if t - s.lastTs > gapMs =>
            out += emit(user, s, "gap")
            cur = open(t, e.event_type)
          case Some(s) =>
            val next = SessionState(
              start = math.min(s.start, t),
              lastTs = math.max(s.lastTs, t),
              count = s.count + 1,
              firstType = if (t < s.start) e.event_type else s.firstType,
              lastType = if (t >= s.lastTs) e.event_type else s.lastType)
            if (next.count >= maxEventsPerSession) {
              out += emit(user, next, "cap"); cur = None
            } else cur = Some(next)
          case None => cur = open(t, e.event_type)
        }
      }
      cur match {
        case Some(s) =>
          session.update(s)
          getHandle.registerTimer(s.lastTs + gapMs)
        case None => session.clear()
      }
      out.iterator
    }

    override def handleExpiredTimer(user: String, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[SessionOut] = {
      val cur = Option(session.get())
      // only close if no newer activity re-armed a later timer
      cur match {
        case Some(s) if s.lastTs + gapMs <= timer.getExpiryTimeInMs() =>
          session.clear()
          Iterator.single(emit(user, s, "timeout"))
        case _ => Iterator.empty
      }
    }
  }

  def sessionize(spark: SparkSession, events: Dataset[WebEvent],
      gapMs: Long = 30 * 60 * 1000L,
      maxEventsPerSession: Int = 10000): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("timestamp", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMs, maxEventsPerSession),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
