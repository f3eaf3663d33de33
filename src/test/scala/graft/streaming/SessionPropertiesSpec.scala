package graft.streaming

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.model.Models.WebEvent

/** Property tests for sessionization invariants (SURVEY §5 test plan):
  * counts preserved under window partitioning, non-negative durations,
  * windows bounded, gap sessions non-overlapping per user. Uses seeded
  * scalacheck generators directly (the scalatest bridge isn't in the
  * offline cache) — 10 deterministic samples per property.
  */
class SessionPropertiesSpec extends SparkTestBase {

  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private val eventGen: Gen[WebEvent] = for {
    u <- Gen.choose(0, 5)
    t <- Gen.choose(0L, 2L * 60 * 60 * 1000) // 2h span
    e <- Gen.oneOf("page_view", "click", "add_to_cart", "purchase")
  } yield WebEvent(s"user_$u", e, "/p", new Timestamp(base + t), "organic")

  private val eventsGen: Gen[List[WebEvent]] =
    Gen.choose(1, 120).flatMap(n => Gen.listOfN(n, eventGen))

  private def samples(n: Int): Seq[List[WebEvent]] =
    (1 to n).map(i => eventsGen.apply(Gen.Parameters.default, Seed(i.toLong))
      .getOrElse(sys.error(s"gen failed for seed $i")))

  test("tumbling sessionization preserves events; durations bounded by window") {
    val s = spark
    import s.implicits._
    samples(10).foreach { events =>
      val out = Sessionize.tumbling(events.toDF()).collect()
      assert(out.map(_.getAs[Long]("number_of_events")).sum === events.size)
      out.foreach { r =>
        val d = r.getAs[Long]("session_duration_seconds")
        assert(d >= 0 && d < 60)
        val st = r.getAs[Timestamp]("session_start_time")
        assert(!st.before(r.getAs[Timestamp]("window_start")))
        assert(st.before(r.getAs[Timestamp]("window_end")))
      }
      // (user, window) keys unique
      val keys = out.map(r => (r.getAs[String]("user_id"), r.getAs[Timestamp]("window_start")))
      assert(keys.distinct.length === keys.length)
    }
  }

  test("gap sessions are per-user non-overlapping and separated by > gap") {
    val s = spark
    import s.implicits._
    samples(10).foreach { events =>
      val out = Sessionize.gapSession(events.toDF(), gap = "10 minutes").collect()
      assert(out.map(_.getAs[Long]("number_of_events")).sum === events.size)
      out.groupBy(_.getAs[String]("user_id")).values.foreach { rows =>
        val spans = rows.map(r => (
          r.getAs[Timestamp]("session_start_time").getTime,
          r.getAs[Timestamp]("session_end_time").getTime)).sortBy(_._1)
        spans.foreach { case (st, en) => assert(st <= en) }
        spans.zip(spans.drop(1)).foreach { case ((_, e1), (s2, _)) =>
          assert(s2 - e1 >= 10 * 60 * 1000L,
            s"consecutive sessions closer than the gap: end=$e1 nextStart=$s2")
        }
      }
    }
  }
}
