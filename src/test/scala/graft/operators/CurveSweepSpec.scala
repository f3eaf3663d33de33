package graft.operators

import graft.SparkTestBase

/** Semantics of q173–q175: the attribution-window sweep, per-doc template
  * scores, and the right-censored day-N retention curve — hand-computable
  * fixtures pinning the windowing, flag, and censoring arithmetic.
  */
class CurveSweepSpec extends SparkTestBase {

  private def t(day: Int, sec: Int = 0) =
    new java.sql.Timestamp(1700000000000L + day * 86400000L + sec * 1000L)

  test("attribution windows: gaps bucket cumulatively; -1 never attributes") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: view, purchase 30 s later (all windows), purchase
      // 2000 s after the view (3600+ windows only)
      (1L, t(0), 1L, "view", 0.0),
      (1L, t(0, 30), 2L, "purchase", 10.0),
      (1L, t(0, 2000), 3L, "purchase", 20.0),
      // user 2: purchase with no view ever — gap -1
      (2L, t(0), 4L, "purchase", 5.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = TemporalJoins.attributionWindowsOf(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(60L) === ((3L, 1L, 0.333333)))
    assert(got(600L) === ((3L, 1L, 0.333333)))
    assert(got(3600L) === ((3L, 2L, 0.666667)))
    assert(got(86400L) === ((3L, 2L, 0.666667)))
  }

  test("template scores: shared-chunk mass at doc grain, integer flag") {
    val s = spark
    import s.implicits._
    val chunk = (1 to 8).map(i => s"w$i").mkString(" ")
    val unique = (1 to 8).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, chunk, "a"),                 // 8/8 shared → 1.0, template
      (2L, s"$chunk $unique", "a"),     // 8/16 shared → 0.5, template (2·8 >= 16)
      (3L, "x1 x2 x3", "b"))            // 0/3 shared → 0.0
      .toDF("doc_id", "text", "source")
    val got = Dedup.templateScoresOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toMap
    assert(got(1L) === ((8L, 8L, 1.0, 1)))
    assert(got(2L) === ((16L, 8L, 0.5, 1)))
    assert(got(3L) === ((3L, 0L, 0.0, 0)))
  }

  test("retention curve: right-censored denominators") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, t(0), 1L, "view"), (1L, t(2), 2L, "view"), // offsets 0, 2
      (2L, t(0), 3L, "view"),                          // offset 0
      (3L, t(2), 4L, "view"))                          // first day 2, offset 0
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.analytics.Funnels.retentionCurveOf(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // max day = day 2; max offsets: u1=2, u2=2, u3=0
    // offset 0: active 3 of 3 eligible; offset 2: active 1 of 2 eligible
    assert(got === Map(
      0L -> ((3L, 3L, 1.0)),
      2L -> ((1L, 2L, 0.5))))
  }
}
