package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Property tests for the round-9 kernels on SEEDED adversarial random
  * fixtures: each operator's mathematical guarantee (rank-error bound,
  * monotonicity, efficiency axiom, marginal consistency) is checked
  * against an independent in-test recompute, not against itself.
  */
class Round9PropSpec extends SparkTestBase {

  private val rnd = new scala.util.Random(0x9c0ffee)

  test("coreset quantiles: measured rank error within the sharded bound") {
    val s = spark
    import s.implicits._
    // adversarial: heavy ties + a fat tail
    val vals = (1 to 5000).map(i =>
      if (i % 7 == 0) 100L else rnd.nextInt(1000).toLong + 1L)
    val li = vals.zipWithIndex.map { case (v, i) =>
      (v / 100.0, i.toLong, 1) }
      .toDF("l_extendedprice", "l_orderkey", "l_linenumber")
    val rows = Relational.coresetQuantilesOf(spark, li).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("rank_err")
        <= r.getAs[Double]("err_bound") + 1e-9,
        s"q=${r.getAs[Double]("q")} violates the coreset guarantee")
    }
  }

  test("isotonic fit: monotone and bounded on random rates") {
    val s = spark
    import s.implicits._
    val binned = (1 to 800).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(2).toLong)).toDF("bin", "y")
    val rows = TextAnalytics.isotonicCalibrationOf(binned).collect()
      .sortBy(_.getAs[Long]("bin_rank"))
    val fits = rows.map(_.getAs[Long]("fitted_fp"))
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b })
    assert(fits.forall(f => f >= 0L && f <= 1000000L))
  }

  test("Shapley: efficiency axiom on random event streams") {
    val s = spark
    import s.implicits._
    val types = Seq("click", "error", "signup", "view", "purchase")
    val raw = (1 to 2000).map(_ =>
      (rnd.nextInt(80).toLong, types(rnd.nextInt(5))))
    val ev = raw.toDF("user_id", "event_type")
    val phi = Funnels.shapleyAttributionOf(ev).collect()
      .map(_.getLong(1)).sum
    // independent recompute of v(N) - v(empty)
    val byUser = raw.groupBy(_._1).values.toSeq.map { es =>
      (es.exists(_._2 == "purchase"),
        es.exists(e => e._2 != "purchase"))
    }
    val vN = byUser.count(_._1)
    val vEmpty = byUser.count { case (conv, touched) => conv && !touched }
    assert(phi === 24L * (vN - vEmpty),
      "sum of Shapley values must equal v(N) - v(empty), exactly x24")
  }

  test("bitmap retention equals an independent join-based recompute") {
    val s = spark
    import s.implicits._
    val raw = (1 to 3000).map(_ => (rnd.nextInt(60).toLong,
      f"2024-01-${rnd.nextInt(28) + 1}%02d 10:00:00"))
    val ev = raw.toDF("user_id", "ts")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val got = Funnels.bitmapRetentionOf(spark, ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent: distinct user-days in plain Scala
    val ud = raw.map { case (u, ts) => (u, ts.substring(0, 10)) }.toSet
    val days = ud.map(_._2)
    val d1 = days.max
    def plus(day: String, lag: Int) = java.time.LocalDate.parse(day)
      .plusDays(lag).toString
    (1 to 7).foreach { lag =>
      val retained = ud.count { case (u, d) => ud.contains((u, plus(d, lag))) }
      val eligible = ud.count { case (_, d) => plus(d, lag) <= d1 }
      assert(got(lag) === ((retained.toLong, eligible.toLong)),
        s"lag $lag mismatch vs the join-based recompute")
    }
  }

  test("QQ shift: order statistics equal plain sorted-array indexing") {
    val s = spark
    import s.implicits._
    val raw = (1 to 1500).map(i => (if (i % 3 == 0) "purchase" else "view",
      (rnd.nextInt(100000) + 1) / 100.0, i.toLong))
    val ev = raw.toDF("event_type", "value", "event_id")
    val got = Funnels.qqShiftOf(ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    def stat(xs: Seq[Long], qpm: Int) = {
      val sorted = xs.sorted
      sorted((qpm * xs.size + 999) / 1000 - 1)
    }
    val p = raw.filter(_._1 == "purchase").map(r => math.round(r._2 * 100))
    val o = raw.filter(_._1 != "purchase").map(r => math.round(r._2 * 100))
    (1 to 9).map(_ * 100).foreach { qpm =>
      assert(got(qpm) === ((stat(p, qpm), stat(o, qpm))),
        s"q=$qpm order statistic mismatch")
    }
  }

  test("sequential patterns: supports bounded by marginals, exact recompute") {
    val s = spark
    import s.implicits._
    val types = Seq("a", "b", "c")
    val raw = (1 to 2000).map(i => (rnd.nextInt(50).toLong,
      types(rnd.nextInt(3)), 1000L + rnd.nextInt(100000), i.toLong))
    val ev = raw.toDF("user_id", "event_type", "sec", "event_id")
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.timestamp_seconds(col("sec"))
          .as("ts"), col("event_id"))
    val got = Funnels.sequentialPatternsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // independent first-occurrence order on the raw tuples
    val firsts = raw.groupBy(r => (r._1, r._2)).map { case ((u, t), es) =>
      (u, t) -> es.map(e => (e._3, e._4)).min
    }
    val users = raw.map(_._1).distinct
    for (a <- types; b <- types if a != b) {
      val n = users.count(u => (firsts.contains((u, a))
        && firsts.contains((u, b))
        && implicitly[Ordering[(Long, Long)]]
          .lt(firsts((u, a)), firsts((u, b)))))
      assert(got.getOrElse((a, b), 0L) === n.toLong, s"$a->$b")
    }
  }
}
