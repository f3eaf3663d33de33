package graft.analytics

import graft.SparkTestBase

/** Semantics of the hypothesis-test / robust-stat operators (q231–q235):
  * χ² independence, Spearman rank correlation, Theil–Sen slope, Cohen's
  * kappa, logistic-model scoring. Crafted fixtures with hand-computed
  * expectations; the DuckDB oracle covers exact corpus values at sf0.01.
  */
class StatTestsSpec extends SparkTestBase {

  private def t(day: Int, sec: Int = 0) =
    new java.sql.Timestamp(1699920000000L + day * 86400000L + sec * 1000L)
  // base = 2023-11-14T00:00:00Z (a Tuesday); day N = Nov 14+N, so seven
  // consecutive days cover each ISO weekday exactly once

  test("chi-square: a perfectly uniform grid scores zero") {
    val s = spark
    import s.implicits._
    // 2 types x 7 weekdays, 3 events per cell -> observed == expected
    val ev = (for {
      ty <- Seq("view", "click"); d <- 0 until 7; i <- 0 until 3
    } yield (1L, t(d, i), ty)).toDF("user_id", "ts", "event_type")
    val rows = Relational.chiSquareDowTypeOf(ev).collect()
    assert(rows.length === 14)
    assert(rows.forall(_.getAs[Double]("contrib") == 0.0))
    assert(rows.forall(_.getAs[Double]("chi2_stat") == 0.0))
    assert(rows.forall(_.getAs[Long]("dof") == 6L))
    // the pinned critical value covers only the 24-dof full grid
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("reject_5pct"))))
  }

  test("chi-square: zero cells are materialized from the margins") {
    val s = spark
    import s.implicits._
    // 'click' never happens on day 1 (Wednesday) -> that grid cell must
    // still appear, with observed = 0 and a positive contribution
    val ev = (Seq((1L, t(0), "view"), (1L, t(1), "view"),
      (1L, t(0), "click"))).toDF("user_id", "ts", "event_type")
    val rows = Relational.chiSquareDowTypeOf(ev).collect()
    assert(rows.length === 4) // 2 types x 2 observed weekdays
    val zero = rows.filter(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[Int]("iso_dow") == 3)
    assert(zero.length === 1)
    assert(zero.head.getAs[Long]("observed") === 0L)
    assert(zero.head.getAs[Double]("contrib") > 0.0)
  }

  test("spearman: monotone metrics correlate at exactly +1") {
    val s = spark
    import s.implicits._
    // user u has u events spread over u distinct days and u purchases:
    // all three metrics are strictly monotone in u -> rho = 1 for both pairs
    val ev = (for {
      u <- 1 to 5; d <- 0 until u
    } yield (u.toLong, t(d), "purchase")).toDF("user_id", "ts", "event_type")
    val got = Funnels.spearmanActivityOf(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("spearman_rho")).toMap
    assert(got === Map("events_vs_days" -> 1.0, "events_vs_purchases" -> 1.0))
  }

  test("spearman: an anti-monotone pair scores -1 with midrank ties intact") {
    val s = spark
    import s.implicits._
    // events up, purchases down; n_days ties (all users active 1 day)
    val ev = (for {
      u <- 1 to 4
      i <- 0 until u
    } yield (u.toLong, t(0, i),
      if (u <= 1) "purchase" else "view")).toDF("user_id", "ts", "event_type")
    // purchases: user1 -> 1, users 2-4 -> 0 (three-way tie at the bottom)
    val got = Funnels.spearmanActivityOf(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("spearman_rho")).toMap
    // events ranks 1..4; purchase doubled midranks: ties 0,0,0 -> 2*2+2=...
    // exact value: rho = -0.774597 (= -sqrt(3)/sqrt(5), the tie-corrected
    // Pearson of ranks (1,2,3,4) vs (4, 2, 2, 2))
    assert(math.abs(got("events_vs_purchases") + 0.774597) < 1e-6)
  }

  test("theil-sen: a clean linear ramp recovers the exact slope") {
    val s = spark
    import s.implicits._
    // daily cents 100, 200, ..., 500 -> every pairwise slope is 100 c/day
    val orders = (1 to 5)
      .map(d => (d.toLong, t(d).toString.take(10), d * 1.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice")
    val r = Relational.theilSenTrendOf(orders).collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Double]("slope_cents_per_day") === 100.0)
  }

  test("theil-sen: one outlier day cannot move the median slope") {
    val s = spark
    import s.implicits._
    // the same ramp with day 3 spiked 100x: OLS would swing, the median
    // of pairwise slopes stays near the ramp slope
    val prices = Map(1 -> 1.0, 2 -> 2.0, 3 -> 300.0, 4 -> 4.0, 5 -> 5.0)
    val orders = (1 to 5)
      .map(d => (d.toLong, t(d).toString.take(10), prices(d)))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice")
    val r = Relational.theilSenTrendOf(orders).collect().head
    assert(math.abs(r.getAs[Double]("slope_cents_per_day")) < 200.0)
  }

  test("kappa: a hand-computed confusion matrix") {
    val s = spark
    import s.implicits._
    // (a,a)=40 (a,b)=10 (b,a)=20 (b,b)=30: po=0.7, pe=0.5, kappa=0.4
    val pred = (Seq.fill(40)(("a", "a")) ++ Seq.fill(10)(("a", "b")) ++
      Seq.fill(20)(("b", "a")) ++ Seq.fill(30)(("b", "b")))
      .toDF("actual_lang", "predicted_lang")
    val r = TextAnalytics.langKappaOf(pred).collect().head
    assert(r.getAs[Long]("n_docs") === 100L)
    assert(r.getAs[Long]("n_agree") === 70L)
    assert(r.getAs[Double]("p_observed") === 0.7)
    assert(r.getAs[Double]("p_expected") === 0.5)
    assert(r.getAs[Double]("kappa") === 0.4)
  }

  test("kappa: perfect agreement scores exactly 1") {
    val s = spark
    import s.implicits._
    val pred = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("actual_lang", "predicted_lang")
    val r = TextAnalytics.langKappaOf(pred).collect().head
    assert(r.getAs[Double]("kappa") === 1.0)
  }

  test("logistic eval: separable fixture scores accuracy 1 and sane losses") {
    val s = spark
    import s.implicits._
    // user 1 day 0: 100 non-purchase events over 4 types + a purchase
    //   -> z = -3 + 0.45 ln(101) + 1.4 > 0 -> p >= 0.5, y = 1 (hit)
    // user 2 day 0: one view -> p small, y = 0 (hit)
    val ev = ((0 until 100).map(i =>
      (1L, t(0, i), Seq("view", "click", "error", "signup")(i % 4))) ++
      Seq((1L, t(0, 200), "purchase"), (2L, t(0), "view")))
      .toDF("user_id", "ts", "event_type")
    val r = Funnels.logisticEvalOf(ev).collect().head
    assert(r.getAs[Long]("n_units") === 2L)
    assert(r.getAs[Long]("n_converted") === 1L)
    assert(r.getAs[Double]("accuracy") === 1.0)
    assert(r.getAs[Double]("log_loss") > 0.0)
    assert(r.getAs[Double]("brier") > 0.0 && r.getAs[Double]("brier") < 0.25)
  }
}
