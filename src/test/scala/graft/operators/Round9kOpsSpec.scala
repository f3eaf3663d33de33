package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational}
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 final batch (q377-q378): overdispersion and
  * the Gumbel block-maxima return level.
  */
class Round9kOpsSpec extends SparkTestBase {

  test("overdispersion fixture: Poisson-flat vs bursty type, exact ratios") {
    val s = spark
    import s.implicits._
    def mk(day: Int, t: String, n: Int, from: Int) =
      (1 to n).map(i => ((from + i).toLong, t,
        f"2024-01-$day%02d 10:00:00", (from + i).toLong))
    // 'flat': 2 events every day (4 days); 'burst': 8 on day 1 only
    val rows = (1 to 4).flatMap(d => mk(d, "flat", 2, d * 100)) ++
      mk(1, "burst", 8, 1000)
    val ev = rows.toDF("user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
    val got = Funnels.overdispersionOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // flat: x = 2,2,2,2 -> vmr 0, chi2 0
    assert(got("flat") === ((4L, 8L, 0.0, 0.0)))
    // burst: x = 8,0,0,0: n*sxx - S^2 = 4*64 - 64 = 192
    // vmr = 192/(8*3) = 8; chi2 = 192/8 = 24
    assert(got("burst") === ((4L, 8L, 8.0, 24.0)))
  }

  test("Gumbel fixture: constant maxima collapse beta to zero") {
    val s = spark
    import s.implicits._
    // two weeks, every day 1.00 -> weekly maxima both 100 cents
    val orders = (0 until 14).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        1.00)).toDF("o_orderdate", "o_totalprice")
    val r = Relational.gumbelReturnLevelOf(spark, orders).collect().head
    assert(r.getAs[Long]("n_weeks") === 2L)
    assert(r.getAs[Long]("observed_max") === 100L)
    assert(r.getAs[Double]("gumbel_beta") === 0.0)
    assert(r.getAs[Double]("gumbel_mu") === 100.0)
    assert(r.getAs[Double]("return_level_52w") === 100.0,
      "zero scale: the return level IS the constant maximum")
  }

  test("reliability fixture: perfect and broken calibration, Murphy identity") {
    val s = spark
    import s.implicits._
    // 4 users x 1 day each: two always-purchase, two never -> the model
    // gives each unit some p4; gaps and the ALL row must reconcile
    val ev = Seq(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "purchase", "2024-01-01 11:00:00", 2L),
      (2L, "view", "2024-01-01 10:00:00", 3L),
      (3L, "view", "2024-01-01 10:00:00", 4L),
      (3L, "view", "2024-01-01 11:00:00", 5L),
      (3L, "purchase", "2024-01-01 12:00:00", 6L),
      (4L, "view", "2024-01-01 10:00:00", 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
    val rows = Funnels.reliabilityDiagramOf(ev).collect()
    val all = rows.filter(_.getLong(0) == -1L).head
    assert(all.getAs[Long]("n") === 4L)
    assert(all.getAs[Long]("y_sum") === 2L)
    assert(all.getAs[Double]("rate") === 0.5)
    assert(all.getAs[Double]("unc") === 0.25)
    assert(all.getAs[Double]("rel_minus_res")
      === BigDecimal(all.getAs[Double]("brier") - all.getAs[Double]("unc"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // per-bin gaps sum to the global gap: sum(n*p4) - 1e4*Y
    val binRows = rows.filter(_.getLong(0) >= 0L)
    val gapSum = binRows.map(_.getAs[Long]("gap_fp")).sum
    val direct = binRows.map(r => r.getLong(0) * r.getAs[Long]("n")).sum -
      10000L * 2L
    assert(gapSum === direct)
  }

  test("densest subgraph fixture: the peel finds the clique, then empties") {
    val s = spark
    import s.implicits._
    // K4 (1-4) plus a pendant chain 5-6-7
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (6L, 7L)).toDF("doc1", "doc2")
    val got = Curation.densestSubgraphOf(spark, pairs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))).toMap
    assert(got(0) === ((7L, 8L, 1142857L, 0)))
    // round 1: the chain peeled away, the clique stands at density 1.5
    assert(got(1) === ((4L, 6L, 1500000L, 1)))
    // round 2: the clique's own degree (3) is below 2(1+eps)*1.5 = 3.75
    (2 to 6).foreach(r => assert(got(r) === ((0L, 0L, 0L, 0))))
  }

  test("Gumbel corpus: return level extrapolates past the observed max") {
    val r = Relational.gumbelReturnLevel(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getAs[Double]("gumbel_beta") > 0.0)
    assert(r.getAs[Double]("return_level_52w")
      > r.getAs[Double]("mean_weekly_max"),
      "a 52-week return level must exceed the mean weekly max")
  }
}
