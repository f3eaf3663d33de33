package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 eighth batch (q365-q368): QQ shift function,
  * log-rank arms test, Lorenz curve, Hill tail index.
  */
class Round9hOpsSpec extends SparkTestBase {

  test("QQ shift fixture: a constant location shift at every decile") {
    val s = spark
    import s.implicits._
    val ev = ((1 to 10).map(i => ("purchase", i / 100.0, i.toLong))
      ++ (1 to 10).map(i => ("view", (i + 10) / 100.0, (100 + i).toLong)))
      .toDF("event_type", "value", "event_id")
    val rows = Funnels.qqShiftOf(ev).collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      val qpm = r.getInt(0)
      val tr = (qpm * 10 + 999) / 1000
      assert(r.getLong(3) === tr.toLong, s"q=$qpm purchase order stat")
      assert(r.getLong(4) === (tr + 10).toLong)
      assert(r.getLong(5) === -10L, "constant -10 cent shift everywhere")
    }
  }

  test("log-rank fixture: arm-0 week-0 churn vs censored arm 1") {
    val s = spark
    import s.implicits._
    // arm 0 (users 2,4): one day-0 event -> churn at week 0
    // arm 1 (users 1,3): active at day 0 and day 21 -> censored (wk 3)
    val ev = Seq(
      (2L, "2024-01-01 10:00:00"), (4L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-22 10:00:00"),
      (3L, "2024-01-01 10:00:00"), (3L, "2024-01-22 10:00:00"))
      .toDF("user_id", "ts")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val r = Funnels.logRankArmsOf(ev).collect().head
    assert(r.getAs[Long]("n_arm0") === 2L)
    assert(r.getAs[Long]("n_arm1") === 2L)
    assert(r.getAs[Long]("o1") === 2L, "both arm-0 users churn")
    assert(r.getAs[Long]("o2") === 0L)
    // week 0: e1 = 2*2/4 = 1 -> 1e6; v = 2*2*2*2/(16*3) -> 333333
    assert(r.getAs[Long]("e1_fp") === 1000000L)
    assert(r.getAs[Long]("v_fp") === 333333L)
    assert(r.getAs[Double]("chi2_stat") === 3.000003)
  }

  test("Lorenz fixture: triangular spend, exact decile shares") {
    val s = spark
    import s.implicits._
    val ev = (1 to 10).map(i => (i.toLong, i.toDouble, i.toLong))
      .toDF("user_id", "value", "event_id")
      .withColumn("ts", org.apache.spark.sql.functions
        .lit("2024-01-01 10:00:00").cast("timestamp"))
    val got = Funnels.lorenzCurveOf(ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got(1) === ((1L, 100L, 18181L, 81819L)))
    assert(got(5) === ((5L, 1500L, 272727L, 227273L)))
    assert(got(10) === ((10L, 5500L, 1000000L, 0L)),
      "the full population holds exactly everything")
  }

}
