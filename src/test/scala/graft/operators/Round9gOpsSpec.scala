package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 seventh batch (q361-q364): CUPED, robust
  * location estimators, Tukey median polish, and the SRM invariant
  * check. Fixtures with closed-form answers throughout.
  */
class Round9gOpsSpec extends SparkTestBase {

  test("CUPED fixture: perfectly correlated covariate removes all variance") {
    val s = spark
    import s.implicits._
    // user i: pre spend i dollars (day 1), post spend 2i dollars (day 16)
    val ev = (1 to 4).flatMap { i =>
      Seq((i.toLong, "2024-01-01 10:00:00", i.toDouble),
        (i.toLong, "2024-01-16 10:00:00", 2.0 * i))
    }.toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("value"))
    val r = Funnels.cupedAdjustmentOf(ev).collect().head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("sum_x_cents") === 1000L)
    assert(r.getAs[Long]("sum_y_cents") === 2000L)
    assert(r.getAs[Double]("theta") === 2.0)
    assert(r.getAs[Double]("var_y") === 50000.0)
    assert(r.getAs[Double]("var_adj") === 0.0)
    assert(r.getAs[Double]("reduction") === 1.0)
  }

  test("robust location fixture: the outlier moves the mean, not HL") {
    val s = spark
    import s.implicits._
    val rows = ((1 to 9).map(i => ("s", i.toLong, i.toLong))
      :+ (("s", 10L, 1000L))).toDF("source", "doc_id", "v")
    val got = TextAnalytics.robustLocationOf(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // mean 104.5; median (5+6); 10% trim drops 1 and 1000 -> 5.5;
    // HL: rank-28 Walsh sum of 55 is 11 -> pseudo-median 5.5
    assert(got("s") === ((10L, 104500000L, 11L, 5500000L, 11L)))
    assert(got("ALL") === got("s"), "single source: ALL mirrors it")
  }

  test("median polish fixture: additive matrix leaves zero residuals") {
    val s = spark
    import s.implicits._
    // price(day i) = row[i%7] + (5 or 9 by week): exactly additive
    val row = Seq(3, 4, 5, 6, 7, 8, 9)
    val orders = (0 until 14).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        (row(i % 7) + (if (i < 7) 5 else 9)).toDouble)
    }.toDF("o_orderdate", "o_totalprice")
    val got = Relational.medianPolishOf(spark, orders).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    (0 to 6).foreach { d =>
      // row effect = (row_d + median(5,9)) dollars = (row_d + 7) * 1600
      assert(got(d) === ((2L, (row(d) + 7) * 1600L, 0L, 0L)),
        s"dow $d: additive data must polish to zero residuals")
    }
  }

  test("SRM fixture: balanced scopes pass, a one-arm flood flags") {
    val s = spark
    import s.implicits._
    val base = (1 to 4).map(i =>
      (i.toLong, "view", "2024-01-01 10:00:00", i.toLong))
    val flood = (1 to 16).map(i =>
      (1L, "click", "2024-01-01 11:00:00", (100 + i).toLong))
    val ev = (base ++ flood).toDF("user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
    val got = Funnels.srmAuditOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5)))).toMap
    assert(got("user_days") === ((4L, 2L, 2L, 0.0, 0)))
    assert(got("view") === ((4L, 2L, 2L, 0.0, 0)))
    assert(got("click") === ((16L, 0L, 16L, 16.0, 1)),
      "16 one-arm events: chi2 = 16 > 3.84")
  }

  test("median polish corpus: row effects live, residuals bounded by data") {
    val rows = Relational.medianPolish(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 7)
    // sf0.001 orders are sparse on the daily spine: most days are the
    // zero fill, so weekday MEDIANS legitimately coincide — the live
    // signal is in the residuals, which must be non-trivial and sane
    rows.foreach { r =>
      assert(r.getAs[Long]("max_abs_resid_x16")
        <= r.getAs[Long]("sum_abs_resid_x16"))
    }
    assert(rows.map(_.getAs[Long]("sum_abs_resid_x16")).sum > 0L,
      "daily totals vary, so polished residuals cannot all be zero")
  }
}
