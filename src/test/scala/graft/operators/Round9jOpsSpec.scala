package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational}
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 tenth batch (q373-q376): Page-Hinkley drift,
  * exact Shapley attribution, Qini curve, Friedman test.
  */
class Round9jOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("Page-Hinkley fixture: flat series is silent, a level shift alarms") {
    val s = spark
    import s.implicits._
    val orders = (0 until 15).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        if (i < 10) 1.00 else 2.00)
    }.toDF("o_orderdate", "o_totalprice")
    val got = Relational.pageHinkleyOf(spark, orders, lambdaFp = 50000000L)
      .collect().map(r => r.getLong(2) ->
        ((r.getLong(3), r.getLong(6), r.getInt(7)))).toMap
    (1L to 10L).foreach { t =>
      assert(got(t) === ((0L, 0L, 0)), s"flat prefix day $t stays silent")
    }
    // t=11: dev = 11*200 - 1200 = 1000 -> term = 1e9 div 11
    assert(got(11L)._1 === 90909090L)
    (11L to 15L).foreach(t => assert(got(t)._3 === 1, s"alarm from day $t"))
  }

  test("Shapley fixture: converters' channels split credit, efficiency holds") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "view"), (1L, "purchase"),
      (2L, "click"),
      (3L, "click"), (3L, "view"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val got = Funnels.shapleyAttributionOf(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("view" -> 36L, "click" -> 12L,
      "error" -> 0L, "signup" -> 0L))
    // efficiency: sum of phi = v(N) - v(empty) = 2 conversions
    assert(got.values.sum === 2L * 24L)
  }

  test("Qini corpus: cumulative cells are monotone and self-consistent") {
    val rows = Funnels.qiniCurve(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.length === 10)
    val nt = rows.map(_.getAs[Long]("n_treated"))
    val nc = rows.map(_.getAs[Long]("n_control"))
    assert(nt.zip(nt.tail).forall { case (a, b) => a <= b })
    assert(nc.zip(nc.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      val expected = r.getAs[Long]("y_treated") * 1000000L -
        (r.getAs[Long]("y_control") * r.getAs[Long]("n_treated") * 1000000L
          / r.getAs[Long]("n_control"))
      assert(r.getAs[Long]("qini_fp") === expected)
    }
  }

  test("Friedman fixture: consistent ordering across blocks, exact statistic") {
    val s = spark
    import s.implicits._
    def mk(day: Int, t: String, n: Int, from: Int) =
      (1 to n).map(i => ((from + i).toLong, t,
        f"2024-01-$day%02d 10:00:00", (from + i).toLong))
    val rows = mk(1, "a", 1, 0) ++ mk(1, "b", 2, 10) ++ mk(1, "c", 3, 20) ++
      mk(2, "a", 1, 100) ++ mk(2, "b", 2, 110) ++ mk(2, "c", 3, 120)
    val ev = rows.toDF("user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
    val got = Funnels.friedmanTestOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4),
        r.getInt(5)))).toMap
    // rank2 per day: a=2, b=4, c=6; two days -> sums 4, 8, 12
    // chi2 = 3*(16+64+144)/(2*3*4) - 3*2*4 = 28 - 24 = 4
    assert(got("a") === ((4L, 4.0, 0)))
    assert(got("b") === ((8L, 4.0, 0)))
    assert(got("c") === ((12L, 4.0, 0)))
  }

  test("Friedman ties: an all-equal block contributes the mid rank to all") {
    val s = spark
    import s.implicits._
    val rows = (1 to 3).flatMap(j => (1 to 2).map(i =>
      ((j * 10 + i).toLong, Seq("a", "b", "c")(j - 1),
        "2024-01-01 10:00:00", (j * 10 + i).toLong)))
    val ev = rows.toDF("user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
    val got = Funnels.friedmanTestOf(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // single day, all counts 2: avg rank 2 -> x2 grid 4 for every type
    assert(got === Map("a" -> 4L, "b" -> 4L, "c" -> 4L))
  }
}
