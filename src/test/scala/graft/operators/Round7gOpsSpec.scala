package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-7g operators: value deciles, weekday mutual
  * information, trend peaks, ship-lag SLA curve, positional entropy.
  * Driver-side replays on sf0.001.
  */
class Round7gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("value deciles: order statistics replay; deciles are monotone") {
    val vals = graft.core.Tables.events(spark, sf)
      .select(col("event_type"),
        org.apache.spark.sql.functions.round(col("value") * 100, 0)
          .cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Relational.valueDeciles(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === byType.keySet)
    got.foreach { r =>
      val s = byType(r.getString(0))
      assert(r.getLong(1) === s.length.toLong)
      val ps = (1 to 9).map(k => r.getLong(1 + k))
      (1 to 9).foreach { k =>
        // smallest value at cumulative rank >= ceil(k*n/10)
        val rank = (k * s.length + 9) / 10
        assert(ps(k - 1) === s(rank - 1), s"${r.getString(0)} p${k * 10}")
      }
      assert(ps === ps.sorted)
    }
  }

  test("dow mutual info: MI >= 0 and bounded by both marginal entropies") {
    val row = Relational.dowTypeMutualInfo(spark, sf).collect().head
    val (mi, hx, hy) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(mi >= 0.0)
    // fixed-point truncation tolerance: terms are rounded per cell
    assert(mi <= math.min(hx, hy) + 1e-4)
    assert(hx > 0 && hy > 0)
    assert(hy <= math.log(7.0) + 1e-9) // 7 weekdays max
  }

  test("trend peaks: every reported day beats both neighbors; replay exact") {
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date(col("o_orderdate")).as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long")).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    def trend(d: java.time.LocalDate): Option[Long] =
      if (d.isBefore(d0.plusDays(15)) || d.isAfter(d1.minusDays(15))) None
      else Some((-15 to 15).map(k => daily.getOrElse(d.plusDays(k.toLong), 0L)).sum)
    val expected = Iterator.iterate(d0.plusDays(16))(_.plusDays(1))
      .takeWhile(!_.isAfter(d1.minusDays(16)))
      .filter { d =>
        val (c, p, n) = (trend(d).get, trend(d.minusDays(1)).get, trend(d.plusDays(1)).get)
        c > p && c > n
      }.toSet
    val got = Relational.trendPeaks(spark, sf).collect()
    assert(got.map(_.getDate(0).toLocalDate).toSet === expected)
    got.foreach { r =>
      assert(r.getLong(1) > r.getLong(2) && r.getLong(1) > r.getLong(3))
      assert(trend(r.getDate(0).toLocalDate).get === r.getLong(1))
    }
  }

  test("ship lag: histogram mass sums to 1 and cum share is monotone") {
    val rows = Relational.shipLagHistogram(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val li = graft.core.Tables.lineitem(spark, sf).count()
    assert(total === li) // every line item lands in exactly one lag bin
    assert(rows.last.getDouble(3) === 1.0)
    val cums = rows.map(_.getDouble(3))
    assert(cums === cums.sorted)
    var running = 0L
    rows.foreach { r =>
      running += r.getLong(1)
      assert(r.getDouble(2) === r6(r.getLong(1).toDouble / total))
      assert(r.getDouble(3) === r6(running.toDouble / total))
    }
  }

  test("positional entropy: buckets partition tokens; entropy replays") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0).split(" ", -1))
    val buckets = docs.flatMap { w =>
      w.zipWithIndex.map { case (word, pos) =>
        (math.min(9, pos * 10 / w.length), word)
      }
    }
    val got = TextAnalytics.positionalEntropy(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    val byB = buckets.groupBy(_._1)
    assert(got.keySet === byB.keySet)
    byB.foreach { case (b, toks) =>
      val r = got(b)
      assert(r.getLong(1) === toks.length.toLong)
      val counts = toks.groupBy(_._2).values.map(_.size).toSeq
      assert(r.getLong(2) === counts.length.toLong)
      val n = toks.length.toDouble
      val hFp = counts.map { c =>
        math.rint(r6((c / n) * -math.log(c / n)) * 1e6).toLong
      }.sum
      assert(r.getDouble(3) === r6(hFp.toDouble / 1e6), s"bucket $b")
    }
  }
}
