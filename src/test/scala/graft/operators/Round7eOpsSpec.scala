package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-7e operators: snapshot diff, MAD anomalies,
  * log-odds keywords, price elasticity, dataset card. Driver-side exact
  * replays on sf0.001.
  */
class Round7eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("snapshot diff: statuses replay the carve and revision rule") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val v1 = docs.filter(_._1 % 7 != 1).map(d => d._1 -> d).toMap
    val v2 = docs.filter(_._1 % 5 != 2)
      .map(d => d._1 -> (if (d._1 % 11 == 3) d._3 + " [rev]" else d._3)).toMap
    val bySource = (v1.keySet ++ v2.keySet).toSeq.map { id =>
      val src = docs.find(_._1 == id).get._2
      val st =
        if (!v1.contains(id)) "added"
        else if (!v2.contains(id)) "removed"
        else if (v1(id)._3 != v2(id)) "changed"
        else "unchanged"
      (src, st)
    }.groupBy(_._1).view.mapValues(_.groupBy(_._2).view.mapValues(_.size).toMap).toMap
    val got = Curation.snapshotDiff(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === bySource.keySet)
    got.foreach { r =>
      val e = bySource(r.getString(0))
      assert(r.getLong(1) === e.getOrElse("added", 0).toLong, "added")
      assert(r.getLong(2) === e.getOrElse("removed", 0).toLong, "removed")
      assert(r.getLong(3) === e.getOrElse("changed", 0).toLong, "changed")
      assert(r.getLong(4) === e.getOrElse("unchanged", 0).toLong, "unchanged")
    }
  }

  test("mad anomalies: x2/x4 medians and integer flags replay") {
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date(col("o_orderdate")).as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long")).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    val spine = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => d -> daily.getOrElse(d, 0L)).toArray
    def med2(xs: Array[Long]): Long = {
      val s = xs.sorted; s(((s.length + 1) / 2) - 1) + s(s.length / 2)
    }
    val m2 = med2(spine.map(_._2))
    val dev = spine.map { case (_, x) => math.abs(2 * x - m2) }
    val m4 = med2(dev)
    val rows = Relational.madAnomalies(spark, sf).collect()
    assert(rows.length === spine.length)
    val byDay = rows.map(r => r.getDate(0).toLocalDate -> r).toMap
    spine.zip(dev).foreach { case ((d, x), dv) =>
      val r = byDay(d)
      assert(r.getLong(1) === x)
      assert(r.getLong(2) === m2)
      assert(r.getLong(3) === m4)
      assert(r.getLong(4) === dv)
      assert(r.getInt(5) === (if (2 * dv > 5L * m4) 1 else 0))
    }
  }

  test("log-odds keywords: z replays for every reported row; ranks valid") {
    val words = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(w => (r.getString(0), w)))
    val ysw = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ns = words.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val yw = words.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = words.length.toLong
    val got = TextAnalytics.logOddsKeywords(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (s, w) = (r.getString(0), r.getString(2))
      val (y, yAll) = (ysw((s, w)), yw(w))
      assert(r.getLong(3) === y)
      assert(r.getLong(4) === yAll)
      val aw = 1000.0 * yAll / n
      val yRest = yAll - y
      val delta = math.log((y + aw) / (ns(s) + 1000.0 - y - aw)) -
        math.log((yRest + aw) / ((n - ns(s)) + 1000.0 - yRest - aw))
      val z = delta / math.sqrt(1.0 / (y + aw) + 1.0 / (yRest + aw))
      assert(r.getDouble(5) === r6(delta), s"delta $s/$w")
      assert(r.getDouble(6) === r6(z), s"z $s/$w")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 5)
    }
    // exactly 5 ranked rows per reported source
    got.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 5))
    }
  }

  test("price elasticity: fixed-point OLS replays in BigInt") {
    val rows = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val brand = graft.core.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def fp(x: Double): BigInt = BigInt(math.rint(x * 1e6).toLong)
    val byBrand = rows.groupBy(r => brand(r._1)).view.mapValues { ls =>
      val xs = ls.map(l => fp(math.log(l._3 / l._2 * 100.0)))
      val ys = ls.map(l => fp(math.log(l._2)))
      val nB = BigInt(ls.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      (ls.length.toLong,
        (nB * sxy - sx * sy).toDouble / (nB * sxx - sx * sx).toDouble)
    }.toMap
    val got = Relational.priceElasticity(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === byBrand.keySet)
    got.foreach { r =>
      val (nb, slope) = byBrand(r.getString(0))
      assert(r.getLong(1) === nb)
      assert(r.getDouble(2) === r6(slope), s"brand ${r.getString(0)}")
    }
  }

  test("dataset card: counts and rates reconcile with the component queries") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"), col("text")).collect()
    val card = Curation.datasetCard(spark, sf).collect().head
    assert(card.getLong(0) === docs.length.toLong)
    assert(card.getLong(1) === docs.map(_.getString(3).split(" ", -1).length.toLong).sum)
    assert(card.getLong(2) === docs.map(_.getString(1)).distinct.length.toLong)
    assert(card.getLong(3) === docs.map(_.getString(2)).distinct.length.toLong)
    val mp = Dedup.minhashPairs(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
    assert(card.getLong(4) === mp.length.toLong)
    val kept = Curation.curationDecisions(spark, sf)
      .where(col("keep") === 1).count()
    assert(card.getLong(5) === kept)
    assert(card.getDouble(6) === r6(mp.length.toDouble / docs.length))
    assert(card.getDouble(7) === r6(kept.toDouble / docs.length))
  }
}
