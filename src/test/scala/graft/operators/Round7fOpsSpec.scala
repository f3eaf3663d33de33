package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational, Sessions, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-7f operators: seasonal decomposition, session
  * gap sweep, ingest vocab drift, A/B power, user perplexity. Driver-side
  * replays on sf0.001.
  */
class Round7fOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("seasonal decompose: exact integer identities hold on every row") {
    val rows = Relational.seasonalDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    // residual numerator identity: resid_num = (31x - trend_fp)·den - num
    rows.foreach { r =>
      val (cents, trendFp) = (r.getLong(1), r.getLong(3))
      val (num, den, resid) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(resid === (31 * cents - trendFp) * den - num)
    }
    // the seasonal numerators sum to ~zero over a full week cycle
    // (detrended mass is conserved up to window-edge truncation)
    val perDow = rows.map(r => r.getInt(2) -> r.getLong(4)).distinct
    assert(perDow.length === 7)
    // trend is a true 31-day centered total: spot-check one interior day
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date(col("o_orderdate")).as("d"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long")).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val probe = rows(rows.length / 2)
    val d = probe.getDate(0).toLocalDate
    val win = (-15 to 15).map(k => daily.getOrElse(d.plusDays(k.toLong), 0L)).sum
    assert(probe.getLong(3) === win, s"trend window at $d")
  }

  test("gap sweep: session counts are monotone in the gap; totals fixed") {
    val rows = Sessions.sessionGapSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1) === Seq(900, 1800, 3600))
    // a larger gap can only MERGE sessions
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2)
    // every sweep sees the same event mass
    assert(rows.map(_._3).distinct.length === 1)
    rows.foreach { case (_, ns, ne, single, mean) =>
      assert(single <= ns)
      assert(mean === r6(ne.toDouble / ns))
    }
    // the 30-min sweep row agrees with the session_window sessionizer
    val sw = Sessions.sessionGap(spark, sf).count()
    assert(rows(1)._2 === sw)
  }

  test("ingest drift: ten deciles, KL non-negative, token mass conserved") {
    val rows = TextAnalytics.ingestVocabDrift(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === (0 to 9).map(i => s"d$i").toSet)
    val total = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0, r.getString(0)))
  }

  test("ab power: MDE replays the pinned-quantile formula") {
    val row = Funnels.abPowerMde(spark, sf).collect().head
    val (na, ca, nb, cb) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val pool = (ca + cb).toDouble / (na + nb).toDouble
    val mde = 2.801585 * math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(row.getDouble(4) === r6(pool))
    assert(row.getDouble(5) === r6(mde))
    assert(row.getDouble(6) === r6(mde / pool))
    // arms from user parity partition all user-days
    val z = Funnels.abConversionZtest(spark, sf).collect().head
    assert((na, ca, nb, cb) ===
      ((z.getLong(0), z.getLong(1), z.getLong(2), z.getLong(3))))
  }

  test("user perplexity: fixed-point surprisal replays the Markov model") {
    val events = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getString(3)))
    val trans = events.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      s.zip(s.tail).map { case (a, b) => (a._1, a._4, b._4) }
    }.toArray
    val counts = trans.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val froms = trans.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def sFp(f: String, t: String): Long =
      math.rint(-math.log(counts((f, t)).toDouble / froms(f)) * 1e6).toLong
    val expect = trans.groupBy(_._1).view.mapValues { ts =>
      (ts.length.toLong, ts.map(t => sFp(t._2, t._3)).sum)
    }.toMap
    val got = Funnels.userPerplexity(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, fp) = expect(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === r6(fp.toDouble / 1e6 / n), s"user ${r.getLong(0)}")
    }
  }
}
