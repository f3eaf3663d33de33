package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational, Sessions, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-7i operators: seasonal strength, user curation
  * verdict, discount bands, Heaps projection. Driver-side replays and
  * invariants on sf0.001.
  */
class Round7iOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("seasonal strength: both measures in [0,1]; day count matches q251") {
    val row = Relational.seasonalStrength(spark, sf).collect().head
    val nDecomp = Relational.seasonalDecompose(spark, sf).count()
    assert(row.getLong(0) === nDecomp)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
    // removing the weekly means can only shrink residual variance vs the
    // detrended series, so seasonal strength is strictly meaningful here
    assert(row.getDouble(1) > 0.0)
  }

  test("user curation: flags replay the three component screens") {
    val ent = Funnels.userEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getInt(4))).toMap
    val per = Funnels.userPerplexity(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rep = Sessions.userReplayScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val got = Funnels.userCurationDecisions(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet === ent.keySet)
    got.foreach { r =>
      val u = r.getLong(0)
      assert(r.getInt(5) === ent(u)._3, s"entropy flag $u")
      val fp = per.get(u).map { case (n, s) =>
        if ((n >= 20 && s < 1.0) || s > 2.5) 1 else 0
      }.getOrElse(0)
      assert(r.getInt(6) === fp, s"perplexity flag $u")
      val fr = rep.get(u).map { case (n, f) =>
        if (n >= 5 && f >= 0.5) 1 else 0
      }.getOrElse(0)
      assert(r.getInt(7) === fr, s"replay flag $u")
      assert(r.getInt(8) === 1 - Seq(ent(u)._3, fp, fr).max)
    }
  }

  test("discount bands: quantities and shares replay; shares sum to ~1") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.round(col("l_discount") * 100, 0)
        .cast("int"), col("l_quantity")).collect()
      .map(r => (r.getInt(0), r.getDouble(1).toLong))
    val expect = li.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val got = Relational.discountBands(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, q) = expect(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(2) === r6(q.toDouble / n))
    }
    assert(math.abs(got.map(_.getDouble(4)).sum - 1.0) < 1e-3)
  }

  test("heaps projection: OLS replays the curve checkpoints in fixed point") {
    val pts = TextAnalytics.heapsCurve(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    def fp(x: Double): Long = math.rint(x * 1e6).toLong
    val xs = pts.map(p => fp(math.log(p._1.toDouble)))
    val ys = pts.map(p => fp(math.log(p._2.toDouble)))
    val n = pts.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val beta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val lnK = (sy.toDouble - beta * sx.toDouble) / n.toDouble / 1e6
    val row = TextAnalytics.heapsProjection(spark, sf).collect().head
    assert(row.getInt(0) === pts.length)
    assert(row.getLong(1) === pts.map(_._1).max)
    assert(row.getDouble(2) === r6(beta))
    assert(row.getDouble(3) === r6(lnK))
    // sublinear growth: beta < 1 always; at sf0.001 the synthetic vocab
    // saturates in the first decile, so beta legitimately rounds to 0
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 1.0)
  }
}
