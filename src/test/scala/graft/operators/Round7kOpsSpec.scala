package graft.operators

import graft.SparkTestBase
import graft.analytics.Relational
import org.apache.spark.sql.functions.col

/** Semantics of the round-7k operators: local supplier volume, supplier
  * HHI, dedup degree histogram, norm bands. Driver-side replays and
  * invariants on sf0.001.
  */
class Round7kOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("local supplier volume: line counts replay the local-nation filter") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ordCust = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custNat = graft.core.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val suppNat = graft.core.Tables.supplier(spark, sf)
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natName = graft.core.Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = li.flatMap { case (ok, sk) =>
      val cn = custNat(ordCust(ok))
      if (cn == suppNat(sk)) Some(natName(cn)) else None
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational.localSupplierVolume(spark, sf).collect()
    assert(got.map(r => r.getString(1) -> r.getLong(2)).toMap === expect)
  }

  test("supplier hhi: in [1/n, 1]; top share bounded by hhi's sqrt logic") {
    val rows = Relational.supplierHhi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(hhi >= r6(1.0 / n) - 1e-6 && hhi <= 1.0, s"${r.getString(0)}")
      // the top supplier alone contributes top^2 to HHI
      assert(hhi >= top * top - 1e-6)
      assert(top > 0.0 && top <= 1.0)
    }
  }

  test("dedup degrees: histogram replays pair-list degrees; mass conserved") {
    val mp = Dedup.minhashPairs(spark, sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    val expect = mp.groupBy(identity).values.map(_.size)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Dedup.dedupDegreeHistogram(spark, sf).collect()
    assert(got.map(r => r.getLong(0).toInt -> r.getLong(1)).toMap === expect)
    // sum(degree * n_docs) = 2 * |pairs| (each pair contributes two ends)
    assert(got.map(r => r.getLong(0) * r.getLong(1)).sum === mp.length.toLong)
  }

  test("norm bands: per-label shares normalize; bands cover all vectors") {
    val rows = Similarity.normBands(spark, sf).collect()
    val total = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    }
    rows.foreach(r => assert(r.getInt(1) >= 0))
  }

  test("order priority mix: cells partition orders; shares normalize") {
    val rows = Relational.orderPriorityMix(spark, sf).collect()
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
  }

  test("acctbal deciles: order statistics replay for both entities") {
    def balances(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(org.apache.spark.sql.functions.round(col(c) * 100, 0)
        .cast("long")).collect().map(_.getLong(0)).sorted
    val expect = Map(
      "customer" -> balances(graft.core.Tables.customer(spark, sf), "c_acctbal"),
      "supplier" -> balances(graft.core.Tables.supplier(spark, sf), "s_acctbal"))
    val got = Relational.acctbalDeciles(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val s = expect(r.getString(0))
      assert(r.getLong(1) === s.length.toLong)
      (1 to 9).foreach { k =>
        val rank = (k * s.length + 9) / 10
        assert(r.getLong(1 + k) === s(rank - 1), s"${r.getString(0)} p${k * 10}")
      }
    }
  }
}
