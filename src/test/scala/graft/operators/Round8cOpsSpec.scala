package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational, TextAnalytics}
import org.apache.spark.sql.functions.{col, countDistinct, expr, sum => ssum}

/** Semantics of the round-8 third batch (q321-q331): the TPC-H classics
  * pack 2 (Q7/Q8/Q10/Q13/Q18/Q21/Q22 shapes), exact-Cramer PACF, the
  * Morton-code layout audit, the classifier operating-point eval and
  * directed association rules. Each test replays the operator
  * independently — hand fixture, driver-side recompute on sf0.001, or a
  * DuckDB-cross-checked golden count.
  */
class Round8cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tpch q7: nation-pair volume rows cover both directions and the 4 qualifying lines") {
    val rows = Relational.tpchQ7VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(3)).sum === 4L) // DuckDB-cross-checked line count
    rows.foreach { r =>
      val pair = (r.getString(0), r.getString(1))
      assert(pair == ("NATION_3", "NATION_7") || pair == ("NATION_7", "NATION_3"))
      assert(r.getInt(2) === 1996 || r.getInt(2) === 1997)
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("tpch q8: market share is a valid ratio and covers the 47 ECONOMY-ASIA lines") {
    val rows = Relational.tpchQ8MarketShare(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === 47L) // DuckDB-cross-checked
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= r.getDouble(3))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // exactly one nation-12 line exists at sf0.001, so exactly one year
    // carries a nonzero focus share
    assert(rows.count(_.getDouble(2) > 0.0) === 1)
  }

  test("tpch q10: top-20 returned-item customers, ordered, top-1 matches a recompute") {
    val rows = Relational.tpchQ10ReturnedItems(spark, sf).collect()
    assert(rows.length === 20)
    val revs = rows.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    import org.apache.spark.sql.functions.{round => sround, sum => sfsum, max => sfmax}
    val expected = graft.core.Tables.lineitem(spark, sf)
      .where(col("l_returnflag") === "R")
      .join(graft.core.Tables.orders(spark, sf)
        .where(col("o_orderdate") >= expr("TIMESTAMP '1996-07-01 00:00:00'")
          && col("o_orderdate") < expr("TIMESTAMP '1996-10-01 00:00:00'")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sround(sfsum(col("l_extendedprice") * (expr("1") - col("l_discount"))), 2)
        .as("rev"))
      .agg(sfmax(col("rev"))).head.getDouble(0)
    assert(rows.head.getDouble(2) === expected)
  }

  test("tpch q13: distribution masses reconcile with customer and order counts") {
    val rows = Relational.tpchQ13OrderCounts(spark, sf).collect()
    val nCust = graft.core.Tables.customer(spark, sf).count()
    val nOrd = graft.core.Tables.orders(spark, sf)
      .where(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map(_.getLong(1)).sum === nCust)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === nOrd)
  }

  test("tpch q18: every large-volume order exceeds the 250-unit gate; keys distinct") {
    val df = Relational.tpchQ18LargeVolume(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(5) > 250L))
    assert(rows.map(_.getLong(2)).distinct.length === rows.length)
    val expected = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(ssum(col("l_quantity")).cast("long").as("q"))
      .where(col("q") > 250).count()
    assert(rows.length.toLong === expected)
  }

  test("tpch q21: each gated order charges exactly one supplier one wait") {
    val rows = Relational.tpchQ21WaitingSuppliers(spark, sf).collect()
    // 109 'F' orders with ≥2 suppliers and exactly one late at sf0.001
    // (DuckDB-cross-checked); one wait each
    assert(rows.map(_.getLong(2)).sum === 109L)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("tpch q22: dormant above-average customers match the anti-join recompute") {
    val rows = Relational.tpchQ22GlobalSales(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === 2L) // DuckDB-cross-checked
    rows.foreach(r => assert(r.getString(0).startsWith("NATION_")))
  }

  test("pacf: exact fp ACF and Durbin-Levinson match a BigInt driver replay on a fixture") {
    import spark.implicits._
    val n = 40
    val vals = (0 until n).map(i => (((i * 37) % 11) * 100 + 100).toLong)
    val orders = vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2020, 1, 1)
        .plusDays(i.toLong).atStartOfDay), v.toDouble)
    }.toDF("o_orderdate", "o_totalprice")
    val got = Relational.pacfDailyRevenueOf(orders).head
    // driver replay in exact BigInt arithmetic (cents = dollars*100)
    val x = vals.map(v => BigInt(v) * 100)
    val s = x.sum
    val bn = BigInt(n)
    def rfp(k: Int): Long = {
      val head = x.dropRight(k); val tail = x.drop(k)
      val sxy = head.zip(tail).map { case (a, b) => a * b }.sum
      val num = bn * bn * sxy - bn * s * (head.sum + tail.sum) + BigInt(n - k) * s * s
      val den = bn * bn * x.map(v => v * v).sum - bn * s * s
      ((num * 1000000) / den).toLong // BigInt / truncates toward zero
    }
    assert(got.getLong(0) === n.toLong)
    assert(got.getLong(1) === rfp(1))
    assert(got.getLong(2) === rfp(2))
    assert(got.getLong(3) === rfp(3))
    val (r1, r2, r3) = (rfp(1) / 1e6, rfp(2) / 1e6, rfp(3) / 1e6)
    val a22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val a21 = r1 * (1.0 - a22)
    val p3 = (r3 - a21 * r2 - a22 * r1) / (1.0 - a21 * r1 - a22 * r2)
    assert(got.getDouble(4) === round6(r1))
    assert(got.getDouble(5) === round6(a22))
    assert(got.getDouble(6) === round6(p3))
  }

  test("zorder: Morton interleave is exact and clustering never scans more than natural order") {
    // the bit-interleave expression against a Scala reference
    import spark.implicits._
    val probe = Seq((0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (30, 90))
      .toDF("db", "pb")
    val zExpr = (0 until 8).map(i =>
      s"shiftleft((shiftright(db, $i) & 1), ${2 * i + 1})"
        + s" + shiftleft((shiftright(pb, $i) & 1), ${2 * i})").mkString(" + ")
    def morton(d: Int, p: Int): Int =
      (0 until 8).map(i => (((d >> i) & 1) << (2 * i + 1)) | (((p >> i) & 1) << (2 * i))).sum
    probe.withColumn("z", expr(zExpr)).collect().foreach { r =>
      assert(r.getInt(2) === morton(r.getInt(0), r.getInt(1)))
    }
    val rows = Relational.zorderLayoutAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size === 3)
    // same corpus in every layout: identical file and match totals
    val hits = rows.values.map(_.getLong(4)).toSet
    assert(hits.size === 1 && hits.head === 119L) // DuckDB-cross-checked
    val nFiles = rows.values.map(_.getLong(1)).toSet
    assert(nFiles === Set(6L)) // 6000 rows / 1000-row files
    // clustering can only help: scanned(clustered) ≤ scanned(natural)
    assert(rows("lex_day_price").getLong(2) <= rows("natural").getLong(2))
    assert(rows("zorder").getLong(2) <= rows("natural").getLong(2))
    // a file with hits must be scanned (zone maps never skip real matches)
    rows.values.foreach(r => assert(r.getLong(3) <= r.getLong(2)))
  }

  test("classifier eval: confusion cells reconcile and AP matches a driver replay") {
    val r = TextAnalytics.classifierEval(spark, sf).head
    val (nDocs, nPos) = (r.getLong(0), r.getLong(1))
    val (tp, fp, tn, fn) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(tp + fp + tn + fn === nDocs)
    assert(tp + fn === nPos)
    assert(tp + fp === nDocs / 2) // exact half cut
    assert(r.getDouble(10) >= -1.0 && r.getDouble(10) <= 1.0) // mcc
    // AP replay from the same score/label projection, independent ranking
    val rep = graft.functions.Text.repetitionMetrics(col("text")).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.round(
          graft.functions.Text.modelScore(col("text")) * 1e6).cast("long")
          .as("score_fp"),
        org.apache.spark.sql.functions.when(rep("dup_bigram_frac") >= 0.1, 1)
          .otherwise(0).as("is_rep"))
      .collect().map(x => (x.getLong(1), x.getLong(0), x.getInt(2)))
      .sortBy(t => (t._1, t._2))
    var cum = 0L; var apFp = 0L
    docs.zipWithIndex.foreach { case ((_, _, rep1), i) =>
      if (rep1 == 1) {
        cum += 1
        apFp += math.round(1e6 * cum / (i + 1).toDouble)
      }
    }
    assert(nPos === cum)
    val expAp = round6(apFp / (1e6 * cum))
    assert(r.getDouble(11) === expAp)
  }

  test("association rules: directed metrics reconcile with marginals and symmetry") {
    val rows = Funnels.associationRules(spark, sf).collect()
    assert(rows.nonEmpty)
    val keyed = rows.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    rows.foreach { r =>
      val (nBoth, nAnt, nCons) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nBoth >= 2L && nBoth <= math.min(nAnt, nCons))
      val conf = r.getDouble(6)
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getDouble(7) > 0.0) // lift
      if (nBoth == nAnt) assert(r.isNullAt(8))
      else assert(!r.isNullAt(8) && r.getDouble(8) > 0.0)
      // joint support is symmetric → the reversed rule exists with the
      // same n_both and swapped marginals
      val rev = keyed((r.getInt(1), r.getInt(0)))
      assert(rev.getLong(2) === nBoth)
      assert(rev.getLong(3) === nCons && rev.getLong(4) === nAnt)
    }
  }
}
