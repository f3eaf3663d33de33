package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, Sessions}
import org.apache.spark.sql.functions.col

/** Semantics of the round-7j operators: revenue concentration, clustering
  * agreement, LSH precision by length, session peak rate. Driver-side
  * replays and invariants on sf0.001.
  */
class Round7jOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("revenue concentration: bands replay the customer rollup exactly") {
    val cust = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long")).as("c"))
      .collect().map(_.getLong(1))
    val expect = cust.groupBy(c => 63 - java.lang.Long.numberOfLeadingZeros(c))
      .view.mapValues(g => (g.length.toLong, g.sum)).toMap
    val got = Relational.revenueConcentration(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet.map(_.toInt))
    val allCents = cust.sum
    got.sortBy(-_.getInt(0)).foldLeft(0L) { (cum, r) =>
      val (n, cents) = expect(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === cents)
      assert(r.getDouble(4) === r6(cents.toDouble / allCents))
      val c2 = cum + cents
      assert(r.getDouble(5) === r6(c2.toDouble / allCents))
      c2
    }
  }

  test("clustering agreement: pair counts replay; looser threshold only merges") {
    val a = Curation.dedupComponents(spark, sf, 0.7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Curation.dedupComponents(spark, sf, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pairsTogether(m: Map[Long, Long]): Long =
      m.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val both = a.keys.toSeq.combinations(2).count { case Seq(x, y) =>
      a(x) == a(y) && b(x) == b(y)
    }.toLong
    val row = Curation.clusteringAgreement(spark, sf).collect().head
    assert(row.getLong(0) === a.size.toLong)
    assert(row.getLong(1) === both)
    assert(row.getLong(2) === pairsTogether(a) - both)
    assert(row.getLong(3) === pairsTogether(b) - both)
    // 0.8 pairs are a subset of 0.7 pairs, so B refines A: nothing is
    // together in B but split in A
    assert(row.getLong(3) === 0L)
    assert(row.getDouble(4) > 0.9) // near-total agreement on sparse dups
  }

  test("lsh precision by length: bands partition the candidate audit") {
    val audit = Dedup.minhashCandidateAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val lens = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = audit.groupBy { case (d1, d2, _) =>
      math.min(9L, math.min(lens(d1), lens(d2)) / 50).toInt
    }.view.mapValues { g =>
      (g.length.toLong, g.count(_._3 >= 0.7).toLong)
    }.toMap
    val got = Dedup.lshPrecisionByLength(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, t) = expect(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === t)
      assert(r.getDouble(3) === r6(t.toDouble / n))
    }
  }

  test("session peak rate: histogram replays minute-bucket maxima") {
    val events = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), org.apache.spark.sql.functions.unix_micros(col("ts")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val peaks = events.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      var cur = scala.collection.mutable.ArrayBuffer[Long](s.head._2)
      s.sliding(2).withFilter(_.length == 2).foreach { pair =>
        val (a0, b0) = (pair(0), pair(1))
        if (b0._2 - a0._2 > 1800L * 1000000L) {
          sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer()
        }
        cur += b0._2
      }
      sessions += cur.toSeq
      sessions.map(ts => ts.groupBy(_ / 60000000L).values.map(_.size).max.toLong)
    }.toSeq
    val expect = peaks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Sessions.sessionPeakRate(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet === expect.keySet)
    val total = peaks.length.toLong
    got.foreach { r =>
      assert(r.getLong(1) === expect(r.getLong(0)), s"peak ${r.getLong(0)}")
      assert(r.getDouble(2) === r6(r.getLong(1).toDouble / total))
    }
  }
}
