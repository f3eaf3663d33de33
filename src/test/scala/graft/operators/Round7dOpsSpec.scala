package graft.operators

import graft.SparkTestBase
import graft.analytics.Relational
import org.apache.spark.sql.functions.col

/** Semantics of the round-7d operators: simhash threshold sweep, near-dup
  * LCP profile, split n-gram coverage curve, k-anonymity audit, re-crawl
  * redundancy curve. Driver-side exact replays on sf0.001.
  */
class Round7dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("simhash sweep: counts replay the pair and truth lists; recall monotone") {
    val pairs = Dedup.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val truth = Dedup.jaccardPairsPrefix(spark, sf, 0.7).select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byD = pairs.groupBy(_._3).view.mapValues { ps =>
      (ps.length.toLong, ps.count(p => truth((p._1, p._2))).toLong)
    }.toMap
    val got = Dedup.simhashThresholdSweep(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(got.map(_.getInt(0)).toSet === byD.keySet)
    var cum = 0L
    var lastRecall = -1.0
    got.foreach { r =>
      val (n, t) = byD(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === t)
      assert(r.getDouble(3) === r6(t.toDouble / n))
      cum += t
      assert(r.getDouble(4) === r6(cum.toDouble / truth.size))
      assert(r.getDouble(4) >= lastRecall) // cumulative recall is monotone
      lastRecall = r.getDouble(4)
    }
  }

  test("neardup lcp: first-mismatch scan replays on the raw token arrays") {
    val texts = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val got = Dedup.neardupLcp(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (w1, w2) = (texts(r.getLong(0)), texts(r.getLong(1)))
      assert(r.getLong(2) === w1.length.toLong)
      assert(r.getLong(3) === w2.length.toLong)
      val lim = math.min(w1.length, w2.length)
      val mis = (0 until lim).indexWhere(i => w1(i) != w2(i))
      val lcp = if (mis < 0) lim.toLong else mis.toLong
      assert(r.getLong(4) === lcp, s"pair ${r.getLong(0)}-${r.getLong(1)}")
      assert(r.getDouble(5) === r6(lcp.toDouble / lim))
    }
  }

  test("split coverage: per-n gram flags replay; unigram coverage is highest") {
    val split = Curation.trainValTestSplit(spark, sf)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (split(r.getLong(0)), r.getString(1).split(" ", -1)))
      .filter(d => d._1 == "train" || d._1 == "test")
    def grams(w: Array[String], n: Int): Iterator[String] =
      if (w.length < n) Iterator.empty else w.sliding(n).map(_.mkString(" "))
    val rows = Curation.splitCoverageCurve(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === (1 to 4))
    rows.foreach { r =>
      val n = r.getInt(0)
      val train = docs.iterator.filter(_._1 == "train")
        .flatMap(d => grams(d._2, n)).toSet
      val test = docs.iterator.filter(_._1 == "test")
        .flatMap(d => grams(d._2, n)).toSet
      assert(r.getLong(1) === test.size.toLong)
      assert(r.getLong(2) === (test & train).size.toLong)
      assert(r.getDouble(3) === r6((test & train).size.toDouble / test.size))
    }
    // longer contexts are never better covered than shorter ones here
    assert(rows.map(_.getDouble(3)).toSeq === rows.map(_.getDouble(3)).sorted.reverse)
  }

  test("k-anonymity: risk mass replays the identifier-group histogram") {
    val groups = graft.core.Tables.customer(spark, sf)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(_.getLong(2))
    val total = groups.sum
    val got = Relational.kAnonymityAudit(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet === Set(2, 5, 10, 20))
    got.foreach { r =>
      val k = r.getInt(0)
      val risky = groups.filter(_ < k)
      assert(r.getLong(1) === groups.length.toLong)
      assert(r.getLong(2) === risky.length.toLong)
      assert(r.getLong(3) === risky.sum)
      assert(r.getDouble(4) === r6(risky.sum.toDouble / total))
    }
  }

  test("recrawl redundancy: decile rollup replays the pair orientation") {
    val dup = Dedup.minhashPairs(spark, sf).select(col("doc2"))
      .collect().map(_.getLong(0)).toSet
    val ids = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val mx = ids.max
    val expect = ids.groupBy(id => math.min(9L, id * 10 / (mx + 1)).toInt)
      .view.mapValues(g => (g.length.toLong, g.count(dup).toLong)).toMap
    val got = Dedup.recrawlRedundancy(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, d) = expect(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === d)
      assert(r.getDouble(3) === r6(d.toDouble / n))
    }
  }
}
