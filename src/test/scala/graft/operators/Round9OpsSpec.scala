package graft.operators

import graft.SparkTestBase
import graft.analytics.Relational
import org.apache.spark.sql.functions.{col, countDistinct, to_date}

/** Semantics of the round-9 first batch (q332-q335): the bounded k-truss
  * peel, the BASE ⊕ DELTA incremental-aggregate maintenance audit, the
  * exact dyadic Holt backtest, and the greedy next-fit-decreasing
  * compaction planner. Hand fixtures replay the recursions step by step;
  * sf0.001 runs pin the corpus-level invariants the oracle also checks.
  */
class Round9OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("k-truss fixture: diamond chain cascades 7 -> 2 -> 0 at k=4") {
    val s = spark
    import s.implicits._
    // triangles {1,2,3}, {2,3,4}, {3,4,5} share edges (2,3) and (3,4):
    // at k=4 (support >= 2) round 1 keeps exactly those two spine edges,
    // round 2 starves them of triangles — the cascade a single support
    // pass misses.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L)).toDF("doc1", "doc2")
    val trace = Curation.kTrussOf(spark, pairs, k = 4, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(trace.toSeq === Seq((1, 7L, 2L), (2, 2L, 0L), (3, 0L, 0L)))
  }

  test("k-truss corpus: round-1 peel equals the edge-support >= 1 filter") {
    val trace = Curation.kTruss(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val support = Curation.edgeSupport(spark, sf).collect()
    assert(trace(0)._2 === support.length.toLong, "round 1 starts from all pairs")
    assert(trace(0)._3 === support.count(_.getLong(2) >= 1L).toLong,
      "round 1 removes exactly the support-0 chain links")
    // peels are monotone and rounds chain (after(r) == before(r+1))
    trace.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 === b._2); assert(b._3 <= b._2)
    }
  }

  test("incremental-agg audit: merge law holds on the corpus, cut is live") {
    val r = Relational.incrementalAggAudit(spark, sf).collect().head
    assert(r.getLong(3) === 0L, "BASE + DELTA must equal the recompute")
    assert(r.getLong(4) === r.getLong(5), "checksums agree when no mismatch")
    assert(r.getLong(0) > 0L && r.getLong(1) > 0L,
      "the 1999-01-01 cut must split the data (liveness)")
    val days = graft.core.Tables.orders(spark, sf)
      .agg(countDistinct(to_date(col("o_orderdate")))).collect().head.getLong(0)
    assert(r.getLong(2) === days, "merged grain covers every order day")
  }

  test("holt backtest fixture: truncating recursion, negative-trend step") {
    val s = spark
    import s.implicits._
    // days 1,2,4 (zero-filled gap on day 3): cents 100, 200, 0, 400
    // l0=100 b0=0; step1 err=100 l=150 b=12; step2 (x=0) err=162 l=81
    // b=(81-150+36)/4 = -69/4 -> -8 via TRUNCATION TOWARD ZERO (the q311
    // contract; floor would give -9); step3 pred=73 err=327 l=236 b=32.
    val orders = Seq(
      ("2020-01-01 00:00:00", 1.0), ("2020-01-02 00:00:00", 2.0),
      ("2020-01-04 00:00:00", 4.0)).toDF("o_orderdate", "o_totalprice")
      .select(col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_totalprice"))
    val r = Relational.holtBacktestOf(spark, orders).collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 236L)
    assert(r.getLong(2) === 32L)
    assert(r.getLong(3) === (100L + 162L + 327L))
    assert(r.getLong(4) === 327L)
    assert(r.getDouble(5) === 1.963333)
  }

  test("compaction plan: bins respect capacity, conserve bytes, stay contiguous") {
    val plan = Curation.compactionPlan(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1)
    val manifest = graft.core.Tables.documents(spark, sf)
      .groupBy(col("source"), org.apache.spark.sql.functions.expr("doc_id div 50"))
      .agg(org.apache.spark.sql.functions.sum(col("n_chars")).as("sz"))
      .collect().map(_.getLong(2))
    assert(plan.map(_._2).sum === manifest.length.toLong, "every file assigned once")
    assert(plan.map(_._3).sum === manifest.sum, "bytes conserved")
    assert(plan.map(_._1).toSeq === plan.indices.map(_.toInt), "bins contiguous from 0")
    plan.foreach { case (b, n, tot, max, min, fill) =>
      assert(n >= 1L && min <= max && max <= tot)
      // every corpus file fits alone under the cap, so no bin may overflow
      assert(tot <= 4096L, s"bin $b overflows")
      assert(fill === BigDecimal(tot.toDouble / 4096.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // next-fit-decreasing liveness: the planner actually packs (fewer
    // bins than files) and the greedy leaves every bin more than half
    // empty only at the tail
    assert(plan.length.toLong < plan.map(_._2).sum)
  }

  test("association rules: fat basket capped at 32 items, small ids win") {
    val s = spark
    import s.implicits._
    val day = java.sql.Date.valueOf("2020-01-01")
    // one power-user basket with 50 items plus two normal baskets that
    // co-occur on items 1,2 — the hot basket must contribute pairs only
    // from its first (smallest) 32 items
    val fat = (1 to 50).map(i => ("hub", day, i))
    val normal = Seq(("u1", day, 1), ("u1", day, 2), ("u2", day, 1), ("u2", day, 2))
    val items = (fat ++ normal).toDF("user_id", "day", "item")
    val rules = graft.analytics.Funnels
      .associationRulesOf(spark, items, minSupport = 1L).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // no rule may involve a capped-away item (> 32)
    assert(rules.keys.forall { case (a, c) => a <= 32 && c <= 32 },
      s"capped items leaked: ${rules.keys.filter(k => k._1 > 32 || k._2 > 32)}")
    // pair volume from the hub basket is 32*31, not 50*49
    val hubOnly = rules.count { case ((a, c), _) => a > 2 || c > 2 }
    assert(hubOnly === 32 * 31 - 2, "hub contributes exactly its capped pairs")
    // items 1,2 co-occur in all 3 baskets (hub kept them: smallest ids win)
    assert(rules((1, 2)) === 3L && rules((2, 1)) === 3L)
    // an uncapped run on the same fixture WOULD emit the >32 pairs
    val uncapped = graft.analytics.Funnels
      .associationRulesOf(spark, items, minSupport = 1L, maxItemsPerBasket = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(uncapped.exists { case (a, c) => a > 32 || c > 32 })
  }
}
