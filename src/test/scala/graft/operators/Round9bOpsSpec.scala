package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 second batch (q336-q339): majority-label
  * propagation, bounded hop-neighborhood growth, RAKE keyphrases, and
  * per-label retrieval MRR. Hand fixtures replay each recursion/score;
  * the retrieval test recomputes the macro metrics independently from
  * the shared q29 ranking contract.
  */
class Round9bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("LPA fixture: majority vote keeps chained triangles separate") {
    val s = spark
    import s.implicits._
    // two triangles joined by one chain link (3,4) — transitive closure
    // would merge them into one component; majority voting must not
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("doc1", "doc2")
    val verts = (1L to 7L).toDF("doc_id")
    val got = Curation.lpaCommunitiesOf(spark, pairs, verts).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // self-inclusive votes: R1 [1,1,1,3,4,4,7] -> R2 [1,1,1,4,4,4,7]
    // (v4's neighbor labels 4,4 outvote its own 3) -> R3 stable
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
    // a pendant pair must CONVERGE to one community, not 2-cycle
    val pg = Seq((20L, 21L)).toDF("doc1", "doc2")
    val pgot = Curation.lpaCommunitiesOf(spark, pg,
      Seq(20L, 21L).toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pgot === Map(20L -> 20L, 21L -> 20L))
    // the two triangles end in DIFFERENT communities; components would not
    assert(got(1L) !== got(4L))
    val comps = Curation.connectedComponents(pairs, verts).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) === comps(4L), "closure merges what LPA separates")
  }

  test("hop neighborhoods fixture: path deepens, clique closes at 1 hop") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("doc1", "doc2")
    val got = Curation.hopNeighborhoodsOf(spark, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))).toMap
    assert(got(1L) === ((1L, 2L, 3L, 3)), "path end keeps growing")
    assert(got(3L) === ((2L, 4L, 4L, 2)), "path center saturates at 2 hops")
    assert(got(10L) === ((2L, 2L, 2L, 1)), "triangle is closed at 1 hop")
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L))
  }

  test("RAKE fixture: deg/freq fixed point, repeated phrase counted once per instance") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta the alpha beta of gamma"),
      (2L, "delta epsilon zeta eta theta iota")) // 6-word run: discarded
      .toDF("doc_id", "text")
    val got = TextAnalytics.rakeKeyphrasesOf(spark, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // deg(alpha)=deg(beta)=4 over two rl-2 runs, freq=2 -> sfp 2e6 each;
    // phrase score 4e6. gamma: 1e6. The 6-word run contributes nothing.
    assert(got.toSeq === Seq(
      ("alpha beta", 2L, 4000000L, 4.0),
      ("gamma", 1L, 1000000L, 1.0)))
  }

  test("modularity: closure keeps every edge internal; singletons cut all") {
    val rows = Curation.partitionModularity(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val m = Dedup.minhashPairs(spark, sf).count()
    val (_, compEdges, compQ) = rows("components")
    assert(compEdges === m, "components internalize every edge by definition")
    val (nSingle, singleEdges, singleQ) = rows("singletons")
    assert(singleEdges === 0L && singleQ < 0.0, "singletons cut everything")
    assert(nSingle === 500L)
    // independent driver-side recompute of the singleton score: -sum(deg^2)/4m^2
    val deg = Dedup.minhashPairs(spark, sf)
      .select(col("doc1"), col("doc2")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .groupBy(identity).map(_._2.length.toLong)
    val expQ = BigDecimal(-deg.map(d => d * d).sum.toDouble / (4.0 * m * m))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(singleQ === expQ)
    assert(compQ > rows("lpa")._3 - 1e-9, "LPA never beats closure when no chain links exist")
  }

  test("centroid confusion: exact driver recompute and row-count conservation") {
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).map(x => BigDecimal(x * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> Array.tabulate(64)(i => vs.map(_._3(i)).sum / vs.length)
    }
    val expected = vecs.map { case (_, trueL, xq) =>
      val pred = cents.map { case (l, c) =>
        (xq.indices.map(i => { val d = xq(i) - c(i); d * d }).sum, l)
      }.minBy(identity)._2
      (trueL, pred)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Similarity.centroidConfusion(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.values.sum === 500L, "every vector classified exactly once")
  }

  test("seasonal-naive fixture: weekly pattern scores lag-7 far under lag-1") {
    val s = spark
    import s.implicits._
    // 21 days of a strict weekly pattern: lag-7 error is 0, lag-1 is not
    val week = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val orders = (0 until 21).map { d =>
      (f"2021-03-${d + 1}%02d 00:00:00", week(d % 7))
    }.toDF("_1", "_2")
      .select(col("_1").cast("timestamp").as("o_orderdate"),
        col("_2").as("o_totalprice"))
    val r = graft.analytics.Relational.seasonalNaiveBacktestOf(spark, orders)
      .collect().head
    assert(r.getLong(0) === 14L, "days 8..21 scored")
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L, "lag-7 is exact")
    assert(r.getDouble(3) === 0.0)
    // lag-1 per day: |diff| of 1 within the week, 6 at the wrap -> per
    // week 6*100 + 600 = 1200 cents; 14 days = 2 weeks
    assert(r.getLong(4) === 2400L)
    assert(r.getDouble(6) === 0.0, "perfect skill")
  }

  test("join fanout fixture: exact rank-based percentiles and self-join mass") {
    val s = spark
    import s.implicits._
    // 10 keys: fanouts 1..9 and one hot key with 100
    val rows = (1 to 9).flatMap(k => Seq.fill(k)(s"u$k")) ++
      Seq.fill(100)("hot")
    val r = Skew.joinFanoutAuditOf(rows.toDF("key")).collect().head
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 45L + 100L)
    assert(r.getLong(2) === 100L)
    // sorted fanouts: 1..9,100; p50 = 5th value = 5; p90 = 9th = 9;
    // p99 = ceil(9.9) = 10th = 100
    assert(r.getLong(3) === 5L && r.getLong(4) === 9L && r.getLong(5) === 100L)
    val sq = (1 to 9).map(k => k.toLong * k).sum + 10000L
    assert(r.getLong(6) === sq)
    assert(r.getDouble(7) === BigDecimal(10000.0 / sq)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("retrieval MRR reconciles with an independent recompute off the q29 ranking") {
    val labels = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nb = Similarity.bruteForceTopK(spark, sf, 10, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))) // query, neighbor, rank
    val perQ = nb.groupBy(_._1).map { case (q, rows) =>
      val rel = rows.filter(t => labels(t._2) == labels(q))
      val rrFp = rel.map(_._3).sorted.headOption.map(1000000L / _).getOrElse(0L)
      (labels(q), rrFp, rel.length.toLong)
    }.toSeq
    val expect = perQ.groupBy(_._1).map { case (l, xs) =>
      l -> ((xs.size.toLong, xs.count(_._2 > 0L).toLong,
        math.rint(xs.map(_._2).sum.toDouble / (xs.size * 1e6) * 1e6) / 1e6,
        math.rint(xs.map(_._3).sum.toDouble / (xs.size * 10) * 1e6) / 1e6))
    }
    val got = Similarity.retrievalLabelMetrics(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === expect)
    assert(got.size === 10, "all ten labels appear among the 100 queries")
  }
}
