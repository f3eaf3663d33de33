package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions.col

/** Semantics of the second round-7 operator batch: label propagation over
  * the near-dup graph, Good-Turing count-of-counts smoothing, and the
  * count-min-sketch accuracy audit. Crafted fixtures where the expectation
  * is computable by hand; the DuckDB oracle covers exact corpus values at
  * sf0.01.
  */
class Round7bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("label propagation: chain spreads one hop per round, seeds clamp") {
    import spark.implicits._
    // path 1-2-3-4, seed at 1 (label 7); plus seed 9 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc1", "doc2")
    val seeds = Seq((1L, 7), (9L, 3)).toDF("doc_id", "label")
    def labelsAfter(r: Int): Map[Long, (Int, Int)] =
      Curation.labelPropagationOf(pairs, seeds, r).collect()
        .map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2)))).toMap
    assert(labelsAfter(1) === Map(1L -> ((7, 1)), 9L -> ((3, 1)),
      2L -> ((7, 0))))
    assert(labelsAfter(3) === Map(1L -> ((7, 1)), 9L -> ((3, 1)),
      2L -> ((7, 0)), 3L -> ((7, 0)), 4L -> ((7, 0))))
  }

  test("label propagation: majority wins, exact tie takes smaller label") {
    import spark.implicits._
    // node 10 sees labels {1, 1, 5} -> majority 1;
    // node 20 sees labels {2, 8} -> tie, smaller label 2
    val pairs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L))
      .toDF("doc1", "doc2")
    val seeds = Seq((1L, 1), (2L, 1), (3L, 5), (4L, 8), (5L, 2))
      .toDF("doc_id", "label")
    val got = Curation.labelPropagationOf(pairs, seeds, 1).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(got(10L) === 1)
    assert(got(20L) === 2)
  }

  test("good-turing: hand fixture 'a a a b b c'") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    // reuse the corpus entry point shape via a temp view is overkill —
    // replay the formula on the public query instead: freq 1,2,3 each
    // with one type; N = 6
    val spine = docs.select(
      org.apache.spark.sql.functions.explode(
        graft.functions.Text.tokens(col("text"))).as("w"))
    val wc = spine.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val gt = TextAnalytics.goodTuring(spark, sf).collect()
    // corpus-level invariants: freq classes are distinct and positive,
    // sum(freq * n_types) = token total used in every gt_class_mass,
    // and gt_freq = (freq+1) * next_n_types / n_types at 6 dp
    val n = gt.map(r => r.getLong(0) * r.getLong(1)).sum
    gt.foreach { r =>
      val (freq, nt, next) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(freq > 0 && nt > 0)
      assert(r.getDouble(3) ===
        BigDecimal((freq + 1) * next / nt.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(4) ===
        BigDecimal((freq + 1) * next / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the observed frequency classes cover every distinct word count
    val freqs = gt.map(_.getLong(0)).toSet
    val counts = TextAnalytics.goodTuring(spark, sf)
    assert(counts.select(col("freq")).distinct().count() === freqs.size)
  }

  test("cms audit: estimates never undercount and hit exact at this width") {
    val rows = TextAnalytics.cmsAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: CMS undercounted")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
    // 31-word vocabulary vs 4x1024 cells: collisions are possible but a
    // row-minimum over 4 independent rows must keep max overestimate
    // below the eps*N bound with e/w slack: N/256
    val n = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(3)).max <= math.max(1L, n / 256))
  }

  test("kmv: small strata are exact, large strata estimate within bounds") {
    val rows = TextAnalytics.kmvDistinct(spark, sf).collect()
    val bySource = rows.map(r => r.getString(0) -> r).toMap
    assert(bySource.contains("ALL"))
    rows.foreach { r =>
      val (n, est) = (r.getLong(1), r.getDouble(3))
      if (r.isNullAt(2)) {
        // fewer than k distinct values: the sketch IS the exact count
        assert(n < 64 && est === n.toDouble && r.getDouble(4) === 0.0)
      } else {
        // KMV with k=64: 1/sqrt(k) ~ 12.5% std error; 5 sigma sanity band
        assert(n >= 64)
        assert(math.abs(est - n) / n < 0.625, s"${r.getString(0)}: $est vs $n")
      }
    }
  }

  test("ndcg: perfect retrieval iff recall is perfect, and ndcg <= 1") {
    val ndcg = Similarity.ndcgAt5(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val recall = Similarity.annRecallAt5(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(ndcg.keySet === recall.keySet)
    ndcg.foreach { case (k, v) =>
      assert(v >= 0.0 && v <= 1.0, s"$k ndcg $v")
      // all 5 hits -> every discount collected -> ndcg exactly 1;
      // any miss caps ndcg strictly below 1
      if (recall(k) === 1.0) assert(v === 1.0, s"$k")
      else assert(v < 1.0, s"$k")
    }
  }

  test("decay engagement: hand replay at one-week half-life") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"),
        org.apache.spark.sql.functions.to_date(col("ts")).as("day"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val d1 = ev.map(_._2).maxBy(_.toEpochDay)
    val expect = ev.groupBy(_._1).view.mapValues { es =>
      es.map { case (_, day, v) =>
        val k = math.min(
          (d1.toEpochDay - day.toEpochDay) / 7, 8L).toInt
        math.round(v * 100) * (1L << (8 - k))
      }.sum
    }.toMap
    val got = graft.analytics.Funnels.decayEngagement(spark, sf).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      assert(r.getLong(2) === expect(r.getLong(0)), s"user ${r.getLong(0)}")
      assert(r.getDouble(3) ===
        BigDecimal(r.getLong(2) / 25600.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("next-event backtest: hand replay of train/test split and argmax") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
    val days = graft.core.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(col("ts")).as("d"),
        col("event_id"))
      .collect().map(r => r.getLong(1) -> r.getDate(0).toLocalDate).toMap
    val d0 = days.values.minBy(_.toEpochDay)
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4, days(b._3))
      }
    }.toSeq
    val (test, train) = pairs.partition(_._3.toEpochDay > d0.toEpochDay + 19)
    val model = train.groupBy(_._1).view.mapValues { ps =>
      ps.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (t, c) => (-c, t) }.head._1
    }.toMap
    val expect = test.filter(p => model.contains(p._1)).groupBy(_._1)
      .map { case (f, ps) =>
        f -> ((model(f), ps.size.toLong,
          ps.count(_._2 == model(f)).toLong))
      }
    val got = graft.analytics.Funnels.nextEventBacktest(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
  }

  test("seasonal index: weighted mean of indices is 1, avg replays") {
    val rows = graft.analytics.Relational.seasonalIndex(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq === (1 to 7))
    val nAll = rows.map(_.getLong(1)).sum
    val revAll = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val (n, cents) = (r.getLong(1), r.getLong(2))
      assert(r.getDouble(3) ===
        BigDecimal(cents.toDouble / (n * 100))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val idx = (BigInt(cents) * nAll).toDouble /
        (BigInt(n) * revAll).toDouble
      assert(math.abs(r.getDouble(4) - idx) < 1e-6, s"dow ${r.getInt(0)}")
    }
    // day-weighted mean of the indices telescopes to exactly 1
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / nAll
    assert(math.abs(weighted - 1.0) < 1e-4)
  }

  test("hll audit: registers account for all 256 slots, error in band") {
    val rows = TextAnalytics.hllAudit(spark, sf).collect()
    rows.foreach { r =>
      val (n, zeros, zfp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(zeros >= 0 && zeros <= 256)
      // every register contributes: filled ones >= 2^0, zeros exactly 2^53
      assert(zfp >= zeros * 9007199254740992L + (256 - zeros))
      assert(r.getDouble(4) > 0)
      // raw HLL std error 1.04/sqrt(256) = 6.5%; generous 5-sigma band
      // once the stratum is big enough for the asymptotics
      if (n >= 1000)
        assert(math.abs(r.getDouble(5)) < 0.325, s"${r.getString(0)}")
    }
  }

  test("ks drift: stats in [0,1], totals constant, fp consistent") {
    val rows = TextAnalytics.ksDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getLong(1) + rows.head.getLong(2)
    rows.foreach { r =>
      val (n1, n2, fp, stat) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(n1 + n2 === total)
      assert(stat >= 0.0 && stat <= 1.0)
      assert(math.abs(stat - fp.toDouble / (n1.toDouble * n2)) < 1e-6)
      // with >= 2 sources of random lengths the CDFs must differ somewhere
      assert(fp > 0)
    }
  }

  test("mutual nn: pairs are disjoint, ordered, and reciprocal by construction") {
    val rows = Similarity.mutualNearestNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // a vector has one argmax, so it can appear in at most one mutual pair
    val members = rows.flatMap(r => Seq(r._1, r._2))
    assert(members.distinct.length === members.length)
    rows.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("mann-whitney: U bounds, auc/biserial consistency, full coverage") {
    val r = Curation.mannWhitneyQuality(spark, sf).collect().head
    val (n1, n2, ux2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(n1 + n2 === total)
    assert(ux2 >= 0 && ux2 <= 2 * n1 * n2)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    // rank-biserial = 2*auc - 1 (identical integers divided, 6-dp rounds)
    assert(math.abs(r.getDouble(4) - (2 * r.getDouble(3) - 1)) < 3e-6)
  }

  test("survival curve: hand-computed KM with churn and censoring") {
    import spark.implicits._
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // corpus end 2024-03-01. Lifetimes (weeks): u1 churned wk0 (one day),
    // u2 churned wk1 (8 days), u3 censored wk0 (active at the end),
    // u4 churned wk0, u5 censored wk5 (40-day lifetime, active at the end)
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"),
      (2L, "2024-01-01"), (2L, "2024-01-09"),
      (3L, "2024-02-27"), (3L, "2024-03-01"),
      (4L, "2024-01-10"), (4L, "2024-01-12"),
      (5L, "2024-01-20"), (5L, "2024-02-29")
    ).map { case (u, s) => (u, d(s)) }.toDF("user_id", "day")
    val got = graft.analytics.Funnels.survivalCurveOf(spark, ev).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // wk0: at risk 5, churned {u1,u4}=2, censored {u3}=1 -> h=2/5,
    //   s = 3/5 -> 600000000000
    assert(got(0) === ((5L, 2L, 1L, 400000000000L, 600000000000L)))
    // wk1: at risk 2 (u2,u5), churned {u2}, h=1/2, s=3/5*1/2=3/10
    assert(got(1) === ((2L, 1L, 0L, 500000000000L, 300000000000L)))
    // wk5: u5 alone, censored -> churn 0, s unchanged
    assert(got(5) === ((1L, 0L, 1L, 0L, 300000000000L)))
    assert(got.size === 3)
  }

  test("wilson ci: brackets p-hat, stays in [0,1], formula replays") {
    val rows = graft.analytics.Sessions.conversionWilson(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 7).toSet))
    rows.foreach { r =>
      val (ns, nc) = (r.getLong(1), r.getLong(2))
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nc <= ns)
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p + 1e-9 && p <= hi + 1e-9)
      val (n, x) = (ns.toDouble, nc.toDouble)
      val denom = 1.0 + 3.8416 / n
      val center = (x / n + 3.8416 / (n * 2)) / denom
      val half = 1.96 * math.sqrt(
        x / n * (1.0 - x / n) / n + 3.8416 / (n * n * 4)) / denom
      assert(math.abs(lo - (center - half)) < 1e-6, s"dow ${r.getInt(0)}")
      assert(math.abs(hi - (center + half)) < 1e-6)
    }
  }

  test("bootstrap se: mean replays the direct mean, se positive and sane") {
    val rows = TextAnalytics.bootstrapSe(spark, sf).collect()
    assert(rows.nonEmpty)
    val direct: Map[String, (Long, Long)] = graft.core.Tables
      .documents(spark, sf)
      .select(col("source"),
        graft.functions.Text.modelScore(col("text")).as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, xs) =>
        k -> ((xs.length.toLong, xs.map(x => math.round(x._2 * 1e6)).sum))
      }
    rows.foreach { r =>
      val (src, n) = (r.getString(0), r.getLong(1))
      val (dn, dsumFp) = direct(src)
      assert(n === dn)
      assert(math.abs(r.getDouble(2) - dsumFp.toDouble / (n * 1e6)) < 1e-6)
      // a 6-dp-grid score in roughly [-0.5, 2] with n >= ~15 docs:
      // SE must be positive and far below the score range
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 0.5, s"$src")
    }
  }

  test("heaps curve: cumulative counts reconcile with corpus totals") {
    val rows = TextAnalytics.heapsCurve(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === (0 to 9))
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val totalTokens = docs.map(_.split(" ", -1).length.toLong).sum
    val vocab = docs.flatMap(_.split(" ", -1)).distinct.length.toLong
    assert(rows.last.getLong(2) === totalTokens)
    assert(rows.last.getLong(3) === vocab)
    // monotone growth, diminishing type-token ratio (Heaps' law shape)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) > a.getLong(2))
      assert(b.getLong(3) >= a.getLong(3))
      assert(b.getDouble(4) <= a.getDouble(4) + 1e-9)
    }
  }

  test("band tuning: candidate sets nest, so volume and recall are monotone") {
    val rows = Dedup.bandTuningSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(-_._1) // 16, 8, 4, 2 bands
    assert(rows.map(_._1).toSeq === Seq(16, 8, 4, 2))
    // an r-row band match implies both r/2-row halves match, so fewer
    // bands can only lose candidates and hits
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._2 >= lo._2, s"candidates ${hi._1}b vs ${lo._1}b")
      assert(hi._4 >= lo._4, s"hits ${hi._1}b vs ${lo._1}b")
    }
    rows.foreach { case (b, cand, truth, hit) =>
      assert(hit <= truth && hit <= cand, s"$b bands")
    }
  }

  test("class tfidf: five ranked keywords per source, score replay") {
    val rows = TextAnalytics.classTfidf(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.values.foreach { rs =>
      assert(rs.length === 5)
      assert(rs.map(_.getInt(4)).sorted.toSeq === (1 to 5))
      val ordered = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      ordered.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    }
    // replay one score: tf * ln(1 + A/f_w) from raw counts
    val words = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val fw = words.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val a = words.length.toDouble / words.map(_._1).distinct.length
    val r0 = rows.head
    val tf0 = words.count(w => w._1 == r0.getString(0) && w._2 == r0.getString(1))
    assert(r0.getLong(2) === tf0.toLong)
    val expect = tf0 * math.log(1.0 + a / fw(r0.getString(1)))
    assert(math.abs(r0.getDouble(3) - expect) < 1e-6)
  }

  test("dendrogram: tighter cuts only shrink pairs, mass and max cluster") {
    val rows = Curation.dedupDendrogram(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0.7, 0.8, 0.9))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2, "pairs")
      assert(lo._4 >= hi._4, "clustered docs")
      assert(lo._5 >= hi._5, "max cluster")
    }
    rows.foreach { case (t, _, nc, mass, mx) =>
      if (nc > 0) {
        assert(mass >= 2 * nc, s"t=$t: clusters need >= 2 members")
        assert(mx >= 2 && mx <= mass)
      } else assert(mass === 0 && mx === 0)
    }
  }

  test("ljung-box: integer replay from the published ACF grid") {
    val r = graft.analytics.Relational.ljungBox(spark, sf).collect().head
    val n = r.getLong(1)
    val acf = graft.analytics.Relational.revenueAutocorrelation(spark, sf)
      .collect().map(x => x.getInt(0) -> x.getDouble(2))
    assert(acf.length === 14)
    val s = acf.map { case (k, a) =>
      val r6 = math.round(a * 1e6)
      r6 * r6 * 1000000L / (n - k)
    }.sum
    val q = (BigInt(n) * (n + 2) * s).toDouble / 1e18
    assert(math.abs(r.getDouble(2) - q) < 1e-5)
    assert(r.getInt(3) === (if (r.getDouble(2) > 23.685) 1 else 0))
  }

  test("cusum: BigInt replay of the argmax deviation") {
    val r = graft.analytics.Relational.cusumChangepoint(spark, sf)
      .collect().head
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date(col("o_orderdate"))
        .as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long")).as("c"))
      .collect().map(x => x.getDate(0).toLocalDate -> x.getLong(1)).toMap
    val d0 = daily.keys.minBy(_.toEpochDay)
    val d1 = daily.keys.maxBy(_.toEpochDay)
    val xs = (d0.toEpochDay to d1.toEpochDay)
      .map(d => java.time.LocalDate.ofEpochDay(d))
      .map(d => d -> daily.getOrElse(d, 0L))
    val n = xs.length
    val total = xs.map(x => BigInt(x._2)).sum
    var cum = BigInt(0)
    val devs = xs.zipWithIndex.map { case ((d, x), i) =>
      cum += x
      (d, (BigInt(n) * cum - BigInt(i + 1) * total).abs)
    }
    val best = devs.maxBy(v => (v._2, -v._1.toEpochDay))
    assert(r.getDate(0).toLocalDate === best._1)
    assert(r.getLong(1) === n.toLong)
    assert(BigInt(r.getLong(2)) === best._2)
  }

  test("ab ztest: user-day replay of counts and the pooled z") {
    val r = graft.analytics.Funnels.abConversionZtest(spark, sf)
      .collect().head
    val ud = graft.core.Tables.events(spark, sf)
      .select(col("user_id"),
        org.apache.spark.sql.functions.to_date(col("ts")).as("d"),
        col("event_type"))
      .collect().map(x => ((x.getLong(0), x.getDate(1).toLocalDate),
        x.getString(2) == "purchase"))
      .groupBy(_._1).map { case (k, vs) => k -> vs.exists(_._2) }
    val a = ud.filter(_._1._1 % 2 == 0)
    val b = ud.filter(_._1._1 % 2 == 1)
    assert(r.getLong(0) === a.size.toLong)
    assert(r.getLong(1) === a.count(_._2).toLong)
    assert(r.getLong(2) === b.size.toLong)
    assert(r.getLong(3) === b.count(_._2).toLong)
    val (na, nb) = (a.size.toDouble, b.size.toDouble)
    val (pa, pb) = (a.count(_._2) / na, b.count(_._2) / nb)
    val pool = (a.count(_._2) + b.count(_._2)) / (na + nb)
    val z = (pa - pb) /
      math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(6) - z) < 1e-6)
    assert(r.getInt(7) === (if (math.abs(r.getDouble(6)) > 1.96) 1 else 0))
  }

  test("class balance: factors are exact ceilings and level the classes") {
    val rows = Similarity.classBalancePlan(spark, sf).collect()
    val maxCnt = rows.map(_.getLong(1)).max
    val after = rows.map(_.getLong(3)).sum
    rows.foreach { r =>
      val (cnt, f, up) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(f === (maxCnt + cnt - 1) / cnt)
      assert(up === f * cnt)
      assert(up >= maxCnt && up < maxCnt + cnt)
      assert(math.abs(r.getDouble(5) - up.toDouble / after) < 1e-6)
    }
    // balancing tightens the spread: worst share_after within factor-1
    // rounding of uniform
    val shares = rows.map(_.getDouble(5))
    assert(shares.max / shares.min < 2.0)
  }

  test("concurrent sessions: brute-force replay over the session list") {
    val sess = graft.analytics.Sessions.sessionGap(spark, sf)
      .select(col("user_id"), col("session_start_time"),
        col("session_end_time"))
      .collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime,
        x.getTimestamp(2).getTime))
    val expect = (for {
      a <- sess; b <- sess
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield java.time.Instant.ofEpochMilli(math.max(a._2, b._2))
      .atZone(java.time.ZoneOffset.UTC).toLocalDate)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.analytics.Sessions.concurrentSessions(spark, sf)
      .collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
