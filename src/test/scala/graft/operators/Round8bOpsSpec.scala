package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, TextAnalytics}
import org.apache.spark.sql.functions.{col, countDistinct, explode, lit, split, count => scount}

/** Semantics of the round-8 continuation batches (q290-q313): FK
  * integrity, lead-lag CCF, rank tests (Kruskal-Wallis / Kendall /
  * Levene / Cramér's V / Welch / Wasserstein / AUC), IR operators
  * (postings audit, phrase search), capped sessions, rank-function
  * kitchen, Mahalanobis outliers, lang macro-F1, the TPC-H classics
  * pack, exact OLS, forward as-of, and credit-conserving linear
  * attribution. Each test replays the operator independently (hand
  * fixture or driver-side recompute on sf0.001).
  */
class Round8bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fk integrity: clean star schema yields zero orphans and full parent coverage on dims") {
    val rows = Relational.fkIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size === 7)
    // the generated testdata is referentially clean: no orphans anywhere
    rows.values.foreach { r => assert(r.getLong(4) === 0L, r.getString(0)) }
    val li = rows("lineitem.l_orderkey->orders")
    val liCount = graft.core.Tables.lineitem(spark, sf).count()
    val ordCount = graft.core.Tables.orders(spark, sf).count()
    assert(li.getLong(1) === liCount)   // n_child
    assert(li.getLong(2) === 0L)        // n_null_fk
    assert(li.getLong(5) === ordCount)  // n_parent
    // orphan-free data: referenced parents = distinct child FK values
    // (the synthetic orders table has a tail of lineitem-less orders)
    val refOrders = graft.core.Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_orderkey"))).head.getLong(0)
    assert(li.getLong(6) === refOrders)  // n_referenced_parent
    assert(li.getLong(3) === refOrders)  // n_child_keys
    val oc = rows("orders.o_custkey->customer")
    val refCust = graft.core.Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(oc.getLong(3) === refCust)   // n_child_keys
    assert(oc.getLong(6) === refCust)   // referenced parents = distinct FKs (no orphans)
  }

  test("revenue-count ccf: lag-0 matches a driver-side Pearson over the zero-filled spine") {
    val daily = graft.core.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(col("o_orderdate")).as("day"),
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long").as("cents"))
      .collect().groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(rs => (rs.length.toLong, rs.map(_.getLong(1)).sum)).toMap
    val (d0, d1) = (daily.keys.min, daily.keys.max)
    val series = (0L to (d1.toEpochDay - d0.toEpochDay)).map { i =>
      daily.getOrElse(d0.plusDays(i), (0L, 0L))
    }
    val n = series.length
    def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
      val m = xs.length
      val (sx, sy) = (xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      val syy = ys.map(y => BigInt(y) * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      (BigInt(m) * sxy - sx * sy).toDouble /
        (math.sqrt((BigInt(m) * sxx - sx * sx).toDouble)
          * math.sqrt((BigInt(m) * syy - sy * sy).toDouble))
    }
    val got = Relational.revenueCountCcf(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size === 15)
    val (n0, r0) = got(0)
    assert(n0 === n.toLong)
    assert(math.abs(r0 - round6(pearson(series.map(_._1), series.map(_._2)))) < 1e-9)
    // lag +7: x_t vs y_{t+7} → n−7 pairs; replay the shifted correlation
    val (n7, r7) = got(7)
    assert(n7 === (n - 7).toLong)
    val xs = series.dropRight(7).map(_._1)
    val ys = series.drop(7).map(_._2)
    assert(math.abs(r7 - round6(pearson(xs, ys))) < 1e-9)
  }

  test("kruskal-wallis: groups replay a driver-side rank computation") {
    val vals = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // tie-averaged ranks over the full sample
    val sorted = vals.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .view.mapValues(g => g.map(_._2 + 1L).sum.toDouble / g.length).toMap
    val byG = vals.groupBy(_._1)
    val n = vals.length.toDouble
    val sumR2n = byG.values.map { g =>
      val rs = g.map(v => rankOf(v._2)).sum
      rs * rs / g.length
    }.sum
    val hExpect = 12.0 / (n * (n + 1)) * sumR2n - 3 * (n + 1)
    val rows = Relational.kruskalWallisPriority(spark, sf).collect()
    assert(rows.length === byG.size)
    val h = rows.head.getDouble(rows.head.fieldIndex("h_stat"))
    assert(math.abs(h - hExpect) < 1e-4, s"h=$h expected=$hExpect")
    rows.foreach { r =>
      val g = byG(r.getString(0))
      assert(r.getLong(r.fieldIndex("n_orders")) === g.length.toLong)
      val meanRank = r.getDouble(r.fieldIndex("mean_rank"))
      val expectMean = g.map(v => rankOf(v._2)).sum / g.length
      assert(math.abs(meanRank - expectMean) < 1e-4)
    }
  }

  test("kendall tau-b: hand fixture with known concordance structure") {
    import spark.implicits._
    // 4 days: counts 1,2,2,3 / cents 10,20,15,30 (one x-tie pair)
    // pairs (i<j): (1,2):C (1,3):C (1,4):C (2,3): dx=0,dy<0 → tie_x
    // (2,4):C (3,4):C → C=5 D=0 Tx=1 n0=6
    val orders = Seq(
      ("1994-01-01", 10.0),
      ("1994-01-02", 12.0), ("1994-01-02", 8.0),
      ("1994-01-03", 7.5), ("1994-01-03", 7.5),
      ("1994-01-04", 10.0), ("1994-01-04", 10.0), ("1994-01-04", 10.0)
    ).toDF("o_orderdate", "o_totalprice")
      .select(col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
    val r = Relational.kendallTauDailyOf(orders).head
    assert(r.getLong(0) === 4L)  // n_days
    assert(r.getLong(1) === 6L)  // n_pairs
    assert(r.getLong(2) === 5L)  // concordant
    assert(r.getLong(3) === 0L)  // discordant
    assert(r.getLong(4) === 1L)  // ties_x
    assert(r.getLong(5) === 0L && r.getLong(6) === 0L)
    val tau = r.getDouble(7)
    val expect = 5.0 / math.sqrt(5.0 * 6.0)
    assert(math.abs(tau - BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("phrase search: index and scan paths agree; top phrase replays a driver count") {
    val rows = TextAnalytics.phraseSearch(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getInt(4) === 1, s"paths disagree for ${r.getString(0)}")
      assert(r.getLong(1) >= r.getLong(2)) // occurrences ≥ doc frequency
      assert(r.getLong(2) === r.getLong(3))
    }
    // driver replay: recount the top phrase's occurrences from raw text
    val texts = graft.core.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      var i = 0
      while (i < ws.length - 1) {
        counts((ws(i), ws(i + 1))) = counts.getOrElse((ws(i), ws(i + 1)), 0L) + 1
        i += 1
      }
    }
    val (bestPair, bestN) = counts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.head
    val top = rows.maxBy(_.getLong(1))
    assert(top.getString(0) === s"${bestPair._1} ${bestPair._2}")
    assert(top.getLong(1) === bestN)
  }

  test("welch t-test: replays a driver-side computation from raw cents") {
    val byType = graft.core.Tables.events(spark, sf)
      .select(col("event_type"),
        org.apache.spark.sql.functions.round(col("value") * 100, 0)
          .cast("long").as("c"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1))).toMap
    def stats(xs: Seq[Long]): (Long, Double, Double) = {
      val n = xs.length
      val s = xs.map(BigInt(_)).sum
      val q = xs.map(x => BigInt(x) * x).sum
      val mean = s.toDouble / n
      val v = (BigInt(n) * q - s * s).toDouble / (n.toDouble * (n - 1.0))
      (n.toLong, mean, v)
    }
    val (na, ma, va) = stats(byType("purchase"))
    val (nb, mb, vb) = stats(byType("click"))
    val sea = va / na; val seb = vb / nb
    val tExpect = (ma - mb) / math.sqrt(sea + seb)
    val dfExpect = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
    val r = Relational.welchTtest(spark, sf).head
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(math.abs(r.getDouble(r.fieldIndex("t_stat")) - tExpect) < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("df_welch")) - dfExpect) < 1e-2)
    assert(math.abs(r.getDouble(r.fieldIndex("mean_cents_a")) - ma) < 1e-4)
  }

  test("wasserstein drift: replays a driver-side exact EMD") {
    val byType = graft.core.Tables.events(spark, sf)
      .select(col("event_type"),
        org.apache.spark.sql.functions.round(col("value") * 100, 0)
          .cast("long").as("c"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1))).toMap
    val (xs, ys) = (byType("purchase"), byType("click"))
    val (na, nb) = (xs.length.toLong, ys.length.toLong)
    val grain = (xs ++ ys).distinct.sorted
    var emd = BigInt(0)
    var (cum1, cum2) = (0L, 0L)
    grain.zip(grain.tail).foreach { case (v, next) =>
      cum1 += xs.count(_ == v); cum2 += ys.count(_ == v)
      emd += (BigInt(cum1) * nb - BigInt(cum2) * na).abs * (next - v)
    }
    val r = Relational.wassersteinDrift(spark, sf).head
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(r.getLong(2) === grain.length.toLong)
    assert(BigInt(r.getLong(3)) === emd)
    assert(math.abs(r.getDouble(4) - emd.toDouble / (na.toDouble * nb.toDouble)) < 1e-4)
  }

  test("capped sessions: histogram conserves events and splits replay the cap rule") {
    import org.apache.spark.sql.functions.{unix_micros, lag => slag}
    import org.apache.spark.sql.expressions.{Window => W}
    val nEvents = graft.core.Tables.events(spark, sf).count()
    val rows = graft.analytics.Sessions.cappedSessionHistogram(spark, sf).collect()
    // cap=2 → no capped session exceeds 2 events
    assert(rows.forall(_.getLong(0) <= 2L))
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === nEvents)
    // driver replay of the full assignment
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2)))
      .sortBy(t => (t._1, t._2, t._3))
    val sizes = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    var (prevUser, prevTs, gsid, rn) = (-1L, 0L, 0L, 0)
    ev.foreach { case (u, ts, _) =>
      if (u != prevUser) { gsid = 1; rn = 0 }
      else if (ts - prevTs > 1800000000L) { gsid += 1; rn = 0 }
      val sub = rn / 2
      sizes((u, gsid, sub)) = sizes.getOrElse((u, gsid, sub), 0L) + 1
      rn += 1; prevUser = u; prevTs = ts
    }
    val expectHist = sizes.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(expectHist(r.getLong(0)) === r.getLong(1), s"size ${r.getLong(0)}")
    }
    val expectSplits = sizes.keys.count(_._3 > 0).toLong
    assert(rows.map(_.getLong(2)).sum === expectSplits)
  }

  test("rank functions: per-nation top-3 replay with exact percent_rank/cume_dist") {
    val custs = graft.core.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_custkey").cast("long"),
        org.apache.spark.sql.functions.round(col("c_acctbal") * 100, 0)
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byNation = custs.groupBy(_._1)
    val rows = graft.analytics.Relational.rankFunctionKitchen(spark, sf).collect()
    assert(rows.length === byNation.size * 3)
    rows.foreach { r =>
      val nk = r.getInt(0).toLong
      val sorted = byNation(nk).sortBy(t => (-t._3, t._2))
      val n = sorted.length
      val pos = sorted.indexWhere(_._2 == r.getLong(1))
      assert(pos >= 0 && pos < 3)
      val key = sorted(pos)._3
      // standard definitions over the ordered partition (cents desc key)
      assert(r.getInt(3) === sorted.count(_._3 > key) + 1)          // rank
      assert(r.getInt(4) === sorted.map(_._3).distinct.count(_ > key) + 1) // dense
      assert(math.abs(r.getDouble(6)
        - round6((r.getInt(3) - 1).toDouble / (n - 1))) < 1e-9)     // pct_rank
      assert(math.abs(r.getDouble(7)
        - round6((sorted.lastIndexWhere(_._3 == key) + 1).toDouble / n)) < 1e-9) // cume
    }
  }

  test("levene brown-forsythe: medians and F replay driver-side") {
    val byType = graft.core.Tables.events(spark, sf)
      .select(col("event_type"),
        org.apache.spark.sql.functions.round(col("value") * 100, 0)
          .cast("long").as("c"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    def lowerMedian(xs: Seq[Long]): Long = xs((xs.length - 1) / 2)
    val rows = graft.analytics.Relational.leveneBrownForsythe(spark, sf).collect()
    assert(rows.length === byType.size)
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === lowerMedian(xs))
    }
    // F via plain double ANOVA on |x − med|
    val groups = byType.values.map { xs =>
      val med = lowerMedian(xs)
      xs.map(x => math.abs(x - med).toDouble)
    }
    val n = groups.map(_.length).sum.toDouble
    val k = groups.size.toDouble
    val grand = groups.flatten.sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
    val fExpect = ((n - k) / (k - 1)) * (ssb / ssw)
    val f = rows.head.getDouble(rows.head.fieldIndex("f_stat"))
    assert(math.abs(f - fExpect) < 1e-3, s"f=$f expected=$fExpect")
  }

  test("cramers v: replays a driver-side chi-square contingency") {
    val cells = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        (org.apache.spark.sql.functions.weekday(col("o_orderdate")) + lit(1))
          .cast("int").as("dow"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val n = cells.length.toDouble
    val rowT = cells.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val colT = cells.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val obs = cells.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    var chi2 = 0.0
    for (p <- rowT.keys; d <- colT.keys) {
      val e = rowT(p) * colT(d) / n
      val o = obs.getOrElse((p, d), 0.0)
      chi2 += (o - e) * (o - e) / e
    }
    val r = graft.analytics.Relational.cramersVPriority(spark, sf).head
    assert(r.getLong(0) === cells.length.toLong)
    assert(r.getInt(1) === rowT.size && r.getInt(2) === colT.size)
    assert(math.abs(r.getDouble(3) - chi2) < 1e-3)
    val vExpect = math.sqrt(chi2 / (n * (math.min(rowT.size, colT.size) - 1)))
    assert(math.abs(r.getDouble(4) - vExpect) < 1e-4)
  }

  test("mahalanobis outliers: top-20 replays a driver-side standardized distance") {
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS xfp")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val n = vecs.length.toLong
    val d = vecs.head._2.length
    val s = Array.tabulate(d)(j => vecs.map(v => BigInt(v._2(j))).sum)
    val q = Array.tabulate(d)(j => vecs.map(v => BigInt(v._2(j)) * v._2(j)).sum)
    val den = Array.tabulate(d)(j => (BigInt(n) * q(j) - s(j) * s(j)).toDouble)
    val scores = vecs.map { case (id, x) =>
      val fp = (0 until d).map { j =>
        if (den(j) <= 0.0) 0L
        else {
          val a = (BigInt(n) * x(j) - s(j)).toDouble
          math.rint(a * a / den(j) * 1e6).toLong
        }
      }.sum
      (id, fp)
    }
    val expectTop = scores.sortBy(t => (-t._2, t._1)).take(20)
    val got = graft.operators.Similarity.mahalanobisOutliers(spark, sf).collect()
      .sortBy(_.getInt(4))
    assert(got.length === 20)
    got.zip(expectTop).foreach { case (r, (id, fp)) =>
      assert(r.getLong(0) === id)
      assert(r.getLong(2) === fp, s"vec $id")
    }
  }

  test("lang macro f1: per-class counts replay the confusion matrix") {
    val preds = TextAnalytics.langPredictions(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val rows = TextAnalytics.langMacroF1(spark, sf).collect()
    assert(rows.length === preds.map(_._1).distinct.length)
    rows.foreach { r =>
      val lang = r.getString(0)
      val tp = preds.count(p => p._1 == lang && p._2 == lang).toLong
      val fp = preds.count(p => p._1 != lang && p._2 == lang).toLong
      val fn = preds.count(p => p._1 == lang && p._2 != lang).toLong
      assert(r.getLong(1) === tp && r.getLong(2) === fp && r.getLong(3) === fn, lang)
      val f1 = if (2 * tp + fp + fn == 0) 0.0
        else round6(2.0 * tp / (2 * tp + fp + fn))
      assert(math.abs(r.getDouble(6) - f1) < 1e-9, lang)
    }
    // macro over the per-class rounded F1s
    val macroExpect = rows.map(_.getDouble(6)).sum / rows.length
    assert(math.abs(rows.head.getDouble(8) - macroExpect) < 1e-5)
  }

  test("quality auc: AUC matches a direct pairwise computation") {
    // driver replay: recompute score + bigram-repetition label per doc,
    // then AUC the O(n₁·n₀) way — positives must exist for the gate to
    // be live
    val docs = graft.core.Tables.documents(spark, sf)
      .select(
        org.apache.spark.sql.functions.round(
          graft.functions.Text.modelScore(col("text")) * 1e6)
          .cast("long").as("score"),
        col("text"))
      .collect().map { r =>
        val ws = r.getString(1).split(" ", -1)
        val bgs = ws.dropRight(1).zip(ws.drop(1))
        val frac = if (bgs.isEmpty) 0.0
          else round6(1.0 - bgs.distinct.length.toDouble / bgs.length)
        (r.getLong(0), frac >= 0.1)
      }
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty, "label must be live at sf0.001")
    // direct pairwise AUC: P(pos > neg) + 0.5·P(tie)
    var num = 0.0
    for (p <- pos; q <- neg)
      num += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val aucExpect = num / (pos.length.toDouble * neg.length)
    val r = TextAnalytics.qualityAuc(spark, sf).head
    assert(r.getLong(0) === pos.length.toLong)
    assert(r.getLong(1) === neg.length.toLong)
    assert(math.abs(r.getDouble(3) - aucExpect) < 1e-6)
  }

  test("tpch pack: q6 scan and q4 late-order census replay driver-side") {
    val lines = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate"), col("l_discount"),
        col("l_quantity"), col("l_extendedprice"))
      .collect()
    val y0 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val y1 = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val q6 = lines.filter { r =>
      val sd = r.getTimestamp(1)
      !sd.before(y0) && sd.before(y1) &&
        r.getDouble(2) >= 0.05 && r.getDouble(2) <= 0.07 && r.getDouble(3) < 24
    }
    val got6 = graft.analytics.Relational.tpchQ6Forecast(spark, sf).head
    assert(got6.getLong(0) === q6.length.toLong)
    assert(math.abs(got6.getDouble(1)
      - round6(q6.map(r => r.getDouble(4) * r.getDouble(2)).sum)) < 0.01)

    val orders = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val q1End = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val lateKeys: Map[Long, Array[java.sql.Timestamp]] =
      lines.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getTimestamp(1))).toMap
    val expect = orders
      .filter(o => !o._2.before(y0) && o._2.before(q1End))
      .filter { o =>
        val cutoff = new java.sql.Timestamp(
          o._2.toInstant.plus(java.time.Duration.ofDays(60)).toEpochMilli)
        lateKeys.getOrElse(o._1, Array.empty[java.sql.Timestamp]).exists(_.after(cutoff))
      }
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val got4 = graft.analytics.Relational.tpchQ4LateOrders(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got4 === expect)
  }

  test("ols normal equations: coefficients replay an exact BigInt Cramer solve") {
    val rows = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        org.apache.spark.sql.functions.round(col("l_discount") * 10000, 0).cast("long"),
        org.apache.spark.sql.functions.round(col("l_extendedprice"), 0).cast("long"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(rows.length)
    val sq = rows.map(_._1).sum; val sd = rows.map(_._2).sum
    val sqq = rows.map(t => t._1 * t._1).sum
    val sdd = rows.map(t => t._2 * t._2).sum
    val sqd = rows.map(t => t._1 * t._2).sum
    val sy = rows.map(_._3).sum
    val sqy = rows.map(t => t._1 * t._3).sum
    val sdy = rows.map(t => t._2 * t._3).sum
    def det3(a: Seq[BigInt], b: Seq[BigInt], c: Seq[BigInt]): BigInt =
      a(0) * (b(1) * c(2) - b(2) * c(1)) -
        a(1) * (b(0) * c(2) - b(2) * c(0)) +
        a(2) * (b(0) * c(1) - b(1) * c(0))
    val det = det3(Seq(n, sq, sd), Seq(sq, sqq, sqd), Seq(sd, sqd, sdd))
    val det0 = det3(Seq(sy, sq, sd), Seq(sqy, sqq, sqd), Seq(sdy, sqd, sdd))
    val det1 = det3(Seq(n, sy, sd), Seq(sq, sqy, sqd), Seq(sd, sdy, sdd))
    val det2 = det3(Seq(n, sq, sy), Seq(sq, sqq, sqy), Seq(sd, sqd, sdy))
    val r = Relational.olsNormalEquations(spark, sf).head
    assert(r.getLong(0) === rows.length.toLong)
    // BigInt / truncates toward zero = Spark div = DuckDB //
    assert(BigInt(r.getLong(1)) === det0 * 10000 / det)
    assert(BigInt(r.getLong(2)) === det1 * 10000 / det)
    assert(BigInt(r.getLong(3)) === det2 * 10000 / det)
    // (no sign sanity: the synthetic extendedprice is independent of
    // quantity, so the coefficients are exact-but-noise — the equality
    // asserts above are the test)
  }

  test("asof forward: hand fixture pins strict-after, ties, horizon, sentinel") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val ev = Seq(
      // u1: purchase then error at +10s (matched)
      (1L, ts(0), 10L, "purchase", 1.0),
      (1L, ts(10), 11L, "error", 0.0),
      // u2: error at the SAME ts as the purchase — purchases sort first,
      // so it matches at 0 seconds
      (2L, ts(0), 20L, "purchase", 1.0),
      (2L, ts(0), 21L, "error", 0.0),
      // u3: error beyond the 3600s horizon → sentinel
      (3L, ts(0), 30L, "purchase", 1.0),
      (3L, ts(4000), 31L, "error", 0.0),
      // u4: no error at all → sentinel; earlier error must NOT match
      (4L, ts(100), 40L, "error", 0.0),
      (4L, ts(200), 41L, "purchase", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = graft.operators.TemporalJoins.purchaseNextErrorOf(ev).collect()
      .map(r => r.getLong(1) -> (r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    assert(got(10L) === ((10L, 11L)))
    assert(got(20L) === ((0L, 21L)))
    assert(got(30L) === ((-1L, -1L)))
    assert(got(41L) === ((-1L, -1L)))
  }

  test("linear attribution: credit conserves to the cent against a driver replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        org.apache.spark.sql.functions.round(col("value") * 100, 0)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3), r.getLong(4)))
    val views = ev.filter(_._4 == "view")
    val purchases = ev.filter(_._4 == "purchase")
    // attributed purchases: at least one same-user view in (pts−1h, pts)
    var expectCredited = 0L
    var expectPairs = 0L
    val attributed = scala.collection.mutable.Set.empty[Long]
    purchases.foreach { p =>
      val w = views.filter(v => v._1 == p._1
        && v._2 >= p._2 - 3600000L && v._2 < p._2)
      if (w.nonEmpty) {
        expectCredited += p._5; expectPairs += w.length; attributed += p._3
      }
    }
    val rows = graft.operators.TemporalJoins.linearAttribution(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === expectCredited,
      "credit must conserve exactly")
    assert(rows.map(_.getLong(2)).sum === expectPairs)
    assert(expectCredited > 0L, "label must be live at sf0.001")
  }

  test("quality lift deciles: mass conserves and cumulative columns are monotone") {
    val rows = TextAnalytics.qualityLiftDeciles(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    // decile sizes differ by at most 1 (exact row-count cuts)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // positives conserve to the q304 census
    val auc = TextAnalytics.qualityAuc(spark, sf).head
    assert(rows.map(_.getLong(2)).sum === auc.getLong(0))
    // cum_gain is nondecreasing and ends at 1; decile score ranges are
    // ordered (max of d ≤ min of d+1 on the ascending-score order)
    val gains = rows.map(_.getDouble(6))
    assert(gains.zip(gains.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(math.abs(gains.last - 1.0) < 1e-9)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getLong(4) <= b.getLong(3))
    }
  }

  test("multiset set ops: counts replay the bag-arithmetic identities") {
    val counts = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        org.apache.spark.sql.functions.year(col("o_orderdate")).as("y"))
      .where(col("y").isin(1996, 1997))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val prios = counts.keys.map(_._1).toSeq.distinct
    val rows = graft.analytics.Relational.multisetSetOps(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    prios.foreach { p =>
      val c96 = counts.getOrElse((p, 1996), 0L)
      val c97 = counts.getOrElse((p, 1997), 0L)
      assert(rows.getOrElse(("intersect_all", p), 0L) === math.min(c96, c97), p)
      assert(rows.getOrElse(("except_all_96_minus_97", p), 0L)
        === math.max(c96 - c97, 0L), p)
      assert(rows.getOrElse(("except_all_97_minus_96", p), 0L)
        === math.max(c97 - c96, 0L), p)
    }
  }

  test("fellegi-sunter: pair census and m/u replay a driver-side blocked compare") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4)))
    val sim = graft.operators.Dedup.simhashDocs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val enriched = docs.map { case (id, lang, src, len, text) =>
      (id, lang, src, len, len / 64, shingleSet(text), sim(id))
    }
    var nPairs = 0L; var nMatch = 0L
    var maSrc = 0L; var uaSrc = 0L
    for {
      a <- enriched; b <- enriched
      if a._1 < b._1 && a._2 == b._2 && a._5 == b._5
    } {
      nPairs += 1
      val inter = (a._6 & b._6).size
      val uni = a._6.size + b._6.size - inter
      val isMatch = uni > 0 && inter * 10 >= uni * 7
      if (isMatch) nMatch += 1
      val agree = a._3 == b._3
      if (agree && isMatch) maSrc += 1
      if (agree && !isMatch) uaSrc += 1
    }
    val rows = graft.operators.EntityResolution.fellegiSunter(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val srcRow = rows("same_source")
    assert(srcRow.getLong(1) === nPairs)
    assert(srcRow.getLong(2) === nMatch)
    assert(srcRow.getLong(3) === maSrc)
    assert(srcRow.getLong(4) === uaSrc)
    assert(nMatch > 0L, "truth labels must be live at sf0.001")
    val mExpect = (maSrc + 0.5) / (nMatch + 1.0)
    assert(math.abs(srcRow.getDouble(5) - round6(mExpect)) < 1e-9)
  }

  test("blocking audit: pair counts replay; completeness consistent with FS labels") {
    val r = graft.operators.EntityResolution.blockingAudit(spark, sf).head
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("lang"),
        org.apache.spark.sql.functions.expr("n_chars div 64").as("blk")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val n = docs.length.toLong
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === n * (n - 1) / 2)
    val expectBlocked = docs.groupBy(identity).values
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    assert(r.getLong(2) === expectBlocked)
    // the truth-in-block count must equal q316's per-block match census
    val fs = graft.operators.EntityResolution.fellegiSunter(spark, sf)
      .head
    assert(r.getLong(4) === fs.getLong(2),
      "blocked true pairs must equal the FS match count")
    assert(r.getLong(3) >= r.getLong(4))
    assert(r.getDouble(5) > 0.9, "blocking must prune >90% of the pair space here")
  }

  test("fs score patterns: 2^3 patterns conserve the pair census; score tracks theory") {
    val rows = graft.operators.EntityResolution.fsScorePatterns(spark, sf)
      .collect()
    assert(rows.length === 8)
    val fs = graft.operators.EntityResolution.fellegiSunter(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val total = fs("same_source").getLong(1)
    assert(rows.map(_.getLong(3)).sum === total)
    assert(rows.map(_.getLong(4)).sum === fs("same_source").getLong(2))
    // composite score = sum of the three per-feature weights, re-rounded
    rows.foreach { r =>
      def pick(name: String, flag: Int): Double = {
        val row = fs(name)
        if (flag == 1) row.getDouble(7) else row.getDouble(8)
      }
      val expect = round6(pick("same_source", r.getInt(0))
        + pick("len_close", r.getInt(1)) + pick("simhash_near", r.getInt(2)))
      assert(math.abs(r.getDouble(5) - expect) < 1e-9,
        s"pattern ${(r.getInt(0), r.getInt(1), r.getInt(2))}")
    }
    // the all-agree pattern must carry the maximum score
    val best = rows.maxBy(_.getDouble(5))
    assert((best.getInt(0), best.getInt(1), best.getInt(2)) === ((1, 1, 1)))
  }

  test("order reconciliation: buckets partition the orders; discrepancy replays") {
    val lines = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        org.apache.spark.sql.functions.round(col("l_extendedprice")
          * (lit(1) + col("l_tax")) * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long").as("c"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sum).toMap
    val orders = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = orders.groupBy { case (k, hdr) =>
      lines.get(k) match {
        case None => "no_lineitems"
        case Some(c) if hdr == c => "exact"
        case Some(c) if math.abs(hdr - c) <= 100 => "near_1_dollar"
        case _ => "far"
      }
    }.view.mapValues { g =>
      (g.length.toLong,
        g.map { case (k, hdr) => lines.get(k).map(c => math.abs(hdr - c)).getOrElse(0L) }.sum)
    }.toMap
    val rows = Relational.orderReconciliation(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows === expect)
    assert(rows.values.map(_._1).sum === orders.length.toLong)
    // honest-audit pin: this synthetic data's headers are independent of
    // lines — every order with lines lands in 'far' (none reconcile)
    assert(!rows.contains("exact") && !rows.contains("near_1_dollar"))
  }

  test("linenumber audit: the four buckets partition orders and replay driver-side") {
    val byOrder = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var (dense, gapped, dup) = (0L, 0L, 0L)
    byOrder.values.foreach { ls =>
      val k = ls.length
      if (ls.distinct.length != k) dup += 1
      else if (ls.min == 1 && ls.max == k) dense += 1
      else gapped += 1
    }
    val r = Relational.linenumberAudit(spark, sf).head
    assert(r.getLong(0) === byOrder.size.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((dense, gapped, dup)))
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) === r.getLong(0))
  }

  test("postings audit: buckets partition the vocabulary and conserve postings/tf mass") {
    val docs = graft.core.Tables.documents(spark, sf)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val nPostings = tok.select(col("word"), col("doc_id")).distinct().count()
    val nTokens = tok.count()
    val nWords = tok.select(countDistinct(col("word"))).head.getLong(0)
    val rows = TextAnalytics.postingsAudit(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === nWords)
    assert(rows.map(_.getLong(2)).sum === nPostings)
    assert(rows.map(_.getLong(3)).sum === nTokens)
    rows.foreach { r =>
      // varint bytes: at least 1 byte and at most ⌈bits/7⌉ ≤ bits per posting
      assert(r.getLong(5) >= r.getLong(2))
      assert(r.getLong(5) <= r.getLong(4))
      assert(r.getLong(4) >= r.getLong(2)) // ≥1 bit per posting
    }
  }
}
