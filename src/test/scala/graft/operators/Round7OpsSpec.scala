package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, Sessions, TextAnalytics}
import org.apache.spark.sql.functions.{col, unix_micros}

/** Semantics of the round-7 operators: pivot/grouping-sets relational
  * coverage, bounce/exit session rates, exact-sum time-series stats
  * (autocorrelation, higher moments), Adamic-Adar wedges, bounded-hop
  * harmonic centrality, lexical richness, PMI collocations, and MMR
  * re-ranking. Crafted fixtures where the expectation is computable by
  * hand; the DuckDB oracle covers exact corpus values at sf0.01.
  */
class Round7OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def roundAt(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dow pivot: cells replay the per-type/per-isodow cent sums") {
    val events = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // epoch day 0 (1970-01-01) was a Thursday = isodow 4
    def isodow(micros: Long): Int =
      (((micros / 86400000000L) + 3) % 7 + 1).toInt
    val expect = events
      .groupBy(e => (e._1, isodow(e._2)))
      .view.mapValues(_.map(e => math.round(e._3 * 100)).sum).toMap
    val got = Relational.dowRevenuePivot(spark, sf).collect()
    assert(got.length === events.map(_._1).distinct.length)
    got.foreach { r =>
      val t = r.getString(0)
      (1 to 7).foreach { d =>
        assert(r.getLong(d) === expect.getOrElse((t, d), 0L),
          s"cell ($t, wd$d)")
      }
    }
  }

  test("grouping sets: nation rows roll up to region rows to the total") {
    val rows = Relational.revenueGroupingSets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nation = rows.filter(_._3 == 0L)
    val region = rows.filter(_._3 == 1L)
    val total = rows.filter(_._3 == 3L)
    assert(total.length === 1)
    assert(region.map(_._4).sum === total.head._4)
    region.foreach { case (rName, all, _, cents) =>
      assert(all === "ALL")
      assert(nation.filter(_._1 == rName).map(_._4).sum === cents,
        s"region $rName")
    }
    assert(nation.map(_._4).sum === total.head._4)
  }

  test("bounce/exit: totals reconcile and bounces never exceed entries") {
    val rows = Sessions.bounceExitRates(spark, sf).collect()
    val entries = rows.map(_.getLong(1)).sum
    val exits = rows.map(_.getLong(2)).sum
    // every session has exactly one entry and one exit
    assert(entries === exits)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"${r.getString(0)} bounces")
      if (r.getLong(1) > 0)
        assert(r.getDouble(4) ===
          roundAt(r.getLong(3).toDouble / r.getLong(1), 6))
      assert(r.getDouble(5) ===
        roundAt(r.getLong(1).toDouble / entries, 6))
    }
  }

  test("revenue acf: pair counts walk the zero-filled calendar; |r| <= 1") {
    val rows = Relational.revenueAutocorrelation(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 14))
    // zero-filled spine: lag k has exactly (n_days - k) pairs
    val nDays = rows.head._2 + 1
    rows.foreach { case (k, n, r) =>
      assert(n === nDays - k, s"lag $k pair count")
      assert(math.abs(r) <= 1.0 + 1e-9, s"lag $k acf $r")
    }
  }

  test("value moments: replay one event_type's moments driver-side") {
    val vals = graft.core.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("value")).collect().map(r => math.round(r.getDouble(0) * 100))
    val n = vals.length.toDouble
    val m = vals.map(BigInt(_)).sum.toDouble / n
    val e2 = vals.map(v => BigInt(v) * v).sum.toDouble / n
    val e3 = vals.map(v => BigInt(v) * v * v).sum.toDouble / n
    val e4 = vals.map(v => BigInt(v) * v * v * v).sum.toDouble / n
    val m2 = e2 - m * m
    val m3 = e3 - 3.0 * m * e2 + 2.0 * m * m * m
    val m4 = e4 - 4.0 * m * e3 + 6.0 * m * m * e2 - 3.0 * m * m * m * m
    val row = Relational.valueMoments(spark, sf)
      .where(col("event_type") === "purchase").collect().head
    assert(row.getLong(1) === vals.length.toLong)
    assert(row.getDouble(2) === roundAt(m / 100.0, 6))
    assert(row.getDouble(3) === roundAt(math.sqrt(m2) / 100.0, 6))
    assert(row.getDouble(4) === roundAt(m3 / (m2 * math.sqrt(m2)), 6))
    assert(row.getDouble(5) === roundAt(m4 / (m2 * m2) - 3.0, 6))
  }

  test("adamic-adar: open path wedge scores 1/ln2; triangle closes") {
    val s = spark
    import s.implicits._
    // path a-b-c: wedge (a,c) through b (deg 2), no direct edge;
    // triangle d-e-f: every wedge is closed
    val pairs = Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("doc1", "doc2")
    val got = Curation.adamicAdarOf(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(5))).toMap
    val w2 = math.round(1e6 / math.log(2.0))
    assert(got((1L, 3L)) === ((1L, w2, 0)))
    assert(got((10L, 11L)) === ((1L, w2, 1)))
    assert(got((10L, 12L)) === ((1L, w2, 1)))
    assert(got((11L, 12L)) === ((1L, w2, 1)))
    assert(got.size === 4)
  }

  test("adamic-adar: hub cap drops wedges through high-degree centers") {
    val s = spark
    import s.implicits._
    val star = (1L to 5L).map(i => (100L, 100L + i))
    val got = Curation.adamicAdarOf(star.toDF("doc1", "doc2"), maxDeg = 4)
      .collect()
    assert(got.isEmpty)
  }

  test("harmonic centrality: 4-node path counts exact distances") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc1", "doc2")
    val got = Curation.harmonicCentralityOf(pairs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((1L, 1L, 1L, 6L + 3L + 2L)))
    assert(got(2L) === ((2L, 1L, 0L, 12L + 3L)))
    assert(got(3L) === ((2L, 1L, 0L, 15L)))
    assert(got(4L) === ((1L, 1L, 1L, 11L)))
  }

  test("lexical richness: hand fixtures for ttr and hapax share") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "s0", "a a b"), (2L, "s0", "a a a a"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalytics.lexicalRichnessOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getInt(7))).toMap
    assert(got(1L) === ((3L, 2L, 1L, roundAt(2.0 / 3, 6),
      roundAt(1.0 / 3, 6), 0)))
    assert(got(2L) === ((4L, 1L, 0L, 0.25, 0.0, 1)))
  }

  test("pmi: counts and the ln replay by hand on a two-word corpus") {
    val s = spark
    import s.implicits._
    // "x y" repeated: within window 4 the pairs per doc of len 4 are
    // (0,1)(0,2)(0,3)(1,2)(1,3)(2,3) -> xy,xx,xy,xy,yy,xy
    val docs = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val got = TextAnalytics.pmiPairsOf(docs, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // 6 pair events; unigram stream counts both slots
    assert(got(("x", "y"))._1 === 4L)
    assert(got(("x", "x"))._1 === 1L)
    assert(got(("y", "y"))._1 === 1L)
    val (cxy, cx, cy, pmi) = got(("x", "y")) // c_x = c("x") over pair slots
    assert(cx === 6L && cy === 6L)
    assert(pmi === roundAt(math.log(6.0 * cxy / (cx.toDouble * cy)), 6))
  }

  test("window funnel: greedy chain replays driver-side") {
    val events = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = events.groupBy(_._1)
    val horizon = 604800000000L
    def chain(u: Array[(Long, Long, String)]): (Boolean, Boolean, Boolean) = {
      val t1 = u.filter(_._3 == "view").map(_._2).sorted.headOption
      val t2 = t1.flatMap(a =>
        u.filter(e => e._3 == "click" && e._2 > a).map(_._2).sorted.headOption)
      val t3 = t2.flatMap(b =>
        u.filter(e => e._3 == "purchase" && e._2 > b).map(_._2).sorted.headOption)
      (t1.isDefined,
        t2.exists(_ - t1.get <= horizon),
        t3.exists(_ - t1.get <= horizon))
    }
    val states = byUser.values.map(u => chain(u.toArray))
    val (n1, n2, n3) = (states.count(_._1).toLong,
      states.count(_._2).toLong, states.count(_._3).toLong)
    val got = graft.analytics.Funnels.windowFunnel(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> n1, 2 -> n2, 3 -> n3))
  }

  test("dominant component: infinity-norm fixes the peak; exact replay") {
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](1).map(x =>
        BigInt(math.round(x * 1e6))).toArray)
    val d = 64
    val n = BigInt(vecs.length)
    val sx = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    val m = Array.tabulate(d, d)((i, j) =>
      n * vecs.map(v => v(i) * v(j)).sum - sx(i) * sx(j))
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 0 until 8) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => m(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = w.map(x => x * 1000000 / mx)
    }
    val got = Similarity.dominantComponent(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.size === d)
    (0 until d).foreach(i => assert(got(i) === v(i).toLong, s"dim $i"))
    assert(got.values.map(math.abs).max === 1000000L)
  }

  test("removal attribution: removals only hurt; effects reconcile") {
    val rows = graft.analytics.Funnels.removalAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length === 4)
    assert(rows.map(_._2).distinct.length === 1) // one shared p_base
    val sumRe = rows.map(_._4).sum
    rows.foreach { case (c, pb, pr, re, reD, attr) =>
      assert(pr <= pb, s"channel $c removal increased conversion")
      assert(re === pb - pr)
      assert(reD === roundAt(re.toDouble / 1e12, 6))
      assert(attr === roundAt(re.toDouble / sumRe.toDouble, 6))
    }
  }

  test("bpe merges: textbook corpus learns merges in frequency order") {
    val s = spark
    import s.implicits._
    // word freqs: "lolo" x2, "lox" x1 -> round 1 best pair (l,o) cnt 2+2+1=5
    // round 2: segs ' lo lo' (2), ' lo x' (1) -> best (lo,lo) cnt 2
    // round 3: ' lolo' (2), ' lo x' (1) -> best (lo,x) cnt 1; round 4 dry
    val docs = Seq((1L, "lolo lox lolo")).toDF("doc_id", "text")
    val got = TextAnalytics.bpeMergeLoopOf(docs, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    assert(got.toSeq.sortBy(_._1) === Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "lo", "lolo", 2L),
      (3, "lo", "x", "lox", 1L)))
  }

  test("rolling trend: driver-side OLS replay over the zero-filled spine") {
    val daily = graft.core.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(col("o_orderdate")).as("day"),
        col("o_totalprice"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .view.mapValues(_.map(r => math.round(r.getDouble(1) * 100)).sum).toMap
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    def x(d: java.time.LocalDate): Long = daily.getOrElse(d, 0L)
    val got = Relational.rollingTrend(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> (r.getLong(1), r.getLong(2))).toMap
    var d = d0.plusDays(30)
    var checked = 0
    while (!d.isAfter(d1)) {
      val pts = (0 to 30).map(l => (l.toLong, x(d.minusDays(30 - l))))
      val sy = pts.map(_._2).map(BigInt(_)).sum
      val sxy = pts.map { case (l, y) => BigInt(l) * y }.sum
      val slope = (BigInt(31) * sxy - BigInt(465) * sy).toLong
      val (rev, gotSlope) = got(d)
      assert(rev === x(d), s"day $d revenue")
      assert(gotSlope === slope, s"day $d slope")
      checked += 1
      d = d.plusDays(1)
    }
    assert(checked === got.size)
  }

  test("ewma revenue: constant series reconstructs c·(2^31−1) exactly") {
    val s = spark
    import s.implicits._
    // 40 days of constant 123.45 revenue: every full-history day's
    // fixed-point ewma is exactly cents × (2^0 + … + 2^30)
    val orders = (0 until 40)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate
        .of(1995, 1, 1).plusDays(i.toLong)), 123.45))
      .toDF("o_orderdate", "o_totalprice")
    val rows = Relational.ewmaRevenueOf(orders).collect()
    assert(rows.length === 10) // days 31..40 have full history
    val fpExpect = BigInt(12345) * ((BigInt(1) << 31) - 1)
    rows.foreach { r =>
      assert(r.getLong(1) === 12345L)
      val fp = BigInt(r.getLong(2)) * BigInt(1000000000L) + BigInt(r.getLong(3))
      assert(fp === fpExpect, s"day ${r.getDate(0)}")
      assert(r.getLong(3) >= 0L && r.getLong(3) < 1000000000L)
    }
  }

  test("forecast backtest: integral-division cents columns are consistent") {
    val rows = Relational.forecastBacktest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (actual, forecast, err) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(forecast >= 0 && err >= 0)
      // err_fp = |actual·mass − fp| and forecast = fp div mass, so the
      // integral divisions agree with |actual − forecast| to ±1 truncation
      assert(((actual - forecast).abs - err).abs <= 1L,
        s"day ${r.getDate(0)}: actual=$actual forecast=$forecast err=$err")
    }
  }

  test("knn eval: majority vote agrees with the q29 neighbor ranking") {
    val neighbors = Similarity.bruteForceTopK(spark, sf, k = 10, nQueries = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = neighbors.groupBy(_._1).view.mapValues { ns =>
      val votes = ns.map(n => labels(n._2)).groupBy(identity)
        .view.mapValues(_.size).toSeq
      votes.minBy { case (l, v) => (-v, l) }
    }.toMap
    val got = Similarity.knnLabelEval(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4))).toMap
    assert(got.size === expect.size)
    expect.foreach { case (q, (lbl, v)) =>
      val (tl, pred, votes, correct) = got(q)
      assert(pred === lbl, s"query $q predicted")
      assert(votes === v.toLong, s"query $q votes")
      assert(tl === labels(q), s"query $q true label")
      assert(correct === (if (pred == labels(q)) 1 else 0))
    }
  }

  test("shard rebalance: driver-side md5 HRW replay; hrw moves far less than mod") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
    val ids = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def hrw(id: Long, n: Int): Int =
      (0 until n).maxBy(sh => (h60(s"$id:$sh"), sh))
    val modMoved = ids.count(id => id % 8 != id % 9).toLong
    val hrwMoved = ids.count(id => hrw(id, 8) != hrw(id, 9)).toLong
    val got = Curation.shardRebalance(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("mod") === ((ids.length.toLong, modMoved)))
    assert(got("hrw") === ((ids.length.toLong, hrwMoved)))
    assert(hrwMoved < modMoved, "rendezvous hashing must move fewer keys")
  }

  test("bpe encode: java replace replays the merge chain per word") {
    val merges = TextAnalytics.bpeMergeLoop(spark, sf).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    def encode(word: String): Int = {
      val (o, c) = (1.toChar, 2.toChar)
      var seg = word.toCharArray.map(ch => s"$o$ch$c").mkString
      for ((a, b) <- merges)
        seg = seg.replace(s"$o$a$c$o$b$c", s"$o$a$b$c")
      seg.count(_ == o)
    }
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalytics.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.size === docs.size)
    docs.foreach { case (id, text) =>
      val words = text.split(" ")
      val (nChars, nToks) = got(id)
      assert(nChars === words.map(_.length.toLong).sum, s"doc $id chars")
      assert(nToks === words.map(encode(_).toLong).sum, s"doc $id tokens")
    }
  }

  test("mmr: five distinct picks per query; penalty algebra holds") {
    val rows = Similarity.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getDouble(5)))
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.size === 3)
    byQuery.foreach { case (q, picks) =>
      assert(picks.map(_._2).sorted.toSeq === (1 to 5), s"query $q steps")
      assert(picks.map(_._3).distinct.length === 5, s"query $q distinct")
      picks.foreach { case (_, step, _, rel, maxSim, mmr) =>
        if (step == 1) {
          assert(maxSim.isEmpty)
          assert(mmr === roundAt(rel, 6))
        } else {
          assert(maxSim.nonEmpty)
          assert(mmr === roundAt(0.7 * rel - (1.0 - 0.7) * maxSim.get, 6))
        }
      }
    }
  }
}
