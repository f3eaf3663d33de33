package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions.col

/** Semantics of the round-5 retrieval/graph/compression operators: BM25
  * ranking, integer fixed-point PageRank, product quantization, bigram
  * surprisal, cluster-balanced sampling. Crafted inputs where the expected
  * value is computable by replaying the pinned arithmetic in plain Scala;
  * the DuckDB oracle covers exact corpus values at sf0.01.
  */
class RankGraphPqSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Spark's `round` on doubles is BigDecimal HALF_UP — replay with the
    * same mode (math.rint is HALF_EVEN and can differ on exact ties).
    */
  private def roundAt(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def fixedPoint(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("bm25 scores a hand-built corpus exactly and ranks by tf") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark fast"),
      (2L, "spark slow"),
      (3L, "other words here")).toDF("doc_id", "text")
    val got = TextAnalytics.bm25RankOf(docs, Seq("spark"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // replay the formula in plain Scala (same IEEE ops, same order)
    val (k1, b) = (TextAnalytics.Bm25K1, TextAnalytics.Bm25B)
    val avgdl = 8.0 / 3
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def ts(c: Long, dl: Long): Double = {
      val raw = idf * (c * (k1 + 1.0)) / (c + k1 * ((1.0 - b) + b * (dl / avgdl)))
      // one 6-dp round, then the (here single-term) fixed-point sum
      roundAt(fixedPoint(roundAt(raw, 6)) / 1e6, 6)
    }
    assert(got.toSeq === Seq((1L, 1L, ts(2, 3)), (2L, 1L, ts(1, 2))))
    assert(got(0)._3 > got(1)._3) // higher tf outranks at similar length
  }

  test("pagerank matches a driver-side integer replay on a path graph") {
    val s = spark
    import s.implicits._
    // path 1-2-3: ends have deg 1, middle deg 2
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val got = Curation.pagerankOf(pairs, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val scale = 1000000000000L
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    val nbrs = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    var r = Seq(1L, 2L, 3L).map(_ -> scale / 3).toMap
    for (_ <- 0 until 10) {
      r = nbrs.map { case (v, in) =>
        v -> (scale * 15 / 100 / 3 + in.map(u => r(u) / deg(u)).sum * 85 / 100)
      }
    }
    assert(got === r)
    assert(got(1L) === got(3L)) // symmetric endpoints tie exactly
    assert(got(2L) > got(1L))   // the hub outranks the leaves
  }

  test("pq encode: sampled codebook vectors quantize to themselves losslessly") {
    val cids = Similarity.ivfCentroids(spark, sf, 16)
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    val enc = Similarity.pqEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toList
    assert(enc.nonEmpty)
    enc.foreach { case (_, codes, err) =>
      val parts = codes.split(",").map(_.toLong)
      assert(parts.length === Similarity.PqSubspaces)
      assert(parts.forall(cids)) // every code names a sampled centroid
      assert(err >= 0.0)
    }
    // a codebook member is distance 0 to itself in every subspace
    enc.filter(e => cids(e._1)).foreach { case (vid, codes, err) =>
      assert(codes.split(",").forall(_.toLong == vid), s"vec $vid codes $codes")
      assert(err === 0.0)
    }
  }

  test("pq ADC top-k: 5 ranked neighbors per query, self excluded") {
    val rows = Similarity.pqTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to 5))
      assert(rs.forall(_.getLong(1) != q))
      // ranks follow (adc_dist asc, neighbor_id) exactly
      val ordered = rs.sortBy(_.getInt(3))
        .map(r => (r.getDouble(2), r.getLong(1))).toSeq
      assert(ordered === ordered.sorted)
    }
  }

  test("pq recall gate: one row per query, hits consistent with recall") {
    val rows = Similarity.pqRecallAt5(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet === (0L until 10L).toSet)
    rows.foreach { r =>
      val (n, hits, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n === 5L)
      assert(hits >= 0L && hits <= 5L)
      assert(rec === BigDecimal(hits / 5.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("bigram surprisal: repeated bigrams score below novel ones") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x x x x x"),    // one bigram repeated: high probability
      (2L, "x q w z p k")).toDF("doc_id", "text")
    val got = TextAnalytics.bigramSurprisalOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 5L)
    assert(got(2L)._1 === 5L)
    assert(got(1L)._2 < got(2L)._2)
    // replay doc 1 exactly: "x x" has c12=5 of c1("x")=6 (5 from doc1 +
    // 1 from doc2), vocab = 6 distinct words
    val p = (5 + 0.5) / (6 + 0.5 * 6)
    val sur = roundAt(-math.log(p), 6)
    val mean = roundAt(fixedPoint(sur) * 5 / (5 * 1e6), 4)
    assert(got(1L)._2 === mean)
  }

  test("cdc chunks match a driver-side reference chunker and stay edit-stable") {
    val s = spark
    import s.implicits._
    def h32(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    // deterministic 200-word doc; the reference chunker replays the rule
    val words = (0 until 200).map(i => s"t${i * 7 % 97}")
    def refChunks(w: Seq[String]): Seq[(Int, Int, Int, String)] = {
      val ids = w.scanLeft(0) { case (acc, t) =>
        acc + (if (h32(t) % 16 == 0) 1 else 0)
      } // ids(i) = boundaries before position i... computed AFTER token i-1
      val byChunk = w.zipWithIndex.groupBy { case (t, i) => ids(i) }
      byChunk.toSeq.sortBy(_._1).map { case (cid, ts) =>
        val toks = ts.sortBy(_._2)
        (cid, toks.head._2, toks.length,
          java.security.MessageDigest.getInstance("MD5")
            .digest(toks.map(_._1).mkString(" ").getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString)
      }
    }
    assert(words.exists(t => h32(t) % 16 == 0), "fixture must have boundaries")
    val docs = Seq((1L, words.mkString(" ")),
      (2L, ("inserted " + words.mkString(" ")))).toDF("doc_id", "text")
    val got = TextAnalytics.cdcChunksOf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val d1 = got.filter(_._1 == 1L).map(t => (t._2, t._3, t._4, t._5)).sortBy(_._1)
    assert(d1.toSeq === refChunks(words))
    // edit stability: prepending one word disturbs only the first chunk —
    // every later chunk hash survives verbatim (the fixed-grid q55 layout
    // would lose them all)
    val h1 = d1.map(_._4).toSet
    val h2 = got.filter(_._1 == 2L).map(_._5).toSet
    assert((h1 -- h2).size <= 1, "only the first chunk may differ")
  }

  test("minhash estimator audit covers every verified pair with consistent error") {
    val pairs = Dedup.minhashPairs(spark, sf).count()
    val rows = Dedup.minhashEstimatorAudit(spark, sf).collect()
    assert(rows.length.toLong === pairs)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, e, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(e >= 0.0 && e <= 1.0)
      assert(e * 16 === math.rint(e * 16)) // estimate is a k/16 fraction
      assert(err === roundAt(math.abs(e - j), 6))
    }
  }

  test("margin-gated fast pairs: audit-bounded margins reproduce the exact pipeline") {
    val thr = 0.7
    // the CANDIDATE audit (not the survivor-only q97 one) witnesses the
    // worst estimator error over every band candidate; margins at least
    // that wide make the skip/reject decisions provably agree with the
    // exact pipeline (1e-6 slack absorbs the 6-dp rounding of the audit)
    val eps = Dedup.minhashCandidateAudit(spark, sf).collect()
      .map(_.getAs[Double]("abs_err")).max
    val fast = Dedup.minhashPairsFast(spark, sf, thr,
        marginLow = thr - eps - 1e-6, marginHigh = thr + eps + 1e-6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val slow = Dedup.minhashPairs(spark, sf, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === slow)
  }

  test("fast pairs with an infinite margin verify everything and change nothing") {
    val fast = Dedup.minhashPairsFast(spark, sf, 0.7,
      marginLow = 0.0, marginHigh = 1.1).collect()
    assert(fast.forall(_.getInt(3) == 1), "nothing may skip the verify")
    val slow = Dedup.minhashPairs(spark, sf, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.map(r => (r.getLong(0), r.getLong(1))).toSet === slow)
  }

  test("default margins: verified flag tracks the estimate band; audit covers q97") {
    val fast = Dedup.minhashPairsFast(spark, sf).collect()
    assert(fast.nonEmpty)
    fast.foreach { r =>
      val (est, verified) = (r.getDouble(2), r.getInt(3))
      if (verified == 0) assert(est >= 0.875)
      else assert(est >= 0.5 && est < 0.875)
    }
    val all = Dedup.minhashCandidateAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val survivors = Dedup.minhashEstimatorAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(survivors.subsetOf(all), "candidate audit must cover every survivor")
  }

  test("curriculum packing: per-shard offsets chain in score order") {
    val rows = Curation.curriculumPacking(spark, sf, capacity = 512, nShards = 4)
      .collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, shard) =>
      // sort by the declared order (score desc, doc_id): offsets must chain
      val ordered = shard.sortBy { case (_, score, id, _, _) => (-score, id) }
      var expected = 0L
      ordered.foreach { case (_, _, _, n, off) =>
        assert(off === expected)
        expected += n
      }
    }
  }

  test("cluster-balanced sample caps every cell and keeps ranks contiguous") {
    val cap = 3
    val rows = Similarity.clusterBalancedSample(spark, sf, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.length <= cap)
      assert(members.map(_._3).sorted.toSeq === (1 to members.length))
    }
    // sampled rows are a subset of the trained assignment
    val cells = Similarity.ivfAssignTrained(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (vid, cell, _) => assert(cells(vid) === cell) }
  }
}
