package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.analytics.TextAnalytics

/** Property tests for the round-7 deterministic kernels against naive
  * Scala reference implementations: Adamic-Adar wedge scores vs a
  * set-based recount, bounded-hop harmonic centrality vs BFS, and the
  * BPE merge loop vs a symbol-list trainer (the leading-space replace
  * encoding must agree with explicit list merging, including the
  * overlapping-run cases). Seeded generators, deterministic samples.
  */
class Round7PropSpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  private val graphGen: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(3, 12)
    density <- Gen.choose(1, 4)
    edges <- Gen.listOfN(n * density, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.filter(e => e._1 != e._2).toSet

  test("adamic-adar agrees with a set-based recount on random graphs") {
    val s = spark
    import s.implicits._
    (1 to 8).foreach { seed =>
      val pairs = sample(graphGen, seed.toLong)
      if (pairs.nonEmpty) {
        val adj = (pairs.toSeq ++ pairs.toSeq.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val expect = (for {
          v <- adj.keys.toSeq
          deg = adj(v).size
          if deg >= 2 && deg <= 64
          u <- adj(v); w <- adj(v) if u < w
        } yield ((u, w), math.round(1e6 / math.log(deg.toDouble))))
          .groupBy(_._1).view
          .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
        val got = Curation.adamicAdarOf(pairs.toSeq.toDF("doc1", "doc2"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), r.getInt(5))).toMap
        assert(got.keySet === expect.keySet, s"seed $seed pair set")
        expect.foreach { case (k, (n, fp)) =>
          val (gn, gfp, isEdge) = got(k)
          assert(gn === n, s"seed $seed $k n_common")
          assert(gfp === fp, s"seed $seed $k aa_fp")
          assert(isEdge === (if (pairs.contains(k)) 1 else 0), s"seed $seed $k edge")
        }
      }
    }
  }

  test("harmonic centrality agrees with BFS exact-distance counts") {
    val s = spark
    import s.implicits._
    (1 to 8).foreach { seed =>
      val pairs = sample(graphGen, seed.toLong + 100)
      if (pairs.nonEmpty) {
        val adj = (pairs.toSeq ++ pairs.toSeq.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        def byDist(o: Long): (Long, Long, Long) = {
          var frontier = Set(o); var seen = Set(o)
          val counts = (1 to 3).map { _ =>
            frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
            seen ++= frontier
            frontier.size.toLong
          }
          (counts(0), counts(1), counts(2))
        }
        val got = Curation.harmonicCentralityOf(pairs.toSeq.toDF("doc1", "doc2"))
          .collect()
          .map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        assert(got.keySet === adj.keySet, s"seed $seed vertex set")
        adj.keys.foreach { o =>
          val (n1, n2, n3) = byDist(o)
          val (g1, g2, g3, fp) = got(o)
          assert((g1, g2, g3) === ((n1, n2, n3)), s"seed $seed vertex $o")
          assert(fp === 6 * n1 + 3 * n2 + 2 * n3, s"seed $seed vertex $o fp")
        }
      }
    }
  }

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(2, 30)
    words <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
  } yield words

  /** Naive BPE trainer on symbol lists — explicit left-to-right
    * non-overlapping merges, the semantics the string replace encodes.
    */
  private def naiveBpe(words: List[String], rounds: Int): Seq[(String, String, Long)] = {
    var segs: List[(List[String], Long)] = words.groupBy(identity).toList
      .map { case (w, ws) => (w.toCharArray.map(_.toString).toList, ws.size.toLong) }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      segs.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += f)
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, cnt))
        segs = segs.map { case (syms, f) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toList, f)
        }
      }
    }
    out.toSeq
  }

  test("mmr re-ranking agrees with a naive greedy replay") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (0L until 3L).flatMap { q =>
      val cands = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, rel) => (-rel, c) }.take(20)
      var sel = List.empty[(Long, Double, Option[Double], Double, Int)]
      for (step <- 1 to 5) {
        val chosen = sel.map(_._1).toSet
        val pick = cands.filter(c => !chosen.contains(c._1)).map { case (c, rel) =>
          if (step == 1) (c, rel, None: Option[Double], rel)
          else {
            val ms = sel.map(s => cos(vecs(c), vecs(s._1))).max
            (c, rel, Some(ms), 0.7 * rel - (1.0 - 0.7) * ms)
          }
        }.minBy { case (c, _, _, mmr) => (-mmr, c) }
        sel = sel :+ ((pick._1, pick._2, pick._3, pick._4, step))
      }
      sel.map { case (c, rel, ms, mmr, step) => (q, step) ->
        (c, rel, ms, BigDecimal(mmr).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
    }.toMap
    val got = Similarity.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getDouble(5))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (k, v) => assert(got(k) === v, s"pick $k") }
  }

  test("bpe merge loop agrees with the symbol-list trainer") {
    val s = spark
    import s.implicits._
    (1 to 8).foreach { seed =>
      val words = sample(corpusGen, seed.toLong + 200)
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val expect = naiveBpe(words, 4)
      val got = TextAnalytics.bpeMergeLoopOf(docs, rounds = 4).collect()
        .sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      assert(got.toSeq === expect, s"seed $seed corpus $words")
    }
  }
}
