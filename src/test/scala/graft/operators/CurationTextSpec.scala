package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics
import graft.functions.Text
import org.apache.spark.sql.functions.col

/** Semantics of the round-3 curation operators: repetition metrics,
  * chunk-level dedup, decontamination, domain-mix sampling, vocabulary,
  * tf-idf. Crafted inputs where the expected value is computable by hand;
  * corpus invariants (sf0.001) elsewhere — the DuckDB oracle covers exact
  * values at sf0.01.
  */
class CurationTextSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("repetition metrics match hand-computed fractions") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a a a a"), (2L, "w x y z")).toDF("doc_id", "text")
    val m = Text.repetitionMetrics(col("text"))
    val rows = df.select(col("doc_id") +: m.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    // "a a a a": 4 words 1 distinct -> 0.75; bigrams ["a a"]*3 -> 1-1/3;
    // trigrams ["a a a"]*2 -> 0.5
    assert(rows(1L).getAs[Long]("n_words") === 4L)
    assert(rows(1L).getAs[Double]("dup_word_frac") === 0.75)
    assert(rows(1L).getAs[Double]("dup_bigram_frac") === 0.666667)
    assert(rows(1L).getAs[Double]("dup_trigram_frac") === 0.5)
    // all-distinct doc: zero everywhere
    assert(rows(2L).getAs[Double]("dup_word_frac") === 0.0)
    assert(rows(2L).getAs[Double]("dup_bigram_frac") === 0.0)
    assert(rows(2L).getAs[Double]("dup_trigram_frac") === 0.0)
  }

  test("chunk dedup counts cross-doc shared chunks, not internal repeats") {
    val s = spark
    import s.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")   // one 8-word chunk
    val a = shared + " " + (1 to 8).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (1 to 8).map(i => s"b$i").mkString(" ")
    val c = (1 to 16).map(i => s"c$i").mkString(" ")
    val got = Dedup.chunkSharedOf(
        Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_shared_chunks"),
          r.getAs[Double]("shared_frac"))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((2L, 0L, 0.0)))
  }

  test("decontamination excludes the benchmark slice and bounds counts") {
    val rows = Curation.decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 97 !== 0L) // bench docs never output
      val n = r.getAs[Long]("n_ngrams")
      val hit = r.getAs[Long]("n_contaminated")
      assert(hit >= 0L && hit <= n)
      assert(r.getAs[Int]("contaminated") === (if (hit > 0) 1 else 0))
    }
  }

  test("domain mix sampling is deterministic and respects per-source rates") {
    val once = Curation.domainMixSample(spark, sf).collect()
    val again = Curation.domainMixSample(spark, sf).collect()
    assert(once.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
    assert(once.nonEmpty)
    once.foreach { r =>
      val rate = r.getAs[Double]("keep_rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
    // a capped-rate source keeps everything; sampled sources keep roughly
    // rate*n (hash-uniform; just assert the kept set is a strict subset
    // when rate < 1)
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(once.length < total)
  }

  test("vocab top-k is count-ordered with doc frequency bounded by occurrences") {
    val rows = TextAnalytics.vocabTopK(spark, sf, k = 10).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val counts = rows.map(_.getAs[Long]("n_occurrences"))
    counts.zip(counts.tail).foreach { case (x, y) => assert(x >= y) }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occurrences"))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
  }

  test("approx percentiles track the exact aggregate within sketch tolerance") {
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = toMap(graft.analytics.Relational.pricePercentiles(spark, sf))
    val approx = toMap(graft.analytics.Relational.pricePercentilesApprox(spark, sf))
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (p50, p95, q50)) =>
      val (a50, a95, aq) = approx(k)
      // rank error ≤ 1/accuracy; on this data that is well under 2% of value
      assert(math.abs(a50 - p50) / p50 < 0.02)
      assert(math.abs(a95 - p95) / p95 < 0.02)
      assert(math.abs(aq - q50) / math.max(q50, 1.0) < 0.1)
    }
  }

  test("source leakage matrix is strictly upper-triangular with positive counts") {
    val rows = Dedup.sourceLeakage(spark, sf).collect()
    assert(rows.nonEmpty) // planted near-dups cross sources in the testdata
    rows.foreach { r =>
      assert(r.getAs[String]("source1") < r.getAs[String]("source2"))
      assert(r.getAs[Long]("n_shared_chunks") >= 1L)
    }
    // no pair appears twice
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length === pairs.length)
  }

  test("domain mix targets cover every corpus source and sum to one") {
    assert(math.abs(Curation.DomainTargets.map(_._2).sum - 1.0) < 1e-12)
    val corpusSources = graft.core.Tables.documents(spark, sf)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(corpusSources.subsetOf(Curation.DomainTargets.map(_._1).toSet))
  }

  test("curation decisions are internally consistent and cover every doc") {
    val rows = Curation.curationDecisions(spark, sf).collect()
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length === total)
    rows.foreach { r =>
      val expected = r.getAs[Double]("quality_score") >= 0.5 &&
        r.getAs[Double]("dup_trigram_frac") <= 0.2 &&
        r.getAs[Int]("is_canonical") == 1 &&
        r.getAs[Int]("contaminated") == 0 &&
        r.getAs[Int]("is_benchmark") == 0
      assert(r.getAs[Int]("keep") === (if (expected) 1 else 0))
    }
    // the corpus has planted near-dups, so some docs must be dropped as
    // non-canonical, and the benchmark slice itself is always dropped
    assert(rows.exists(_.getAs[Int]("keep") == 0))
    assert(rows.exists(_.getAs[Int]("keep") == 1))
  }

  test("label centroids average every dimension over exactly the label's vectors") {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .selectExpr("label", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
    val dim = emb.head._2.length
    val got = Similarity.labelCentroids(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("mean_v"))).toMap
    val labels = emb.map(_._1).distinct
    assert(got.size === labels.length * dim)
    labels.take(3).foreach { l =>
      val vs = emb.filter(_._1 == l).map(_._2)
      (0 until dim by 17).foreach { d =>
        val (n, m) = got((l, d))
        assert(n === vs.length)
        assert(math.abs(m - vs.map(_(d)).sum / vs.length) < 1e-5)
      }
    }
  }

  test("tfidf ranks at most k terms per doc by rounded score then word") {
    val rows = TextAnalytics.tfidfTopTerms(spark, sf, k = 3).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("term_rank"))
      assert(byRank.map(_.getAs[Int]("term_rank")).toSeq === (1 to g.length))
      val scores = byRank.map(_.getAs[Double]("tfidf"))
      scores.zip(scores.tail).foreach { case (x, y) => assert(x >= y) }
    }
  }
}
