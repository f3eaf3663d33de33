package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics

/** Degenerate-input behavior of the round-6 operators: total removal,
  * identical documents, empty margin bands, single-word corpora — the
  * edges a 100 TB corpus WILL contain somewhere.
  */
class Round6EdgeSpec extends SparkTestBase {

  test("boilerplate scrub: a fully-shared document empties cleanly") {
    val s = spark
    import s.implicits._
    // both docs are one identical 8-word chunk → every chunk is flagged
    val t = "one two three four five six seven eight"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = Curation.boilerplateScrubOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(4))).toMap
    assert(got(1L) === ((1L, "")))
    assert(got(2L) === ((1L, "")))
  }

  test("excision: a fully-contaminated document rebuilds to the empty string") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "x y z")).toDF("doc_id", "text")
    val bench = Seq((9L, "x y z")).toDF("doc_id", "text")
    val r = Curation.exciseContaminationAgainst(train, bench, n = 3).collect().head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) === ((3L, 3L, "")))
  }

  test("bigram top-M: single repeated bigram survives any pruning unchanged") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val full = TextAnalytics.bigramSurprisalOf(docs, Some(true)).collect().head
    val pruned = TextAnalytics.bigramSurprisalTopM(docs, topM = 1).collect().head
    assert(full.getDouble(2) === pruned.getDouble(2))
  }

  test("fast pairs: touching margins leave an empty verify band, accepts only") {
    // marginLow == marginHigh == threshold: every candidate either
    // accepts unverified (est >= thr) or is rejected — nothing verifies
    val rows = Dedup.minhashPairsFast(spark, "/root/testdata/sf0.001",
      threshold = 0.7, marginLow = 0.7, marginHigh = 0.7).collect()
    assert(rows.forall(_.getInt(3) == 0), "no pair may carry verified=1")
    assert(rows.forall(_.getDouble(2) >= 0.7))
  }

  test("normalized dedup: whitespace-only difference collapses; empty normal forms group") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "!!! ???"), // normalizes to empty
      (2L, "..."),     // also empty
      (3L, "real words")).toDF("doc_id", "text")
    val got = Dedup.normalizedDedupOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(4))).toMap
    assert(got(1L) === ((2L, 0)))
    assert(got(2L) === ((2L, 1)))
    assert(got(3L) === ((1L, 0)))
  }

  test("repeated grams: a doc of one repeated token is pure repetition") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "w w w w w")).toDF("doc_id", "text")
    val r = TextAnalytics.repeatedGramsOf(docs, n = 2).collect().head
    // 4 bigram positions, 3 repeat the first
    assert((r.getLong(1), r.getLong(2), r.getInt(4)) === ((4L, 3L, 1)))
  }

  test("incremental near-dup: empty history and empty batch both yield no hits") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementalNearDupAgainst(docs, empty).count() === 0L)
    assert(Dedup.incrementalNearDupAgainst(empty, docs).count() === 0L)
  }

  test("source KL drift: a single-source corpus diverges by exactly zero") {
    val s = spark
    import s.implicits._
    val docs = Seq(("only", "a b c a b")).toDF("source", "text")
    val r = TextAnalytics.sourceKlDriftOf(docs).collect().head
    assert(r.getDouble(3) === 0.0) // p_s == p_c for every word
  }
}
