package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Exactness and plan-shape invariants for the prefix-filtered Jaccard
  * join ([[Dedup.jaccardPairsPrefix]]) — the scale path that replaces the
  * capped quadratic verifier.
  */
class PrefixJoinSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Scala-side ground truth: 3-gram shingle Jaccard over (id, text). */
  private def bruteForce(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] = {
    def sh(s: String): Set[Seq[String]] = {
      val w = s.split(" ").toSeq
      if (w.length < 3) Set.empty else w.sliding(3).map(_.toSeq).toSet
    }
    val sets = docs.map { case (id, text) => id -> sh(text) }
    (for {
      (d1, s1) <- sets; (d2, s2) <- sets
      if d1 < d2 && s1.nonEmpty && s2.nonEmpty
      inter = (s1 & s2).size.toDouble
      j = inter / (s1.size + s2.size - inter)
      // mirror the operator: round to 6 dp, then threshold
      if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= t
    } yield (d1, d2)).toSet
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prefix join equals the capped exact join on the corpus fixture") {
    // at sf0.001 no shingle approaches the df cap, so jaccardPairs IS the
    // uncapped truth here — both must agree pair-for-pair and score-for-score
    for (t <- Seq(0.7, 0.8)) {
      val exact = Dedup.jaccardPairs(spark, sf, threshold = t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val prefix = Dedup.jaccardPairsPrefix(spark, sf, threshold = t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(prefix.keySet === exact.keySet, s"pair sets diverge at t=$t")
      prefix.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-9) }
    }
  }

  test("prefix join stays exact where the hot-shingle cap corrupts the score") {
    val s = spark
    import s.implicits._
    // every doc ends with the same boilerplate trailer, so the trailer's
    // shingles are in ALL docs (df = 32 > cap 10); docs 1 and 2 also share
    // a long unique head, so their true Jaccard is high
    val trailer = "this content is provided as is without any warranty of fitness"
    val head = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    val docs = Seq(
      1L -> s"$head kilo $trailer",
      2L -> s"$head lima $trailer") ++
      (3L to 32L).map(i => i -> s"unique$i text$i body$i word$i only$i here$i $trailer")
    val df = docs.toDF("doc_id", "text")
    val truth = bruteForce(docs, 0.5)
    assert(truth.contains((1L, 2L)), "fixture must contain a true near-dup")
    // a df-capped verifier would have to either drop the trailer shingles
    // (mis-scoring every pair) or enumerate df² pairs; the prefix join
    // needs neither — the hot shingles simply never enter a prefix
    val prefix = pairsOf(Dedup.jaccardPairsPrefixOf(df, threshold = 0.5))
    assert(prefix === truth,
      s"missing: ${truth -- prefix}, extra: ${prefix -- truth}")
  }

  test("prefix join finds high-threshold pairs among many decoys") {
    val s = spark
    import s.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      100L -> base,                                   // identical pair
      101L -> base,
      102L -> ((1 to 39).map(i => s"w$i").mkString(" ") + " zz"), // ~0.9 pair
      200L -> (41 to 80).map(i => s"v$i").mkString(" ")) ++      // decoy
      (300L to 340L).map(i => i -> (1 to 40).map(j => s"x${i}_$j").mkString(" "))
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.6, 0.8, 0.95)) {
      val got = pairsOf(Dedup.jaccardPairsPrefixOf(df, threshold = t))
      assert(got === bruteForce(docs, t), s"diverged at t=$t")
    }
  }

  test("prefix join candidate plan is equality-join shaped (no nested loop)") {
    val plan = Dedup.jaccardPairsPrefix(spark, sf).queryExecution
      .executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "quadratic stage in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested loop in plan")
  }

  test("prefix join rejects a nonsensical threshold") {
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairsPrefix(spark, sf, threshold = 0.0)
    }
  }
}
