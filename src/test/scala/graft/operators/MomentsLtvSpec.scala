package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Semantics of q176–q178: per-dimension embedding moments (BigInt replay
  * of the exact fixed-point arithmetic), the cohort-LTV triangle (crafted
  * two-cohort fixture), and Simpson lexical diversity (hand-computed
  * distributions).
  */
class MomentsLtvSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def t(day: Int, sec: Int = 0) =
    new java.sql.Timestamp(1700000000000L + day * 86400000L + sec * 1000L)

  test("dim variance: exact moments replay via BigInt at sf0.001") {
    val s = spark
    val vecs = graft.core.Tables.embeddings(s, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val dims = vecs.head.length
    val got = Similarity.dimVariance(s, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.size === dims)
    for (j <- 0 until dims) {
      val r = vecs.map(v => BigDecimal(v(j) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt)
      val s1 = r.sum
      val s2 = r.map(x => x * x).sum
      val mean = BigDecimal(s1.toDouble / n / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val vari = BigDecimal((BigInt(n) * s2 - s1 * s1).toDouble
        / n.toDouble / n.toDouble / 1e18)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(j) === ((n.toLong, mean, vari)), s"dim $j")
    }
  }

  test("cohort LTV: cumulative revenue per cohort user by week offset") {
    val s = spark
    import s.implicits._
    // base lands on Tue 2023-11-14 (week of Mon Nov 13); day 7 is the
    // next week
    val ev = Seq(
      (1L, t(0), "purchase", 10.0), (1L, t(7), "purchase", 30.0),
      (2L, t(0), "view", 0.0),                      // cohort A, never buys
      (3L, t(7), "purchase", 50.0))                 // cohort B
      .toDF("user_id", "ts", "event_type", "value")
    val got = graft.analytics.Funnels.cohortLtvOf(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(got === Map(
      ("2023-11-13", 0L) -> ((1L, 10.0, 10.0, 2L, 5.0)),
      ("2023-11-13", 1L) -> ((1L, 30.0, 40.0, 2L, 20.0)),
      ("2023-11-20", 0L) -> ((1L, 50.0, 50.0, 1L, 50.0))))
  }

  test("simpson diversity: hand-computed distributions") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x y", "a"),       // n: x=2, y=1 → N=3, types=2, s2=5
      (2L, "z z", "b"),
      (3L, "z z", "b"))         // z=4 → N=4, types=1, s2=16
      .toDF("doc_id", "text", "source")
    val got = graft.analytics.TextAnalytics.simpsonDiversityOf(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("a") === ((3L, 2L, 0.444444)))
    assert(got("b") === ((4L, 1L, 0.0)))
  }
}
