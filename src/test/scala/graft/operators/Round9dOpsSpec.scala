package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 fourth batch (q349-q352): rank-coreset
  * quantile sketches, the trained naive Bayes classifier, split-conformal
  * intervals, and the exact-Gini decision stump. Hand fixtures replay
  * each estimator/recursion exactly.
  */
class Round9dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("coreset quantile fixture: every-4th order statistic, exact ranks") {
    val s = spark
    import s.implicits._
    // 100 rows, cents = 1..100, one shard, step 4: kept = ranks 4,8..100
    val li = (1 to 100).map(i => (i / 100.0, i.toLong, 1))
      .toDF("l_extendedprice", "l_orderkey", "l_linenumber")
    val got = Relational.coresetQuantilesOf(spark, li, shards = 1, step = 4)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // q=0.5: target 50 -> 13th kept (cum 52) = cents 52, rank err 0.02
    assert(got(0.5) === ((52L, 52L, 0.02)))
    // q=0.9: target 90 -> 23rd kept (cum 92) = cents 92, rank err 0.02
    assert(got(0.9) === ((92L, 92L, 0.02)))
    // q=0.99: target 99 -> 25th kept (cum 100) = cents 100, rank err 0.01
    assert(got(0.99) === ((100L, 100L, 0.01)))
  }

  test("coreset quantile corpus: rank error within the sharded bound") {
    val rows = Relational.coresetQuantiles(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val err = r.getAs[Double]("rank_err")
      val bound = r.getAs[Double]("err_bound")
      assert(err <= bound + 1e-9,
        s"q=${r.getAs[Double]("q")}: measured $err > bound $bound")
    }
  }

  test("naive Bayes fixture: learned vocab separates; ties break to first class") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "en", "x x y"), (2L, "en", "x y"),
      (3L, "de", "z z z"), (4L, "de", "z y")).toDF("doc_id", "lang", "text")
    val got = TextAnalytics.naiveBayesLangOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got === Map(1L -> "en", 2L -> "en", 3L -> "de", 4L -> "de"))
    // perfectly symmetric classes: identical scores -> min class name
    val tie = Seq((1L, "b", "w"), (2L, "a", "w")).toDF("doc_id", "lang", "text")
    val tgot = TextAnalytics.naiveBayesLangOf(tie).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(tgot === Map(1L -> "a", 2L -> "a"))
  }

  test("naive Bayes corpus: model output is live and complete") {
    val rows = TextAnalytics.naiveBayesLang(spark, sf).collect()
    assert(rows.length === 500)
    val preds = rows.map(_.getString(2)).distinct
    assert(preds.length > 1, "predictions must not collapse to one class")
  }

  test("conformal fixture: qhat from calibration, spike uncovered in eval") {
    val s = spark
    import s.implicits._
    // 16 days of 1.00/day except day 13 at 2.00: scored days 7..15,
    // n_cal=4 (days 7-10, all residuals 0) -> qhat=0; eval days 11-15
    // have residuals {0,0,100,0,0} -> coverage 4/5
    val orders = (0 to 15).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        if (i == 13) 2.00 else 1.00)
    }.toDF("o_orderdate", "o_totalprice")
    val r = Relational.conformalForecastOf(spark, orders).collect().head
    assert(r.getLong(r.fieldIndex("n_total")) === 9L)
    assert(r.getLong(r.fieldIndex("n_cal")) === 4L)
    assert(r.getLong(r.fieldIndex("n_eval")) === 5L)
    assert(r.getLong(r.fieldIndex("k_rank")) === 4L)
    assert(r.getLong(r.fieldIndex("qhat_cents")) === 0L)
    assert(r.getLong(r.fieldIndex("n_covered")) === 4L)
    assert(r.getDouble(r.fieldIndex("coverage")) === 0.8)
  }

  test("decision stump fixture: perfect split found, exact max score") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "en", "p q", 10L), (2L, "en", "p q r", 12L),
      (3L, "de", "p", 50L), (4L, "fr", "p q r s", 60L))
      .toDF("doc_id", "lang", "text", "n_chars")
    val top = TextAnalytics.decisionStumpOf(docs).collect().head
    assert(top.getAs[String]("feature") === "n_chars")
    assert(top.getAs[Long]("threshold") === 12L)
    // perfect split: score = n * 1e6 = 4e6; both sides pure
    assert(top.getAs[Long]("score_fp") === 4000000L)
    assert(top.getAs[Int]("pred_left") === 1)
    assert(top.getAs[Int]("pred_right") === 0)
    assert(top.getAs[Double]("train_acc") === 1.0)
  }

  test("decision stump corpus: five ranked candidates, accuracy beats majority") {
    val rows = TextAnalytics.decisionStump(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Int]("split_rank")).toSeq === Seq(1, 2, 3, 4, 5))
    val scores = rows.map(_.getAs[Long]("score_fp"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // majority baseline at sf0.001 is 307/500 non-en
    assert(rows.head.getAs[Double]("train_acc") >= 307.0 / 500.0)
  }
}
