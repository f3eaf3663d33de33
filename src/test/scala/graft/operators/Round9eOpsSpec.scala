package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, TextAnalytics}
import org.apache.spark.sql.functions.{col, concat, lit}

/** Semantics of the round-9 fifth batch (q353-q356): k-fold CV naive
  * Bayes, pinned-hash permutation test, declarative PAV isotonic fit,
  * and ordered sequential-pattern mining.
  */
class Round9eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("CV naive Bayes fixture: majority class wins in every fold") {
    val s = spark
    import s.implicits._
    // identical vocab in every doc -> prediction is driven by the train
    // split's class counts, which stay majority-'a' for every held fold
    val docs = (1L to 20L).map(i => (i, if (i <= 15) "a" else "b", "x"))
      .toDF("doc_id", "lang", "text")
    // recompute the pinned fold assignment the operator uses
    val folds = docs.select(col("doc_id"), col("lang"),
        (graft.functions.Hashing.stableHash32(
          concat(lit("cv:"), col("doc_id").cast("string"))) % 5)
          .cast("int").as("fold"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val expected = folds.groupBy(_._3).map { case (f, ds) =>
      f -> ((ds.length.toLong, ds.count(_._2 == "a").toLong))
    }
    val got = TextAnalytics.naiveBayesCvOf(docs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    expected.foreach { case (f, (n, nA)) =>
      assert(got(f) === ((n, nA)), s"fold $f: all predictions must be 'a'")
    }
    assert(got(-1) === ((20L, 15L)), "overall: 15 of 20 are the majority")
  }

  test("CV naive Bayes corpus: folds partition the docs; CV is live") {
    val rows = TextAnalytics.naiveBayesCv(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Set(-1, 0, 1, 2, 3, 4))
    val foldSum = (0 to 4).map(f => rows(f)._1).sum
    assert(foldSum === 500L && rows(-1)._1 === 500L)
    assert((0 to 4).map(f => rows(f)._2).sum === rows(-1)._2)
  }

  test("permutation test fixture: constant values give p = 1") {
    val s = spark
    import s.implicits._
    val docs = (1L to 30L)
      .map(i => (i, if (i <= 10) "en" else "de", 100L))
      .toDF("doc_id", "lang", "n_chars")
    val r = TextAnalytics.permutationTestOf(spark, docs).collect().head
    assert(r.getAs[Long]("obs_diff_fp") === 0L)
    assert(r.getAs[Long]("n_perms") === 19L)
    assert(r.getAs[Long]("n_ge") === 19L)
    assert(r.getAs[Double]("p_value") === 1.0)
  }

  test("permutation test fixture: extreme separation, exact observed stat") {
    val s = spark
    import s.implicits._
    val docs = (1L to 30L)
      .map(i => (i, if (i <= 10) "en" else "de", if (i <= 10) 100L else 0L))
      .toDF("doc_id", "lang", "n_chars")
    val r = TextAnalytics.permutationTestOf(spark, docs).collect().head
    assert(r.getAs[Long]("obs_diff_fp") === 100000000L)
    val p = r.getAs[Double]("p_value")
    assert(p >= 0.05 - 1e-9 && p <= 1.0)
  }

  test("isotonic fixture: violation pools to the PAV average") {
    val s = spark
    import s.implicits._
    // rates 0, 1, 0.5 -> PAV pools bins 2-3 at 0.75
    val binned = (Seq.fill(2)((1L, 0L)) ++ Seq.fill(2)((2L, 1L))
      ++ Seq((3L, 1L), (3L, 0L))).toDF("bin", "y")
    val got = TextAnalytics.isotonicCalibrationOf(binned).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(got === Map(1L -> 0L, 2L -> 750000L, 3L -> 750000L))
  }

  test("isotonic corpus: fit is monotone non-decreasing in the bin order") {
    val rows = TextAnalytics.isotonicCalibration(spark, sf).collect()
      .sortBy(_.getLong(1))
    val fits = rows.map(_.getAs[Long]("fitted_fp"))
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b },
      s"not monotone: ${fits.mkString(",")}")
    assert(rows.length > 3, "binning must be live")
  }

  test("sequential patterns fixture: first-occurrence order, tie by event id") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "a", "2024-01-01 10:00:00", 1L),
      (1L, "b", "2024-01-01 11:00:00", 2L),
      (1L, "a", "2024-01-01 12:00:00", 3L), // later repeat: ignored
      (2L, "b", "2024-01-01 10:00:00", 4L),
      (2L, "a", "2024-01-01 11:00:00", 5L),
      (3L, "a", "2024-01-01 10:00:00", 6L),
      (4L, "a", "2024-01-01 10:00:00", 10L), // same ts: eid breaks the tie
      (4L, "b", "2024-01-01 10:00:00", 11L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
    val got = Funnels.sequentialPatternsOf(ev).collect()
      .map(r => (r.getString(1), r.getString(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    // columns: consequent, antecedent (join reorders), n_a, n_b, n_ab, ...
    assert(got(("b", "a")) === ((4L, 3L, 2L, 0.5, 0.5, 0.666667)))
    assert(got(("a", "b")) === ((3L, 4L, 1L, 0.25, 0.333333, 0.333333)))
  }
}
