package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions._

/** Round-5 additions: boilerplate scrub (q84), frequent-n-gram detector
  * (q85), SemDeDup resolution (q86), per-source score calibration (q87),
  * per-source quality cap (q88). Hand-crafted inputs where the expected
  * value is computable by hand; corpus invariants at sf0.001 — the DuckDB
  * oracle covers exact values at sf0.01.
  */
class BoilerplateCalibrationSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("boilerplate scrub removes shared chunks and rebuilds text in order") {
    val s = spark
    import s.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ") // one 8-word chunk
    val a = shared + " " + (1 to 8).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (1 to 4).map(i => s"b$i").mkString(" ")
    val c = (1 to 16).map(i => s"c$i").mkString(" ")
    val got = Curation.boilerplateScrubOf(
        Seq((1L, a), (2L, b), (3L, c), (4L, shared)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    assert(got(1L) === ((2L, 1L, (1 to 8).map(i => s"a$i").mkString(" "))))
    assert(got(2L) === ((2L, 1L, (1 to 4).map(i => s"b$i").mkString(" "))))
    assert(got(3L) === ((2L, 0L, c))) // untouched doc survives verbatim
    assert(got(4L) === ((1L, 1L, ""))) // fully-boilerplate doc → empty
  }

  test("boilerplate scrub keeps chunk order across removed gaps") {
    val s = spark
    import s.implicits._
    val boiler = (1 to 8).map(i => s"x$i").mkString(" ")
    val u1 = (1 to 8).map(i => s"u$i").mkString(" ")
    val u2 = (1 to 8).map(i => s"v$i").mkString(" ")
    // boiler sits BETWEEN two unique chunks; removal must not reorder them
    val doc = s"$u1 $boiler $u2"
    val got = Curation.boilerplateScrubOf(
        Seq((1L, doc), (2L, boiler)).toDF("doc_id", "text"))
      .where(col("doc_id") === 1L).collect().head
    assert(got.getAs[String]("clean_text") === s"$u1 $u2")
    assert(got.getAs[Double]("removed_frac") === 0.333333)
  }

  test("frequent n-grams: cross-document grams only, ordered, capped") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x y x y"), // "x y" twice, "y x" once — within-doc repeat alone
      (2L, "x y z"),   // "x y" again (2nd doc), "y z"
      (3L, "p q")      // unique bigram
    ).toDF("doc_id", "text")
    val rows = TextAnalytics.frequentNgramsOf(docs, n = 2, k = 10).collect()
    // only "x y" spans ≥2 docs: 2 docs, 3 occurrences
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("gram") === "x y")
    assert(rows.head.getAs[Long]("n_docs") === 2L)
    assert(rows.head.getAs[Long]("n_occurrences") === 3L)
  }

  test("semantic resolution: one keep per component, canonical min labels") {
    // already persisted via SessionMemo — no extra cache/unpersist here
    val res = Similarity.semanticResolution(spark, sf)
    val nVecs = graft.core.Tables.embeddings(spark, sf).count()
    assert(res.count() === nVecs) // every vector gets a verdict
    // exactly one kept representative per component
    val perComp = res.groupBy(col("component"))
      .agg(sum(col("keep")).as("n_keep"), count(lit(1)).as("n"),
        min(col("vec_id")).as("min_vec"), max(col("n_members")).as("nm"))
      .collect()
    perComp.foreach { r =>
      assert(r.getAs[Long]("n_keep") === 1L, s"component ${r.get(0)}")
      // component label is the min member id (q50 fixpoint contract)
      assert(r.getAs[Long]("component") === r.getAs[Long]("min_vec"))
      assert(r.getAs[Long]("nm") === r.getAs[Long]("n"))
    }
    // singletons keep themselves with centroid cosine ≈ 1
    val singles = res.where(col("n_members") === 1).collect()
    assert(singles.nonEmpty)
    singles.foreach { r =>
      assert(r.getAs[Int]("keep") === 1)
      assert(r.getAs[Double]("centroid_cosine") >= 0.999)
    }
    // the kept member is the (cosine, vec_id)-minimum of its component
    val multi = res.where(col("n_members") > 1)
      .select(col("component"), col("vec_id"),
        col("centroid_cosine"), col("keep"))
      .collect().groupBy(_.getAs[Long]("component"))
    assert(multi.nonEmpty)
    multi.foreach { case (_, members) =>
      val kept = members.filter(_.getAs[Int]("keep") === 1)
      val best = members.minBy(r =>
        (r.getAs[Double]("centroid_cosine"), r.getAs[Long]("vec_id")))
      assert(kept.map(_.getAs[Long]("vec_id")).toSeq ===
        Seq(best.getAs[Long]("vec_id")))
    }
  }

  test("score calibration: exact per-source CDF over 2-dp bins") {
    val cal = TextAnalytics.scoreCalibration(spark, sf).cache()
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(cal.count() === nDocs) // join back loses nothing
    val rows = cal.collect()
    rows.foreach { r =>
      val p = r.getAs[Double]("pct_below")
      assert(p >= 0.0 && p < 1.0)
    }
    // spot-verify the CDF definition against a direct count for one source
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val (src, docs) = bySrc.maxBy(_._2.length)
    val d0 = docs.minBy(r => (r.getAs[Double]("bin"), r.getAs[Long]("doc_id")))
    assert(d0.getAs[Double]("pct_below") === 0.0) // lowest bin: nothing below
    docs.foreach { r =>
      val below = docs.count(_.getAs[Double]("bin") < r.getAs[Double]("bin"))
      val expect = BigDecimal(below.toDouble / docs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("pct_below") === expect,
        s"$src bin ${r.getAs[Double]("bin")}")
    }
    cal.unpersist()
  }

  test("split leakage: holdout rows only, counts bounded, splits agree") {
    val leak = Curation.splitLeakage(spark, sf)
    val splits = Curation.trainValTestSplit(spark, sf)
      .select(col("doc_id"), col("split").as("expected_split"))
    val rows = leak.join(splits, "doc_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[String]("split")
      assert(s === "val" || s === "test") // train docs never audited
      assert(s === r.getAs[String]("expected_split")) // same pinned draw
      val n = r.getAs[Long]("n_ngrams")
      val hit = r.getAs[Long]("n_leaked")
      assert(hit >= 0L && hit <= n)
      assert(r.getAs[Int]("leaked") === (if (hit > 0) 1 else 0))
    }
    // every holdout doc long enough to have an 8-gram is audited
    val expected = graft.core.Tables.documents(spark, sf)
      .join(splits, "doc_id")
      .where(col("expected_split") =!= "train"
        && size(split(col("text"), " ")) >= 8)
      .count()
    assert(rows.length.toLong === expected)
  }

  test("per-source quality cap: contiguous ranks, non-increasing scores") {
    val top = TextAnalytics.topQualityPerSource(spark, sf, cap = 25).collect()
    val bySrc = top.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rows) =>
      assert(rows.length <= 25, src)
      val byRank = rows.sortBy(_.getAs[Int]("quality_rank"))
      assert(byRank.map(_.getAs[Int]("quality_rank")).toSeq ===
        (1 to rows.length), src)
      val scores = byRank.map(_.getAs[Double]("model_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, src)
    }
  }
}
