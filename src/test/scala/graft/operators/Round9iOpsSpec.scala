package graft.operators

import graft.SparkTestBase
import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 ninth batch (q369-q372): integer power
  * iteration, quadratic-kernel MMD, WoE/IV, AMS F2 sketches.
  */
class Round9iOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("power iteration corpus: normalized, live, and converged in direction") {
    val v8 = Similarity.principalDirection(spark, sf, rounds = 8).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(v8.size === 64)
    assert(v8.values.map(math.abs).max === 1000000L,
      "max-normalization pins the largest component to the grid")
    assert(v8.values.toSeq.distinct.length > 10, "direction must be live")
    val v9 = Similarity.principalDirection(spark, sf, rounds = 9).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val dot = (1 to 64).map(i => v8(i).toDouble * v9(i).toDouble).sum
    val n8 = math.sqrt((1 to 64).map(i => v8(i).toDouble * v8(i)).sum)
    val n9 = math.sqrt((1 to 64).map(i => v9(i).toDouble * v9(i)).sum)
    // near-uniform random embeddings have a small eigengap, so the
    // direction still drifts slightly per round — but it must not flip
    assert(dot / (n8 * n9) > 0.98,
      "one more round must barely move a near-converged direction")
  }

  test("MMD fixture: identical groups are zero, orthogonal groups separate") {
    val s = spark
    import s.implicits._
    val same = Seq(
      (1L, "x", Seq(1000L, 0L)), (2L, "x", Seq(0L, 1000L)),
      (3L, "y", Seq(1000L, 0L)), (4L, "y", Seq(0L, 1000L)))
      .toDF("vec_id", "g", "vq")
    val r0 = Similarity.mmdQuadraticOf(spark, same).collect().head
    assert(r0.getAs[Double]("mmd2_t") === 0.0, "identical populations")
    val orth = Seq(
      (1L, "x", Seq(1000L, 0L)), (2L, "x", Seq(1000L, 0L)),
      (3L, "y", Seq(0L, 1000L)), (4L, "y", Seq(0L, 1000L)))
      .toDF("vec_id", "g", "vq")
    val r1 = Similarity.mmdQuadraticOf(spark, orth).collect().head
    assert(r1.getAs[Double]("e_kxx_t") === 1.0)
    assert(r1.getAs[Double]("e_kyy_t") === 1.0)
    assert(r1.getAs[Double]("e_kxy_t") === 0.0)
    assert(r1.getAs[Double]("mmd2_t") === 2.0)
  }

  test("MMD corpus: the V-statistic is a squared RKHS norm, never negative") {
    val r = Similarity.mmdQuadratic(spark, sf).collect().head
    assert(r.getAs[Double]("mmd2_t") >= 0.0)
    assert(r.getAs[Double]("e_kxx_t") > 0.0)
    assert(r.getAs[Long]("n_x") + r.getAs[Long]("n_y") === 500L)
  }

  test("WoE fixture: mirrored bins get negated WoE, equal IV, exact total") {
    val s = spark
    import s.implicits._
    val binned = (Seq.fill(3)((1L, 1L)) ++ Seq((1L, 0L))
      ++ Seq((2L, 1L)) ++ Seq.fill(3)((2L, 0L))).toDF("bin", "y")
    val got = TextAnalytics.woeInformationValueOf(binned).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // ps(1)=3.5/4.5, ns(1)=1.5/4.5 -> ln(7/3)=0.847298
    assert(got(1L)._3 === 847298L)
    assert(got(2L)._3 === -847298L, "reciprocal ratio negates the log")
    assert(got(1L)._4 === 444444L && got(2L)._4 === -444444L)
    assert(got(1L)._5 === got(2L)._5, "IV contribution is sign-invariant")
    assert(got(-1L) === ((4L, 4L, 0L, 0L, 2L * got(1L)._5)),
      "total row sums the exact integer contributions")
  }

  test("AMS fixture: a single item is estimated exactly by every sketch") {
    val s = spark
    import s.implicits._
    val freq = Seq(("w", 5L)).toDF("w", "f")
    val rows = TextAnalytics.amsF2Of(freq, sketches = 8).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("z")) === 5L)
      assert(r.getAs[Long]("est") === 25L)
      assert(r.getAs[Long]("f2_exact") === 25L)
      assert(r.getAs[Long]("median_est") === 25L)
      assert(r.getAs[Double]("median_rel_err") === 0.0)
    }
  }

  test("LongDotProduct matches the built-in composition, incl. edge shapes") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-1000L, 1000L), Seq(1000L, 1000L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(7L), Seq(2L, 9L))) // mismatched: common prefix only
      .toDF("a", "b")
    val got = df.select(graft.functions.Vectors.dotLong(col("a"), col("b"))
      .as("d")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(32L, 0L, 0L, 14L))
    // against the interpreted fold on a random-ish frame
    val rnd = (1 to 50).map(i =>
      (Seq.tabulate(8)(j => (i * 31 + j * 7 % 13).toLong),
        Seq.tabulate(8)(j => (i * 17 - j * 3).toLong))).toDF("a", "b")
    val fast = rnd.select(graft.functions.Vectors.dotLong(col("a"), col("b"))
      .as("d")).collect().map(_.getLong(0)).toSeq
    val slow = rnd.select(org.apache.spark.sql.functions.aggregate(
      org.apache.spark.sql.functions.zip_with(col("a"), col("b"),
        (p, q) => p * q), org.apache.spark.sql.functions.lit(0L),
      (acc, e) => acc + e).as("d")).collect().map(_.getLong(0)).toSeq
    assert(fast === slow)
  }

  test("kernel plans: the codegen'd integer dot is in the hot path") {
    val q370 = Similarity.mmdQuadratic(spark, sf)
    // eager queries: inspect via a fresh plan over the same operators
    val plan357 = Similarity.silhouette(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan357.contains("graft_dot_long"),
      "silhouette's pair stage must use LongDotProduct, not zip_with")
    assert(!plan357.contains("CartesianProduct"))
    assert(q370.collect().length === 1)
  }

  test("AMS corpus: median estimator lands within an order of magnitude") {
    val rows = TextAnalytics.amsF2Sketch(spark, sf).collect()
    assert(rows.length === 8)
    val exact = rows.head.getAs[Long]("f2_exact")
    val med = rows.head.getAs[Long]("median_est")
    assert(exact > 0L && med > 0L)
    assert(med < exact * 10 && med > exact / 10,
      s"AMS median $med vs exact $exact")
  }
}
