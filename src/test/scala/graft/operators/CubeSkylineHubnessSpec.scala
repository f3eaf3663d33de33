package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, TextAnalytics}
import org.apache.spark.sql.functions.{col, size, split}

/** Semantics of the round-6 lattice/frontier/hubness operators (q168–q170):
  * the CUBE grouping-set lattice, the 2-D skyline, and the kNN in-degree
  * histogram. Skyline and hubness are checked by independent brute-force
  * replays (NOT-EXISTS dominance in Scala; full in-cell kNN recount), so
  * the engine's factored plans are validated against the textbook
  * definitions they replace.
  */
class CubeSkylineHubnessSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("event cube: every lattice level present with exact marginals") {
    val s = spark
    import s.implicits._
    val got = Relational.eventCube(s, sf).collect()
    // 4 grouping levels: (type,dow), (type), (dow), ()
    val levels = got.map(r => (r.getInt(2), r.getInt(3))).distinct.toSet
    assert(levels === Set((0, 0), (0, 1), (1, 0), (1, 1)))
    val grand = got.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length === 1)
    val total = grand.head.getLong(4)
    // each level's n_events sums to the grand total
    for ((gt, gd) <- Seq((0, 0), (0, 1), (1, 0)))
      assert(got.filter(r => r.getInt(2) == gt && r.getInt(3) == gd)
        .map(_.getLong(4)).sum === total)
    // rolled-up cells carry NULL in the rolled dimension, and only there
    assert(got.forall(r => (r.getInt(2) == 1) == r.isNullAt(0)))
    assert(got.forall(r => (r.getInt(3) == 1) == r.isNullAt(1)))
  }

  test("skyline: survivors equal the brute-force NOT-EXISTS frontier") {
    val s = spark
    val docs = graft.core.Tables.documents(s, sf)
    val scored = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      graft.functions.Text.modelScore(col("text")).as("model_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = scored.filter { case (_, t, m) =>
      !scored.exists { case (_, bt, bm) =>
        bt <= t && bm >= m && (bt < t || bm > m)
      }
    }.map(_._1).toSet
    val got = TextAnalytics.skylineDocs(s, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("skyline: ties on both dimensions are mutually non-dominating") {
    val s = spark
    import s.implicits._
    // identical texts → identical (n_tokens, score): both must survive;
    // the longer copy of the same text scores the same → dominated
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.skylineDocsOf(docs).collect()
    val ids = got.map(_.getLong(0)).toSet
    assert(ids.contains(1L) && ids.contains(2L))
    // doc 3 survives only if its score strictly beats the short docs'
    val m = docs.select(col("doc_id"),
      graft.functions.Text.modelScore(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ids.contains(3L) === (m(3L) > m(1L)))
  }

  test("hubness: histogram equals a brute-force in-cell kNN recount") {
    val s = spark
    val k = 5
    val av = Similarity.ivfAssignTrained(s, sf)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val vecs = graft.core.Tables.embeddings(s, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = av.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val indeg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((_, members) <- byCell; a <- members) {
      val top = members.filter(_ != a)
        .map(b => (cos(vecs(a), vecs(b)), b))
        .sortBy { case (c, b) => (-c, b) }.take(k)
      top.foreach { case (_, b) => indeg(b) += 1L }
    }
    val expected = indeg.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
        .updated(0L, av.length.toLong - indeg.size)
        .filter(_._2 > 0)
    val got = Similarity.knnHubness(s, sf, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // mass check: every vector lands in exactly one bucket
    assert(got.values.sum === av.length.toLong)
  }
}
