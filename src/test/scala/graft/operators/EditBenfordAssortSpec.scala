package graft.operators

import graft.SparkTestBase
import graft.analytics.Relational
import org.apache.spark.sql.functions.col

/** Semantics of q182–q184: Levenshtein near-dup verify (independent Scala
  * DP replay per emitted pair), degree assortativity (hand-computed star
  * and regular-graph fixtures), and the Benford audit (leading-digit
  * recount from the raw order totals).
  */
class EditBenfordAssortSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Textbook two-row DP — the independent implementation the engine's
    * codegen'd levenshtein is checked against.
    */
  private def lev(a: String, b: String): Int = {
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(b.length)
  }

  test("edit distance pairs: every emitted row replays the DP exactly") {
    val s = spark
    val texts = graft.core.Tables.documents(s, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Dedup.editDistancePairs(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      val (t1, t2) = (texts(d1), texts(d2))
      val dist = lev(t1, t2)
      assert(r.getInt(2) === dist, s"distance ($d1,$d2)")
      assert(r.getInt(3) === t1.length && r.getInt(4) === t2.length)
      val sim = round6(1.0 - dist.toDouble / math.max(t1.length, t2.length))
      assert(r.getDouble(5) === sim, s"similarity ($d1,$d2)")
      assert(r.getInt(6) === (if (sim >= 0.8) 1 else 0))
    }
  }

  test("edit distance pairs: candidates cover every verified Jaccard pair") {
    val s = spark
    val cand = Dedup.editDistancePairs(s, sf)
      .select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.minhashPairs(s, sf)
      .select(col("doc1"), col("doc2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cand))
  }

  test("assortativity: star graph is exactly -1, regular graph is NULL") {
    val s = spark
    import s.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc1", "doc2")
    val starRow = Curation.degreeAssortativityOf(star).collect()(0)
    assert(starRow.getLong(0) === 6L)
    assert(starRow.getDouble(1) === -1.0)
    // a triangle is 2-regular: zero degree variance, undefined r
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc1", "doc2")
    val triRow = Curation.degreeAssortativityOf(tri).collect()(0)
    assert(triRow.getLong(0) === 6L)
    assert(triRow.isNullAt(1))
  }

  test("assortativity: path of length 2 hand-check") {
    val s = spark
    import s.implicits._
    // path b-a-c: directed (2,1)x2 and (1,2)x2; n=4 sx=6 sxx=10 sxy=8
    // r = (4*8-36)/(4*10-36) = -1
    val path = Seq((1L, 2L), (1L, 3L)).toDF("doc1", "doc2")
    assert(Curation.degreeAssortativityOf(path).collect()(0).getDouble(1) === -1.0)
  }

  test("benford: digit shares recount the raw order totals") {
    val s = spark
    val totals = graft.core.Tables.orders(s, sf)
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
    val counts = totals
      .map(v => math.floor(v).toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = totals.length.toDouble
    val got = Relational.benfordOrders(s, sf).collect()
    assert(got.map(_.getLong(1)).sum === totals.length.toLong)
    got.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) === counts(d), s"count digit $d")
      assert(r.getDouble(2) === round6(counts(d) / n))
      val p = round6(math.log((d + 1.0) / d) / math.log(10.0))
      assert(r.getDouble(3) === p)
      assert(r.getDouble(4) === round6(math.abs(r.getDouble(2) - p)))
    }
  }
}
