package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 additions: regression tests for the advisory fixes (morton's
  * 64-bit widening — 3+ dims × 8 bits reaches bit positions ≥ 31, where
  * 32-bit shiftleft silently wraps; bitmapRetention's short-span
  * eligibility guard — n_days ≤ lag used to feed a negative shift,
  * mod-64 garbage; mmdQuadraticOf's degradation on an empty group — null
  * metrics, not NoSuchElementException / divide-by-zero) plus the q381
  * Huffman-audit gate replay against an independent in-test Huffman.
  */
class Round10FixSpec extends SparkTestBase {

  test("morton widens to long: 3 dims x 8 bits reaches bit positions past 31") {
    val s = spark
    import s.implicits._
    // d=3, bits=8: bit 7 of dim 0 lands at position 3*7+2 = 23; with
    // value 255 in every dim the top term is position 23 for dim0's bit 7
    // only if... use 4 dims x 8 bits: top position = 4*7+3 = 31, and
    // 5 dims x 8: 5*7+4 = 39 — both past the 32-bit wrap
    val r = Seq((255, 255, 255, 255, 255)).toDF("a", "b", "c", "d", "e")
      .select(graft.functions.Spatial.morton(
        Seq(col("a"), col("b"), col("c"), col("d"), col("e")), 8).as("z"))
      .collect().head.getLong(0)
    // all 40 interleaved bit positions set = 2^40 - 1
    assert(r === (1L << 40) - 1L)
    // independent reference on a non-trivial point: interleave by hand
    def ref(dims: Seq[Int], bits: Int): Long = {
      val d = dims.size
      (for {
        i <- 0 until bits
        (v, j) <- dims.zipWithIndex
      } yield ((v >> i) & 1).toLong << (d * i + (d - 1 - j))).sum
    }
    val pt = Seq(170, 85, 204, 51) // 4 dims x 8 bits -> top position 31
    val got = Seq((pt(0), pt(1), pt(2), pt(3))).toDF("a", "b", "c", "d")
      .select(graft.functions.Spatial.morton(
        Seq(col("a"), col("b"), col("c"), col("d")), 8).as("z"))
      .collect().head.getLong(0)
    assert(got === ref(pt, 8))
  }

  test("bitmapRetention: spans shorter than the lag report eligible = 0") {
    val s = spark
    import s.implicits._
    // a 2-day span: lag 1 has 1 eligible day; lags 2..7 exceed the span
    // and must report eligible 0 / null rate (the negative-shift garbage
    // used to make them nonzero)
    val ev = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (2L, "2024-01-01 09:00:00"))
      .toDF("user_id", "ts")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val rows = graft.analytics.Funnels.bitmapRetentionOf(spark, ev)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(rows(1) === ((1L, 2L, Some(0.5)))) // user 1 retained of 2 eligible
    (2 to 7).foreach { lag =>
      assert(rows(lag) === ((0L, 0L, None)),
        s"lag $lag exceeds the 2-day span: eligible must be 0, rate null")
    }
  }

  /** Independent Huffman: a priority queue (vs the operator's
    * sort-per-round) under the same pinned (weight, min-member) total
    * order.
    */
  private def huffDepths(freqs: Seq[(String, Long)]): Map[String, Int] = {
    case class Node(w: Long, id: String, members: Set[String])
    val ord: Ordering[Node] = Ordering.by((n: Node) => (n.w, n.id))
    val pq = scala.collection.mutable.PriorityQueue(
      freqs.map { case (t, n) => Node(n, t, Set(t)) }: _*)(ord.reverse)
    var depth = Map[String, Int]().withDefaultValue(0)
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      val m = a.members ++ b.members
      m.foreach(t => depth = depth.updated(t, depth(t) + 1))
      pq.enqueue(Node(a.w + b.w, if (a.id < b.id) a.id else b.id, m))
    }
    depth
  }

  test("q381 Huffman depths replay an independent priority-queue Huffman") {
    val s = spark
    import s.implicits._
    val sf = "/root/testdata/sf0.001"
    val audit = graft.analytics.Funnels.huffmanAudit(spark, sf).collect()
    val per = audit.filter(_.getString(0) != "ALL")
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    val freqs = graft.core.Tables.events(spark, sf)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(per === huffDepths(freqs))
    // Kraft equality: the code is a FULL binary tree
    assert(per.values.map(l => math.pow(2.0, -l)).sum === 1.0)
    // Shannon optimality: H <= avg_len < H + 1 (the audit's whole point)
    val all = audit.find(_.getString(0) == "ALL").get
    val (avgFp, entFp) = (all.getLong(5), all.getLong(6))
    assert(avgFp >= entFp && avgFp < entFp + 1000000L)
    // weighted_bits consistency: ALL row carries the exact total
    assert(audit.filter(_.getString(0) != "ALL").map(_.getLong(3)).sum
      === all.getLong(3))
  }

  test("q381 Huffman on a skewed dyadic alphabet yields the exact ladder") {
    val s = spark
    import s.implicits._
    // dyadic weights 1,2,4,8,16,32: optimal depths are the ladder
    // 5,5,4,3,2,1 (deepest two share the bottom merge)
    val fx = Seq(("a", 1), ("b", 2), ("c", 4), ("d", 8), ("e", 16), ("f", 32))
    val events = fx.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("event_type")
    val got = graft.analytics.Funnels.huffmanAuditOf(events).collect()
      .filter(_.getString(0) != "ALL")
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got === Map("a" -> 5, "b" -> 5, "c" -> 4, "d" -> 3, "e" -> 2,
      "f" -> 1))
    assert(got === huffDepths(fx.map { case (t, n) => (t, n.toLong) }))
  }

  test("mmdQuadraticOf degrades to null metrics when a group is empty") {
    val s = spark
    import s.implicits._
    val oneSided = Seq((1L, "x", Seq(1000L, 0L)), (2L, "x", Seq(0L, 1000L)))
      .toDF("vec_id", "g", "vq")
    val r = Similarity.mmdQuadraticOf(spark, oneSided).collect().head
    assert(r.getAs[Long]("n_x") === 2L)
    assert(r.getAs[Long]("n_y") === 0L)
    assert(r.isNullAt(r.fieldIndex("e_kxx_t")))
    assert(r.isNullAt(r.fieldIndex("mmd2_t")))
    val empty = oneSided.where(lit(false))
    val r2 = Similarity.mmdQuadraticOf(spark, empty).collect().head
    assert(r2.getAs[Long]("n_x") === 0L && r2.getAs[Long]("n_y") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("mmd2_t")))
  }
}
