package graft.operators

import graft.SparkTestBase
import graft.analytics.Funnels
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 sixth batch (q357-q360): silhouette and
  * Calinski-Harabasz on the integer grid, bipartite HITS, and the Wald
  * SPRT trajectory. Every fixture value is hand-derived.
  */
class Round9fOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("silhouette fixture: exact a/b means, sign-split s, singleton = 0") {
    val s = spark
    import s.implicits._
    val a = Seq(
      (1L, 1L, Seq(0L)), (2L, 1L, Seq(2L)),
      (3L, 2L, Seq(10L)), (4L, 2L, Seq(12L)),
      (5L, 3L, Seq(100L))).toDF("vec_id", "cell", "vq")
    val got = Similarity.silhouetteOf(a).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) === ((2L, Some(4000000L), 122000000L, 967213L)))
    assert(got(2L) === ((2L, Some(4000000L), 82000000L, 951219L)))
    assert(got(3L) === ((2L, Some(4000000L), 82000000L, 951219L)))
    assert(got(4L) === ((2L, Some(4000000L), 122000000L, 967213L)))
    assert(got(5L) === ((1L, None, 7922000000L, 0L)), "singleton: s = 0")
  }

  test("cluster dispersion fixture: truncating centroids, exact CH ratio") {
    val s = spark
    import s.implicits._
    val a = Seq(
      (1L, 1L, Seq(0L)), (2L, 1L, Seq(2L)),
      (3L, 2L, Seq(10L)), (4L, 2L, Seq(14L))).toDF("vec_id", "cell", "vq")
    // centroids [1],[12]; global (26/4 -> 6); wss 2,8; bgd 50,72
    // CH = (122 * (4-2)) / (10 * (2-1)) = 24.4
    val got = Similarity.clusterDispersionOf(a).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got(1L) === ((2L, 2L, 50L, 2L, 4L, 24.4)))
    assert(got(2L) === ((2L, 8L, 72L, 2L, 4L, 24.4)))
  }

  test("HITS fixture: one round exact; nested repertoires order authorities") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (3L, "c"), (3L, "c")).toDF("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    // round 1: a_raw = (3,2,1)e6, amx = 3e6 -> a = 1e6, 666666, 333333
    val r1 = Funnels.hitsBipartiteOf(ev, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r1 === Map("a" -> 1000000L, "b" -> 666666L, "c" -> 333333L))
    // three rounds keep the dominance order and the max at exactly 1e6
    val r3 = Funnels.hitsBipartiteOf(ev, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r3("a") === 1000000L)
    assert(r3("a") > r3("b") && r3("b") > r3("c"))
    // symmetric graph: every authority pins to the grid max
    val sym = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("user_id", "event_type")
    val rs = Funnels.hitsBipartiteOf(sym, rounds = 3).collect()
      .map(_.getLong(2))
    assert(rs.toSeq === Seq(1000000L, 1000000L))
  }

  test("SPRT fixture: pinned LLR constants, Wald crossing day") {
    val s = spark
    import s.implicits._
    val mk = (day: Int, t: String, n: Int, from: Int) =>
      (1 to n).map(i => ((from + i).toLong, t,
        f"2024-01-$day%02d 10:00:00", 1L))
    // day1: 2/10 purchases -> llr = 2*223144 - 8*64539 = -70024
    // day2: 5/5 -> +1115720, cum 1045696 (continue)
    // day3: 30/30 -> +6694320, cum 7740016 (accept_h1)
    val rows = mk(1, "purchase", 2, 0) ++ mk(1, "view", 8, 100) ++
      mk(2, "purchase", 5, 200) ++ mk(3, "purchase", 30, 300)
    val ev = rows.toDF("event_id", "event_type", "ts", "user_id")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("event_id"))
    val got = Funnels.sprtDailyOf(ev).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got("2024-01-01") === ((-70024L, -70024L, "continue")))
    assert(got("2024-01-02") === ((1115720L, 1045696L, "continue")))
    assert(got("2024-01-03") === ((6694320L, 7740016L, "accept_h1")))
  }

  test("silhouette corpus: s in [-1e6, 1e6], every vector labeled") {
    val rows = Similarity.silhouette(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val sf0 = r.getLong(5)
      assert(sf0 >= -1000000L && sf0 <= 1000000L)
    }
  }
}
