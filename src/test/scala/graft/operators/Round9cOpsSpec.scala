package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-9 third batch (q345-q348): native unpivot melt,
  * bitmap-index lag retention, KMV pairwise-intersection sketches, and
  * grid-blocked DBSCAN. Hand fixtures replay each computation exactly;
  * plan-shape asserts pin the properties that make each operator the
  * scale-correct choice (zero-join retention, Expand-only melt).
  */
class Round9cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("unpivot fixture: zero cells survive the wide->long round trip") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      ("2024-01-01 10:00:00", "click"), ("2024-01-01 11:00:00", "click"),
      ("2024-01-01 12:00:00", "view"), ("2024-01-02 09:00:00", "purchase"))
      .toDF("ts", "event_type")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
    val got = Relational.unpivotDailyMetricsOf(ev).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      ("2024-01-01", "click", 2L), ("2024-01-01", "error", 0L),
      ("2024-01-01", "purchase", 0L), ("2024-01-01", "signup", 0L),
      ("2024-01-01", "view", 1L),
      ("2024-01-02", "click", 0L), ("2024-01-02", "error", 0L),
      ("2024-01-02", "purchase", 1L), ("2024-01-02", "signup", 0L),
      ("2024-01-02", "view", 0L)))
  }

  test("unpivot plan: melt is an Expand, not a shuffle or join") {
    val plan = Relational.unpivotDailyMetrics(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "unpivot should compile to Expand")
    assert(!plan.contains("Join"), "melt must not join")
  }

  test("bitmap retention fixture: shift-AND-popcount equals the join answer") {
    val s = spark
    import s.implicits._
    // u1 active days {0,1,2}, u2 active days {0,2} over a 3-day span
    val ev = Seq(
      (1L, "2024-01-01 05:00:00"), (1L, "2024-01-01 09:00:00"),
      (1L, "2024-01-02 05:00:00"), (1L, "2024-01-03 05:00:00"),
      (2L, "2024-01-01 05:00:00"), (2L, "2024-01-03 05:00:00"))
      .toDF("user_id", "ts")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val got = Funnels.bitmapRetentionOf(spark, ev, maxLag = 2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // lag 1: retained = u1:{0->1,1->2} = 2; eligible = days d with d+1
    // in span = u1:{0,1} + u2:{0} = 3
    assert(got(1) === ((2L, 3L, Some(0.666667))))
    // lag 2: retained = u1:{0->2} + u2:{0->2} = 2; eligible = {0}x2 = 2
    assert(got(2) === ((2L, 2L, Some(1.0))))
  }

  test("bitmap retention: span wider than one word fails loudly") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "2024-01-01 05:00:00"), (1L, "2024-06-01 05:00:00"))
      .toDF("user_id", "ts")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val e = intercept[Exception] {
      Funnels.bitmapRetentionOf(spark, ev).collect()
    }
    assert(e.getMessage != null)
  }

  test("bitmap retention plan: no self-join — the bitmap IS the index") {
    val plan = Funnels.bitmapRetention(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "retention must come from bit arithmetic, not a (u,d)x(u,d+lag) join")
  }

  test("KMV intersection fixture: complete sketches fall back to exact") {
    val s = spark
    import s.implicits._
    // |A|,|B| < k: sketches are the full sets, estimates must be exact
    val uni = Seq(
      ("A", "a"), ("A", "b"), ("A", "c"),
      ("B", "b"), ("B", "c"), ("B", "d")).toDF("source", "s")
    val r = TextAnalytics.kmvIntersectionOf(uni, k = 8).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("src_a") === "A")
    assert(row.getAs[Long]("inter_exact") === 2L)
    assert(row.getAs[Long]("union_exact") === 4L)
    assert(row.getAs[Long]("sketch_overlap") === 2L)
    assert(row.getAs[Double]("jaccard_est") === 0.5)
    assert(row.getAs[Double]("jaccard_exact") === 0.5)
    assert(row.getAs[Double]("union_est") === 4.0)
    assert(row.getAs[Double]("inter_est") === 2.0)
    assert(row.getAs[Double]("inter_rel_err") === 0.0)
  }

  test("KMV intersection fixture: identical and disjoint sets at k-truncation") {
    val s = spark
    import s.implicits._
    val words = (1 to 10).map(i => s"w$i")
    val same = (words.map(("A", _)) ++ words.map(("B", _)))
      .toDF("source", "s")
    val r1 = TextAnalytics.kmvIntersectionOf(same, k = 4).collect().head
    // identical sets -> identical sketches -> every merged hash in both
    assert(r1.getAs[Long]("sketch_overlap") === 4L)
    assert(r1.getAs[Double]("jaccard_est") === 1.0)
    assert(r1.getAs[Double]("jaccard_exact") === 1.0)
    val disj = ((1 to 10).map(i => ("A", s"x$i"))
      ++ (1 to 10).map(i => ("B", s"y$i"))).toDF("source", "s")
    val r2 = TextAnalytics.kmvIntersectionOf(disj, k = 4).collect().head
    assert(r2.getAs[Long]("sketch_overlap") === 0L)
    assert(r2.getAs[Double]("jaccard_est") === 0.0)
    assert(r2.getAs[Double]("inter_est") === 0.0)
    assert(r2.get(r2.fieldIndex("inter_rel_err")) === null)
  }

  test("KMV intersection corpus: estimates track exact within sketch error") {
    val rows = TextAnalytics.kmvIntersection(spark, sf).collect()
    assert(rows.length === 190, "20 sources -> 190 unordered pairs")
    rows.foreach { r =>
      val je = r.getAs[Double]("jaccard_est")
      val jx = r.getAs[Double]("jaccard_exact")
      // k=64 binomial std err ~ sqrt(J(1-J)/64) <= 0.0625; 4 sigma
      assert(math.abs(je - jx) <= 0.25,
        s"${r.getAs[String]("src_a")}x${r.getAs[String]("src_b")}: $je vs $jx")
      assert(r.getAs[Long]("sketch_overlap") <= 64L)
      assert(r.getAs[Long]("kth_hash") > 0L)
    }
  }

  test("grid DBSCAN fixture: cores, border pins to min component, noise") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L),
      (4L, 2L, 1L), (5L, 5L, 5L), (6L, 6L, 5L)).toDF("doc_id", "x", "y")
    val got = Curation.gridDbscanOf(spark, pts, 1L, 1L, 3L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((3L, 1, 1L)))
    assert(got(2L) === ((4L, 1, 1L)), "sees 1,3 and border 4")
    assert(got(3L) === ((3L, 1, 1L)))
    assert(got(4L) === ((2L, 0, 1L)), "border: non-core next to core 2")
    assert(got(5L) === ((2L, 0, -1L)), "pair below minPts is noise")
    assert(got(6L) === ((2L, 0, -1L)))
  }

  test("grid DBSCAN fixture: eps-boundary neighbors across cells are found") {
    val s = spark
    import s.implicits._
    // exactly eps apart on both axes, in different grid cells
    val pts = Seq((1L, 4L, 1L), (2L, 9L, 3L), (3L, 100L, 100L))
      .toDF("doc_id", "x", "y")
    val got = Curation.gridDbscanOf(spark, pts, 5L, 2L, 2L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((2L, 1, 1L)), "|dx|=5,|dy|=2 is inside the L-inf box")
    assert(got(2L) === ((2L, 1, 1L)))
    assert(got(3L) === ((1L, 0, -1L)))
  }

  test("grid DBSCAN corpus: labels are live and every doc is labeled") {
    val rows = Curation.gridDbscan(spark, sf).collect()
    assert(rows.length === 500)
    val cores = rows.count(_.getInt(2) == 1)
    assert(cores > 400 && cores < 500, s"core/non-core mix must be live: $cores")
    val clusters = rows.map(_.getLong(3)).filter(_ >= 0L).distinct
    assert(clusters.nonEmpty)
  }
}
