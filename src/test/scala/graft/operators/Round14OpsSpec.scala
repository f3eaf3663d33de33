package graft.operators

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 behavior pins: the grid-DBSCAN distributed resolver
  * (r13 verdict item 5 — the documented connectedComponentsStar fallback
  * for feature domains whose occupied grid outgrows the driver) must emit
  * labels IDENTICAL to the driver union-find wherever both finish: the
  * star fixpoint is the same min-label closure the union-find computes.
  */
class Round14OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(feats: DataFrame, distributed: Boolean,
      epsX: Long = 5L, epsY: Long = 2L, minPts: Long = 4L): Seq[(Long, Long, Int, Long)] =
    Curation.gridDbscanOf(spark, feats, epsX, epsY, minPts,
        distributedResolve = distributed)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("grid DBSCAN: distributed star resolver equals driver union-find on a long chain") {
    val s = spark
    import s.implicits._
    // 60 points spaced 2 apart on x: every point sees i±1, i±2 within the
    // (5,2) L∞ box (5 neighbors ≥ minPts=4, all cores) and the chain spans
    // ~24 grid cells — a rep-graph DIAMETER large enough that the star
    // resolver needs multiple rounds; plus an isolated dense blob and noise
    val chain = (0 until 60).map(i => (i.toLong + 1, i * 2L, 0L))
    val blob = (0 until 6).map(i => (100L + i, 500L + i, 100L))
    val noise = Seq((900L, 9999L, 9999L))
    val pts = (chain ++ blob ++ noise).toDF("doc_id", "x", "y")
    val driver = run(pts, distributed = false)
    val star = run(pts, distributed = true)
    assert(driver == star,
      s"resolver disagreement:\n driver=$driver\n star  =$star")
    // sanity: the chain really is ONE cluster — labeled by its min CORE
    // (doc 2: the endpoints 1 and 60 see only 3 neighbors incl. self,
    // so they are border points pinned to the chain's component)
    assert(driver.filter(_._1 <= 60L).map(_._4).distinct == Seq(2L))
    assert(driver.find(_._1 == 1L).get._3 == 0, "endpoint is border, not core")
    assert(driver.find(_._1 == 900L).get._4 == -1L, "noise stays noise")
  }

  test("grid DBSCAN: both resolvers agree bit-exactly on the gate corpus") {
    val feats = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long").as("x"),
        (length(col("text")) - length(translate(col("text"), " ", "")))
          .cast("long").as("y"))
    assert(run(feats, distributed = false) == run(feats, distributed = true))
  }

  test("q385 and q348 gate entries emit identical rows (shared oracle is sound)") {
    // the two entries share one oracle SQL — pin that the ENTRIES (not
    // just gridDbscanOf) stay row-identical, so an edit to either's
    // feature projection cannot silently decouple them from the shared SQL
    def rows(name: String): Seq[String] =
      graft.SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).toSeq.sorted
    assert(rows("q348_grid_dbscan") == rows("q385_grid_dbscan_star"))
  }
}
