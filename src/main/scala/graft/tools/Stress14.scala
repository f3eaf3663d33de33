package graft.tools

import graft.core.GraftSession
import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 scale stress: grid-DBSCAN's DISTRIBUTED component resolver
  * (r13 verdict item 5) — `gridDbscanOf(distributedResolve = true)`
  * routes the contracted rep graph through connectedComponentsStar
  * instead of the driver union-find, the documented fallback for feature
  * domains whose occupied grid outgrows the driver. Planted closed-form
  * truth on a WIDENED integer domain (site coordinates stride ~500× eps,
  * so occupied cells ≈ sites + noise — the regime where the rep graph is
  * corpus-shaped, not constant-shaped):
  *
  *  - `nSites` cluster sites, 10 points each, packed inside one ε-box
  *    but STRADDLING up to 4 grid cells (odd points offset by exactly
  *    (epsX, epsY)) so cross-cell rep edges exist at every site; with
  *    minPts = 4 every site point is core ⇒ exactly one cluster per
  *    site, labeled by the site's min doc_id;
  *  - `nNoise` isolated points (≥ 100ε from everything) ⇒ label −1;
  *  - one `chainLen`-point chain at spacing 2 on x ⇒ ONE cluster whose
  *    rep-graph DIAMETER is ~chainLen·2/epsX — the case that forces the
  *    star resolver through its O(log²) rounds (and would stall a
  *    propagation resolver);
  *  - a small-scale leg re-runs BOTH resolvers on the same generator and
  *    checks bit equality via distributed exceptAll (the "overlap" check).
  *
  * Run: `sbt "runMain graft.tools.Stress14 [nSites] [nNoise] [chainLen]"`
  * (defaults 100000 sites = 1M clustered points, 500000 noise, 20000 chain).
  */
object Stress14 {
  private val EpsX = 5L
  private val EpsY = 2L
  private val MinPts = 4L

  /** Deterministic planted frame: (doc_id, x, y, expected cluster label).
    * Sites stride 500·eps on x and hash-scatter on y (widened domain);
    * noise lives on a negative-x shelf; the chain on its own y-shelf.
    */
  private def planted(spark: org.apache.spark.sql.SparkSession,
      nSites: Long, nNoise: Long, chainLen: Long): DataFrame = {
    val sitePts = spark.range(nSites * 10).select(
      col("id").as("doc_id"),
      expr("id div 10").as("site"), // integer div: `/` would be double
      pmod(col("id"), lit(10L)).as("j"))
      .select(col("doc_id"),
        (col("site") * (500L * EpsX) +
          when(pmod(col("j"), lit(2L)) === 1L, EpsX).otherwise(0L)).as("x"),
        (pmod(xxhash64(col("site")), lit(1000003L)) * (500L * EpsY) +
          when(pmod(col("j"), lit(2L)) === 1L, EpsY).otherwise(0L)).as("y"),
        (col("site") * 10).as("expected"))
    val noiseBase = nSites * 10
    val noisePts = spark.range(nNoise).select(
      (col("id") + noiseBase).as("doc_id"),
      (-(col("id") + 1L) * (500L * EpsX)).as("x"),
      (pmod(xxhash64(col("id")), lit(1000003L)) * (500L * EpsY)).as("y"),
      lit(-1L).as("expected"))
    val chainBase = noiseBase + nNoise
    // chain endpoints see only 3 neighbors incl. self → border, pinned to
    // the chain cluster; min CORE is the second point (chainBase + 1)
    val chainPts = spark.range(chainLen).select(
      (col("id") + chainBase).as("doc_id"),
      (col("id") * 2L).as("x"),
      lit(1000003L * 500L * EpsY + 1000L).as("y"), // own shelf, above every site
      lit(chainBase + 1L).as("expected"))
    sitePts.unionAll(noisePts).unionAll(chainPts)
  }

  def main(args: Array[String]): Unit = {
    val nSites = args.headOption.map(_.toLong).getOrElse(100_000L)
    val nNoise = args.lift(1).map(_.toLong).getOrElse(500_000L)
    val chainLen = args.lift(2).map(_.toLong).getOrElse(20_000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress14] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- leg 1: resolver equality on the overlap (both fit the driver)
    time("leg1 resolver-equality (5k sites / 20k noise / 2k chain)") {
      val small = planted(spark, 5000L, 20000L, 2000L)
        .select(col("doc_id"), col("x"), col("y")).localCheckpoint()
      val a = Curation.gridDbscanOf(spark, small, EpsX, EpsY, MinPts)
      val b = Curation.gridDbscanOf(spark, small, EpsX, EpsY, MinPts,
        distributedResolve = true)
      val onlyA = a.exceptAll(b).count()
      val onlyB = b.exceptAll(a).count()
      assert(onlyA == 0 && onlyB == 0,
        s"resolver disagreement: $onlyA rows only-driver, $onlyB only-star")
      println(s"[stress14] leg1 OK: ${a.count()} labeled rows bit-equal " +
        "between driver union-find and distributed star")
    }

    // ---- leg 2: planted truth at scale, distributed resolver ONLY
    val pts = time(f"generate ${nSites * 10 + nNoise + chainLen}%,d points " +
      f"($nSites%,d sites / $nNoise%,d noise / $chainLen%,d chain)") {
      planted(spark, nSites, nNoise, chainLen).localCheckpoint()
    }
    val labeled = time("grid-DBSCAN (distributedResolve=true)") {
      Curation.gridDbscanOf(spark,
        pts.select(col("doc_id"), col("x"), col("y")),
        EpsX, EpsY, MinPts, distributedResolve = true).localCheckpoint()
    }
    time("assert planted truth") {
      val joined = labeled.join(pts.select(col("doc_id"), col("expected")),
        Seq("doc_id"))
      val mismatches = joined.where(col("cluster") =!= col("expected")).count()
      assert(mismatches == 0, s"$mismatches label mismatches vs planted truth")
      val nClusters = labeled.where(col("cluster") >= 0)
        .agg(count_distinct(col("cluster"))).head().getLong(0)
      assert(nClusters == nSites + 1,
        s"expected ${nSites + 1} clusters (sites + chain), got $nClusters")
      val nNoiseGot = labeled.where(col("cluster") === -1L).count()
      assert(nNoiseGot == nNoise, s"expected $nNoise noise, got $nNoiseGot")
      println(f"[stress14] leg2 OK: $nClusters%,d clusters bit-exact, " +
        f"$nNoiseGot%,d noise, 0 mismatches over ${labeled.count()}%,d points")
    }
    spark.stop()
  }
}
