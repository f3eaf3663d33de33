package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Round-9 scale stress (dev tool): drives the new operator families at
  * 100-1000× the gate scales to check the documented 100 TB shapes hold
  * empirically — grid DBSCAN stays candidate-bounded, the bitmap
  * retention stays one aggregate + bit arithmetic, the coreset quantile
  * summary stays N/step, sequential patterns stay |types|²-bounded
  * per user, and the Shapley coalition algebra stays constant past the
  * first aggregate.
  *
  *   sbt "runMain graft.tools.Stress9 2000000"
  */
object Stress9 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2_000_000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress9] $name: $rows%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // --- grid DBSCAN on n points over a bounded 2-D integer plane:
    // density is bounded by construction, so pair work stays linear
    val pts = spark.range(n).select(col("id").as("doc_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(20000L)).as("x"),
        pmod(xxhash64(col("id"), lit(2)), lit(4000L)).as("y"))
      .repartition(64).localCheckpoint()
    time(s"grid DBSCAN ($n pts, eps 5x2)")(
      graft.operators.Curation.gridDbscanOf(spark, pts, 5L, 2L, 4L).count())

    // --- bitmap retention on n user-days across 60 days, 2 words
    val ud = spark.range(n).select(
        pmod(xxhash64(col("id"), lit(3)), lit(n / 20)).as("user_id"),
        to_timestamp(date_add(lit("2024-01-01").cast("date"),
          pmod(xxhash64(col("id"), lit(4)), lit(60L)).cast("int")))
          .as("ts"))
      .localCheckpoint()
    time(s"bitmap store build ($n events, ${n / 20} users, 60 days)")(
      graft.streaming.BitmapMaintain.dayBitsOf(ud).count())

    // --- coreset quantiles over n synthetic lineitem rows
    val li = spark.range(n).select(
        (pmod(xxhash64(col("id"), lit(5)), lit(9000000L)).cast("double")
          / 100.0 + 900.0).as("l_extendedprice"),
        col("id").as("l_orderkey"), lit(1).as("l_linenumber"))
      .localCheckpoint()
    time(s"coreset quantiles ($n rows, 8x32)")(
      graft.analytics.Relational.coresetQuantilesOf(spark, li).count())

    // --- sequential patterns: n events over n/50 users, 5 types
    val ev = spark.range(n).select(
        pmod(xxhash64(col("id"), lit(6)), lit(n / 50)).as("user_id"),
        element_at(typedLit(Seq("click", "error", "purchase", "signup",
          "view")), pmod(xxhash64(col("id"), lit(7)), lit(5L)).cast("int")
          + 1).as("event_type"),
        to_timestamp(date_add(lit("2024-01-01").cast("date"),
          pmod(xxhash64(col("id"), lit(8)), lit(30L)).cast("int")))
          .as("ts"),
        col("id").as("event_id"))
      .localCheckpoint()
    time(s"sequential patterns ($n events, ${n / 50} users)")(
      graft.analytics.Funnels.sequentialPatternsOf(ev).count())
    time(s"Shapley attribution ($n events)")(
      graft.analytics.Funnels.shapleyAttributionOf(ev).count())
    time(s"CUPED ($n events)")(
      graft.analytics.Funnels.cupedAdjustmentOf(
        ev.withColumn("value", (pmod(xxhash64(col("event_id")), lit(10000L))
          .cast("double") / 100.0))).count())

    spark.stop()
  }
}
