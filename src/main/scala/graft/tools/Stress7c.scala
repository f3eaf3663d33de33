package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Round-7c/d/e/f operator stress (dev tool): drives the new audits at
  * 20-200× the sf0.1 scale on synthetic tables with the testdata schema —
  * the gram-heavy coverage curve, the holder-list pair expansion under
  * hot grams, the one-window gap sweep and perplexity over tens of
  * millions of events, the two-version diff, and the calendar-grain
  * driver solves staying calendar-sized as the fact tables grow.
  *
  *   sbt "runMain graft.tools.Stress7c 20000000 100000 2000000"
  */
object Stress7c {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(20_000_000L)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(100_000L)
    val nOrders = args.lift(2).map(_.toLong).getOrElse(2_000_000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress7c] $name: $rows%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_r7c").toString

    spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L)
        + pmod(xxhash64(col("id"), lit(3)), lit(90L * 86400000000L))).as("ts"),
      pmod(xxhash64(col("id")), lit(200000L)).as("user_id"),
      element_at(array(lit("click"), lit("signup"), lit("error"),
        lit("view"), lit("purchase")),
        (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id"), lit(7)), lit(50000L)) / 100.0).as("value"),
      lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    time(s"gap sweep ($nEvents events, one window pass)")(
      graft.analytics.Sessions.sessionGapSweep(spark, dir).count())
    time(s"user perplexity ($nEvents events)")(
      graft.analytics.Funnels.userPerplexity(spark, dir).count())
    time(s"ab power ($nEvents events)")(
      graft.analytics.Funnels.abPowerMde(spark, dir).count())

    // documents: 60 words from a 5000-word vocabulary, 20 sources
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(5000)))): _*)
          .as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        lit(360L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    time(s"split coverage curve ($nDocs docs, n=1..4)")(
      graft.operators.Curation.splitCoverageCurve(spark, dir).count())
    time(s"vocab overlap ($nDocs docs, 20 sources)")(
      graft.analytics.TextAnalytics.vocabOverlap(spark, dir).count())
    time(s"log-odds keywords ($nDocs docs)")(
      graft.analytics.TextAnalytics.logOddsKeywords(spark, dir).count())
    time(s"snapshot diff ($nDocs docs x2 versions)")(
      graft.operators.Curation.snapshotDiff(spark, dir).count())
    time(s"ingest vocab drift ($nDocs docs)")(
      graft.analytics.TextAnalytics.ingestVocabDrift(spark, dir).count())
    time(s"hill tail index ($nDocs docs)")(
      graft.analytics.TextAnalytics.hillTailIndex(spark, dir).count())

    // orders over a ~2,400-day calendar — the day-grain family's input
    spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id")), lit(150000L)).as("o_custkey"),
      date_add(lit(java.sql.Date.valueOf("1992-01-01")),
        pmod(xxhash64(col("id"), lit(2)), lit(2400L)).cast("int"))
        .as("o_orderdate"),
      (pmod(xxhash64(col("id"), lit(5)), lit(50000000L)) / 100.0)
        .as("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    time(s"theil-sen ($nOrders orders, 2400-day calendar)")(
      graft.analytics.Relational.theilSenTrend(spark, dir).count())
    time(s"mad anomalies ($nOrders orders)")(
      graft.analytics.Relational.madAnomalies(spark, dir).count())
    time(s"seasonal decompose ($nOrders orders)")(
      graft.analytics.Relational.seasonalDecompose(spark, dir).count())
    time(s"haar pyramid ($nOrders orders)")(
      graft.analytics.Relational.haarRevenue(spark, dir).count())

    spark.stop()
  }
}
