package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.GraftSession

/** Round-7 operator stress (dev tool): drives the new event, text, and
  * embedding operators at 20-200× the sf0.1 scale on synthetic tables with
  * the testdata schema, to observe the plan behavior the bench corpus
  * can't exercise (hot aggregate widths, generate throughput, the
  * metadata-sized driver solves staying metadata-sized).
  *
  *   sbt "runMain graft.tools.Stress7 20000000 100000 100000"
  */
object Stress7 {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(20_000_000L)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(100_000L)
    val nVecs = args.lift(2).map(_.toLong).getOrElse(100_000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress7] $name: $rows%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_r7").toString

    // events with the testdata schema: ~200k users over ~90 days
    spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L)
        + pmod(xxhash64(col("id"), lit(3)), lit(90L * 86400000000L))).as("ts"),
      pmod(xxhash64(col("id")), lit(200000L)).as("user_id"),
      element_at(array(lit("click"), lit("signup"), lit("error"),
        lit("view"), lit("purchase")),
        (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id"), lit(7)), lit(50000L)) / 100.0).as("value"),
      concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit(4)), lit(97L)),
        lit("}")).as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    time(s"window funnel ($nEvents events)")(
      graft.analytics.Funnels.windowFunnel(spark, dir).count())
    time(s"bounce/exit rates ($nEvents events)")(
      graft.analytics.Sessions.bounceExitRates(spark, dir).count())
    time(s"removal attribution ($nEvents events)")(
      graft.analytics.Funnels.removalAttribution(spark, dir).count())
    time(s"dow pivot ($nEvents events)")(
      graft.analytics.Relational.dowRevenuePivot(spark, dir).count())
    time(s"value moments ($nEvents events)")(
      graft.analytics.Relational.valueMoments(spark, dir).count())

    // documents: 60 words from a 5000-word vocabulary
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(5000)))): _*)
          .as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        lit(0L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // noop sink, not count(): the plan is map-only, so count() would prune
    // the HOF columns away and time an empty projection
    time(s"lexical richness ($nDocs docs)") {
      val df = graft.analytics.TextAnalytics.lexicalRichness(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      nDocs
    }
    time(s"pmi pairs ($nDocs docs)")(
      graft.analytics.TextAnalytics.pmiPairs(spark, dir).count())
    time(s"bpe merge loop ($nDocs docs)")(
      graft.analytics.TextAnalytics.bpeMergeLoop(spark, dir).count())

    // embeddings: 64 dims in [-1, 1)
    spark.range(nVecs)
      .select(col("id").as("vec_id"),
        array((0 until 64).map(j =>
          ((pmod(xxhash64(col("id"), lit(j)), lit(2000L)) - 1000L) / 1000.0)
            .cast("float")): _*).as("embedding"),
        pmod(col("id"), lit(16)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    time(s"dominant component ($nVecs vecs)")(
      graft.operators.Similarity.dominantComponent(spark, dir).count())

    spark.stop()
  }
}
