package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Round-8 continuation stress (dev tool): drives the new text/IR and
  * statistics operators at 100-200× the sf0.1 documents corpus — the
  * same synthetic-corpus substitution Stress8 makes for the media
  * pipeline. Checks the documented scale shapes hold where they matter:
  * the postings audit's (word, shard) window must absorb hot words
  * (every one of the 5k vocab words is hot at 100k docs), phrase search
  * must stay two corpus passes + broadcast, and the grain-based stats
  * (Kruskal/Levene on the events side) are covered by the q-gates.
  *
  *   sbt "runMain graft.tools.Stress8b 100000"
  */
object Stress8b {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100_000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress8b] $name: $rows%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_r8b").toString
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(5000)))): _*)
          .as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        lit(360L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    time(s"postings audit ($nDocs docs, 5k vocab — every word hot)")(
      graft.analytics.TextAnalytics.postingsAudit(spark, dir).count())
    time(s"phrase search ($nDocs docs, top-5 of ~25M bigram types)")(
      graft.analytics.TextAnalytics.phraseSearch(spark, dir).count())
    time(s"lang macro-F1 ($nDocs docs)")(
      graft.analytics.TextAnalytics.langMacroF1(spark, dir).count())
    time(s"quality AUC ($nDocs docs)")(
      graft.analytics.TextAnalytics.qualityAuc(spark, dir).count())
  }
}
