package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Hashing, Text}

/** Document-corpus text analysis queries: quality scoring, language ID,
  * token counting, fingerprinting. All narrow map-side projections over the
  * documents scan (no shuffle except the summary aggregations) — at 100 TB
  * these run as a single pass with column pruning down to (doc_id, text).
  */
object TextAnalytics {

  /** Per-document quality metrics + composite score. */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Text.qualityMetrics(col("text"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id") +: m.map { case (n, c) => c.as(n) }: _*)
  }

  /** Language-ID prediction vs the labeled lang column. */
  def langPredictions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang").as("actual_lang"),
        Text.langId(col("text")).as("predicted_lang"))

  /** Token counts (whitespace + regex-subword proxy) and the rolling-hash
    * document fingerprint.
    */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("ws_tokens"),
        Text.regexTokenCount(col("text")).cast("long").as("regex_tokens"),
        Hashing.rollingFingerprint(Text.tokens(col("text"))).as("fingerprint"))

  /** Corpus roll-up per (lang, source): volume, mean quality, distinct
    * fingerprints (content diversity) — the monitoring query a data
    * pipeline runs per ingest batch.
    */
  def corpusSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val score = Text.qualityMetrics(col("text")).toMap.apply("quality_score")
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"), score.as("q"),
        Hashing.rollingFingerprint(Text.tokens(col("text"))).as("fp"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(round(sum(col("q")), 4) / count(lit(1)), 4).as("mean_quality"),
        countDistinct(col("fp")).as("distinct_fingerprints"))
  }
}
