package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Single-pass column profiling — the per-ingest-batch data-quality report
  * a pipeline runs before promoting a table: row/null/distinct counts and
  * min/max per column, computed as ONE aggregation over the scan (every
  * metric is an agg expression; no per-column passes) and unpivoted to
  * long format with stack().
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
      s"'$c', ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx").mkString(", ")
    wide.selectExpr("__total",
      s"stack(${cols.size}, $stackExpr) AS (column_name, non_nulls, distinct_count, min_value, max_value)")
      .select(col("column_name"), col("__total").as("row_count"),
        col("non_nulls"), col("distinct_count"),
        col("min_value"), col("max_value"))
  }

  /** Profile of the customer table (the oracle-checked instance). */
  def customerProfile(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.customer(spark, sfDir),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
}
