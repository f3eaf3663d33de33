package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** SQL-text surface: the testdata tables as temp views so any engine
  * capability is reachable via `spark.sql(...)` — including the
  * extension-registered functions (graft_cosine).
  */
object Sql {

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      // events must go through Tables.events (ns→µs timestamp conversion);
      // the raw parquet would expose ts as a nanosecond Long to every SQL
      val df = if (n == "events") Tables.events(spark, sfDir)
        else Tables.load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** Pure-SQL similarity ranking against a fixed anchor vector, using the
    * extension-registered codegen'd graft_cosine — proves the SQL surface
    * and the function injection work end to end.
    */
  def cosineRankingSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(
      """SELECT e.vec_id,
        | round(graft_cosine(CAST(e.embedding AS ARRAY<DOUBLE>), q.v), 4) AS cosine
        |FROM embeddings e
        |CROSS JOIN (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS v
        |            FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id
        |LIMIT 20""".stripMargin)
  }

  /** Correlated EXISTS subquery: customers holding at least one urgent
    * open order. Catalyst rewrites the correlated EXISTS into a left semi
    * join (RewritePredicateSubquery) — no per-row re-execution; the subquery
    * becomes one join keyed on the correlation column.
    */
  def existsSubquerySql(spark: SparkSession, sfDir: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT'
        |    AND o.o_orderstatus = 'O')""".stripMargin)
  }

  /** Scalar subquery + NOT IN: parts priced above the corpus-wide average
    * that no BUILDING-segment customer ever ordered. The scalar average
    * plans as a one-row broadcast; the NOT IN becomes a null-aware left
    * anti join.
    */
  def scalarSubquerySql(spark: SparkSession, sfDir: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(
      """SELECT p_partkey, p_retailprice
        |FROM part
        |WHERE p_retailprice > (SELECT round(sum(p_retailprice), 2) / count(*) FROM part)
        |  AND p_partkey NOT IN (
        |    SELECT l.l_partkey
        |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |    JOIN customer c ON o.o_custkey = c.c_custkey
        |    WHERE c.c_mktsegment = 'BUILDING' AND l.l_quantity > 45)""".stripMargin)
  }
}
