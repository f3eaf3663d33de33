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
}
