package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftSession

/** Extensions need their own session (withExtensions at build time), so this
  * suite builds one with a distinct app name rather than using the shared
  * test session.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would return the shared plain session; stop-and-rebuild
    // is intrusive. Instead register the same pieces on the shared session's
    // cloned state via newSession + manual injection is not public API —
    // so: build once with extensions if no active session, else register
    // the function/rule directly through the experimental hooks.
    val s = GraftSession.local(4)
    s.experimental.extraOptimizations ++= Seq(ApproxDistinctRewrite)
    s.sessionState.functionRegistry.registerFunction(
      GraftExtensions.cosineFunction._1,
      GraftExtensions.cosineFunction._2,
      GraftExtensions.cosineFunction._3)
    s
  }

  test("graft_cosine is callable from SQL text") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("graft_jaccard is callable from SQL text; null arrays score NULL") {
    val r = spark.sql(
      "SELECT graft_jaccard(array('a','b'), array('b','c')) AS j")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0 / 3.0) < 1e-12)
    // modern size semantics are baked in: null input → NULL score, even
    // though the session default is legacy sizeOfNull
    assert(spark.sql(
      "SELECT graft_jaccard(CAST(NULL AS ARRAY<STRING>), array('a')) AS j")
      .collect().head.isNullAt(0))
    // wrong arity surfaces as AnalysisException, like every built-in
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_jaccard(array('a'))").collect()
    }
    assert(e.getMessage.contains("graft_jaccard"))
  }

  test("SQL theta join on graft_jaccard is planned by SimilarityJoinRewrite") {
    val s = spark
    import s.implicits._
    Seq((1L, Seq("x", "y", "z")), (2L, Seq("x", "y")))
      .toDF("id", "arr").createOrReplaceTempView("sim_l")
    Seq((10L, Seq("x", "y", "q")), (11L, Seq("q", "r")))
      .toDF("id", "arr").createOrReplaceTempView("sim_r")
    spark.conf.set("spark.graft.similarityJoinRewrite", "true")
    try {
      val df = spark.sql(
        """SELECT a.id AS ida, b.id AS idb FROM sim_l a JOIN sim_r b
          |ON graft_jaccard(a.arr, b.arr) >= 0.5""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_sim_elem"), s"rewrite did not fire:\n$plan")
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 10L), (2L, 10L))) // 2/4 = 0.5 and 2/3
    } finally spark.conf.set("spark.graft.similarityJoinRewrite", "false")
  }

  test("approxDistinct rule rewrites count(distinct) only when enabled") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => (i % 7, i % 101)).toDF("g", "x")
    df.createOrReplaceTempView("approx_t")
    val q = "SELECT g, count(DISTINCT x) AS d FROM approx_t GROUP BY g"

    spark.conf.set("spark.graft.approxDistinct", "false")
    val exact = spark.sql(q).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exact.values.forall(_ === 101L))

    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val plan = spark.sql(q).queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), s"rule did not fire:\n$plan")
      val approx = spark.sql(q).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // HLL++ at default rsd must be within 5% here
      assert(approx.values.forall(v => math.abs(v - 101L) <= 6))
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }
}
