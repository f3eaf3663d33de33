package graft

import org.apache.spark.sql.execution.FormattedMode

/** Whole-surface plan hygiene: EVERY gated query's physical plan is
  * checked for the one shape that is never acceptable at scale — a
  * CartesianProduct (unbroadcast cross join: |L|·|R| rows through the
  * cluster with no key). PlanShapeSpec pins richer per-query contracts;
  * this sweep guarantees the floor holds for all 300+ queries including
  * every future addition, so a regression in any query's join planning
  * fails the suite by name.
  *
  * BroadcastNestedLoopJoin is deliberately allowed: the corpus uses it
  * only with a broadcast (bounded) build side — the q29 ANN contract and
  * the A11 one-row aggregate combines.
  */
class PlanHygieneSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("no gated query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.explainString(FormattedMode)
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
