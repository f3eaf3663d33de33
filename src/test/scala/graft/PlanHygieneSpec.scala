package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

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

  /** The bins-never-docs window contract (VERDICT r10 item 2), machine-
    * checked instead of living in scaladoc: a `Window.orderBy` with NO
    * partitionBy funnels its whole input through one task — acceptable
    * ONLY when the input grain is bounded by construction (a histogram,
    * a spine, a capped sample — never a corpus-scale grain) or when
    * WindowGroupLimit caps the rows reaching it (rank<=k pushdown).
    * Every empty-partitionSpec WindowExec in every gated plan must be
    * either group-limited in its own subtree or covered by an allowlist
    * entry NAMING the bound. A new query that reintroduces a full-grain
    * global window — or a regression in q367/q375/q218's RangedRank
    * routing — fails this sweep by name.
    */
  /** (named bound, EXPECTED window count): the count pins the exact
    * number of empty-partitionSpec windows the entry admits, so an
    * allowlisted query that later GAINS a new unbounded global window
    * fails by name instead of riding the existing entry.
    */
  private val boundedGlobalWindows: Map[String, (String, Int)] = Map(
    // see also orderSpecFingerprints below: the count alone would admit
    // swapping an allowlisted bounded-grain window for a DIFFERENT
    // unbounded one at the same count (r11 advice)
    "q108_zipf_audit" ->
      ("rank window above the TakeOrdered top-k vocab cut (k = 1000 rows)", 1),
    "q120_survivor_mix" ->
      ("share-of-total window over the |sources| grain (handful of labels)", 1),
    "q129_hybrid_rrf" ->
      ("both rank windows sit above top-k limits (bm25Rank k / .limit(k), k = 50)", 2),
    "q152_gini_activity" ->
      ("window over the per-user activity-count HISTOGRAM (<= max per-user events; bins, never users)", 1),
    "q155_vocab_coverage" ->
      ("rank window above the TakeOrdered max(ks) vocab cut", 1),
    "q165_stickiness" ->
      ("window over the calendar date grid (<= span days)", 1),
    "q170_skyline_docs" ->
      ("prefix-max over the distinct doc-LENGTH table (<= max tokens per doc; bins, never docs)", 1),
    "q175_retention_curve" ->
      ("suffix count over the day-offset grid (<= span days)", 1),
    "q181_session_sizes" ->
      ("total window over the session-size histogram (<= longest session; bins, never events)", 1),
    "q190_bounce_exit" ->
      ("entry-total window over the bounded event_type domain (5 values)", 1),
    "q222_heaps_curve" -> ("window over the 10-row decile table", 1),
    "q227_cusum_changepoint" ->
      ("cumsum windows over the calendar day spine (<= span days)", 2),
    "q241_simhash_sweep" ->
      ("cumulative window over the 4-row threshold rollup", 1),
    "q259_ship_lag" ->
      ("cumulative + total windows over the ship-lag histogram (lag domain, days)", 2),
    "q264_activity_heatmap" ->
      ("day-total window over <= 168 hour-of-week cells", 1),
    "q265_session_return_gaps" ->
      ("windows over the gap-hour histogram (capped by the observation window)", 2),
    "q269_heaps_projection" -> ("window over the 10-row decile table", 1),
    "q270_revenue_concentration" ->
      ("windows over the <= 40-row balance-band table", 2),
    "q273_session_peak_rate" ->
      ("total window over the peak-rate histogram (bins, never sessions)", 1),
    "q276_dedup_degrees" ->
      ("total window over the degree histogram (<= max near-dup degree)", 1),
    "q278_order_priority_mix" ->
      ("total window over the <= 5x3 priority-status cell grid", 1),
    "q302_mahalanobis_outliers" ->
      ("rank window above TakeOrderedAndProject .limit(k), k = 20 rows", 1),
    "q314_quality_lift" ->
      ("running-sum window over the 10-row decile rollup", 1),
    "q349_coreset_quantiles" ->
      ("cumulative-weight windows over the kept coreset (N/step rows; step sized to the summary budget)", 2),
    "q351_conformal_forecast" ->
      ("windows over the day-grain residual table (<= span days)", 3),
    "q352_decision_stump" ->
      ("argmax window over the (feature x distinct-threshold) candidate table (bounded feature domains; pre-binned at web scale)", 1),
    "q358_hits_bipartite" ->
      ("normalizer windows over the |event-type| authority table (<= 5 rows x pinned rounds)", 5),
    "q359_sprt_daily" -> ("window over the day spine (<= span days)", 1),
    "q372_ams_f2" -> ("rank window over the 8-row sketch-accumulator table", 1),
    "q373_page_hinkley" ->
      ("three windows over the calendar day spine (<= span days)", 3),
    "q375_qini_curve" ->
      ("cumulative window over the 10-row decile rollup", 1))

  /** md5-prefix fingerprint of each allowlisted query's SORTED global-
    * window orderSpec sql strings — pins WHICH windows the entry admits,
    * not just how many: swapping a bounded-grain window for a different
    * unbounded one at the same count now fails by name with the actual
    * orderings in the message (update the pin only after re-verifying
    * the named bound still holds for the NEW ordering).
    */
  private def orderFp(ws: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(ws.sorted.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  private val orderSpecFingerprints: Map[String, String] = Map(
    "q108_zipf_audit" -> "b8e542d4",
    "q120_survivor_mix" -> "d41d8cd9", // empty orderSpec (total window)
    "q129_hybrid_rrf" -> "5f8900fd",
    "q152_gini_activity" -> "d6b17d7f",
    "q155_vocab_coverage" -> "b8e542d4",
    "q165_stickiness" -> "891e4c56",
    "q170_skyline_docs" -> "c196e6c6",
    "q175_retention_curve" -> "3cb51f07",
    "q181_session_sizes" -> "d41d8cd9",
    "q190_bounce_exit" -> "d41d8cd9",
    "q222_heaps_curve" -> "61ff02fc",
    "q227_cusum_changepoint" -> "f0c6d630",
    "q241_simhash_sweep" -> "13fa8c4d",
    "q259_ship_lag" -> "27f89850",
    "q264_activity_heatmap" -> "d41d8cd9",
    "q265_session_return_gaps" -> "762f55d0",
    "q269_heaps_projection" -> "61ff02fc",
    "q270_revenue_concentration" -> "627f1ce1",
    "q273_session_peak_rate" -> "d41d8cd9",
    "q276_dedup_degrees" -> "d41d8cd9",
    "q278_order_priority_mix" -> "d41d8cd9",
    "q302_mahalanobis_outliers" -> "68393866",
    "q314_quality_lift" -> "61ff02fc",
    "q349_coreset_quantiles" -> "a267c135",
    "q351_conformal_forecast" -> "1605b2c8",
    "q352_decision_stump" -> "766388b1",
    "q358_hits_bipartite" -> "59d7d64d",
    "q359_sprt_daily" -> "2137866c",
    "q372_ams_f2" -> "1e88003f",
    "q373_page_hinkley" -> "3750c12b",
    "q375_qini_curve" -> "61ff02fc")

  test("global windows are top-k-limited or on an allowlisted bounded grain") {
    val found: Seq[(String, Seq[String])] =
      SparkEntry.queries.keys.toSeq.sorted.map { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.sparkPlan
        name -> plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty &&
              w.collectFirst { case g: WindowGroupLimitExec => g }.isEmpty =>
            w.orderSpec.map(_.sql).mkString(", ")
        }
      }
    val offenders = found.flatMap { case (name, ws) =>
      boundedGlobalWindows.get(name) match {
        case None if ws.nonEmpty =>
          Some(s"$name: ${ws.size} global window(s) ordered by ${ws.mkString(" | ")}")
        case Some((_, expected)) if ws.nonEmpty && ws.size != expected =>
          // a NEW global window behind an existing entry is exactly the
          // regression class this sweep exists for — fail on count drift
          Some(s"$name: allowlist admits $expected global window(s), plan " +
            s"has ${ws.size} (ordered by ${ws.mkString(" | ")})")
        case Some(_) if ws.nonEmpty &&
            !orderSpecFingerprints.get(name).contains(orderFp(ws)) =>
          Some(s"$name: orderSpec fingerprint ${orderFp(ws)} != pinned " +
            s"${orderSpecFingerprints.getOrElse(name, "<missing>")} " +
            s"(ordered by ${ws.mkString(" | ")})")
        case _ => None
      }
    }
    assert(offenders.isEmpty,
      "unallowlisted single-partition windows:\n" + offenders.mkString("\n"))
    // allowlist hygiene: an entry for a query that no longer plans a
    // global window (deleted, or routed through RangedRank) is stale —
    // it would silently re-admit a future regression
    val live = found.toMap
    val stale = boundedGlobalWindows.keys.toSeq.sorted
      .filter(n => live.get(n).forall(_.isEmpty))
    assert(stale.isEmpty,
      s"stale allowlist entries (query gone or window fixed): $stale")
  }
}
