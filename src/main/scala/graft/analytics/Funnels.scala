package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Num.dec

/** Sequential funnel and cohort-retention analytics — the real versions of
  * the reference's commented-out funnel report (spark_batch_job.py:102-119
  * counted distinct users per step with no ordering; a funnel requires the
  * steps to happen IN ORDER).
  *
  * Funnel shape: ONE hash-shuffle on user_id, then three chained full-frame
  * window mins (step N's predicate reads step N-1's window value) and a
  * final per-user aggregate that reuses the same distribution — no joins,
  * no repeated event scans.
  */
object Funnels {

  /** First-occurrence ordered funnel view → click → purchase: per user the
    * earliest time of each step that occurs strictly after the previous
    * step's first occurrence, and the resulting depth 0-3.
    *
    * Plan: single Exchange(user_id) feeding three WindowExecs (unbounded
    * frame — the per-user step time is constant across the user's rows) and
    * a HashAggregate on the same key. The aggregate's max() just collapses
    * the per-row copies of that constant.
    */
  def funnelDepth(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"),
        max(col("t_click")).as("t_click"),
        max(col("t_purchase")).as("t_purchase"))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (when(col("t_view").isNotNull, 1).otherwise(0)
          + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
          .cast("int").as("funnel_depth"))
  }

  /** Weekly cohort retention: users grouped by first-activity week, counted
    * in each subsequent week they were active. One pass to anchor each
    * user's cohort (aggregate + broadcast-joinable), one to count
    * (cohort_week, week_offset) cells.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.distinct().join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * P(next event type | current event type) with transition counts — the
    * behavioral fingerprint behind "what do users do after add_to_cart",
    * next-event prediction baselines, and bot detection (bots have
    * near-deterministic rows). Consecutive pairs come from `lead` over
    * (ts, event_id) within each user — the deterministic order the
    * sessionizers already rely on.
    *
    * Scale shape: ONE hash-shuffle on user_id feeds the window; the pair
    * counts are a map-side-combinable aggregate on the (tiny)
    * |types|²-keyed matrix, and the row-normalizing totals join is
    * |types|-sized — broadcast by construction. Output is metadata-sized
    * at any corpus scale.
    */
  /** RFM segmentation: per-user Recency (days from last event to the
    * corpus anchor date), Frequency (event count), Monetary (summed
    * purchase value) with pinned band scores 1–3 each and the classic
    * segment labels — the user-value rollup every e-commerce session
    * pipeline serves to marketing. Bands are PINNED thresholds, not
    * data-dependent quantiles: reproducible across engines and runs, and
    * at corpus scale a quantile cut would need a sketch pass anyway.
    *
    * Scale shape: one user-keyed aggregate; the anchor date is a one-row
    * broadcast (the q12 pattern — no driver collect); band scoring is
    * map-side arithmetic.
    */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame =
    rfmSegmentsOf(Tables.events(spark, sfDir))

  /** [[rfmSegments]] over an arbitrary events frame — the core the
    * half-period [[rfmMigration]] runs once per half (each half anchors
    * on its OWN max date).
    */
  def rfmSegmentsOf(ev: DataFrame): DataFrame = {
    val anchor = ev.agg(max(to_date(col("ts"))).as("anchor_date"))
    val base = ev.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_date"),
        count(lit(1)).as("frequency"),
        round(sum(when(col("event_type") === "purchase" && col("value").isNotNull,
          col("value")).otherwise(lit(0.0))), 2).as("monetary"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("anchor_date"), col("last_date")).cast("long"))
    val r = when(col("recency_days") <= 7, 3)
      .when(col("recency_days") <= 30, 2).otherwise(1)
    val f = when(col("frequency") >= 50, 3)
      .when(col("frequency") >= 10, 2).otherwise(1)
    val m = when(col("monetary") >= 500.0, 3)
      .when(col("monetary") >= 50.0, 2).otherwise(1)
    base.select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), r.as("r_score"), f.as("f_score"), m.as("m_score"))
      .withColumn("segment",
        when(col("r_score") === 3 && col("f_score") === 3 && col("m_score") === 3, "champion")
          .when(col("r_score") >= 2 && col("f_score") >= 2, "loyal")
          .when(col("r_score") === 1 && col("f_score") >= 2, "at_risk")
          .when(col("r_score") >= 2 && col("f_score") === 1, "new")
          .otherwise("hibernating"))
  }

  /** RFM segment MIGRATION between the first and second half of the
    * observation window: users counted by (segment-then, segment-now)
    * cell, with `absent` standing in for users active in only one half —
    * the customer-base flow report behind every "are champions churning"
    * review, built from two [[rfmSegmentsOf]] runs that each anchor on
    * their own half's end. The calendar midpoint (d0 + ⌊span/2⌋) splits
    * the halves deterministically.
    *
    * Scale shape: two half-filtered user rollups (map-side combinable)
    * full-outer-joined on user_id, collapsed to a ≤ 6×6 matrix.
    */
  def rfmMigration(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val mid = ev.agg(min(to_date(col("ts"))).as("d0"),
      max(to_date(col("ts"))).as("d1"))
      .select(expr("date_add(d0, CAST(datediff(d1, d0) DIV 2 AS INT))")
        .as("mid"))
    val tagged = ev.crossJoin(broadcast(mid))
    def half(pred: org.apache.spark.sql.Column) =
      rfmSegmentsOf(tagged.where(pred).drop("mid"))
        .select(col("user_id"), col("segment"))
    half(to_date(col("ts")) < col("mid"))
      .withColumnRenamed("segment", "seg_from")
      .join(half(to_date(col("ts")) >= col("mid"))
        .withColumnRenamed("segment", "seg_to"), Seq("user_id"), "full")
      .select(coalesce(col("seg_from"), lit("absent")).as("seg_from"),
        coalesce(col("seg_to"), lit("absent")).as("seg_to"))
      .groupBy(col("seg_from"), col("seg_to"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user purchase cadence: gap statistics (days) between consecutive
    * purchases — the repeat-buy rhythm behind churn prediction and
    * replenishment timing; only users with ≥ 2 purchases report (one
    * purchase has no cadence). Gaps are integer day diffs over the
    * (ts, event_id)-ordered purchase stream; the mean divides exact
    * integer sums, so the output is engine-exact.
    *
    * Scale shape: the purchase filter is map-side; one user-keyed window
    * for the lag and one user-keyed aggregate — same single-shuffle
    * distribution reused.
    */
  def purchaseCadence(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("prev_ts").isNotNull)
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(col("prev_ts"))).cast("long").as("gap_days"))
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_days")).as("min_gap"),
        max(col("gap_days")).as("max_gap"),
        round(sum(col("gap_days")).cast("double") / count(lit(1)), 6).as("mean_gap"))
  }

  /** Item co-occurrence with lift over (user, day) baskets: which items
    * appear together more often than independence predicts — the
    * market-basket association baseline behind "bought together" and
    * session-item recommendation candidates. lift(i,j) =
    * P(i,j)/(P(i)·P(j)) as basket ratios; > 1 means genuine affinity.
    *
    * Scale shape: the distinct (basket, item) stream shuffles on the
    * basket key; the pair self-join explodes per basket (bounded by a
    * day's distinct items per user — screen hub users with q146's bot
    * flag upstream, or add a basket-size filter: same plan, one
    * predicate); item marginals and the basket total are
    * vocabulary-/one-row-sized broadcasts. Output ≤ |items|².
    */
  def itemCooccurrence(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .where(col("item").isNotNull)
      .distinct()
    val tot = items.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val ic = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day")
          && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item1"), col("b.item").as("item2"))
      .agg(count(lit(1)).as("n_pairs"))
    pairs
      .join(broadcast(ic.select(col("item").as("item1"), col("n_item").as("n_item1"))), "item1")
      .join(broadcast(ic.select(col("item").as("item2"), col("n_item").as("n_item2"))), "item2")
      .crossJoin(broadcast(tot))
      .select(col("item1"), col("item2"), col("n_pairs"),
        col("n_item1"), col("n_item2"),
        round(col("n_pairs").cast("double") * col("n_baskets")
          / (col("n_item1") * col("n_item2")), 6).as("lift"))
  }

  /** Per-user behavioral entropy: Shannon entropy (nats) of each user's
    * event-type distribution, with a bot-likeness flag — scripted clients
    * repeat one or two actions (entropy → 0) while organic users mix
    * types; the standard first-cut bot screen next to [[transitionMatrix]]
    * ("near-deterministic rows"). Flag = high-volume AND low-entropy, so
    * thin users (whose entropy estimate is meaningless) never flag.
    *
    * Determinism: per-type terms −p·ln(p) round once at 6 dp and sum as
    * ×10⁶ fixed-point longs (q103 recipe; ln per the q90 contract).
    * Scale shape: one (user, type) map-side-combinable aggregate, then a
    * |users|-keyed rollup — no window, no join.
    */
  def userEntropy(spark: SparkSession, sfDir: String,
      minEvents: Long = 20L, flagBelow: Double = 0.5): DataFrame = {
    val ut = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val tot = ut.groupBy(col("user_id")).agg(sum(col("c")).as("n_events"))
    val p = col("c").cast("double") / col("n_events")
    ut.join(tot, "user_id")
      .select(col("user_id"), col("n_events"),
        round(-p * log(p), 6).as("term"))
      .groupBy(col("user_id"))
      .agg(min(col("n_events")).as("n_events"),
        count(lit(1)).as("n_types"),
        round(sum(round(col("term") * 1e6).cast("long")).cast("double") / 1e6, 6)
          .as("entropy"))
      .select(col("user_id"), col("n_events"), col("n_types"), col("entropy"),
        (col("n_events") >= minEvents && col("entropy") < flagBelow)
          .cast("int").as("bot_like"))
  }

  /** Per-user inter-event burstiness B = (σ−μ)/(σ+μ) (Goh & Barabási,
    * EPL 2008) over whole-second event gaps: B → −1 is a PERIODIC client
    * (σ ≈ 0 — cron-scheduled bots), B ≈ 0 Poisson-like organic traffic,
    * B → 1 extreme bursts. The inter-arrival-shape screen completing the
    * trio with [[userEntropy]] (what they do) and
    * [[transitionMatrix]] (in what order); users need > `minGaps` gaps so
    * the σ estimate means something.
    *
    * Determinism: gaps are floor-divided microsecond diffs (exact
    * integers); Σg and Σg² accumulate as decimal(38,0) (HUGEINT in the
    * oracle — g² overflows a long on multi-week gaps); σ =
    * √(n·Σg² − (Σg)²)/n and μ = Σg/n evaluate in IEEE doubles with
    * identical op order both sides (sqrt is correctly rounded), rounding
    * once at 6 dp. σ+μ = 0 (a user whose every gap is 0 s) yields null.
    *
    * Scale shape: one user-keyed window for the lag and one user-keyed
    * aggregate on the same distribution — the q149 shape.
    */
  def burstiness(spark: SparkSession, sfDir: String,
      minGaps: Long = 5L): DataFrame =
    burstinessOf(Tables.events(spark, sfDir), minGaps)

  /** [[burstiness]] over an arbitrary events frame — the fixture-testable
    * core.
    */
  def burstinessOf(ev: DataFrame, minGaps: Long = 5L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = ev
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .where(col("prev_us").isNotNull)
      .withColumn("g", expr("(unix_micros(ts) - prev_us) DIV 1000000"))
    val stats = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(dec(col("g"))).as("sg"),
        sum(dec(col("g")) * dec(col("g"))).as("sg2"))
      .where(col("n_gaps") >= minGaps)
    val nD = col("n_gaps").cast("double")
    val mu = col("sg").cast("double") / nD
    val sigma = sqrt((dec(col("n_gaps")) * col("sg2")
      - col("sg") * col("sg")).cast("double")) / nD
    stats.select(col("user_id"), col("n_gaps"),
      round(mu, 6).as("mean_gap_s"),
      round(sigma, 6).as("std_gap_s"),
      when(sigma + mu > 0, round((sigma - mu) / (sigma + mu), 6))
        .as("burstiness"))
  }

  /** Gini concentration of user activity: how unequally events distribute
    * across users — the one-number inequality reading of the traffic
    * (0 = every user equally active, → 1 = a handful of users generate
    * everything; a sudden jump is the classic bot-cohort arrival signal
    * next to [[userEntropy]]'s per-user flag).
    *
    * Exact, not sampled: Gini = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over
    * rank-sorted per-user counts, computed from the COUNT HISTOGRAM —
    * for each distinct activity level c with multiplicity m starting at
    * exclusive rank s, Σ 2i·xᵢ over the tie block is c·(2·m·s + m·(m+1)),
    * so the whole statistic needs only the histogram, never a global
    * per-user ranking. All sums are decimal(38,0) (HUGEINT-exact in the
    * oracle, the q132 recipe); the two divisions happen once, on the
    * final one-row frame, rounded at 6 dp.
    *
    * Scale shape: one user-keyed aggregate, one histogram aggregate
    * (|distinct counts| rows — bounded by max per-user activity, not by
    * |users|), and a single-partition window over that bounded histogram
    * (the q87 bins-never-docs contract).
    */
  def giniConcentration(spark: SparkSession, sfDir: String): DataFrame =
    giniOfCounts(Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c")))

  /** [[giniConcentration]] over an arbitrary (user, c) count frame — the
    * fixture-testable core.
    */
  def giniOfCounts(cnt: DataFrame): DataFrame = {
    val h = cnt.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("start", sum(col("m")).over(w) - col("m"))
      .select(
        (dec(col("c")) * (lit(2) * dec(col("m")) * dec(col("start"))
          + dec(col("m")) * (dec(col("m")) + lit(1)))).as("rs2"),
        (dec(col("c")) * dec(col("m"))).as("tot"),
        col("m"))
      .agg(sum(col("rs2")).as("srs2"), sum(col("tot")).as("tot"),
        sum(col("m")).as("n"))
      .select(col("n").cast("long").as("n_users"),
        col("tot").cast("long").as("total_events"),
        round(col("srs2").cast("double")
          / (col("n").cast("double") * col("tot").cast("double"))
          - (col("n").cast("double") + lit(1)) / col("n").cast("double"), 6)
          .as("gini"))
  }

  /** Conversion-lag histogram: integer days from each user's FIRST event
    * to their FIRST purchase, for users who ever purchase — the
    * time-to-convert distribution behind attribution-window sizing (how
    * long must a campaign wait before writing a visitor off) next to
    * [[funnelDepth]]'s step view. Bounded output: one row per distinct
    * lag day with user count and converter share.
    *
    * Scale shape: one user-keyed conditional aggregate (no window — min
    * and conditional min collapse in one pass), a bounded histogram
    * aggregate, and a one-row total broadcast.
    */
  def conversionLag(spark: SparkSession, sfDir: String): DataFrame = {
    val firsts = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_date"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("first_purchase_date"))
      .where(col("first_purchase_date").isNotNull)
      .select(datediff(col("first_purchase_date"), col("first_date"))
        .cast("long").as("lag_days"))
    val tot = firsts.agg(count(lit(1)).as("n_converters"))
    firsts.groupBy(col("lag_days"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("lag_days"), col("n_users"),
        round(col("n_users").cast("double")
          / col("n_converters").cast("double"), 6).as("share"))
  }

  /** Daily winback report: how many users RETURNED each day after a
    * dormancy of ≥ `dormantDays` days — the re-engagement time series a
    * growth team reads next to [[cohortRetention]] (retention says who
    * stays; this says who comes back). A return day is the first event
    * after a qualifying gap; two dormancies cannot end on the same day
    * for one user (the gap after a return is 0), so the distinct-user
    * count equals the resurrection count.
    *
    * Scale shape: one user-keyed window for the lag (the q149/q154
    * distribution) and one bounded per-day aggregate.
    */
  def winbackReport(spark: SparkSession, sfDir: String,
      dormantDays: Int = 2): DataFrame =
    winbackReportOf(Tables.events(spark, sfDir), dormantDays)

  /** [[winbackReport]] over an arbitrary events frame. */
  def winbackReportOf(ev: DataFrame, dormantDays: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("prev_ts").isNotNull &&
        datediff(to_date(col("ts")), to_date(col("prev_ts"))) >= dormantDays)
      .groupBy(to_date(col("ts")).as("return_date"))
      .agg(countDistinct(col("user_id")).as("n_resurrected"))
  }

  /** Distinct (user_id, day) activity table — the shared first stage of
    * [[stickinessOf]], [[newVsReturningOf]] and [[retentionCurveOf]]; one
    * definition so the user-day convention cannot drift between them.
    */
  private def userDays(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()

  /** Per-user first active day over a [[userDays]] table. */
  private def firstDays(ud: DataFrame): DataFrame =
    ud.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))

  /** DAU/WAU stickiness: per active day, the distinct users active that
    * day (DAU), the distinct users active in the trailing `windowDays`
    * days (WAU), and their ratio — the engagement-frequency number
    * (what share of the weekly audience shows up on a given day).
    *
    * The rolling distinct count is NOT computed as a windowed
    * count-distinct (no such aggregate) nor as a day×window range join
    * over user-days (a `windowDays`× blowup of the biggest table).
    * Instead each user's active-day sequence becomes disjoint coverage
    * intervals — active day a covers [a, a+w-1], truncated at the next
    * active day — and WAU(d) is an interval-stabbing count: +1/−1
    * deltas at interval ends, prefix-summed over the DATE GRID. The
    * single-partition running-sum window touches only distinct dates
    * (thousands of rows at any corpus scale), never user-days — the
    * q87 bins-never-docs contract applied to time.
    *
    * Scale shape: one user-day distinct (user-keyed), one user-keyed
    * lag window, one date-keyed delta aggregate, one bounded date-grid
    * window.
    */
  def stickiness(spark: SparkSession, sfDir: String,
      windowDays: Int = 7): DataFrame =
    stickinessOf(Tables.events(spark, sfDir), windowDays)

  /** [[stickiness]] over an arbitrary events frame — the fixture-testable
    * core.
    */
  def stickinessOf(ev: DataFrame, windowDays: Int = 7): DataFrame = {
    val days = userDays(ev)
    val wu = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val iv = days
      .withColumn("next_day", lead(col("day"), 1).over(wu))
      .withColumn("end_excl",
        when(col("next_day").isNotNull &&
            col("next_day") < date_add(col("day"), windowDays), col("next_day"))
          .otherwise(date_add(col("day"), windowDays)))
    val dau = days.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    // active days enter the grid with delta 0 so the running sum is
    // defined on every day DAU reports (interval ends may fall later)
    val deltas = iv.select(col("day").as("d"), lit(1L).as("delta"))
      .unionByName(iv.select(col("end_excl").as("d"), lit(-1L).as("delta")))
      .unionByName(dau.select(col("day").as("d"), lit(0L).as("delta")))
      .groupBy(col("d")).agg(sum(col("delta")).as("delta"))
    val wd = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wau = deltas.withColumn("wau", sum(col("delta")).over(wd))
      .select(col("d").as("day"), col("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("stickiness"))
  }

  /** New-vs-returning daily mix: per active day, how many of the day's
    * users are seen for the FIRST time ever vs returning — the
    * acquisition/retention split of the daily audience, the companion
    * series to [[winbackReport]] (which counts only the resurrected
    * subset of returners).
    *
    * Scale shape: one user-day distinct, one user-keyed min aggregate
    * folded back by a user-keyed join (both sides pre-aggregated to
    * user grain — no broadcast needed, no raw-event shuffle), one
    * bounded per-day rollup.
    */
  def newVsReturning(spark: SparkSession, sfDir: String): DataFrame =
    newVsReturningOf(Tables.events(spark, sfDir))

  /** [[newVsReturning]] over an arbitrary events frame. */
  def newVsReturningOf(ev: DataFrame): DataFrame = {
    val ud = userDays(ev)
    val first = firstDays(ud)
    ud.join(first, "user_id")
      .groupBy(col("day"))
      .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
        .as("n_new"),
        sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
          .as("n_returning"))
      .select(col("day"), col("n_new"), col("n_returning"),
        round(col("n_new").cast("double")
          / (col("n_new") + col("n_returning")).cast("double"), 6)
          .as("new_frac"))
  }

  /** Daily volume anomalies: per (event_type, day) count z-scored against
    * that type's own 30-day history — the ops-dashboard alarm (a traffic
    * spike, a silent drop, an error burst) on the same series
    * [[transitionMatrix]] reads structurally.
    *
    * Determinism: the moments are exact — daily counts are integers and
    * Σn, Σn² accumulate as decimal(38,0) (HUGEINT in the oracle; a
    * 100 TB day count squared overflows a long, the q132/q154 recipe).
    * z = (n − μ)/σ evaluates in IEEE doubles with identical op order
    * both sides (σ via correctly-rounded sqrt of the integer variance
    * numerator), rounded once at 6 dp; a zero-variance type yields null
    * z and is never flagged.
    *
    * Scale shape: one (type, day) aggregate, one bounded per-type moment
    * aggregate (|types| rows) broadcast back onto the daily series.
    */
  def dailyAnomalies(spark: SparkSession, sfDir: String,
      zThresh: Double = 2.0): DataFrame =
    dailyAnomaliesOf(Tables.events(spark, sfDir), zThresh)

  /** [[dailyAnomalies]] over an arbitrary events frame. */
  def dailyAnomaliesOf(ev: DataFrame, zThresh: Double = 2.0): DataFrame = {
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("n_events"))).as("s1"),
        sum(dec(col("n_events")) * dec(col("n_events"))).as("s2"))
    val nD = col("n_days").cast("double")
    val mu = col("s1").cast("double") / nD
    val sigma = sqrt((dec(col("n_days")) * col("s2")
      - col("s1") * col("s1")).cast("double")) / nD
    val z = (col("n_events").cast("double") - mu) / sigma
    daily.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("day"), col("n_events"),
        when(sigma > 0, round(z, 6)).as("z_score"),
        when(sigma > 0 && abs(z) > zThresh, 1).otherwise(0)
          .cast("int").as("is_anomaly"))
  }

  /** Cohort LTV triangle: per (first-activity-week cohort, week offset),
    * purchase count, revenue, cumulative revenue, and cumulative revenue
    * per cohort user — the lifetime-value read laid over
    * [[cohortRetention]]'s activity triangle (retention says who is
    * still here; this says what they have been worth so far).
    *
    * Determinism: revenue sums are raw-double money sums on the 0.01
    * grid (the determinism-audit carve-out — the true sum sits ~0.005
    * from any rounding boundary), rounded at 2 dp per cell before the
    * cumulative window re-sums the already-rounded cells in pinned
    * week-offset order.
    *
    * Scale shape: the q48 anchor aggregate, one (cohort, offset)-keyed
    * rollup, a window over the bounded offset grid WITHIN each cohort
    * (≤ weeks-of-history rows per cohort — bins, never purchases), and
    * a metadata-sized cohort-size broadcast.
    */
  def cohortLtv(spark: SparkSession, sfDir: String): DataFrame =
    cohortLtvOf(Tables.events(spark, sfDir))

  /** [[cohortLtv]] over an arbitrary events frame. */
  def cohortLtvOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"), col("value"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy(col("cohort_week")).agg(count(lit(1)).as("n_users"))
    val weekly = ev.where(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly.withColumn("cum_revenue", round(sum(col("revenue")).over(w), 2))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_purchases"),
        col("revenue"), col("cum_revenue"), col("n_users"),
        round(col("cum_revenue") / col("n_users"), 6).as("ltv_per_user"))
  }

  /** Day-N retention curve: for each day offset N, the share of users
    * active exactly N days after their OWN first day — the flattened
    * all-cohorts read of [[cohortRetention]]'s weekly triangle, with the
    * right-censoring handled honestly: the denominator at offset N is
    * only the users whose first day is ≥ N days before the corpus's last
    * day (a user who joined yesterday cannot count against day-7
    * retention).
    *
    * Scale shape: one user-day distinct, one user-keyed min + join (the
    * q166 shape), then everything runs on the OFFSET grid: the
    * numerator is an offset-keyed aggregate, the denominator a
    * suffix-count window over the bounded max-offset histogram (active
    * offsets enter the grid with mass 0 so the step function is defined
    * everywhere it is read — the q165 grid trick), and the final join is
    * offset-keyed over #days rows.
    */
  def retentionCurve(spark: SparkSession, sfDir: String): DataFrame =
    retentionCurveOf(Tables.events(spark, sfDir))

  /** [[retentionCurve]] over an arbitrary events frame. */
  def retentionCurveOf(ev: DataFrame): DataFrame = {
    val ud = userDays(ev)
    val first = firstDays(ud)
    val active = ud.join(first, "user_id")
      .groupBy(datediff(col("day"), col("first_day")).cast("long")
        .as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val maxDay = ud.agg(max(col("day")).as("max_day"))
    val moHist = first.crossJoin(broadcast(maxDay))
      .groupBy(datediff(col("max_day"), col("first_day")).cast("long")
        .as("max_offset"))
      .agg(count(lit(1)).as("m"))
    val grid = moHist
      .unionByName(active.select(col("offset_days").as("max_offset"),
        lit(0L).as("m")))
      .groupBy(col("max_offset")).agg(sum(col("m")).as("m"))
    val wd = Window.orderBy(col("max_offset").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val denom = grid.withColumn("n_eligible", sum(col("m")).over(wd))
      .select(col("max_offset").as("offset_days"), col("n_eligible"))
    active.join(denom, "offset_days")
      .select(col("offset_days"), col("n_active"), col("n_eligible"),
        round(col("n_active").cast("double") / col("n_eligible"), 6)
          .as("retention"))
  }

  /** First-order transition counts over per-user event streams — the
    * shared distributed stage of [[transitionMatrix]] and
    * [[stationaryDistribution]]: one user-keyed lead window, one
    * (from, to)-keyed aggregate to |types|² rows.
    */
  private def transitionCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  def transitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = transitionCounts(spark, sfDir)
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("n_from"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") / col("n_from"), 6).as("p_next"))
  }

  /** Stationary distribution of the [[transitionMatrix]] chain: where a
    * user's event stream spends its time in the long run — the one-vector
    * summary that ranks states by steady-state visit share (an
    * error-state's stationary mass is the "how stuck do users get"
    * number the raw transition row can't give).
    *
    * Power iteration in ×10¹² integer fixed-point (the q91 PageRank
    * recipe): p′(t) = Σₛ ⌊p(s)·n(s,t) / n(s)⌋, `iters` rounds from the
    * uniform start over states with outgoing mass — every term is exact
    * integer arithmetic, so both engines (and the oracle's unrolled CTE
    * chain) produce bit-identical `p_fp`. Truncation leaks ≤|edges|
    * units of 10⁻¹² mass per round by design — determinism is worth more
    * than the 15th decimal.
    *
    * Scale shape: the corpus-scale work — counting transitions over the
    * event stream — is the distributed [[transitionCounts]] stage. The
    * chain solve itself runs on the driver over the collected counts:
    * |event-type vocabulary|² cells, METADATA-sized by construction (the
    * TrainedCodebook discipline, not a corpus-sized collect — cf. the
    * distributed q91 iteration, which walks a corpus-sized graph).
    */
  def stationaryDistribution(spark: SparkSession, sfDir: String,
      iters: Int = 20): DataFrame = {
    val edges = transitionCounts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outTotals = edges.groupBy(_._1).map { case (f, es) =>
      f -> es.map(e => BigInt(e._3)).sum
    }
    val scale = BigInt("1000000000000")
    var p: Map[String, BigInt] =
      outTotals.keys.map(_ -> scale / outTotals.size).toMap
    for (_ <- 1 to iters) {
      val next = scala.collection.mutable.Map.empty[String, BigInt]
        .withDefaultValue(BigInt(0))
      for ((f, t, n) <- edges if p.contains(f))
        next(t) += p(f) * n / outTotals(f)
      p = next.toMap
    }
    val s = spark
    import s.implicits._
    p.toSeq.map { case (st, v) => (st, v.toLong) }.sortBy(_._1)
      .toDF("state", "p_fp")
      .select(col("state"), col("p_fp"),
        round(col("p_fp").cast("double") / lit(1e12), 6).as("stationary_p"))
  }

  /** Time-constrained ordered funnel (the windowFunnel of event
    * analytics): per user, the EARLIEST-ANCHOR greedy chain — t₁ = first
    * `stages(0)`, t₂ = first `stages(1)` after t₁, … — counted as reaching
    * stage k iff tₖ − t₁ ≤ `horizonSec`. One row per stage with the user
    * count and the conversion ratios against the first and previous
    * stages. Greedy-from-earliest is the deterministic contract (a
    * backtracking chain search is exponential and rarely what a funnel
    * dashboard means).
    *
    * Scale shape: each stage is one filtered scan aggregated per user
    * (map-side combine) joined to the previous stage's per-user row on
    * the user key — `stages.length − 1` equality shuffles on user_id,
    * nothing quadratic; the final rollup collapses to one row before the
    * stage rows are stacked.
    */
  def windowFunnel(spark: SparkSession, sfDir: String,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      horizonSec: Long = 604800L): DataFrame = {
    require(stages.length == 3, "windowFunnel: exactly 3 stages")
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val u1 = ev.where(col("event_type") === stages(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val u2 = ev.where(col("event_type") === stages(1))
      .join(u1, Seq("user_id")).where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
    val u3 = ev.where(col("event_type") === stages(2))
      .join(u2, Seq("user_id")).where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"), min(col("t1")).as("t1"))
    def inWin(t: org.apache.spark.sql.Column, t1: org.apache.spark.sql.Column) =
      unix_micros(t) - unix_micros(t1) <= horizonSec * 1000000L
    val one = u1.agg(count(lit(1)).as("n1"))
      .crossJoin(u2.agg(sum(when(inWin(col("t2"), col("t1")), 1L)
        .otherwise(0L)).as("n2")))
      .crossJoin(u3.agg(sum(when(inWin(col("t3"), col("t1")), 1L)
        .otherwise(0L)).as("n3")))
      .select(col("n1"), coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("n3"), lit(0L)).as("n3"))
    // stage names land in a SQL literal — escape quotes so a caller-
    // supplied name cannot break the stack() expression
    val esc = stages.map(_.replace("'", "''"))
    val stacked = one.selectExpr(
      "stack(3, " +
        s"1, '${esc(0)}', n1, n1, " +
        s"2, '${esc(1)}', n2, n1, " +
        s"3, '${esc(2)}', n3, n2) " +
        "AS (step, stage, n_users, n_prev)")
      .crossJoin(broadcast(one.select(col("n1").as("n_first"))))
    stacked.select(col("step"), col("stage"), col("n_users"),
      when(col("n_first") === 0, lit(null).cast("double"))
        .otherwise(round(col("n_users").cast("double") / col("n_first"), 6))
        .as("conv_from_first"),
      when(col("n_prev") === 0, lit(null).cast("double"))
        .otherwise(round(col("n_users").cast("double") / col("n_prev"), 6))
        .as("conv_from_prev"))
  }

  /** Markov removal-effect attribution over acquisition channels (the
    * utm_source derivation of q17): sessions become channel journeys
    * (consecutive duplicates collapsed) with absorbing `conv` (session
    * contains a purchase) / `drop` ends plus a `start` state; the
    * first-order chain's start→conv probability is solved by `iters`
    * value-iteration rounds, then re-solved with each channel's inbound
    * transitions redirected to `drop` — the removal effect (Anderl et al.,
    * "Mapping the customer journey", IJRM 2016). A channel's attribution
    * share is its normalized conversion drop — the budget-allocation
    * number last-touch attribution gets structurally wrong.
    *
    * Determinism: the chain solve runs in ×10¹² truncating-integer fixed
    * point (the q91/q172 recipe) on exact transition counts, so every
    * emitted `*_fp` is bit-exact in both engines; doubles appear only in
    * final 6-dp-rounded ratios.
    *
    * Scale shape: the corpus-scale work — sessionizing the event stream
    * and counting channel transitions — is one user-keyed window pass and
    * one (src, dst)-keyed rollup. The chain solve runs on the driver over
    * the collected counts: |channels + 3|² cells, METADATA-sized by
    * construction (the [[stationaryDistribution]] discipline), and the
    * 1 + |channels| scenarios re-use the same collected table.
    */
  def removalAttribution(spark: SparkSession, sfDir: String,
      iters: Int = 12): DataFrame = {
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val channel: org.apache.spark.sql.Column = element_at(
      array(lit("facebook"), lit("google"), lit("tiktok_ads"), lit("organic")),
      (get_json_object(col("props"), "$.k").cast("int") % 4) + 1)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        channel.as("ch"),
        (col("event_type") === "purchase").cast("int").as("is_p"))
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(wUser).isNull
          || unix_micros(col("ts"))
            - unix_micros(lag(col("ts"), 1).over(wUser)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    val wSessAll = Window.partitionBy(col("user_id"), col("sid"))
    val collapsed = ev
      .withColumn("conv", max(col("is_p")).over(wSessAll))
      .withColumn("prev_ch", lag(col("ch"), 1).over(wSess))
      .where(col("prev_ch").isNull || col("prev_ch") =!= col("ch"))
      .withColumn("next_ch", lead(col("ch"), 1).over(wSess))
    val transitions = collapsed
      .where(col("prev_ch").isNull)
      .select(lit("start").as("src"), col("ch").as("dst"))
      .union(collapsed.where(col("next_ch").isNotNull)
        .select(col("ch").as("src"), col("next_ch").as("dst")))
      .union(collapsed.where(col("next_ch").isNull)
        .select(col("ch").as("src"),
          when(col("conv") === 1, "conv").otherwise("drop").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val edges = transitions.collect()
      .map(r => (r.getString(0), r.getString(1), BigInt(r.getLong(2))))
    val totals = edges.groupBy(_._1).map { case (f, es) => f -> es.map(_._3).sum }
    val scale = BigInt("1000000000000")
    def solve(removed: Option[String]): BigInt = {
      val redirected = edges.map { case (f, t, n) =>
        (f, if (removed.contains(t)) "drop" else t, n)
      }
      var v: Map[String, BigInt] =
        totals.keys.map(_ -> BigInt(0)).toMap ++
          Seq("conv" -> scale, "drop" -> BigInt(0))
      for (_ <- 1 to iters) {
        val next = scala.collection.mutable.Map.empty[String, BigInt]
          .withDefaultValue(BigInt(0))
        for ((f, t, n) <- redirected) next(f) += n * v.getOrElse(t, BigInt(0))
        v = totals.map { case (f, tot) => f -> next(f) / tot } ++
          Seq("conv" -> scale, "drop" -> BigInt(0))
      }
      v("start")
    }
    val pBase = solve(None)
    // the channel domain is the utm mapping's codomain, PINNED — deriving
    // it from observed start-edges would drop a channel that only ever
    // appears mid-journey (it still relays conversions, so its removal
    // effect is well-defined and the oracle emits its row)
    val channels = Seq("facebook", "google", "tiktok_ads", "organic")
    val rows = channels.map { c =>
      val pc = solve(Some(c))
      (c, pc, pBase - pc)
    }
    val sumRe = rows.map(_._3).sum
    val s = spark
    import s.implicits._
    rows.toSeq.map { case (c, pc, re) =>
      (c, pBase.toLong, pc.toLong, re.toLong)
    }.toDF("channel", "p_base_fp", "p_removed_fp", "removal_effect_fp")
      .select(col("channel"), col("p_base_fp"), col("p_removed_fp"),
        col("removal_effect_fp"),
        round(col("removal_effect_fp").cast("double") / lit(1e12), 6)
          .as("removal_effect"),
        if (sumRe == 0) lit(null).cast("double").as("attribution")
        else round(col("removal_effect_fp").cast("double") / lit(sumRe.toDouble), 6)
          .as("attribution"))
  }

  /** Half-life-decayed engagement score per user: each event's cent value
    * weighted by 2^−⌊age/7d⌋ relative to the newest event day — the
    * recency-weighted LTV/engagement rank that a winback list (q164) or
    * churn model wants instead of the flat lifetime sum (q12). Week
    * granularity keeps the weights EXACT powers of two: contributions are
    * cents·2^(8−k) integer longs (k clamped at 8 — ≥8-week-old activity
    * saturates at weight 1/256), summed exactly; the only float ops are
    * one division by 25600 (2⁸·100) and the 6-dp round.
    *
    * Scale shape: the anchor day is a broadcast one-row aggregate (the
    * A11/q12 recipe — no driver collect); scoring is then one map pass
    * over events and one user-keyed map-side-combinable sum.
    */
  def decayEngagement(spark: SparkSession, sfDir: String,
      maxK: Int = 8): DataFrame = {
    val weights = array((0 to maxK).map(k => lit(1L << (maxK - k))): _*)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    ev.crossJoin(broadcast(ev.agg(max(col("day")).as("d1"))))
      .withColumn("k",
        least(floor(datediff(col("d1"), col("day")) / 7), lit(maxK))
          .cast("int"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents") * element_at(weights, col("k") + 1))
          .as("decayed_fp"))
      .withColumn("decayed_value",
        round(col("decayed_fp").cast("double") / (100.0 * (1L << maxK)), 6))
  }

  /** Backtest of the q140 Markov next-event predictor: train the
    * argmax-transition model on the first `trainDays` days of the stream,
    * then score it on every later transition — per prior event type, the
    * prediction, test-transition count, hits, and accuracy. This closes
    * the transition-matrix loop the way q203 closes q187's: a model table
    * is only trustworthy once its out-of-sample hit rate is a measured
    * number (the sequence-model sanity check behind session-based
    * recommenders and bot detectors).
    *
    * Deterministic: integer counts; argmax ties break to the
    * lexicographically smallest next type; one final division.
    *
    * Scale shape: one window pass over user-partitioned events builds all
    * transitions (the q140 stage); the train/test split is a map-side flag
    * off a broadcast one-row min-day aggregate; the model is
    * |event types|² rows, broadcast into the test-side rollup. Prior
    * types unseen in training are excluded by the inner join (no model
    * row to score).
    */
  def nextEventBacktest(spark: SparkSession, sfDir: String,
      trainDays: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_day", lead(to_date(col("ts")), 1).over(w))
      .where(col("next_type").isNotNull)
      .withColumnRenamed("event_type", "from_type")
    val d0 = Tables.events(spark, sfDir)
      .agg(min(to_date(col("ts"))).as("d0"))
    val tagged = pairs.crossJoin(broadcast(d0))
      .withColumn("is_test",
        col("next_day") > date_add(col("d0"), trainDays - 1))
      .select(col("from_type"), col("next_type"), col("is_test"))
    val mw = Window.partitionBy(col("from_type"))
      .orderBy(col("c").desc, col("next_type"))
    val model = tagged.where(!col("is_test"))
      .groupBy(col("from_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(mw))
      .where(col("rn") === 1)
      .select(col("from_type"), col("next_type").as("predicted_type"))
    tagged.where(col("is_test"))
      .join(broadcast(model), Seq("from_type"))
      .groupBy(col("from_type"), col("predicted_type"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("next_type") === col("predicted_type"), 1L)
          .otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n_test"), 6))
  }

  /** Two-proportion z-test scaffold for an A/B readout: users split into
    * arms by id parity (the stand-in for an assignment column), metric =
    * "did the user ever purchase", and the pooled two-proportion z
    * statistic with the ±1.96 significance verdict — the minimal
    * experimentation primitive every event pipeline ends up needing, with
    * the same determinism contract as the q220 Wilson bounds (exact
    * integer counts into one explicitly-shaped IEEE expression tree; the
    * flag compares the ROUNDED statistic).
    *
    * Scale shape: one user-keyed conversion rollup (map-side combinable),
    * then a two-row arm aggregate pivoted into one row.
    */
  def abConversionZtest(spark: SparkSession, sfDir: String): DataFrame = {
    // unit = user-DAY (a day with >= 1 purchase converts): granular
    // enough that neither arm degenerates to all-converted even on small
    // fixtures, which would zero the pooled variance
    val userDays = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("conv"))
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
    val arms = userDays.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("x"))
    val wide = arms.groupBy()
      .agg(max(when(col("arm") === 0, col("n"))).as("n_a"),
        max(when(col("arm") === 0, col("x"))).as("conv_a"),
        max(when(col("arm") === 1, col("n"))).as("n_b"),
        max(when(col("arm") === 1, col("x"))).as("conv_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("conv_a").cast("double") / na
    val pb = col("conv_b").cast("double") / nb
    val pool = (col("conv_a") + col("conv_b")).cast("double") / (na + nb)
    val varTerm =
      pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb)
    // zero pooled variance (all or none converted in both arms) has no
    // defined z — publish NULL rather than an engine-specific 0/0
    val z = when(varTerm > 0, (pa - pb) / sqrt(varTerm))
    wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round(z, 6).as("z_stat"))
      .withColumn("significant_5pct",
        when(col("z_stat").isNull, lit(0))
          .otherwise((abs(col("z_stat")) > lit(1.96)).cast("int")))
  }

  /** A/B POWER companion to [[abConversionZtest]]: with the observed arm
    * sizes and pooled conversion rate, the minimum detectable effect at
    * α = 5% (two-sided) and 80% power — MDE = (z_{α/2} + z_β)·
    * √(2p̄(1−p̄)/n̄) with the normal quantiles pinned as literals
    * (1.959964, 0.841621). The number an experiment reviewer checks
    * BEFORE reading q228's verdict: a non-significant z with an MDE
    * above the effect anyone cares about is an underpowered test, not a
    * negative result.
    *
    * Determinism: exact integer counts into one pinned IEEE tree.
    *
    * Scale shape: the q228 unit rollup (map-side combinable), a two-row
    * arm aggregate, one output row.
    */
  def abPowerMde(spark: SparkSession, sfDir: String): DataFrame = {
    val userDays = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("conv"))
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
    val arms = userDays.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("x"))
    val wide = arms.groupBy()
      .agg(max(when(col("arm") === 0, col("n"))).as("n_a"),
        max(when(col("arm") === 0, col("x"))).as("conv_a"),
        max(when(col("arm") === 1, col("n"))).as("n_b"),
        max(when(col("arm") === 1, col("x"))).as("conv_b"))
    val pool = ((col("conv_a") + col("conv_b")).cast("double")
      / (col("n_a") + col("n_b")).cast("double"))
    // z_{α/2} + z_β pre-summed as ONE literal: both engines parse the
    // same decimal string to the same double, where a computed sum of
    // two parsed doubles could differ by an ulp
    val mde = lit(2.801585) *
      sqrt(pool * (lit(1.0) - pool)
        * (lit(1.0) / col("n_a").cast("double")
          + lit(1.0) / col("n_b").cast("double")))
    wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(pool, 6).as("p_pooled"),
      round(mde, 6).as("mde_abs"),
      round(mde / pool, 6).as("mde_rel"))
  }

  /** Per-user Markov PERPLEXITY under the corpus transition model: the
    * mean surprisal −ln p(next|current) of a user's consecutive event
    * transitions, scored against [[transitionMatrix]]'s global
    * first-order chain. The cross-user companion to q146's entropy: that
    * measures how mixed a user's OWN behavior is; this measures how
    * UNLIKE EVERYONE ELSE it is — replay bots and scripted crawlers sit
    * at the extremes (too predictable or impossibly erratic), which is
    * why behavioral-curation passes score it.
    *
    * Determinism: transition probabilities are ratios of exact counts;
    * each surprisal is rounded once onto the ×10⁶ grid and summed in
    * fixed point per user (the q71 recipe); one final division.
    *
    * Scale shape: one user-keyed lead window over the event stream, the
    * |types|²-bounded model broadcast onto it, one user-keyed rollup.
    */
  def userPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("next_type").as("to_type"))
    val counts = trans.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_ft"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n_ft")).as("n_from"))
    val model = counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"),
        round(-log(col("n_ft").cast("double") / col("n_from")) * 1e6, 0)
          .cast("long").as("s_fp"))
    trans.join(broadcast(model), Seq("from_type", "to_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_transitions"), sum(col("s_fp")).as("sum_fp"))
      .select(col("user_id"), col("n_transitions"),
        round(col("sum_fp").cast("double") / 1e6 / col("n_transitions"), 6)
          .as("mean_surprisal"))
  }

  /** Per-USER curation verdict — the behavioral q61: compose the
    * low-entropy/high-volume screen ([[userEntropy]]), the Markov
    * perplexity bands ([[userPerplexity]]: too predictable under the
    * corpus chain with real volume, or impossibly erratic), and the
    * session replay score ([[graft.analytics.Sessions.userReplayScore]])
    * into one keep/drop row per user — the filter a clickstream corpus
    * runs before its events become training data, exactly as q61 gates
    * documents. Thresholds are pinned constants (reproducible,
    * sketch-free), and a user missing a signal (no transitions, no
    * sessions) simply doesn't flag on it.
    *
    * Scale shape: three user-keyed rollups (each one shuffle on user_id,
    * shapes documented at their sources) meet in two user-keyed joins;
    * flags and the verdict are map-side.
    */
  def userCurationDecisions(spark: SparkSession, sfDir: String,
      surprisalLow: Double = 1.0, surprisalHigh: Double = 2.5,
      replayMin: Double = 0.5): DataFrame = {
    val ent = userEntropy(spark, sfDir)
      .select(col("user_id"), col("n_events"), col("entropy"),
        col("bot_like").as("flag_entropy"))
    val per = userPerplexity(spark, sfDir)
      .select(col("user_id"), col("n_transitions"), col("mean_surprisal"))
    val rep = graft.analytics.Sessions.userReplayScore(spark, sfDir)
      .select(col("user_id"), col("n_sessions"), col("replay_frac"))
    ent
      .join(per, Seq("user_id"), "left")
      .join(rep, Seq("user_id"), "left")
      .withColumn("flag_perplexity", coalesce(
        ((col("n_transitions") >= 20 && col("mean_surprisal") < surprisalLow)
          || col("mean_surprisal") > surprisalHigh).cast("int"), lit(0)))
      .withColumn("flag_replay", coalesce(
        (col("n_sessions") >= 5 && col("replay_frac") >= replayMin)
          .cast("int"), lit(0)))
      .select(col("user_id"), col("n_events"), col("entropy"),
        col("mean_surprisal"), col("replay_frac"),
        col("flag_entropy"), col("flag_perplexity"), col("flag_replay"),
        (lit(1) - greatest(col("flag_entropy"), col("flag_perplexity"),
          col("flag_replay"))).as("keep"))
  }

  /** Kaplan–Meier retention survival curve at week grain: per lifetime
    * week k, the users still at risk, the churn events (users whose
    * observed lifetime ended at week k AND whose last activity predates
    * the final corpus week), the right-censored users (lifetime k but
    * still active in the last 7 days — we have NOT seen them churn), the
    * discrete hazard d/r, and the KM survival estimate Π_{j≤k}(1−h_j).
    * Right-censoring is the whole point: a naive "1 − CDF of lifetimes"
    * counts every currently-active user as churned at today's age and
    * systematically underestimates retention.
    *
    * Determinism: hazards and the survival product are ×10¹² truncating
    * integer fixed point (the q91/q172 recipe) — the product loop is
    * SEQUENTIAL in k, so it runs on the driver over the collected
    * week table (|weeks| rows — metadata-sized at any corpus scale),
    * matching the oracle's recursive CTE step for step.
    *
    * Scale shape: the corpus-scale work is one user-keyed min/max
    * aggregate (map-side combinable); everything after lives on the
    * week-grain table.
    */
  def survivalCurve(spark: SparkSession, sfDir: String): DataFrame =
    survivalCurveOf(spark, Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")))

  /** [[survivalCurve]] over an arbitrary (user_id, day) activity frame. */
  def survivalCurveOf(spark: SparkSession, ev: DataFrame): DataFrame = {
    val life = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("f"), max(col("day")).as("l"))
    val byWeek = life
      .crossJoin(broadcast(ev.agg(max(col("day")).as("dmax"))))
      .select(floor(datediff(col("l"), col("f")) / 7).cast("int").as("wk"),
        (datediff(col("dmax"), col("l")) < 7).cast("int").as("censored"))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("n_end"), sum(col("censored")).as("n_cens"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val scale = BigInt("1000000000000")
    var atRisk = byWeek.map(_._2).sum
    var surv = scale
    val rows = byWeek.map { case (wk, nEnd, nCens) =>
      val churn = nEnd - nCens
      val hazardFp = (BigInt(churn) * scale / atRisk).toLong
      surv = surv * (atRisk - churn) / atRisk
      val row = (wk, atRisk, churn, nCens, hazardFp, surv.toLong)
      atRisk -= nEnd
      row
    }
    val s = spark
    import s.implicits._
    rows.toSeq
      .toDF("wk", "n_at_risk", "n_churned", "n_censored", "hazard_fp",
        "survival_fp")
      .withColumn("survival",
        round(col("survival_fp").cast("double") / lit(1e12), 6))
  }

  /** Spearman rank correlation between per-user activity metrics — the
    * robust (monotone-invariant) answer to "do heavier users show up on
    * more days / buy more", immune to the heavy-tailed count
    * distributions that wreck a raw Pearson (q132 correlates FEATURES;
    * this ranks USERS). Ties take midranks, the textbook treatment.
    *
    * Determinism: midranks are held as DOUBLED integers (2·midrank =
    * 2·min_rank + tie_count − 1, always integral), so every rank moment
    * is an exact Decimal(38,0) sum and ρ materializes through the q191
    * Pearson tree — scale-invariance of ρ absorbs the doubling.
    *
    * Scale shape: ranking never sorts users globally — each metric
    * collapses to its VALUE DISTRIBUTION (events-per-user and
    * days-per-user are bounded domains: one is capped by per-user volume
    * quotas, the other by the calendar), ranks come from a ranged
    * two-pass cumulative count over that distribution table
    * ([[graft.operators.RangedRank]] — no single-partition window even
    * over the grain), and users join their rank by value key. The only
    * corpus-scale stages are the user rollup and two bounded-domain
    * equality joins.
    */
  def spearmanActivity(spark: SparkSession, sfDir: String): DataFrame =
    spearmanActivityOf(Tables.events(spark, sfDir))

  /** [[spearmanActivity]] over an arbitrary events frame — the
    * fixture-testable core.
    */
  def spearmanActivityOf(ev: DataFrame): DataFrame = {
    // localCheckpoint: three ranked() calls each feed RangedRank, whose
    // range sampling evaluates its input twice — without this the event
    // scan + user rollup ran up to six times (r16)
    val users = ev
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(to_date(col("ts"))).as("n_days"),
        sum((col("event_type") === "purchase").cast("long"))
          .as("n_purchases"))
      .localCheckpoint()
    def ranked(metric: String): DataFrame = {
      val d = users.groupBy(col(metric).as("v"))
        .agg(count(lit(1)).as("c"))
      graft.operators.RangedRank.withGlobalRank(d, Seq(col("v")),
          "vr", Seq("c" -> "cum")).df
        .select(col("v").as(metric),
          // 2·midrank = 2·(cum − c + 1) + (c − 1)
          (lit(2) * (col("cum") - col("c") + 1) + col("c") - 1)
            .as(s"r2_$metric"))
    }
    def rho(x: String, y: String, name: String): DataFrame = {
      val rx = col(s"r2_$x")
      val ry = col(s"r2_$y")
      val s = users
        .join(broadcast(ranked(x)), Seq(x))
        .join(broadcast(ranked(y)), Seq(y))
        .agg(dec(count(lit(1))).as("n"),
          sum(dec(rx)).as("s1"), sum(dec(ry)).as("s2"),
          sum(dec(rx) * rx).as("s11"), sum(dec(ry) * ry).as("s22"),
          sum(dec(rx) * ry).as("s12"))
      s.select(lit(name).as("metric_pair"), col("n").cast("long").as("n_users"),
        round((col("n") * col("s12") - col("s1") * col("s2")).cast("double")
          / (sqrt((col("n") * col("s11") - col("s1") * col("s1")).cast("double"))
            * sqrt((col("n") * col("s22") - col("s2") * col("s2"))
              .cast("double"))), 6).as("spearman_rho"))
    }
    rho("n_events", "n_days", "events_vs_days")
      .unionAll(rho("n_events", "n_purchases", "events_vs_purchases"))
  }

  /** Scoreboard for a pinned-weight logistic conversion model: per
    * user-day, p(purchase) from non-purchase activity (event count and
    * type breadth — the label's own events are excluded from the
    * features), then log-loss, Brier score and accuracy@0.5 against the
    * observed purchase label — the q87-style calibration story turned
    * into the three standard proper-scoring numbers a model gate reads.
    *
    * Determinism: the feature→probability map is one pinned IEEE tree
    * (ln/exp are the q90/q137-precedent transcendentals); each unit's
    * loss terms are rounded once to the 6-dp grid and summed as exact
    * integers (q103 recipe), so the corpus means are order-independent.
    *
    * Scale shape: one map-side-combinable (user, day) rollup, then a
    * zero-shuffle scoring projection and one global fixed-point
    * aggregate — nothing downstream exceeds one row.
    */
  def logisticEval(spark: SparkSession, sfDir: String): DataFrame =
    logisticEvalOf(Tables.events(spark, sfDir))

  /** [[logisticEval]] over an arbitrary events frame — the
    * fixture-testable core.
    */
  def logisticEvalOf(ev: DataFrame): DataFrame = {
    val units = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        sum((col("event_type") =!= "purchase").cast("long")).as("n_feat"),
        count_distinct(when(col("event_type") =!= "purchase",
          col("event_type"))).as("k_types"),
        max((col("event_type") === "purchase").cast("int")).as("y"))
    val z = lit(-3.0) + lit(0.45) * log(lit(1.0) + col("n_feat")) +
      lit(0.35) * col("k_types")
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val scored = units.withColumn("p", p)
      .withColumn("ll_fp", round(
        -(col("y") * log(col("p")) +
          (lit(1) - col("y")) * log(lit(1.0) - col("p"))) * 1e6, 0)
        .cast("long"))
      .withColumn("br_fp", round(
        (col("p") - col("y")) * (col("p") - col("y")) * 1e6, 0).cast("long"))
      .withColumn("hit",
        ((col("p") >= 0.5).cast("int") === col("y")).cast("long"))
    scored.agg(count(lit(1)).as("n_units"), sum(col("y")).as("n_converted"),
        sum(col("ll_fp")).as("ll"), sum(col("br_fp")).as("br"),
        sum(col("hit")).as("h"))
      .select(col("n_units"), col("n_converted"),
        round(col("ll").cast("double") / 1e6 / col("n_units"), 6)
          .as("log_loss"),
        round(col("br").cast("double") / 1e6 / col("n_units"), 6)
          .as("brier"),
        round(col("h").cast("double") / col("n_units"), 6).as("accuracy"))
  }

  /** Directed association rules (q331) over the q148 basket grain
    * ((user, day) sessions, `props.$.k` items): for every ordered item
    * pair (antecedent → consequent) with joint support ≥ `minSupport`
    * baskets, the four numbers a recommender or merchandising rule needs
    * — support, confidence P(cons|ant), lift, and conviction
    * (1−P(cons))/(1−conf), the "rule fails how much less often than
    * chance" odds ratio. q148 stops at the undirected lift; rules are
    * DIRECTED (confidence and conviction are asymmetric), which is what
    * makes them actionable.
    *
    * Determinism: every count is an exact integer; each metric is one
    * double expression over those integers rounded at 6 dp — conviction
    * computed as the single integer-ratio form
    * (n_baskets−n_cons)·n_ant / ((n_ant−n_both)·n_baskets), NULL for
    * confidence-1 rules (infinite conviction).
    *
    * Scale shape: identical to q148 — the basket self-join explodes per
    * basket, so baskets are CAPPED at `maxItemsPerBasket` distinct items
    * (deterministic: the smallest item ids win, via a per-basket
    * row_number on the same (user, day) key the self-join shuffles on —
    * the Sessions.scala:373 collect_list discipline applied to the pair
    * source). Without the cap one power-user basket funnels k² pairs
    * through a single join key; with it the per-basket work is ≤ cap².
    * The default 32 is 3× the observed gate-scale maximum (10 at
    * sf0.01), so the cap is a pure scale guard there — but it is part of
    * the operator's CONTRACT (the oracle ranks and caps identically), not
    * a silent truncation. Marginals, the basket total, and the pair
    * counts all read the SAME capped basket, so the metrics stay mutually
    * consistent. Output ≤ |items|².
    */
  def associationRules(spark: SparkSession, sfDir: String,
      minSupport: Long = 2L, maxItemsPerBasket: Int = 32): DataFrame = {
    val items = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .where(col("item").isNotNull)
      .distinct()
    associationRulesOf(spark, items, minSupport, maxItemsPerBasket)
  }

  /** [[associationRules]] over an arbitrary distinct (user_id, day, item)
    * basket frame — the fixture-testable core.
    */
  def associationRulesOf(spark: SparkSession, rawItems: DataFrame,
      minSupport: Long = 2L, maxItemsPerBasket: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("item"))
    // localCheckpoint: FOUR consumers read the capped basket frame (the
    // basket total, the item marginals, and both sides of the pair
    // self-join) — without it each consumer re-runs the events scan +
    // props JSON parse + distinct + cap window (r16, guide §2.4/§5:
    // measured 2.0 s warm → 1.4 s at sf0.1; the frame is
    // baskets·≤cap rows of three narrow columns)
    val items = rawItems
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxItemsPerBasket)
      .drop("__rk")
      .localCheckpoint()
    val tot = items.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val ic = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val rules = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day")
          && col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("antecedent"), col("b.item").as("consequent"))
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minSupport)
    rules
      .join(broadcast(ic.select(col("item").as("antecedent"),
        col("n_item").as("n_ant"))), "antecedent")
      .join(broadcast(ic.select(col("item").as("consequent"),
        col("n_item").as("n_cons"))), "consequent")
      .crossJoin(broadcast(tot))
      .select(col("antecedent"), col("consequent"),
        col("n_both"), col("n_ant"), col("n_cons"),
        round(col("n_both").cast("double") / col("n_baskets"), 6)
          .as("support"),
        round(col("n_both").cast("double") / col("n_ant"), 6)
          .as("confidence"),
        round(col("n_both").cast("double") * col("n_baskets")
          / (col("n_ant") * col("n_cons")), 6).as("lift"),
        when(col("n_ant") === col("n_both"), lit(null).cast("double"))
          .otherwise(round(
            ((col("n_baskets") - col("n_cons")) * col("n_ant")).cast("double")
              / ((col("n_ant") - col("n_both")) * col("n_baskets"))
                .cast("double"), 6)).as("conviction"))
  }

  /** Exact Shapley channel attribution (q374, Shapley 1953): each
    * non-purchase event type's fair share of conversion credit, computed
    * EXACTLY over all 2⁴ channel coalitions — v(S) = converted users
    * whose touched-channel set ⊆ S, φᵢ = Σ_S w(|S|)·(v(S∪{i}) − v(S))
    * with the 4-player weights ×24 ∈ {6,2,2,6}, so every Shapley value
    * is an exact ×24 integer and Σφ = v(N) − v(∅) exactly (the
    * efficiency axiom, asserted in the spec). The game-theoretic answer
    * to the q200 removal-effect heuristic.
    *
    * Scale shape: the corpus collapses to the 16-row mask table (one
    * user aggregate + one mask aggregate); the coalition algebra is
    * 16×16 bit-ops on that constant-sized table. At ANY corpus scale
    * the cost past the first aggregate is fixed — the exponential
    * coalition enumeration is in the CHANNEL count, pinned at 4.
    */
  def shapleyAttribution(spark: SparkSession, sfDir: String): DataFrame =
    shapleyAttributionOf(Tables.events(spark, sfDir))

  /** [[shapleyAttribution]] over an arbitrary events frame. */
  def shapleyAttributionOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val channels = Seq("click", "error", "signup", "view")
    val bit = channels.zipWithIndex.map { case (c, i) => c -> (1 << i) }
    val mask = bit.foldLeft(lit(0)) { case (acc, (c, b)) =>
      acc + max(when(col("event_type") === c, b).otherwise(0))
    }
    val users = events.groupBy(col("user_id"))
      .agg(mask.as("mask"),
        max((col("event_type") === "purchase").cast("long")).as("conv"))
    val byMask = users.groupBy(col("mask"))
      .agg(sum(col("conv")).as("n_conv"))
      .localCheckpoint() // <= 16 rows
    val coalitions = broadcast((0 until 16).toDF("s"))
    // v(S) = converted users whose mask is a subset of S
    val v = coalitions.join(byMask, expr("(mask & s) = mask"), "left")
      .groupBy(col("s"))
      .agg(coalesce(sum(col("n_conv")), lit(0L)).as("v"))
      .localCheckpoint()
    val w24 = Map(0 -> 6L, 1 -> 2L, 2 -> 2L, 3 -> 6L)
    val chan = broadcast(bit.map { case (c, b) => (c, b) }
      .toDF("channel", "b"))
    val marginals = chan
      .join(v.select(col("s"), col("v").as("v_with")),
        expr("(s & b) = b"))
      .join(v.select(col("s").as("s0"), col("v").as("v_without")),
        expr("s0 = s - b"))
      .select(col("channel"), col("s"),
        (col("v_with") - col("v_without")).as("marg"),
        expr("bit_count(s - b)").cast("int").as("ssize"))
    val wMap = typedLit(w24.map { case (k, x) => k -> x })
    marginals
      .withColumn("w24", wMap(col("ssize")))
      .groupBy(col("channel"))
      .agg(sum(col("marg") * col("w24")).as("shapley_x24"))
      .select(col("channel"), col("shapley_x24"),
        round(col("shapley_x24").cast("double") / 24.0, 6).as("shapley"))
  }

  /** Qini uplift curve (q375, Radcliffe 2007): users ranked by the q235
    * pinned conversion model (score ROUNDED at 6 dp before ranking —
    * raw exp/ln doubles could order differently across engines at the
    * last ulp; ties pin by the integer features and unit key), cut into
    * score deciles, and per decile the CUMULATIVE incremental
    * conversions Y_t − Y_c·N_t/N_c between the q228 arms — the curve
    * behind every uplift-model evaluation, exact integers through the
    * one ×10⁶ truncating division per decile.
    *
    * Scale shape: the unit grain is one aggregate; the decile cut is a
    * ranged two-pass rank ([[graft.operators.RangedRank]] — NO
    * single-partition window over the unit grain), whose partition
    * totals also supply the unit count n (the old separate
    * `units.count()` action is gone); cumulative cells are a 10-row
    * rollup of a grouped aggregate.
    */
  def qiniCurve(spark: SparkSession, sfDir: String): DataFrame =
    qiniCurveOf(Tables.events(spark, sfDir))

  /** [[qiniCurve]] over an arbitrary events frame. */
  def qiniCurveOf(ev: DataFrame): DataFrame = {
    val units = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        sum((col("event_type") =!= "purchase").cast("long")).as("n_feat"),
        count_distinct(when(col("event_type") =!= "purchase",
          col("event_type"))).as("k_types"),
        max((col("event_type") === "purchase").cast("int")).as("y"))
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
      .withColumn("p6", round(lit(1.0) / (lit(1.0) + exp(-(lit(-3.0)
        + lit(0.45) * log(lit(1.0) + col("n_feat"))
        + lit(0.35) * col("k_types")))), 6))
      // localCheckpoint: RangedRank's range sampling evaluates its input
      // a second time (r16) — here the event scan + unit rollup
      .localCheckpoint()
    val rr = graft.operators.RangedRank.withGlobalRank(units,
      Seq(col("p6").desc, col("n_feat").desc, col("k_types").desc,
        col("user_id"), col("day")), "r")
    val ranked = rr.df
    val n = rr.total
    val perDecile = ranked
      .withColumn("decile",
        least(lit(10L), expr(s"((r - 1) * 10) div $n + 1")).cast("int"))
      .groupBy(col("decile"))
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === 1, col("y").cast("long")).otherwise(0L))
          .as("yt"),
        sum(when(col("arm") === 0, col("y").cast("long")).otherwise(0L))
          .as("yc"))
    val wc = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDecile
      .withColumn("cnt", sum(col("nt")).over(wc))
      .withColumn("cnc", sum(col("nc")).over(wc))
      .withColumn("cyt", sum(col("yt")).over(wc))
      .withColumn("cyc", sum(col("yc")).over(wc))
      .select(col("decile"), col("cnt").as("n_treated"),
        col("cnc").as("n_control"), col("cyt").as("y_treated"),
        col("cyc").as("y_control"),
        (col("cyt") * 1000000L
          - expr("(cyc * cnt * 1000000) div cnc")).as("qini_fp"),
        (expr("(cyt * 1000000) div cnt")
          - expr("(cyc * 1000000) div cnc")).as("uplift_fp"))
  }

  /** Huffman code audit (q381, Huffman 1952): the optimal prefix code
    * for the event-type distribution, built by the classic two-smallest
    * merge with a PINNED total order (weight, then the lexicographically
    * smallest member type — node min-members are distinct because
    * members partition the alphabet, so ties are total), audited against
    * the Shannon bound: the ALL row carries total coded bits, the ×10⁶
    * average code length, and the ×10⁶ entropy (6-dp log2 fixed point) —
    * optimality means avg_len ∈ [H, H+1). The "how compressible is this
    * stream" number behind every log-compaction estimate.
    *
    * Scale shape: ONE frequency aggregate; the merge loop runs on the
    * |alphabet|-row table (driver-side here, |alphabet| = 5; the oracle
    * unrolls the same four merges declaratively). Code lengths depend
    * only on the frequency table, never the stream.
    */
  def huffmanAudit(spark: SparkSession, sfDir: String): DataFrame =
    huffmanAuditOf(Tables.events(spark, sfDir))

  /** [[huffmanAudit]] over an arbitrary events frame. */
  def huffmanAuditOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val freqs = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val total = freqs.map(_._2).sum
    // merge loop: nodes are (weight, min-member id, member set)
    var nodes = freqs.map { case (t, n) => (n, t, Set(t)) }
    val depth = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    while (nodes.size > 1) {
      val sorted = nodes.sortBy { case (w, id, _) => (w, id) }
      val (a, b) = (sorted(0), sorted(1))
      val merged = (a._1 + b._1,
        if (a._2 < b._2) a._2 else b._2, a._3 ++ b._3)
      merged._3.foreach(t => depth(t) += 1)
      nodes = sorted.drop(2) :+ merged
    }
    def s2fp(n: Long): Long =
      math.round(BigDecimal(math.log(total.toDouble / n)
        / math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6)
    val perType = freqs.map { case (t, n) =>
      (t, n, depth(t), n * depth(t), s2fp(n))
    }
    val totalBits = perType.map(_._4).sum
    val entropyFp = perType.map { case (_, n, _, _, s) => n * s }.sum / total
    val avgLenFp = (totalBits * 1000000L) / total
    (perType :+ (("ALL", total, 0, totalBits,
      0L))).toDF("event_type", "n_events", "code_len", "weighted_bits",
        "surprisal2_fp")
      .withColumn("avg_len_fp",
        when(col("event_type") === "ALL", lit(avgLenFp))
          .otherwise(lit(null).cast("long")))
      .withColumn("entropy_fp",
        when(col("event_type") === "ALL", lit(entropyFp))
          .otherwise(lit(null).cast("long")))
  }

  /** Reliability diagram + Murphy identity (q379, Murphy 1973): the q235
    * pinned conversion model binned on its own 4-dp score grid — per bin
    * the count, conversions, observed rate and the exact integer
    * calibration gap n·p₄ − y (×10⁴) — plus an ALL row carrying the
    * binned Brier score, the uncertainty term ȳ(1−ȳ), and their exact
    * difference REL − RES = Brier − UNC (the Murphy decomposition's
    * aggregate identity, computable with NO per-bin division: Brier =
    * (Σn·p₄² − 2·10⁴Σp₄y + 10⁸Y)/(N·10⁸) is one exact integer
    * numerator). The calibration readout every probability model ships
    * with; q87 normalizes scores, this audits them against outcomes.
    *
    * Scale shape: one unit aggregate, one bin aggregate on the ≤10⁴-row
    * score grid, a 1-row rollup.
    */
  def reliabilityDiagram(spark: SparkSession, sfDir: String): DataFrame =
    reliabilityDiagramOf(Tables.events(spark, sfDir))

  /** [[reliabilityDiagram]] over an arbitrary events frame. */
  def reliabilityDiagramOf(ev: DataFrame): DataFrame = {
    val units = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        sum((col("event_type") =!= "purchase").cast("long")).as("n_feat"),
        count_distinct(when(col("event_type") =!= "purchase",
          col("event_type"))).as("k_types"),
        max((col("event_type") === "purchase").cast("int")).as("y"))
      .select(round(round(lit(1.0) / (lit(1.0) + exp(-(lit(-3.0)
        + lit(0.45) * log(lit(1.0) + col("n_feat"))
        + lit(0.35) * col("k_types")))), 4) * 1e4).cast("long").as("p4"),
        col("y").cast("long").as("y"))
    val bins = units.groupBy(col("p4"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("y_sum"))
      .localCheckpoint() // score-grid-sized; reused by rows + rollup
    val tot = bins.agg(sum(col("n")).as("nn"), sum(col("y_sum")).as("yy"),
      sum(col("p4") * col("p4") * col("n")).as("spp"),
      sum(col("p4") * col("y_sum")).as("spy"))
    val all = tot.select(lit(-1L).as("p4_fp"), col("nn").as("n"),
      col("yy").as("y_sum"), lit(0L).as("gap_fp"),
      round(col("yy").cast("double") / col("nn").cast("double"), 6)
        .as("rate"),
      round((col("spp") - lit(20000L) * col("spy")
          + lit(100000000L) * col("yy")).cast("double")
        / (col("nn").cast("double") * 1e8), 6).as("brier"),
      round(col("yy").cast("double") * (col("nn") - col("yy"))
          .cast("double")
        / (col("nn").cast("double") * col("nn").cast("double")), 6)
        .as("unc"))
      .withColumn("rel_minus_res", round(col("brier") - col("unc"), 6))
    bins.select(col("p4").as("p4_fp"), col("n"), col("y_sum"),
        (col("p4") * col("n") - col("y_sum") * 10000L).as("gap_fp"),
        round(col("y_sum").cast("double") / col("n").cast("double"), 6)
          .as("rate"),
        lit(null).cast("double").as("brier"),
        lit(null).cast("double").as("unc"),
        lit(null).cast("double").as("rel_minus_res"))
      .unionByName(all)
  }

  /** Overdispersion audit (q377): per event type, the variance-to-mean
    * ratio of ZERO-FILLED daily counts and the Poisson dispersion
    * statistic χ² = Σ(x−x̄)²/x̄ = (n·Σx² − S²)/S — the "is a Poisson
    * model even admissible" check that decides whether rate alarms can
    * use √mean bands or need the negative-binomial widening. Count
    * moments are exact integers; each ratio is one double expression.
    *
    * Scale shape: one (day, type) aggregate, the zero-fill grid join on
    * the calendar × |types| frame, one moment rollup per type.
    */
  def overdispersion(spark: SparkSession, sfDir: String): DataFrame =
    overdispersionOf(Tables.events(spark, sfDir))

  /** [[overdispersion]] over an arbitrary events frame. */
  def overdispersionOf(events: DataFrame): DataFrame = {
    val cell = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    val days = cell.select(col("day")).distinct()
    val grid = days
      .crossJoin(broadcast(cell.select(col("event_type")).distinct()))
      .join(cell, Seq("day", "event_type"), "left")
      .select(col("event_type"), coalesce(col("x"), lit(0L)).as("x"))
    grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"), col("total"),
        round((col("n_days") * col("sxx") - col("total") * col("total"))
          .cast("double")
          / (col("total") * (col("n_days") - 1)).cast("double"), 6)
          .as("vmr"),
        round((col("n_days") * col("sxx") - col("total") * col("total"))
          .cast("double") / col("total").cast("double"), 6)
          .as("chi2_dispersion"))
  }

  /** Friedman rank test (q376, Friedman 1937): do the five event types
    * draw systematically different daily volumes, blocking by day? Ranks
    * within each day live on the ×2 grid (tie groups take 2·avgrank =
    * 2·rank() + g − 1, exact integers), the statistic χ² =
    * 3·Σ(R2ⱼ)²/(n·k·(k+1)) − 3·n·(k+1) is one double expression over
    * exact integer rank sums (tie correction omitted — identical on
    * both engines either way), flagged against the pinned
    * χ²₍₀.₀₅,₄₎ = 9.487729. The nonparametric blocked ANOVA the q231
    * chi-square cannot give (it tests independence, not ordering).
    *
    * Scale shape: one (day, type) aggregate, one |types|-wide rank
    * window per day, a |types|-row finish.
    */
  def friedmanTest(spark: SparkSession, sfDir: String): DataFrame =
    friedmanTestOf(Tables.events(spark, sfDir))

  /** [[friedmanTest]] over an arbitrary events frame. */
  def friedmanTestOf(events: DataFrame): DataFrame = {
    val cell = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("x"))
    // zero-fill the (day, type) grid so every block ranks all k types
    val grid = cell.select(col("day")).distinct()
      .crossJoin(broadcast(cell.select(col("event_type")).distinct()))
      .join(cell, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("x"), lit(0L)).as("x"))
    val wr = Window.partitionBy(col("day")).orderBy(col("x"))
    val wt = Window.partitionBy(col("day"), col("x"))
    val ranked = grid
      .withColumn("rk", rank().over(wr).cast("long"))
      .withColumn("g", count(lit(1)).over(wt))
      .select(col("day"), col("event_type"),
        (col("rk") * 2 + col("g") - 1).as("rank2"))
    val sums = ranked.groupBy(col("event_type"))
      .agg(sum(col("rank2")).as("rank2_sum"), count(lit(1)).as("n_days"))
    val k = sums.count()
    val tot = sums.agg(max(col("n_days")).as("n"),
      sum(col("rank2_sum") * col("rank2_sum")).as("ssq"))
    sums.crossJoin(broadcast(tot))
      .select(col("event_type"), col("rank2_sum"), col("n"),
        lit(k).cast("long").as("k"),
        round(lit(3.0) * col("ssq").cast("double")
          / (col("n") * lit(k) * lit(k + 1)).cast("double")
          - lit(3.0) * col("n").cast("double") * (k + 1), 6)
          .as("chi2_stat"))
      .withColumn("reject_05",
        (col("chi2_stat") > 9.487729).cast("int"))
  }

  /** Quantile-quantile shift function (q365, Doksum 1974): at each
    * decile, the exact order-statistic difference between purchase-event
    * values and all other event values — WHERE in the distribution the
    * two groups differ, not just whether their means do (the
    * distribution-level readout a mean test like q228 cannot give).
    * Decile ranks are pure integer arithmetic — target rank =
    * ⌈q‰·n/1000⌉ via (q‰·n + 999) div 1000 — so no float rank ever
    * exists to disagree on; ties pin by (cents, event_id).
    *
    * Scale shape: one partitioned window rank per group (never a global
    * sort), a 9-row broadcast target grid, one conditional-count finish.
    */
  def qqShift(spark: SparkSession, sfDir: String): DataFrame =
    qqShiftOf(Tables.events(spark, sfDir))

  /** [[qqShift]] over an arbitrary events frame. */
  def qqShiftOf(events: DataFrame): DataFrame = {
    val rows = events.select(
      when(col("event_type") === "purchase", lit("purchase"))
        .otherwise(lit("other")).as("grp"),
      round(col("value") * 100, 0).cast("long").as("cents"),
      col("event_id"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cents"), col("event_id"))
    val ranked = rows.withColumn("r", row_number().over(w).cast("long"))
    val sizes = rows.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val qs = broadcast(rows.sparkSession.range(1, 10)
      .select((col("id") * 100).cast("int").as("q_pm")))
    val targets = sizes.crossJoin(qs)
      .select(col("grp").as("t_grp"), col("q_pm"),
        expr("(q_pm * n + 999) div 1000").as("tr"), col("n"))
    val at = ranked.join(broadcast(targets),
        col("grp") === col("t_grp") && col("r") === col("tr"))
      .select(col("t_grp").as("grp"), col("q_pm"), col("n"),
        col("cents"))
    at.groupBy(col("q_pm"))
      .agg(max(when(col("grp") === "purchase", col("n"))).as("n_purchase"),
        max(when(col("grp") === "other", col("n"))).as("n_other"),
        max(when(col("grp") === "purchase", col("cents")))
          .as("q_purchase_cents"),
        max(when(col("grp") === "other", col("cents"))).as("q_other_cents"))
      .select(col("q_pm"), col("n_purchase"), col("n_other"),
        col("q_purchase_cents"), col("q_other_cents"),
        (col("q_purchase_cents") - col("q_other_cents")).as("shift_cents"))
  }

  /** Two-sample log-rank test (q366, Mantel 1966) of weekly churn
    * between the two q228 arms: per week, observed churners vs the
    * expected count under the pooled hazard, with the hypergeometric
    * variance — the censoring-aware "do the arms retain differently"
    * test that the q219 Kaplan-Meier curve describes but does not
    * decide. A user churns at their last active week; users whose last
    * week is the span's final week are right-censored (they count in
    * the at-risk sets, never as events).
    *
    * Determinism: per-week O/E/V terms are ×10⁶ truncating fixed points
    * of exact integer products (n₁n₂d(n−d) ≤ ~10¹² at these scales —
    * ×10⁶ stays inside INT64; at population scale promote the products
    * to DECIMAL(38) exactly like q361); the final χ² is one double
    * expression over the exact sums.
    *
    * Scale shape: a user-grain aggregate, a week-grain aggregate, one
    * scalar collapse — the week table is calendar-sized.
    */
  def logRankArms(spark: SparkSession, sfDir: String): DataFrame =
    logRankArmsOf(Tables.events(spark, sfDir))

  /** [[logRankArms]] over an arbitrary events frame. */
  def logRankArmsOf(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), to_date(col("ts")).as("day"))
    val b = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("d0"),
        (datediff(col("d1"), col("d0")).cast("long") / 7).cast("long")
          .as("max_wk"))
    val users = ev.crossJoin(broadcast(b))
      .groupBy(col("user_id"), col("max_wk"))
      .agg(max((datediff(col("day"), col("d0")).cast("long") / 7)
        .cast("long")).as("last_wk"))
      .select(pmod(col("user_id"), lit(2)).cast("int").as("arm"),
        col("last_wk"),
        (col("last_wk") < col("max_wk")).cast("long").as("churned"))
    val weeks = users.select(explode(sequence(lit(0L), col("last_wk")))
        .as("wk"), col("arm"), col("last_wk"), col("churned"))
    val perWeek = weeks.groupBy(col("wk"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
        sum(when(col("arm") === 0 && col("wk") === col("last_wk"),
          col("churned")).otherwise(0L)).as("d1"),
        sum(when(col("arm") === 1 && col("wk") === col("last_wk"),
          col("churned")).otherwise(0L)).as("d2"))
      .select(col("wk"), col("n1"), col("n2"), col("d1"), col("d2"),
        (col("n1") + col("n2")).as("nj"), (col("d1") + col("d2")).as("dj"))
    val terms = perWeek.where(col("dj") > 0)
      .select(col("d1"), col("d2"),
        expr("(dj * n1 * 1000000) div nj").as("e1_fp"),
        when(col("nj") > 1,
          expr("(n1 * n2 * dj * (nj - dj) * 1000000)"
            + " div (nj * nj * (nj - 1))")).otherwise(0L).as("v_fp"))
    val agg = terms.agg(sum(col("d1")).as("o1"), sum(col("d2")).as("o2"),
      sum(col("e1_fp")).as("e1_fp"), sum(col("v_fp")).as("v_fp"))
    val nArm = users.groupBy().agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
    agg.crossJoin(broadcast(nArm))
      .select(col("n_arm0"), col("n_arm1"), col("o1"), col("o2"),
        col("e1_fp"), col("v_fp"),
        when(col("v_fp") > 0L,
          round((col("o1").cast("double") * 1e6 - col("e1_fp")
              .cast("double"))
            * (col("o1").cast("double") * 1e6 - col("e1_fp")
              .cast("double"))
            / (col("v_fp").cast("double") * 1e6), 6))
          .otherwise(lit(null).cast("double")).as("chi2_stat"))
  }

  /** Lorenz concentration table (q367): cumulative share of total spend
    * held by the bottom k/10 of users, k = 1..10 — the CURVE behind the
    * q152 Gini scalar (where the inequality lives, not just how much).
    * Decile cut ranks are exact integer arithmetic ((k·n) div 10);
    * shares are ×10⁶ truncating fixed points; the equality gap column
    * (k·10⁵ − share) is the per-decile distance to the diagonal.
    *
    * Scale shape: one user aggregate, then a ranged two-pass rank +
    * running sum ([[graft.operators.RangedRank]] — one range shuffle,
    * per-partition prefix walk, broadcast partition offsets; NO
    * single-partition window over the user grain), a 10-row broadcast
    * target join. The rank pass's partition totals hand back n and the
    * grand cent total, so the old second aggregate over the user grain
    * is gone too.
    */
  def lorenzCurve(spark: SparkSession, sfDir: String): DataFrame =
    lorenzCurveOf(Tables.events(spark, sfDir))

  /** [[lorenzCurve]] over an arbitrary events frame. */
  def lorenzCurveOf(events: DataFrame): DataFrame = {
    // localCheckpoint: RangedRank's range sampling evaluates its input a
    // second time (r16) — here the event scan + user rollup
    val u = events.groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .localCheckpoint()
    val rr = graft.operators.RangedRank.withGlobalRank(u,
      Seq(col("cents"), col("user_id")), "r", Seq("cents" -> "cum"))
    val targets = broadcast(events.sparkSession.range(1, 11)
      .select(col("id").cast("int").as("decile"),
        lit(rr.total).as("n"), lit(rr.totalLong("cum")).as("total"))
      .withColumn("tr", expr("(decile * n) div 10")))
    rr.df.join(targets, col("r") === col("tr"))
      .select(col("decile"), col("tr").as("n_users_cum"), col("cum")
        .as("cum_cents"), col("total").as("total_cents"),
        expr("(cum * 1000000) div total").as("share_fp"))
      .withColumn("equality_gap_fp",
        col("decile").cast("long") * 100000L - col("share_fp"))
  }

  /** CUPED variance reduction (q361, Deng et al. WSDM'13): adjust each
    * user's post-period spend by their PRE-period spend — Y′ = Y −
    * θ(X − X̄), θ = cov(X,Y)/var(X) — and report how much metric
    * variance the covariate removes (the standard way an experimentation
    * platform shrinks A/B confidence intervals without more traffic).
    * Pre = the first 15 calendar days of the span, post = the rest; the
    * split day comes from the broadcast 1-row bounds (A11 pattern).
    *
    * Determinism: all moments are EXACT integer-cent sums promoted to
    * DECIMAL(38) for the cross products (n·Σxy − Σx·Σy overflows INT64
    * at sf ≥ 0.1); θ and the variances are then a fixed sequence of
    * scalar double ops on those exact integers — no row-order-dependent
    * float accumulation anywhere. var(Y′) uses the algebraic identity
    * var(Y) − 2θcov + θ²var(X), so no second data pass either.
    *
    * Scale shape: one user-keyed conditional aggregate, one 1-row moment
    * collapse. Two passes over events total at any scale.
    */
  def cupedAdjustment(spark: SparkSession, sfDir: String): DataFrame =
    cupedAdjustmentOf(Tables.events(spark, sfDir))

  /** [[cupedAdjustment]] over an arbitrary events frame. */
  def cupedAdjustmentOf(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), to_date(col("ts")).as("day"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val bounds = ev.agg(min(col("day")).as("d0"))
    val user = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(sum(when(datediff(col("day"), col("d0")) < 15, col("cents"))
          .otherwise(0L)).as("x"),
        sum(when(datediff(col("day"), col("d0")) >= 15, col("cents"))
          .otherwise(0L)).as("y"))
    val m = user.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"))
    val n = col("n").cast("double")
    // parenthesized continuations: a leading `-` on a new line would be
    // parsed as a fresh unary-minus statement, silently dropping the term
    val covN = (col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double") / n)
    val varXN = (col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double") / n)
    val varYN = (col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double") / n)
    val theta = covN / varXN
    val adj = (varYN - lit(2.0) * theta * covN + theta * theta * varXN)
    m.select(col("n"), col("sx").cast("long").as("sum_x_cents"),
      col("sy").cast("long").as("sum_y_cents"),
      round(theta, 6).as("theta"),
      round(varYN / n, 6).as("var_y"),
      round(adj / n, 6).as("var_adj"),
      round(lit(1.0) - adj / varYN, 6).as("reduction"))
  }

  /** Sample-ratio-mismatch audit (q364): the χ² goodness-of-fit of the
    * q228 arm assignment (user_id mod 2) against the designed 50/50
    * split, for the user-day experiment grain AND per event type — the
    * first invariant check any experiment readout must pass (a
    * significant SRM invalidates the whole test before any metric is
    * read). With df = 1 the statistic collapses to (n₀ − n₁)²/n, exact
    * integers until the one 6-dp division; the flag compares against the
    * pinned χ²₍₀.₀₅,₁₎ = 3.841459.
    *
    * Scale shape: two conditional-count aggregates, both map-side
    * combinable; output is |types| + 1 rows.
    */
  def srmAudit(spark: SparkSession, sfDir: String): DataFrame =
    srmAuditOf(Tables.events(spark, sfDir))

  /** [[srmAudit]] over an arbitrary events frame. */
  def srmAuditOf(events: DataFrame): DataFrame = {
    val ud = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day")).agg(lit(1))
      .select(lit("user_days").as("scope"),
        pmod(col("user_id"), lit(2)).cast("int").as("arm"))
    val te = events.select(col("event_type").as("scope"),
      pmod(col("user_id"), lit(2)).cast("int").as("arm"))
    ud.unionByName(te)
      .groupBy(col("scope"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
      .select(col("scope"), col("n"), col("n_arm0"), col("n_arm1"),
        round(((col("n_arm0") - col("n_arm1"))
          * (col("n_arm0") - col("n_arm1"))).cast("double")
          / col("n").cast("double"), 6).as("chi2_stat"))
      .withColumn("srm_flag",
        (col("chi2_stat") > 3.841459).cast("int"))
  }

  /** Bipartite HITS (q358, Kleinberg JACM'99) over the user ↔ event-type
    * incidence graph: authorities are event types scored by the hub mass
    * of the users who perform them, hubs are users scored by the
    * authority mass of their repertoire — three synchronous rounds of
    * the mutual-reinforcement iteration, each side max-normalized to the
    * ×10⁶ grid with truncating division (all masses positive, so both
    * engines' integer division agree). The bipartite principal-singular-
    * vector view of "which actions define engaged users", next to the
    * q91 PageRank (random-walk) and q336 LPA (majority) graph scores.
    *
    * Scale shape per round: two edge-keyed map-side-combinable
    * aggregates (the edge list shuffles on user_id once and on type
    * once) and a 1-row broadcast max for the normalizer; the
    * authority table is |types|-sized and broadcasts back onto the edge
    * list. Rounds are a pinned constant.
    */
  def hitsBipartite(spark: SparkSession, sfDir: String,
      rounds: Int = 3): DataFrame =
    hitsBipartiteOf(Tables.events(spark, sfDir), rounds)

  /** [[hitsBipartite]] over an arbitrary events frame. */
  def hitsBipartiteOf(events: DataFrame, rounds: Int = 3): DataFrame = {
    val e = events.select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint() // the bipartite edge list, reused every round
    var hub = e.select(col("user_id")).distinct()
      .select(col("user_id"), lit(1000000L).as("h"))
    var auth: DataFrame = null
    // normalizers are whole-frame window maxes, not separate aggregate
    // subplans — each round stays ONE linear chain (a per-round max as
    // its own subtree re-executes every prior round once per consumer:
    // 2^rounds recompute). At cluster scale the |types|-row authority
    // window is trivial; the user-side window normalizes a 1-column
    // frame and would shard by range if users ever outgrew one reducer.
    for (_ <- 1 to rounds) {
      auth = e.join(hub, Seq("user_id"))
        .groupBy(col("event_type")).agg(sum(col("h")).as("a_raw"))
        .select(col("event_type"),
          expr("(a_raw * 1000000) div (max(a_raw) over ())").as("a"))
      hub = e.join(broadcast(auth), Seq("event_type"))
        .groupBy(col("user_id")).agg(sum(col("a")).as("h_raw"))
        .select(col("user_id"),
          expr("(h_raw * 1000000) div (max(h_raw) over ())").as("h"))
    }
    val marg = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
    auth.join(marg, Seq("event_type"))
      .select(col("event_type"), col("n_users"),
        col("a").as("authority_fp"),
        round(col("a").cast("double") / 1e6, 6).as("authority"))
  }

  /** Daily SPRT trajectory (q359, Wald 1945): the sequential probability
    * ratio test of the purchase share — H₀: p = 0.20 vs H₁: p = 0.25,
    * α = β = 0.05 — run day by day over the event stream. The per-day
    * log-likelihood-ratio increments use PINNED 6-dp fixed-point
    * constants (ln(0.25/0.20) → 223144, ln(0.75/0.80) → −64539 on the
    * ×10⁶ grid — no engine ln at all), the cumulative LLR is an exact
    * integer prefix sum, and the Wald bounds ±ln(19) → ±2944439 classify
    * each day accept-H₁ / accept-H₀ / continue. The sequential test a
    * production experimentation platform runs instead of a fixed-horizon
    * one: it reads the answer off the SAME daily gold table and stops
    * early when the evidence is in.
    *
    * Scale shape: one day-grain conditional aggregate (map-side
    * combinable), one window over the metadata-sized day table.
    */
  def sprtDaily(spark: SparkSession, sfDir: String): DataFrame =
    sprtDailyOf(Tables.events(spark, sfDir))

  /** [[sprtDaily]] over an arbitrary events frame. */
  def sprtDailyOf(events: DataFrame): DataFrame = {
    val d = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
    val llr = d.select(col("day"), col("n_events"), col("n_purchases"),
      (col("n_purchases") * lit(223144L)
        + (col("n_events") - col("n_purchases")) * lit(-64539L))
        .as("llr_fp"))
    val wd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    llr.withColumn("cum_llr_fp", sum(col("llr_fp")).over(wd))
      .select(col("day"), col("n_events"), col("n_purchases"),
        col("llr_fp"), col("cum_llr_fp"),
        when(col("cum_llr_fp") >= 2944439L, lit("accept_h1"))
          .when(col("cum_llr_fp") <= -2944439L, lit("accept_h0"))
          .otherwise(lit("continue")).as("state"))
  }

  /** Ordered sequential-pattern mining (q356): every directed event-type
    * pair a→b scored by how many users did their FIRST a strictly before
    * their first b — the gap-tolerant generalization of the q140
    * immediate-successor transition matrix (a→b counts even with other
    * events between) and the mined version of the q-funnel's PINNED
    * sequence. Support n(a→b), confidence n(a→b)/n(a) and lift
    * n(a→b)·N / (n(a)·n(b)) follow the q331 association-rule contract
    * but on ORDER, not co-occurrence. First occurrences pin ties by
    * (ts, event_id), so the order relation is total and deterministic.
    *
    * Scale shape: one user-keyed aggregate to |types| first-occurrence
    * rows per user, then a per-user self-join with ≤ |types|² bounded
    * fan-out (a constant, not data-dependent) feeding a map-side-
    * combinable pair count; the type marginals broadcast onto the 20-row
    * result.
    */
  def sequentialPatterns(spark: SparkSession, sfDir: String): DataFrame =
    sequentialPatternsOf(Tables.events(spark, sfDir))

  /** [[sequentialPatterns]] over an arbitrary events frame. */
  def sequentialPatternsOf(events: DataFrame): DataFrame = {
    val ft = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"))).as("f"))
      .select(col("user_id"), col("event_type"),
        col("f.ts").as("ts"), col("f.event_id").as("eid"))
      .localCheckpoint() // |users|·|types| rows; reused by pairs + marginals
    val n = ft.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val marg = ft.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val pairs = ft.as("a").join(ft.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") =!= col("b.event_type")
          && (col("a.ts") < col("b.ts")
            || (col("a.ts") === col("b.ts")
              && col("a.eid") < col("b.eid"))))
      .groupBy(col("a.event_type").as("antecedent"),
        col("b.event_type").as("consequent"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marg.select(col("event_type").as("antecedent"),
        col("n_t").as("n_a"))), Seq("antecedent"))
      .join(broadcast(marg.select(col("event_type").as("consequent"),
        col("n_t").as("n_b"))), Seq("consequent"))
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_users"),
        round(col("n_ab").cast("double") / col("n_users").cast("double"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("n_users").cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  /** Bitmap-index lag retention (q346): each user's activity calendar is
    * packed into ONE 64-bit bitmap (bit i = active on day d0+i, built by
    * `bit_or(1L << idx)` — a plain map-side-combinable aggregate), and
    * day-over-day retention for lags 1-7 falls out of pure bit
    * arithmetic: retained user-days at lag L = popcount(bm & (bm >> L)),
    * eligible = popcount(bm & mask(n_days−L)) (active days with L days of
    * follow-up inside the observed span). This is the bitmap-index
    * formulation of the q48/q175 join-based retention — same numbers, no
    * self-join: the (u,d)⋈(u,d+L) equality join is replaced by a shift
    * and an AND inside each user's single row.
    *
    * Why it matters at 100 TB: the bitmap is a mergeable per-user sketch
    * (OR-combinable across partitions and across incremental loads), 8
    * bytes per user per 64-day window vs one row per user-day — the
    * events table is touched once, and every lag after that is arithmetic
    * on the compacted index. Spans past 63 days shard into (user, epoch)
    * rows — bit_or merges within epochs and cross-epoch lags only touch
    * the two adjacent words; this audit's 30-day window fits one word
    * (guarded below).
    *
    * Determinism: exact integer popcounts; the rate is one 6-dp rounded
    * division.
    */
  def bitmapRetention(spark: SparkSession, sfDir: String): DataFrame =
    bitmapRetentionOf(spark, Tables.events(spark, sfDir))

  /** [[bitmapRetention]] over an arbitrary events frame. */
  def bitmapRetentionOf(spark: SparkSession, events: DataFrame,
      maxLag: Int = 7): DataFrame = {
    val du = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    // global span as a 1-row broadcast (A11 pattern — no driver collect);
    // n_days > 63 would overflow one word: fail loudly rather than wrap
    val bounds = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("d0"), (datediff(col("d1"), col("d0")) + 1).as("n_days"))
    val bm = du.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("n_days"),
        datediff(col("day"), col("d0")).as("idx"))
      .where(assert_true(col("n_days") <= 63,
        lit("bitmapRetention: span exceeds one 64-bit word")).isNull &&
        col("idx") >= 0)
      .groupBy(col("user_id"))
      .agg(expr("bit_or(shiftleft(1L, idx))").as("bm"),
        max(col("n_days")).as("n_days"))
    val lags = spark.range(1, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    bm.crossJoin(broadcast(lags))
      .select(col("lag"),
        expr("bit_count(bm & shiftright(bm, lag))").as("ret_u"),
        // n_days <= lag means NO day is early enough to be eligible; the
        // mask expression would otherwise get a negative shift (Java takes
        // it mod 64) and yield garbage eligibility instead of 0
        when(col("n_days") <= col("lag"), lit(0))
          .otherwise(expr("bit_count(bm & (shiftleft(1L, n_days - lag) - 1L))"))
          .as("eli_u"))
      .groupBy(col("lag"))
      .agg(sum(col("ret_u")).cast("long").as("retained"),
        sum(col("eli_u")).cast("long").as("eligible"))
      .select(col("lag"), col("retained"), col("eligible"),
        when(col("eligible") === 0L, lit(null).cast("double"))
          .otherwise(round(col("retained").cast("double")
            / col("eligible").cast("double"), 6)).as("retention_rate"))
  }
}
