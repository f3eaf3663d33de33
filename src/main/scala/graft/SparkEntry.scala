package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{Relational, Sessions}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2 (or a
  * beyond-parity scale operator); `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01. Column names and types are
  * aligned on both sides; doubles are rounded on both sides to absorb
  * summation-order drift.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Sessions.sessionLevel(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — relational surface (SURVEY §2.3-§2.8) —
    "q01_pricing_summary" -> Relational.pricingSummary _,
    "q02_top_revenue" -> Relational.topRevenueOrders _,
    "q03_region_revenue" -> Relational.regionRevenue _,
    "q04_customer_orders" -> Relational.customerOrderSummary _,
    "q05_cust_with_orders" -> Relational.customersWithOrders _,
    "q06_cust_without_orders" -> Relational.customersWithoutOrders _,
    "q07_nation_setops" -> Relational.nationSetOps _,
    "q08_topk_window" -> Relational.topPartsPerSupplier _,
    "q09_distinct_agg" -> Relational.distinctParts _,
    "q10_split_categories" -> Relational.partCategories _,
    // — session analytics parity (SURVEY §2.5-§2.9) —
    "q11_session_level" -> Sessions.sessionLevel _,
    "q12_user_level" -> Sessions.userLevel _,
    "q13_favorite_event_type" -> Sessions.favoriteEventType _,
    "q14_user_enriched" -> Sessions.userEnriched _,
    "q15_daily_activity" -> Sessions.dailyActivity _,
    "q16_daily_funnel" -> Sessions.dailyFunnel _,
    "q17_daily_traffic" -> Sessions.dailyTrafficSource _,
    "q18_session_gap" -> ((s: SparkSession, d: String) => Sessions.sessionGap(s, d)),
    "q19_session_first_last" -> Sessions.sessionFirstLast _,
    "q20_session_events_json" -> ((s: SparkSession, d: String) => Sessions.sessionEventsJson(s, d)),
    "q21_events_enriched" -> Sessions.eventsEnriched _,
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1,2""".stripMargin,
    "q02_top_revenue" ->
      """SELECT l_orderkey, o_orderdate,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q03_region_revenue" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,
    "q04_customer_orders" ->
      """SELECT c_custkey, c_name,
        | coalesce(cnt, 0) AS order_count,
        | coalesce(tp, 0.0) AS total_price
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt, round(sum(o_totalprice),2) AS tp
        |  FROM orders GROUP BY 1) o ON c_custkey = o_custkey""".stripMargin,
    "q05_cust_with_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q06_cust_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q07_nation_setops" ->
      """WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier)
        |SELECT nationkey, 'union' AS set_op FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT nationkey, 'intersect' AS set_op FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT nationkey, 'except' AS set_op FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)""".stripMargin,
    "q08_topk_window" ->
      """WITH pp AS (
        |  SELECT l_suppkey, l_partkey, round(sum(l_extendedprice),2) AS revenue
        |  FROM lineitem GROUP BY 1,2),
        |r AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey) AS INTEGER) AS "rank"
        |  FROM pp)
        |SELECT * FROM r WHERE "rank" <= 3""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS distinct_parts,
        | count(DISTINCT l_suppkey) AS distinct_supps
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q10_split_categories" ->
      """SELECT p_partkey,
        | string_split(p_name, ' ')[1] AS main_category,
        | string_split(p_name, ' ')[2] AS sub_category,
        | string_split(p_name, ' ')[-1] AS last_category
        |FROM part""".stripMargin,
    "q11_session_level" ->
      """SELECT user_id, time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS session_start,
        | min(CAST(ts AS TIMESTAMP)) AS first_event_time,
        | max(CAST(ts AS TIMESTAMP)) AS last_event_time,
        | CAST(floor(epoch(max(CAST(ts AS TIMESTAMP)))) - floor(epoch(min(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS session_duration_seconds,
        | count(event_type) AS number_of_events,
        | count(DISTINCT event_type) AS distinct_event_types,
        | CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INTEGER) AS is_purchase
        |FROM events GROUP BY 1,2""".stripMargin,
    "q12_user_level" ->
      """WITH a AS (SELECT max(CAST(ts AS DATE)) AS anchor_date FROM events),
        |u AS (SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS total_purchases,
        |  round(sum(CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN value END),2) AS total_spent,
        |  max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS last_purchase_time
        | FROM events GROUP BY 1)
        |SELECT user_id, total_purchases, total_spent, last_purchase_time,
        | CAST(CASE WHEN last_purchase_time IS NOT NULL
        |   THEN date_diff('day', CAST(last_purchase_time AS DATE), anchor_date)
        |   ELSE -1 END AS INTEGER) AS days_since_last_purchase
        |FROM u CROSS JOIN a""".stripMargin,
    "q13_favorite_event_type" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS interaction_count
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY user_id ORDER BY interaction_count DESC, event_type) AS rn FROM c)
        |SELECT user_id, event_type AS favorite_event_type, interaction_count
        |FROM r WHERE rn = 1""".stripMargin,
    "q14_user_enriched" ->
      """WITH a AS (SELECT max(CAST(ts AS DATE)) AS anchor_date FROM events),
        |u AS (SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS total_purchases,
        |  round(sum(CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN value END),2) AS total_spent,
        |  max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS last_purchase_time
        | FROM events GROUP BY 1),
        |ul AS (SELECT user_id, total_purchases, total_spent, last_purchase_time,
        | CAST(CASE WHEN last_purchase_time IS NOT NULL
        |   THEN date_diff('day', CAST(last_purchase_time AS DATE), anchor_date)
        |   ELSE -1 END AS INTEGER) AS days_since_last_purchase
        | FROM u CROSS JOIN a),
        |c AS (SELECT user_id, event_type, count(*) AS interaction_count
        |  FROM events GROUP BY 1,2),
        |rk AS (SELECT *, row_number() OVER (
        |  PARTITION BY user_id ORDER BY interaction_count DESC, event_type) AS rn FROM c),
        |fav AS (SELECT user_id, event_type AS favorite_event_type FROM rk WHERE rn = 1)
        |SELECT ul.*, fav.favorite_event_type
        |FROM ul LEFT JOIN fav USING (user_id)""".stripMargin,
    "q15_daily_activity" ->
      """WITH s AS (
        | SELECT user_id, time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS session_start,
        |  CAST(floor(epoch(max(CAST(ts AS TIMESTAMP)))) - floor(epoch(min(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS dur
        | FROM events GROUP BY 1,2)
        |SELECT user_id, CAST(session_start AS DATE) AS session_date,
        | count(*) AS num_sessions, sum(dur) AS total_duration_seconds
        |FROM s GROUP BY 1,2""".stripMargin,
    "q16_daily_funnel" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        | count(DISTINCT user_id) AS users_count
        |FROM events GROUP BY 1,2""".stripMargin,
    "q17_daily_traffic" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        | (['facebook','google','tiktok_ads','organic'])[(CAST(props->>'k' AS INTEGER) % 4) + 1] AS utm_source,
        | count(DISTINCT user_id) AS users_count,
        | round(round(sum(value),2) / count(*), 4) AS avg_value
        |FROM events GROUP BY 1,2""".stripMargin,
    "q18_session_gap" ->
      """WITH s AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) >= 1800
        |   THEN 1 ELSE 0 END AS new_s
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT *, sum(new_s) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        | FROM s)
        |SELECT user_id,
        | min(CAST(ts AS TIMESTAMP)) AS session_start_time,
        | max(CAST(ts AS TIMESTAMP)) AS session_end_time,
        | count(*) AS number_of_events,
        | round(sum(value),2) AS session_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q19_session_first_last" ->
      """SELECT user_id, time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS session_start,
        | arg_min(event_type, event_id) AS first_event_type,
        | arg_max(event_type, event_id) AS last_event_type,
        | min(event_id) AS first_event_id,
        | max(event_id) AS last_event_id
        |FROM events GROUP BY 1,2""".stripMargin,
    "q20_session_events_json" ->
      """SELECT user_id, time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS session_start,
        | CAST(count(*) AS INTEGER) AS n_events,
        | CAST(to_json(list(struct_pack(event_id := event_id, event_type := event_type)
        |   ORDER BY event_id)) AS VARCHAR) AS events_json
        |FROM events GROUP BY 1,2""".stripMargin,
    "q21_events_enriched" ->
      """SELECT event_id, user_id, event_type,
        | CAST(ts AS DATE) AS event_date,
        | dayname(CAST(ts AS TIMESTAMP)) AS day_of_week,
        | CAST(hour(ts) AS INTEGER) AS hour_of_day,
        | CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS INTEGER) AS is_purchase,
        | CASE WHEN event_type = 'purchase' AND value IS NOT NULL THEN round(value,2) END AS purchase_amount,
        | CASE WHEN value < 50 THEN 'low' WHEN value < 200 THEN 'mid' ELSE 'high' END AS value_bucket
        |FROM events""".stripMargin,
  )
}
