package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Relational, SeriesQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator from SURVEY.md §2 (or the
  * north-star batch surface) run over the driver's parquet tables; every
  * key in [[oracleSql]] is the equivalent ANSI SQL the driver executes in
  * DuckDB over the same tables for a hash-compare.
  *
  * Conventions for oracle parity (hash match):
  *  - computed double columns are `round(...)`ed in BOTH engines so
  *    summation-order ULP drift cannot flip the hash;
  *  - derived integer columns are cast to BIGINT on both sides
  *    (Spark `row_number` is int32, DuckDB's is int64);
  *  - the nanosecond `events.ts` is used as `ts_us = ts_ns div 1000`
  *    microseconds on the Spark side because DuckDB truncates ns->µs
  *    on parquet read; every ordering uses (ts_us, event_id).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- TPC-H-style relational surface (north star; SURVEY §2.10) ---
    "q1_pricing_summary" -> (Relational.pricingSummary _),
    "q6_revenue_filter" -> (Relational.revenueFilter _),
    "q3_top_orders" -> (Relational.topRevenueOrders _),
    "q5_nation_revenue" -> (Relational.nationRevenue _),
    "q_top_customers" -> (Relational.topCustomers _),
    "q_cust_no_orders" -> (Relational.customersWithoutOrders _),
    "q4_order_priority" -> (Relational.orderPriorityCheck _),
    "q_returns_rollup" -> (Relational.returnsRollup _),
    "q_top_orders_per_cust" -> (Relational.topOrdersPerCustomer _),
    "q_running_spend" -> (Relational.runningCustomerSpend _),
    "q_distinct_counts" -> (Relational.distinctCounts _),
    // --- reference operator surface over events (SURVEY §2.2-2.7) ---
    "tr1_change_filter" -> (SeriesQueries.changeFilter _),
    "tr2_anchored_return" -> (SeriesQueries.anchoredReturn _),
    "nrm1_minmax_scale" -> (SeriesQueries.minMaxScale _),
    "win1_sliding_features" -> (SeriesQueries.slidingFeatures _),
    "win2_latest_window" -> (SeriesQueries.latestWindow _),
    "jn1_fifo_rank_join" -> (SeriesQueries.fifoRankJoin _),
    "jn2_asof_join" -> (SeriesQueries.asOfJoin _),
    "agg2_persistence_rmse" -> (SeriesQueries.persistenceRmse _),
    "agg3_value_summary" -> (SeriesQueries.valueSummary _),
    "src2_json_extract" -> (SeriesQueries.jsonExtract _),
    "q_events_hourly" -> (SeriesQueries.hourlyRollup _),
    "q_sessionize" -> (SeriesQueries.sessionize _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
         round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q6_revenue_filter" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue FROM lineitem
         WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderpriority,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         JOIN customer ON o_custkey=c_custkey
         WHERE c_mktsegment='BUILDING'
         GROUP BY o_orderkey, o_orderpriority
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q5_nation_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         JOIN customer ON o_custkey=c_custkey
         JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
         JOIN nation ON s_nationkey=n_nationkey
         GROUP BY n_name""",
    "q_top_customers" ->
      """SELECT c_custkey, c_name, round(sum(o_totalprice),2) AS total_spend,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey=c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY total_spend DESC, c_custkey LIMIT 10""",
    "q_cust_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey=c_custkey AND o_totalprice > 400000)""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey=o_orderkey AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority""",
    "q_returns_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
         count(*) AS n FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS o_totalprice, rk
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders) t WHERE rk <= 3""",
    "q_running_spend" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
         FROM orders""",
    "q_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "tr1_change_filter" ->
      """SELECT user_id, event_id, value FROM (
         SELECT user_id, event_id, value,
                lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events) t WHERE prev IS NULL OR value <> prev""",
    "tr2_anchored_return" ->
      """SELECT user_id, event_id,
         round(value / first_value(value) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 6) AS variation
         FROM events""",
    "nrm1_minmax_scale" ->
      """SELECT event_id,
         round(CASE WHEN mx > mn THEN (value-mn)/(mx-mn) ELSE 0.0 END, 6) AS scaled
         FROM events, (SELECT min(value) AS mn, max(value) AS mx FROM events)""",
    "win1_sliding_features" ->
      """SELECT user_id, event_id, f01,f02,f03,f04,f05,f06,f07,f08,f09,f10,
                l1,l2,l3,l4,l5 FROM (
         SELECT user_id, event_id, value AS f01,
           lead(value,1) OVER w AS f02, lead(value,2) OVER w AS f03,
           lead(value,3) OVER w AS f04, lead(value,4) OVER w AS f05,
           lead(value,5) OVER w AS f06, lead(value,6) OVER w AS f07,
           lead(value,7) OVER w AS f08, lead(value,8) OVER w AS f09,
           lead(value,9) OVER w AS f10, lead(value,10) OVER w AS l1,
           lead(value,11) OVER w AS l2, lead(value,12) OVER w AS l3,
           lead(value,13) OVER w AS l4, lead(value,14) OVER w AS l5
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
         WHERE l5 IS NOT NULL""",
    "win2_latest_window" ->
      """SELECT user_id, (11 - rn)::BIGINT AS pos, event_id, value FROM (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events) t WHERE rn <= 10""",
    "jn1_fifo_rank_join" ->
      """WITH f AS (SELECT user_id, event_id AS f_event_id, value AS f_value,
                    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                    FROM events WHERE event_type='purchase'),
              a AS (SELECT user_id, event_id AS a_event_id, value AS a_value,
                    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                    FROM events WHERE event_type='view')
         SELECT user_id, f_event_id, f_value, a_event_id, a_value
         FROM f LEFT JOIN a USING (user_id, rn)""",
    "jn2_asof_join" ->
      """SELECT user_id, event_id, value, last_view_value FROM (
         SELECT user_id, event_id, value, event_type,
           last_value(CASE WHEN event_type='view' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts, CASE WHEN event_type='view' THEN 0 ELSE 1 END
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
         FROM events WHERE event_type IN ('view','purchase')) t
         WHERE event_type='purchase'""",
    "agg2_persistence_rmse" ->
      """SELECT user_id, round(sqrt(avg(pow(value - prev, 2))), 4) AS rmse FROM (
         SELECT user_id, value,
                lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events) t WHERE prev IS NOT NULL GROUP BY user_id""",
    "agg3_value_summary" ->
      """SELECT event_type, min(value) AS min_value, max(value) AS max_value,
         round(avg(value),4) AS avg_value, count(*) AS n
         FROM events GROUP BY event_type""",
    "src2_json_extract" ->
      """SELECT (json_extract_string(props,'$.k')::INT) % 10 AS k_bucket,
         count(*) AS n, round(sum(value),2) AS sum_value
         FROM events GROUP BY 1""",
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS hour,
         event_type, count(*) AS n, round(sum(value),2) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q_sessionize" ->
      """WITH t AS (
           SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts::TIMESTAMP)
                       - lag(epoch_us(ts::TIMESTAMP)) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts_us,
             (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
           FROM t)
         SELECT user_id, session_id, count(*) AS n_events,
                ((max(ts_us) - min(ts_us)) // 1000000)::BIGINT AS duration_sec
         FROM s GROUP BY user_id, session_id""",
  )
}
