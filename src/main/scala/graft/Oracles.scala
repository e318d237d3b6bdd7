package graft

/** DuckDB oracle SQL, one statement per `SparkEntry.queries` key.
  *
  * Each statement mirrors the Spark plan's semantics EXACTLY:
  *  - the attribution schema is derived from `events` with the same
  *    expressions as [[graft.sources.Tables]] (SURVEY.md §3);
  *  - epoch-µs comparisons (`epoch_us(ts)` ≡ Spark `ts DIV 1000` on raw
  *    nanos — DuckDB truncates parquet ns→µs on read);
  *  - double aggregates use the order-independent
  *    `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)` shape
  *    ([[graft.functions.Exact]]);
  *  - per-row arithmetic uses identical expression trees, so IEEE results
  *    are bit-equal;
  *  - deterministic ORDER BY with full tie-breaking on both sides.
  */
object Oracles {

  /** Shared attribution CTE chain (conversions / sessions / session_costs /
    * assigned / flagged / ihc_tbl). */
  val attrBase: String = """WITH conversions AS (
  SELECT event_id AS conv_id, user_id, epoch_us(ts) AS conv_ts_us,
         CAST(ts AS DATE) AS conv_date, value AS revenue
  FROM events WHERE event_type = 'purchase'
), sessions AS (
  SELECT event_id AS session_id, user_id, epoch_us(ts) AS ts_us,
         CAST(ts AS DATE) AS event_date, event_type AS channel_name,
         CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END AS holder_engagement,
         CASE WHEN event_type IN ('click','signup') THEN 1 ELSE 0 END AS closer_engagement,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS impression_interaction
  FROM events WHERE event_type <> 'purchase'
), session_costs AS (
  SELECT event_id AS session_id, value / 20.0 AS cost
  FROM events WHERE event_type IN ('click','view')
), assigned AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT s.*, c.conv_id, c.conv_ts_us, c.revenue,
           row_number() OVER (PARTITION BY s.session_id ORDER BY c.conv_ts_us, c.conv_id) AS rn
    FROM sessions s JOIN conversions c
      ON s.user_id = c.user_id AND s.ts_us < c.conv_ts_us) t
  WHERE rn = 1
), flagged AS (
  SELECT *, CASE WHEN row_number() OVER (PARTITION BY conv_id ORDER BY ts_us DESC, session_id ASC) = 1
                 THEN 1 ELSE 0 END AS conversion
  FROM assigned
), ihc_tbl AS (
  SELECT *,
    ((CASE WHEN row_number() OVER (PARTITION BY conv_id ORDER BY ts_us ASC, session_id ASC) = 1 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN SUM(holder_engagement) OVER (PARTITION BY conv_id) > 0
          THEN CAST(holder_engagement AS DOUBLE) / CAST(SUM(holder_engagement) OVER (PARTITION BY conv_id) AS DOUBLE)
          ELSE 1.0 / CAST(COUNT(*) OVER (PARTITION BY conv_id) AS DOUBLE) END)
     + (CASE WHEN SUM(closer_engagement) OVER (PARTITION BY conv_id) > 0
          THEN CAST(closer_engagement AS DOUBLE) / CAST(SUM(closer_engagement) OVER (PARTITION BY conv_id) AS DOUBLE)
          ELSE CAST(conversion AS DOUBLE) END)) / 3.0 AS ihc
  FROM flagged
)
"""

  val conversionsExtract: String = attrBase + """
SELECT conv_id, user_id, conv_ts_us, conv_date, revenue
FROM conversions
WHERE conv_date >= DATE '2024-01-05'
ORDER BY conv_id"""

  val sessionsExtract: String = attrBase + """
SELECT s.session_id, s.user_id, s.ts_us, s.event_date, s.channel_name,
       s.holder_engagement, s.closer_engagement, s.impression_interaction, sc.cost
FROM sessions s LEFT JOIN session_costs sc ON s.session_id = sc.session_id
ORDER BY s.session_id"""

  val journeyBuild: String = attrBase + """
SELECT conv_id, session_id, user_id, ts_us, channel_name
FROM assigned
ORDER BY conv_id, session_id"""

  val journeyFlag: String = attrBase + """
SELECT conv_id, session_id, conversion
FROM flagged
ORDER BY conv_id, session_id"""

  val ihcAttribution: String = attrBase + """
SELECT conv_id, session_id, channel_name, ihc
FROM ihc_tbl
ORDER BY conv_id, session_id"""

  val attributionSumCheck: String = attrBase + """
SELECT conv_id, total_ihc, (ABS(total_ihc - 1.0) <= 0.001) AS within_tolerance
FROM (
  SELECT conv_id, CAST(SUM(CAST(ihc AS DECIMAL(27,9))) AS DOUBLE) AS total_ihc
  FROM ihc_tbl GROUP BY conv_id) t
ORDER BY conv_id"""

  val journeyStats: String = attrBase + """
SELECT CAST(COUNT(*) AS BIGINT) AS total_journeys,
       CAST(SUM(n) AS BIGINT) AS total_sessions,
       CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_sessions_per_journey,
       CAST(MIN(n) AS BIGINT) AS min_sessions,
       CAST(MAX(n) AS BIGINT) AS max_sessions
FROM (SELECT conv_id, COUNT(*) AS n FROM assigned GROUP BY conv_id) per"""

  val journeyValidate: String = attrBase + """
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       (SUM(conversion) = 1) AS has_one_conversion,
       (MIN(CASE WHEN holder_engagement IN (0,1) AND closer_engagement IN (0,1)
                  AND impression_interaction IN (0,1) AND conversion IN (0,1)
                 THEN 1 ELSE 0 END) = 1) AS flags_valid
FROM flagged
GROUP BY conv_id
ORDER BY conv_id"""

  private val channelReportingCore: String = """
SELECT s.channel_name, s.event_date AS date,
       CAST(SUM(CAST(COALESCE(sc.cost, 0.0) AS DECIMAL(27,6))) AS DOUBLE) AS cost,
       CAST(SUM(CAST(a.ihc AS DECIMAL(27,6))) AS DOUBLE) AS ihc,
       CAST(SUM(CAST(a.ihc * c.revenue AS DECIMAL(27,6))) AS DOUBLE) AS ihc_revenue
FROM sessions s
JOIN ihc_tbl a ON s.session_id = a.session_id
LEFT JOIN session_costs sc ON s.session_id = sc.session_id
JOIN conversions c ON a.conv_id = c.conv_id
"""

  val channelReporting: String = attrBase + channelReportingCore + """
GROUP BY s.channel_name, s.event_date
ORDER BY s.channel_name, date"""

  val channelReportingMetrics: String = attrBase + """
SELECT channel_name, date, cost, ihc, ihc_revenue,
       CASE WHEN ihc > 0.0 THEN cost / ihc ELSE NULL END AS CPO,
       CASE WHEN cost > 0.0 THEN ihc_revenue / cost ELSE NULL END AS ROAS
FROM (""" + channelReportingCore + """
GROUP BY s.channel_name, s.event_date) r
ORDER BY channel_name, date"""

  val channelReportingWindow: String = attrBase + channelReportingCore + """
WHERE s.event_date >= DATE '2024-01-05' AND s.event_date <= DATE '2024-01-20'
GROUP BY s.channel_name, s.event_date
ORDER BY s.channel_name, date"""

  val q3TopUnshipped: String = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10"""

  val q5RegionRevenue: String = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name"""

  val topCustomersWindow: String = """
SELECT c_custkey, c_name, revenue, rk FROM (
  SELECT c_custkey, c_name, revenue,
         row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rk
  FROM (
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name) rev) ranked
WHERE rk <= 25
ORDER BY rk"""

  val runningTotalWindow: String = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey"""

  val eventsSessionize: String = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
), marked AS (
  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 7200000000
                 THEN 1 ELSE 0 END AS is_new
  FROM ev
), sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM marked
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us
FROM sess
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx"""

  val eventsJsonExtract: String = """
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2"""

  val ordersEnrichDenorm: String = """
SELECT o_orderkey, o_orderdate, o_totalprice, c_name, c_mktsegment, n_name, r_name
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
ORDER BY o_orderkey"""

  val q1PricingSummary: String = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""
}
