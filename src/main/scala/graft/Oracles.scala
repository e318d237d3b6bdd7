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

  /** Redistribution-parameter IHC (`api_utils.py:304-340`): 'error' is the
    * direct-channel stand-in; thresholds/directions per the reference's
    * `create_redistribution_parameter` defaults (i: earlier-only thr 0,
    * h: any thr 0, c: later-only thr 0.1). Every multi-term sum is the
    * ordered double fold, matching the Spark side bit-for-bit. */
  val ihcRedistributed: String = attrBase + """
, pw AS (
  SELECT conv_id, session_id, ts_us, channel_name,
    (CASE WHEN row_number() OVER (PARTITION BY conv_id ORDER BY ts_us ASC, session_id ASC) = 1 THEN 1.0 ELSE 0.0 END) AS w_i,
    (CASE WHEN SUM(holder_engagement) OVER (PARTITION BY conv_id) > 0
       THEN CAST(holder_engagement AS DOUBLE) / CAST(SUM(holder_engagement) OVER (PARTITION BY conv_id) AS DOUBLE)
       ELSE 1.0 / CAST(COUNT(*) OVER (PARTITION BY conv_id) AS DOUBLE) END) AS w_h,
    (CASE WHEN SUM(closer_engagement) OVER (PARTITION BY conv_id) > 0
       THEN CAST(closer_engagement AS DOUBLE) / CAST(SUM(closer_engagement) OVER (PARTITION BY conv_id) AS DOUBLE)
       ELSE CAST(conversion AS DOUBLE) END) AS w_c
  FROM flagged
), pwc AS (
  SELECT *, (w_i + w_h + w_c) / 3.0 AS ihc FROM pw
), donors AS (
  SELECT conv_id, 'i' AS phase, session_id AS d_sid, ts_us AS d_ts, w_i AS d_w
  FROM pwc WHERE channel_name IN ('error') AND w_i > 0.0
  UNION ALL
  SELECT conv_id, 'h', session_id, ts_us, w_h FROM pwc WHERE channel_name IN ('error') AND w_h > 0.0
  UNION ALL
  SELECT conv_id, 'c', session_id, ts_us, w_c FROM pwc WHERE channel_name IN ('error') AND w_c > 0.0
), receivers AS (
  SELECT conv_id AS r_conv, session_id AS r_sid, ts_us AS r_ts, ihc AS r_ihc
  FROM pwc WHERE channel_name NOT IN ('error')
), pairs AS (
  SELECT d.conv_id, d.phase, d.d_sid, d.d_w, r.r_sid, r.r_ihc
  FROM donors d JOIN receivers r
    ON d.conv_id = r.r_conv
   AND r.r_ihc >= (CASE d.phase WHEN 'i' THEN 0.0 WHEN 'h' THEN 0.0 ELSE 0.1 END)
   AND (d.phase = 'h'
     OR (d.phase = 'i' AND (r.r_ts < d.d_ts OR (r.r_ts = d.d_ts AND r.r_sid < d.d_sid)))
     OR (d.phase = 'c' AND (r.r_ts > d.d_ts OR (r.r_ts = d.d_ts AND r.r_sid > d.d_sid))))
), denom AS (
  SELECT conv_id, phase, d_sid, MAX(d_w) AS d_w,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(r_ihc ORDER BY r_sid)),
                     (a, b) -> a + b) AS denom
  FROM pairs GROUP BY conv_id, phase, d_sid
), live AS (
  SELECT * FROM denom WHERE denom > 0.0
), transfers AS (
  SELECT p.conv_id, p.r_sid,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(((p.d_w * p.r_ihc) / l.denom) / 3.0 ORDER BY p.phase, p.d_sid)),
           (a, b) -> a + b) AS t_in
  FROM pairs p JOIN live l
    ON p.conv_id = l.conv_id AND p.phase = l.phase AND p.d_sid = l.d_sid
  GROUP BY p.conv_id, p.r_sid
), donated AS (
  SELECT conv_id, d_sid,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d_w / 3.0 ORDER BY phase)),
                     (a, b) -> a + b) AS t_out
  FROM live GROUP BY conv_id, d_sid
)
SELECT b.conv_id, b.session_id, b.channel_name, b.ihc,
       (b.ihc - COALESCE(o.t_out, 0.0)) + COALESCE(t.t_in, 0.0) AS ihc_redist
FROM pwc b
LEFT JOIN donated o ON b.conv_id = o.conv_id AND b.session_id = o.d_sid
LEFT JOIN transfers t ON b.conv_id = t.conv_id AND b.session_id = t.r_sid
ORDER BY b.conv_id, b.session_id"""

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

  val attributionIncremental: String = attrBase + """
SELECT conv_id, session_id
FROM assigned
WHERE conv_id % 3 <> 0
ORDER BY conv_id, session_id"""

  val journeyPaths: String = attrBase + """
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_journeys,
       CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM (
  SELECT conv_id,
         string_agg(channel_name, '>' ORDER BY ts_us, session_id) AS path,
         MIN(revenue) AS revenue
  FROM assigned GROUP BY conv_id) j
GROUP BY path
ORDER BY n_journeys DESC, path"""

  val channelTransitions: String = attrBase + """
SELECT channel_name AS from_channel, next_channel AS to_channel,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT conv_id, channel_name,
         LEAD(channel_name) OVER (PARTITION BY conv_id ORDER BY ts_us, session_id) AS next_channel
  FROM assigned) t
WHERE next_channel IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2"""

  /** Synchronous label propagation over the (symmetrized) channel
    * transition graph — `iters` rounds unrolled, each round = label mass
    * groupBy + per-node argmax with (wsum DESC, label ASC) tie-break,
    * in lockstep with `Markov.labelPropagation` (long sums, no floats
    * anywhere). */
  val channelCommunities: String = {
    val iters = 4
    val sb = new StringBuilder
    sb ++= attrBase
    sb ++= """
, trans AS (
  SELECT channel_name AS from_channel, next_channel AS to_channel,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT conv_id, channel_name,
           LEAD(channel_name) OVER (PARTITION BY conv_id ORDER BY ts_us, session_id) AS next_channel
    FROM assigned) t
  WHERE next_channel IS NOT NULL
  GROUP BY 1, 2
), e AS (
  SELECT from_channel AS src, to_channel AS dst, n AS weight FROM trans
  UNION ALL
  SELECT to_channel, from_channel, n FROM trans
), nodes AS (
  SELECT DISTINCT src AS node FROM e
), l0 AS (
  SELECT node, node AS label FROM nodes
)"""
    for (r <- 1 to iters) {
      sb ++= s"""
, l$r AS (
  SELECT nd.node, COALESCE(b.label, nd.node) AS label
  FROM nodes nd LEFT JOIN (
    SELECT node, label FROM (
      SELECT node, label,
             row_number() OVER (PARTITION BY node ORDER BY wsum DESC, label ASC) AS rn
      FROM (
        SELECT e.dst AS node, l.label, SUM(e.weight) AS wsum
        FROM e JOIN l${r - 1} l ON e.src = l.node
        GROUP BY e.dst, l.label) m) q
    WHERE rn = 1) b ON nd.node = b.node
)"""
    }
    sb ++= s"""
SELECT node, label AS community FROM l$iters ORDER BY node"""
    sb.result()
  }

  /** Degree-oriented triangle counting + clustering coefficient over the
    * undirected channel transition graph — wedge-at-lowest-degree-apex
    * enumeration in lockstep with `Markov.triangleCount` (exact long
    * counts, one IEEE division for the coefficient). */
  val channelTriangles: String = attrBase + """
, trans AS (
  SELECT channel_name AS from_channel, next_channel AS to_channel
  FROM (
    SELECT channel_name,
           LEAD(channel_name) OVER (PARTITION BY conv_id ORDER BY ts_us, session_id) AS next_channel
    FROM assigned) t
  WHERE next_channel IS NOT NULL
), und AS (
  SELECT DISTINCT least(from_channel, to_channel) AS a,
                  greatest(from_channel, to_channel) AS b
  FROM trans WHERE from_channel <> to_channel
), dg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und) n
  GROUP BY node
), orient AS (
  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.a < u.b) THEN u.a ELSE u.b END AS lo,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.a < u.b) THEN u.b ELSE u.a END AS hi
  FROM und u JOIN dg d1 ON u.a = d1.node JOIN dg d2 ON u.b = d2.node
), wedge AS (
  SELECT w1.lo AS apex, w1.hi AS x, w2.hi AS y
  FROM orient w1 JOIN orient w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
), closed AS (
  SELECT w.apex, w.x, w.y
  FROM wedge w JOIN (SELECT least(lo, hi) AS x, greatest(lo, hi) AS y FROM orient) e
    ON w.x = e.x AND w.y = e.y
), pern AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
  FROM (SELECT unnest([apex, x, y]) AS node FROM closed) m
  GROUP BY node
)
SELECT d.node, d.deg, CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.deg >= 2
            THEN (2.0 * CAST(COALESCE(p.triangles, 0) AS DOUBLE)) /
                 (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE))
            ELSE 0.0 END AS clustering
FROM dg d LEFT JOIN pern p ON d.node = p.node
ORDER BY d.node"""

  /** SCD2 point-in-interval enrichment: the B53 version derivation, then
    * every event left-joined to the version whose [from, to) interval
    * covers its timestamp — the relational (range-join) form as the
    * oracle for `Temporal.intervalJoin`'s union+window plan. */
  val scd2Enrich: String = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
), chg AS (
  SELECT user_id, event_id, ts_us, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS is_change
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), ver AS (
  SELECT user_id, ts_us, event_type,
         SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
  FROM chg
), g AS (
  SELECT user_id, CAST(version AS BIGINT) AS version,
         MIN(event_type) AS state, MIN(ts_us) AS valid_from_us
  FROM ver GROUP BY user_id, version
), v AS (
  SELECT *, lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us
  FROM g
)
SELECT e.event_id, e.user_id, e.ts_us, v.version, v.state
FROM ev e LEFT JOIN v
  ON e.user_id = v.user_id AND e.ts_us >= v.valid_from_us
 AND (v.valid_to_us IS NULL OR e.ts_us < v.valid_to_us)
ORDER BY e.event_id"""

  /** Market-basket support/confidence/lift over distinct order lines —
    * exact long counts, single IEEE divisions, (lift DESC, n_ab DESC,
    * item) tie-broken top-k, in lockstep with `Analytics.basketLift`. */
  val basketLift: String = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem
), no AS (
  SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM items
), ic AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY item
), pr AS (
  SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b ON a.okey = b.okey AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT pr.item_a, pr.item_b, pr.n_ab, ca.n AS n_a, cb.n AS n_b,
       CAST(pr.n_ab AS DOUBLE) / CAST(no.n_orders AS DOUBLE) AS support,
       CAST(pr.n_ab AS DOUBLE) / CAST(ca.n AS DOUBLE) AS confidence,
       (CAST(pr.n_ab AS DOUBLE) * CAST(no.n_orders AS DOUBLE)) /
         (CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE)) AS lift
FROM pr
JOIN ic ca ON pr.item_a = ca.item
JOIN ic cb ON pr.item_b = cb.item
CROSS JOIN no
ORDER BY lift DESC, n_ab DESC, item_a, item_b
LIMIT 100"""

  /** Daily-revenue EWMA: decimal-exact day rollup, then the recurrence
    * `s_t = (0.3·x_t) + ((1−0.3)·s_{t−1})` replayed by a recursive CTE —
    * the identical IEEE tree the driver fold applies per step. */
  val ordersEwma: String = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
), rk AS MATERIALIZED (
  SELECT day, revenue, row_number() OVER (ORDER BY day) AS rn FROM daily
), ew AS (
  SELECT rn, day, revenue, revenue AS ewma FROM rk WHERE rn = 1
  UNION ALL
  SELECT r.rn, r.day, r.revenue, (0.3 * r.revenue) + ((1.0 - 0.3) * e.ewma)
  FROM ew e JOIN rk r ON r.rn = e.rn + 1
)
SELECT day, revenue, ewma FROM ew ORDER BY day"""

  /** Zipf OLS fit over the top-1000 token frequencies: ordered double
    * folds of lni(rank)/lni(freq) moments in rank order (the
    * [[lniSql]] integer-ln tree — libm `ln` is NOT hash-gateable, it
    * diverges from every JVM ln on some integers in this exact range),
    * slope/intercept as the identical IEEE trees `Corpus.tokenZipf`
    * builds. */
  val tokenZipf: String = s"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), top AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM tok WHERE w <> ''
  GROUP BY w ORDER BY freq DESC, w LIMIT 1000
), ranked AS (
  SELECT w, freq, row_number() OVER (ORDER BY freq DESC, w) AS rank FROM top
), lns AS (
  SELECT rank, ${lniSql("rank")} AS lr, ${lniSql("freq")} AS lf FROM ranked
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(lr ORDER BY rank)), (a, b) -> a + b) AS sx,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(lf ORDER BY rank)), (a, b) -> a + b) AS sy,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(lr * lr ORDER BY rank)), (a, b) -> a + b) AS sxx,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list(lr * lf ORDER BY rank)), (a, b) -> a + b) AS sxy
  FROM lns
), sl AS (
  SELECT n,
         ((CAST(n AS DOUBLE) * sxy) - (sx * sy)) /
           ((CAST(n AS DOUBLE) * sxx) - (sx * sx)) AS slope,
         sx, sy
  FROM s
)
SELECT n, slope, (sy - (slope * sx)) / CAST(n AS DOUBLE) AS intercept FROM sl"""

  /** One damped PageRank power iteration, arithmetic tree in lockstep
    * with [[graft.operators.Markov.channelPagerank]]. Term sums are
    * ORDERED DOUBLE FOLDS (list_reduce over channel-sorted lists ≡ the
    * driver's sorted foldLeft) — the double→DECIMAL(38,12) cast path was
    * dropped because DuckDB's cast rounding in the half-way ambiguity
    * band is engine-internal (int64 vs hugeint decimal paths round ties
    * differently) and diverged from every driver-side bridge we could
    * write; an ordered fold has NO rounding bridge at all. */
  private def prIteration(t: Int): String = s"""
, pr$t AS MATERIALIZED (
  SELECT nd.channel,
         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n1.nn
         + CAST(0.85 AS DOUBLE) * (COALESCE(inf.inflow, CAST(0 AS DOUBLE)) + dang.d / n1.nn) AS pr
  FROM nodes nd
  CROSS JOIN n1
  CROSS JOIN (SELECT COALESCE(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list(pr ORDER BY channel)), (acc, x) -> acc + x),
                     CAST(0 AS DOUBLE)) AS d
              FROM pr${t - 1} WHERE channel NOT IN (SELECT from_channel FROM outs)) dang
  LEFT JOIN (SELECT to_channel AS channel,
                    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list(CAST(pr * p AS DOUBLE) ORDER BY edges.from_channel)),
                      (acc, x) -> acc + x) AS inflow
             FROM edges JOIN pr${t - 1} pv ON edges.from_channel = pv.channel
             GROUP BY to_channel) inf
    ON nd.channel = inf.channel)"""

  val channelPagerank: String = attrBase + """
, trans AS MATERIALIZED (
  SELECT channel_name AS from_channel, next_channel AS to_channel,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT conv_id, channel_name,
           LEAD(channel_name) OVER (PARTITION BY conv_id ORDER BY ts_us, session_id) AS next_channel
    FROM assigned) t
  WHERE next_channel IS NOT NULL
  GROUP BY 1, 2
), nodes AS MATERIALIZED (
  SELECT DISTINCT channel FROM (
    SELECT from_channel AS channel FROM trans
    UNION ALL SELECT to_channel FROM trans) u
), n1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes),
outs AS MATERIALIZED (
  SELECT from_channel, CAST(SUM(n) AS BIGINT) AS out_n FROM trans GROUP BY 1
), edges AS MATERIALIZED (
  SELECT t.from_channel, t.to_channel, CAST(n AS DOUBLE) / CAST(out_n AS DOUBLE) AS p
  FROM trans t JOIN outs o ON t.from_channel = o.from_channel
), pr0 AS MATERIALIZED (
  SELECT channel, CAST(1.0 AS DOUBLE) / n1.nn AS pr FROM nodes CROSS JOIN n1
)""" +
    (1 to 8).map(prIteration).mkString +
    """
SELECT channel, pr FROM pr8
ORDER BY pr DESC, channel"""

  /** One HITS round (a ← Lᵀh then h ← La, L1-normalized), arithmetic in
    * lockstep with [[graft.operators.Markov.channelHits]]: ordered
    * double folds over channel-sorted term lists (see [[prIteration]]'s
    * note on why the decimal cast path was dropped — sf0.1 put 4 HITS
    * terms in the cast's ambiguity band and the engines diverged). */
  private def hitsIteration(t: Int): String = s"""
, a${t}raw AS MATERIALIZED (
  SELECT nd.channel, COALESCE(s.v, CAST(0 AS DOUBLE)) AS v
  FROM nodes nd LEFT JOIN (
    SELECT tr.to_channel AS channel,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(h.v * CAST(tr.n AS DOUBLE) AS DOUBLE) ORDER BY tr.from_channel)),
             (acc, x) -> acc + x) AS v
    FROM trans tr JOIN h${t - 1} h ON h.channel = tr.from_channel
    GROUP BY tr.to_channel) s ON s.channel = nd.channel)
, a$t AS MATERIALIZED (
  SELECT r.channel, CASE WHEN nrm.s > 0 THEN r.v / nrm.s ELSE CAST(0 AS DOUBLE) END AS v
  FROM a${t}raw r CROSS JOIN
    (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY channel)),
            (acc, x) -> acc + x) AS s FROM a${t}raw) nrm)
, h${t}raw AS MATERIALIZED (
  SELECT nd.channel, COALESCE(s.v, CAST(0 AS DOUBLE)) AS v
  FROM nodes nd LEFT JOIN (
    SELECT tr.from_channel AS channel,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(a.v * CAST(tr.n AS DOUBLE) AS DOUBLE) ORDER BY tr.to_channel)),
             (acc, x) -> acc + x) AS v
    FROM trans tr JOIN a$t a ON a.channel = tr.to_channel
    GROUP BY tr.from_channel) s ON s.channel = nd.channel)
, h$t AS MATERIALIZED (
  SELECT r.channel, CASE WHEN nrm.s > 0 THEN r.v / nrm.s ELSE CAST(0 AS DOUBLE) END AS v
  FROM h${t}raw r CROSS JOIN
    (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY channel)),
            (acc, x) -> acc + x) AS s FROM h${t}raw) nrm)"""

  val channelHits: String = attrBase + """
, trans AS MATERIALIZED (
  SELECT channel_name AS from_channel, next_channel AS to_channel,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT conv_id, channel_name,
           LEAD(channel_name) OVER (PARTITION BY conv_id ORDER BY ts_us, session_id) AS next_channel
    FROM assigned) t
  WHERE next_channel IS NOT NULL
  GROUP BY 1, 2
), nodes AS MATERIALIZED (
  SELECT DISTINCT channel FROM (
    SELECT from_channel AS channel FROM trans
    UNION ALL SELECT to_channel FROM trans) u
), h0 AS MATERIALIZED (
  SELECT channel, CAST(1.0 AS DOUBLE) AS v FROM nodes
)""" +
    (1 to 8).map(hitsIteration).mkString +
    """
SELECT n.channel, h8.v AS hub, a8.v AS authority
FROM nodes n
JOIN h8 ON h8.channel = n.channel
JOIN a8 ON a8.channel = n.channel
ORDER BY n.channel"""

  val dataProfile: String = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_custkey) AS BIGINT) AS custkey_nonnull,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders"""

  val eventsAnomaly: String = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
win AS (
  SELECT *,
         COUNT(n) OVER w AS w_n,
         CAST(SUM(n) OVER w AS BIGINT) AS w_sum,
         CAST(SUM(n * n) OVER w AS BIGINT) AS w_sumsq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY event_date
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
m AS (
  SELECT event_type, event_date, n, w_n, w_sumsq,
         CAST(w_sum AS DOUBLE) / CAST(w_n AS DOUBLE) AS mean7
  FROM win WHERE w_n >= 3),
sd AS (
  SELECT event_type, event_date, n, mean7,
         sqrt(greatest(CAST(w_sumsq AS DOUBLE) / CAST(w_n AS DOUBLE) - mean7 * mean7,
                       CAST(0 AS DOUBLE))) AS std7
  FROM m),
z AS (
  SELECT event_type, event_date, n, mean7, std7,
         CASE WHEN std7 > CAST(0 AS DOUBLE)
              THEN (CAST(n AS DOUBLE) - mean7) / std7
              ELSE CAST(0 AS DOUBLE) END AS zscore
  FROM sd)
SELECT event_type, event_date, n, mean7, std7, zscore,
       abs(zscore) > CAST(2.0 AS DOUBLE) AS is_anomaly
FROM z
ORDER BY event_type, event_date"""

  val journeyHashedFeatures: String = attrBase + s"""
, fb AS (
  SELECT conv_id, revenue,
         CAST(concat('0x', substring(md5(channel_name), 1, 15)) AS BIGINT) % 16 AS b
  FROM assigned)
SELECT conv_id, MAX(revenue) AS revenue, CAST(COUNT(*) AS BIGINT) AS n_touches,
       ${(0 until 16).map(i =>
          s"CAST(SUM(CASE WHEN b = $i THEN 1 ELSE 0 END) AS BIGINT) AS f$i").mkString(", ")}
FROM fb
GROUP BY conv_id
ORDER BY conv_id"""

  /** Training-data export (extracted_training_data.py, determinized). */
  val trainingDataExport: String = attrBase + """
, sample AS (
  SELECT conv_id, user_id AS c_user_id, conv_ts_us
  FROM conversions ORDER BY conv_id LIMIT 20
)
SELECT conv_id AS conversion_id, session_id, ts_us,
       channel_name AS channel_label,
       holder_engagement, closer_engagement,
       CASE WHEN row_number() OVER (PARTITION BY conv_id
                                    ORDER BY ts_us DESC, session_id DESC) = 1
            THEN 1 ELSE 0 END AS conversion,
       impression_interaction
FROM sessions s JOIN sample c
  ON s.user_id = c.c_user_id AND s.ts_us < c.conv_ts_us
ORDER BY conversion_id, session_id"""

  val firstTouchAttribution: String = attrBase + """
SELECT channel_name, CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id
                               ORDER BY ts_us ASC, session_id ASC) AS rn
  FROM assigned) t
WHERE rn = 1
GROUP BY channel_name
ORDER BY channel_name"""

  val lastTouchAttribution: String = attrBase + """
SELECT channel_name, CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM flagged
WHERE conversion = 1
GROUP BY channel_name
ORDER BY channel_name"""

  /** One Jacobi step of the Markov absorption solve — mirrors
    * [[graft.operators.Markov.absorption]]: per-state accumulation is an
    * ORDERED DOUBLE FOLD over to-state-sorted terms (the prIteration
    * discipline — no double→decimal cast anywhere, so no tie-rounding
    * bridge to the oracle engine's internal cast semantics). */
  private def markovIter(t: Int): String = s"""
, p$t AS MATERIALIZED (
  SELECT st.r, st.s,
         COALESCE(cv.cp, CAST(0.0 AS DOUBLE)) + COALESCE(x.acc, CAST(0.0 AS DOUBLE)) AS p
  FROM states st
  LEFT JOIN convp cv ON cv.r = st.r AND cv.s = st.s
  LEFT JOIN (
    SELECT m.r, m.f AS s,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(m.prob * pp.p AS DOUBLE) ORDER BY m.t)),
             (acc, x) -> acc + x) AS acc
    FROM chant m JOIN p${t - 1} pp ON pp.r = m.r AND pp.s = m.t
    GROUP BY m.r, m.f) x ON x.r = st.r AND x.s = st.s
)"""

  val markovAttribution: String = {
    val iters = 16
    attrBase + """
, jseq AS (
  SELECT conv_id, channel_name,
         LEAD(channel_name, 1) OVER win AS nxt,
         row_number() OVER win AS rn
  FROM assigned WINDOW win AS (PARTITION BY conv_id ORDER BY ts_us, session_id)
), rsd AS (
  SELECT user_id, ts_us, session_id, channel_name FROM sessions s
  WHERE NOT EXISTS (SELECT 1 FROM assigned a WHERE a.session_id = s.session_id)
), rseq AS (
  SELECT user_id, channel_name,
         LEAD(channel_name, 1) OVER win AS nxt,
         row_number() OVER win AS rn
  FROM rsd WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, session_id)
), edges AS (
  SELECT channel_name AS f, nxt AS t FROM jseq WHERE nxt IS NOT NULL
  UNION ALL SELECT 'START', channel_name FROM jseq WHERE rn = 1
  UNION ALL SELECT channel_name, 'CONV' FROM jseq WHERE nxt IS NULL
  UNION ALL SELECT channel_name, nxt FROM rseq WHERE nxt IS NOT NULL
  UNION ALL SELECT 'START', channel_name FROM rseq WHERE rn = 1
  UNION ALL SELECT channel_name, 'NULL' FROM rseq WHERE nxt IS NULL
), trans AS MATERIALIZED (
  SELECT f AS from_state, t AS to_state, CAST(COUNT(*) AS BIGINT) AS n
  FROM edges GROUP BY f, t
), rlist AS (
  SELECT DISTINCT from_state AS r FROM trans WHERE from_state <> 'START'
  UNION ALL SELECT '<none>'
), tots AS (
  SELECT from_state AS f, CAST(SUM(n) AS BIGINT) AS ntot FROM trans GROUP BY from_state
), probs AS MATERIALIZED (
  SELECT rl.r, tr.from_state AS f,
         CASE WHEN tr.to_state = rl.r THEN 'NULL' ELSE tr.to_state END AS t,
         CAST(tr.n AS DOUBLE) / CAST(tt.ntot AS DOUBLE) AS prob
  FROM trans tr
  JOIN tots tt ON tt.f = tr.from_state
  CROSS JOIN rlist rl
  WHERE tr.from_state <> rl.r
), convp AS MATERIALIZED (
  SELECT r, f AS s, prob AS cp FROM probs WHERE t = 'CONV'
), chant AS MATERIALIZED (
  SELECT r, f, t, prob FROM probs WHERE t NOT IN ('CONV', 'NULL')
), states AS MATERIALIZED (
  SELECT DISTINCT r, f AS s FROM probs
), p0 AS MATERIALIZED (
  SELECT r, s, CAST(0.0 AS DOUBLE) AS p FROM states
)""" +
      (1 to iters).map(markovIter).mkString +
      s"""
, re AS (
  SELECT rm.r AS channel_name,
         GREATEST(CAST(1.0 AS DOUBLE) - rm.p / fl.p, CAST(0.0 AS DOUBLE)) AS removal_effect
  FROM (SELECT r, p FROM p$iters WHERE s = 'START' AND r <> '<none>') rm
  CROSS JOIN (SELECT p FROM p$iters WHERE s = 'START' AND r = '<none>') fl
), ws AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(removal_effect ORDER BY channel_name)),
           (acc, x) -> acc + x) AS w FROM re
), tot_rev AS (
  SELECT CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS total
  FROM (SELECT DISTINCT conv_id, revenue FROM assigned) t
)
SELECT channel_name, removal_effect,
       removal_effect / ws.w AS weight,
       removal_effect / ws.w * tot_rev.total AS revenue
FROM re CROSS JOIN ws CROSS JOIN tot_rev
ORDER BY channel_name"""
  }

  /** Second-order Markov — identical solve/iteration discipline to
    * [[markovAttribution]], over `prev>cur` composite states; channel
    * removal matches the CURRENT component (`split_part(state, chr(31), 2)` —
    * the chr(31) state separator matches [[graft.operators.Markov.StateSep]]). */
  val markov2Attribution: String = {
    val iters = 16
    attrBase + """
, jc AS (
  SELECT conv_id, ts_us, session_id,
         concat(coalesce(LAG(channel_name) OVER (PARTITION BY conv_id ORDER BY ts_us, session_id), 'START'),
                chr(31), channel_name) AS st
  FROM assigned
), jseq AS (
  SELECT st, LEAD(st, 1) OVER win AS nxt, row_number() OVER win AS rn
  FROM jc WINDOW win AS (PARTITION BY conv_id ORDER BY ts_us, session_id)
), rsd AS (
  SELECT user_id, ts_us, session_id, channel_name FROM sessions s
  WHERE NOT EXISTS (SELECT 1 FROM assigned a WHERE a.session_id = s.session_id)
), rc AS (
  SELECT user_id, ts_us, session_id,
         concat(coalesce(LAG(channel_name) OVER (PARTITION BY user_id ORDER BY ts_us, session_id), 'START'),
                chr(31), channel_name) AS st
  FROM rsd
), rseq AS (
  SELECT st, LEAD(st, 1) OVER win AS nxt, row_number() OVER win AS rn
  FROM rc WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, session_id)
), edges AS (
  SELECT st AS f, nxt AS t FROM jseq WHERE nxt IS NOT NULL
  UNION ALL SELECT 'START', st FROM jseq WHERE rn = 1
  UNION ALL SELECT st, 'CONV' FROM jseq WHERE nxt IS NULL
  UNION ALL SELECT st, nxt FROM rseq WHERE nxt IS NOT NULL
  UNION ALL SELECT 'START', st FROM rseq WHERE rn = 1
  UNION ALL SELECT st, 'NULL' FROM rseq WHERE nxt IS NULL
), trans AS MATERIALIZED (
  SELECT f AS from_state, t AS to_state, CAST(COUNT(*) AS BIGINT) AS n
  FROM edges GROUP BY f, t
), rlist AS (
  SELECT DISTINCT split_part(from_state, chr(31), 2) AS r FROM trans WHERE from_state <> 'START'
  UNION ALL SELECT '<none>'
), tots AS (
  SELECT from_state AS f, CAST(SUM(n) AS BIGINT) AS ntot FROM trans GROUP BY from_state
), probs AS MATERIALIZED (
  SELECT rl.r, tr.from_state AS f,
         CASE WHEN tr.to_state NOT IN ('CONV', 'NULL')
                   AND split_part(tr.to_state, chr(31), 2) = rl.r
              THEN 'NULL' ELSE tr.to_state END AS t,
         CAST(tr.n AS DOUBLE) / CAST(tt.ntot AS DOUBLE) AS prob
  FROM trans tr
  JOIN tots tt ON tt.f = tr.from_state
  CROSS JOIN rlist rl
  WHERE split_part(tr.from_state, chr(31), 2) <> rl.r
), convp AS MATERIALIZED (
  SELECT r, f AS s, prob AS cp FROM probs WHERE t = 'CONV'
), chant AS MATERIALIZED (
  SELECT r, f, t, prob FROM probs WHERE t NOT IN ('CONV', 'NULL')
), states AS MATERIALIZED (
  SELECT DISTINCT r, f AS s FROM probs
), p0 AS MATERIALIZED (
  SELECT r, s, CAST(0.0 AS DOUBLE) AS p FROM states
)""" +
      (1 to iters).map(markovIter).mkString +
      s"""
, re AS (
  SELECT rm.r AS channel_name,
         GREATEST(CAST(1.0 AS DOUBLE) - rm.p / fl.p, CAST(0.0 AS DOUBLE)) AS removal_effect
  FROM (SELECT r, p FROM p$iters WHERE s = 'START' AND r <> '<none>') rm
  CROSS JOIN (SELECT p FROM p$iters WHERE s = 'START' AND r = '<none>') fl
), ws AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(removal_effect ORDER BY channel_name)),
           (acc, x) -> acc + x) AS w FROM re
), tot_rev AS (
  SELECT CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS total
  FROM (SELECT DISTINCT conv_id, revenue FROM assigned) t
)
SELECT channel_name, removal_effect,
       removal_effect / ws.w AS weight,
       removal_effect / ws.w * tot_rev.total AS revenue
FROM re CROSS JOIN ws CROSS JOIN tot_rev
ORDER BY channel_name"""
  }

  val linearAttribution: String = attrBase + """
, lin AS (
  SELECT channel_name, revenue,
         CAST(1.0 AS DOUBLE) / CAST(COUNT(*) OVER (PARTITION BY conv_id) AS DOUBLE) AS credit
  FROM assigned
)
SELECT channel_name,
       CAST(SUM(CAST(credit AS DECIMAL(27,9))) AS DOUBLE) AS conversions,
       CAST(round(SUM(CAST(credit AS DECIMAL(10,9)) * CAST(revenue AS DECIMAL(12,6))), 9) AS DOUBLE) AS revenue
FROM lin GROUP BY channel_name ORDER BY channel_name"""

  val timeDecayAttribution: String = attrBase + """
, td AS (
  SELECT channel_name, revenue, conv_id,
         CAST(1.0 AS DOUBLE)
           / (CAST(1.0 AS DOUBLE) + CAST((conv_ts_us - ts_us) // 86400000000 AS DOUBLE)) AS w
  FROM assigned
), tdn AS (
  SELECT channel_name, revenue,
         w / CAST(SUM(CAST(w AS DECIMAL(27,9))) OVER (PARTITION BY conv_id) AS DOUBLE) AS credit
  FROM td
)
SELECT channel_name,
       CAST(SUM(CAST(credit AS DECIMAL(27,9))) AS DOUBLE) AS conversions,
       CAST(round(SUM(CAST(credit AS DECIMAL(10,9)) * CAST(revenue AS DECIMAL(12,6))), 9) AS DOUBLE) AS revenue
FROM tdn GROUP BY channel_name ORDER BY channel_name"""

  val positionAttribution: String = attrBase + """
, pos AS (
  SELECT channel_name, revenue,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts_us ASC, session_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY conv_id) AS n
  FROM assigned
), pcredit AS (
  SELECT channel_name, revenue,
         CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
              WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
              WHEN rn = 1 OR rn = n THEN CAST(0.4 AS DOUBLE)
              ELSE CAST(0.2 AS DOUBLE) / CAST(n - 2 AS DOUBLE) END AS credit
  FROM pos
)
SELECT channel_name,
       CAST(SUM(CAST(credit AS DECIMAL(27,9))) AS DOUBLE) AS conversions,
       CAST(round(SUM(CAST(credit AS DECIMAL(10,9)) * CAST(revenue AS DECIMAL(12,6))), 9) AS DOUBLE) AS revenue
FROM pcredit GROUP BY channel_name ORDER BY channel_name"""

  val q6ForecastRevenue: String = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0"""

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

  val q7VolumeShipping: String = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year"""

  val q8MarketShare: String = """
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1.0 - l_discount) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END
                     AS DECIMAL(27,6))) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year"""

  val q10ReturnedItems: String = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20"""

  /** Q9 shape adapted to this schema: supply cost stands in as
    * 0.6·p_retailprice·l_quantity (no partsupp table). */
  val q9ProfitByNation: String = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     - 0.6 * p_retailprice * l_quantity
                     AS DECIMAL(27,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC"""

  /** Q2 shape: the part-supplier offer relation derives from lineitem
    * (decimal-exact avg unit price), correlated MIN joined back by
    * equality — both engines compute the identical decimal-sum/division
    * tree, so the equality is exact. */
  val q2MinPriceSupplier: String = """
WITH geo AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT p_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS unit_price
  FROM lineitem
  JOIN geo ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD'
  GROUP BY 1, 2
), mo AS (
  SELECT p_partkey AS mp, MIN(unit_price) AS min_price
  FROM offers GROUP BY 1
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, unit_price
FROM offers
JOIN mo ON p_partkey = mp AND unit_price = min_price
JOIN geo ON l_suppkey = s_suppkey
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100"""

  /** Q11 shape: per-part value kept above 2× the mean per-part share of
    * the global total (the scale-free form of Q11's 1/SF-scaled
    * fraction) over the same restricted supplier set. */
  val q11ImportantParts: String = """
WITH perpart AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
), total AS (
  SELECT CAST(SUM(CAST(part_value AS DECIMAL(27,6))) AS DOUBLE) AS grand_total,
         CAST(COUNT(*) AS DOUBLE) AS npart
  FROM perpart
)
SELECT l_partkey, part_value
FROM perpart CROSS JOIN total
WHERE part_value > 2.0 * grand_total / npart
ORDER BY part_value DESC, l_partkey"""

  /** Q12 shape: ship-delay classes on the RAW signed microsecond diff
    * (synthetic data ships some lines before the order date — no
    * division, bit-identical thresholds). */
  val q12ShippingPriority: String = """
SELECT CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) < 2592000000000
            THEN 'FAST'
            WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) < 7776000000000
            THEN 'MEDIUM'
            ELSE 'SLOW' END AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1"""

  /** Q16 shape: distinct suppliers per part attribute triple with a
    * NOT-IN supplier exclusion (s_acctbal < 1000 standing in for the
    * complaints filter). */
  val q16SupplierCounts: String = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q21 shape: finished multi-supplier orders where exactly one
    * supplier shipped >=80 days late, counted against that supplier. */
  val q21WaitingSuppliers: String = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         epoch_us(l_shipdate) - epoch_us(o_orderdate) >= 6912000000000 AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), perorder AS (
  SELECT l_orderkey AS agg_ok,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nsupp,
         CAST(COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS BIGINT) AS nlate
  FROM li GROUP BY 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM li
JOIN perorder ON l_orderkey = agg_ok
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE late AND nsupp >= 2 AND nlate = 1 AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100"""

  /** Closed-form OLS on daily revenue per priority: the five moment
    * sums as exact decimals, then the identical slope/intercept/R²
    * IEEE arithmetic trees as the Spark side (R² = squared-correlation
    * form — no sqrt). */
  val revenueTrendOls: String = """
WITH daily AS (
  SELECT o_orderpriority AS priority,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) * 100 AS BIGINT) AS yc
  FROM orders
  GROUP BY 1, 2
), m AS (
  SELECT priority,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(CAST(yc AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * yc) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(yc AS HUGEINT) * yc) AS DOUBLE) AS syy
  FROM daily GROUP BY 1
)
SELECT priority, n_days,
       CASE WHEN (n * sxx - sx * sx) = 0.0 THEN NULL
            ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
       (sy - (CASE WHEN (n * sxx - sx * sx) = 0.0 THEN NULL
                   ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END) * sx) / n
         AS intercept,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0.0 THEN NULL
            ELSE ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2
FROM m
ORDER BY priority"""

  /** Q20 shape: excess stock = per-(part, supplier) shipped qty above
    * 2× the per-part average of those totals, PROMO parts, one nation. */
  val q20PromoSuppliers: String = """
WITH sp AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
  GROUP BY 1, 2
), perpart AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(qty AS DECIMAL(27,6))) AS DOUBLE) AS tot,
         CAST(COUNT(*) AS DOUBLE) AS nsupp
  FROM sp GROUP BY 1
), excess AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_excess_parts,
         CAST(SUM(CAST(qty AS DECIMAL(27,6))) AS DOUBLE) AS excess_qty
  FROM sp JOIN perpart ON l_partkey = pk
  WHERE qty > 2.0 * (tot / nsupp)
  GROUP BY 1
)
SELECT s_name, n_excess_parts, excess_qty
FROM excess
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
ORDER BY s_name"""

  val q15TopSupplier: String = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey"""

  val q18LargeVolume: String = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) > 250.0)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100"""

  val q19DiscountedRevenue: String = """
SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1.0 AND 11.0)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10.0 AND 20.0)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20.0 AND 30.0)"""

  val q22GlobalSales: String = """
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
FROM customer, threshold
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment"""

  val topCustomersWindow: String = """
SELECT c_custkey, c_name, revenue, CAST(rk AS INTEGER) AS rk FROM (
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

  /** One-pass session-count sweep over gap thresholds. Mirrors
    * Analytics.sessionizeGapSweep. */
  val sessionizeGapSweep: String = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
), g AS (
  SELECT user_id,
         ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
  FROM ev
), a AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS b0,
         CAST(COALESCE(SUM(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS b1,
         CAST(COALESCE(SUM(CASE WHEN gap > 7200000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS b2,
         CAST(COALESCE(SUM(CASE WHEN gap > 14400000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS b3
  FROM g
)
SELECT gap_us, n_sessions, n_events,
       CASE WHEN n_sessions = 0 THEN NULL
            ELSE CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE) END
         AS events_per_session
FROM (
  SELECT CAST(1800000000 AS BIGINT) AS gap_us, u + b0 AS n_sessions, n AS n_events FROM a
  UNION ALL SELECT CAST(3600000000 AS BIGINT), u + b1, n FROM a
  UNION ALL SELECT CAST(7200000000 AS BIGINT), u + b2, n FROM a
  UNION ALL SELECT CAST(14400000000 AS BIGINT), u + b3, n FROM a)
ORDER BY gap_us"""

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

  // ---- LLM-pipeline surface (SURVEY §2.C) ----

  private val stopList = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'"

  /** Distinct 3-gram shingles CTE over documents (mirrors Dedup.shingles). */
  private val shingleBase: String = """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, w || ' ' || LEAD(w,1) OVER win || ' ' || LEAD(w,2) OVER win AS shingle
    FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)) t
  WHERE shingle IS NOT NULL
)
"""

  val dedupExact: String = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id"""

  /** Shared ExactSubstr span chain (k = 20): every token position whose
    * 20-gram first occurs in an EARLIER doc is removable; flagged
    * positions stitch gaps-and-islands into maximal [min p, max p + 19]
    * spans (CTE `spans`). 120-bit dual-60-bit md5-segment gram ids
    * (hex chars [1,15] + [16,30]), lockstep with
    * Dedup.exactSubstringSpans / Dedup.gramIds — a single 60-bit prefix
    * is birthday-collision-prone at 10^12-gram corpus scale. */
  private def substringSpanChain: String = """
WITH tokarr AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), g0 AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 19)) AS pos
  FROM tokarr WHERE len(ts) >= 20
), g AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         CAST(concat('0x', substring(md5(array_to_string(ts[pos:pos+19], ' ')), 1, 15)) AS BIGINT) AS gid_hi,
         CAST(concat('0x', substring(md5(array_to_string(ts[pos:pos+19], ' ')), 16, 15)) AS BIGINT) AS gid_lo
  FROM g0
), fst AS (
  SELECT gid_hi, gid_lo, MIN(doc_id) AS first_doc FROM g GROUP BY gid_hi, gid_lo
), flagged AS (
  SELECT g.doc_id, g.pos FROM g JOIN fst USING (gid_hi, gid_lo) WHERE g.doc_id > fst.first_doc
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 20
              THEN 1 ELSE 0 END AS brk
  FROM flagged WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), isl2 AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
), spans AS (
  SELECT doc_id,
         MIN(pos) AS span_start,
         MAX(pos) + 19 AS span_end,
         CAST(MAX(pos) + 19 - MIN(pos) + 1 AS BIGINT) AS n_tokens
  FROM isl2 GROUP BY doc_id, island
)"""

  val dedupExactSubstring: String = substringSpanChain + """
SELECT doc_id, span_start, span_end, n_tokens FROM spans
ORDER BY doc_id, span_start"""

  /** Substring SCRUB: the cleaned corpus after cutting every span out —
    * per-token LEFT range-join against `spans` (disjoint per doc by the
    * gap rule), survivors re-joined in position order. Lockstep with
    * Dedup.exactSubstringScrub. */
  val dedupSubstringScrub: String = substringSpanChain + """
, tk AS (
  SELECT doc_id, CAST(unnest(generate_series(1, len(ts))) AS BIGINT) AS pos,
         ts FROM tokarr
), tk2 AS (
  SELECT doc_id, pos, ts[CAST(pos AS INTEGER)] AS tok FROM tk
), mk AS (
  SELECT t.doc_id, t.pos, t.tok, (s.doc_id IS NOT NULL) AS rm
  FROM tk2 t LEFT JOIN spans s
    ON s.doc_id = t.doc_id AND t.pos BETWEEN s.span_start AND s.span_end
)
SELECT doc_id,
       coalesce(array_to_string(list(tok ORDER BY pos) FILTER (WHERE NOT rm), ' '), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_tokens_before,
       CAST(COUNT(*) FILTER (WHERE rm) AS BIGINT) AS n_removed
FROM mk GROUP BY doc_id
ORDER BY doc_id"""

  /** Verbatim run recovery (per-source refinement of C82): each k-gram
    * joins its gid's corpus-wide first occurrence (lexicographic
    * min (doc_id, pos) via struct_pack min), matches chain per
    * (doc_id, src_doc, diag = pos − src_pos) with C82's q ≤ p + k
    * stitch. Lockstep with Dedup.exactSubstringRuns. */
  val dedupSubstringRuns: String = """
WITH tokarr AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), g0 AS (
  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 19)) AS pos
  FROM tokarr WHERE len(ts) >= 20
), g AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         CAST(concat('0x', substring(md5(array_to_string(ts[pos:pos+19], ' ')), 1, 15)) AS BIGINT) AS gid_hi,
         CAST(concat('0x', substring(md5(array_to_string(ts[pos:pos+19], ' ')), 16, 15)) AS BIGINT) AS gid_lo
  FROM g0
), fst AS (
  SELECT gid_hi, gid_lo, MIN(struct_pack(d := doc_id, p := pos)) AS f
  FROM g GROUP BY gid_hi, gid_lo
), fsrc AS (
  SELECT gid_hi, gid_lo, f.d AS src_doc, f.p AS src_pos FROM fst
), m AS (
  SELECT g.doc_id, g.pos, fsrc.src_doc, g.pos - fsrc.src_pos AS diag
  FROM g JOIN fsrc USING (gid_hi, gid_lo) WHERE g.doc_id > fsrc.src_doc
), isl AS (
  SELECT doc_id, pos, src_doc, diag,
         CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 20
              THEN 1 ELSE 0 END AS brk
  FROM m WINDOW w AS (PARTITION BY doc_id, src_doc, diag ORDER BY pos)
), isl2 AS (
  SELECT doc_id, pos, src_doc, diag,
         SUM(brk) OVER (PARTITION BY doc_id, src_doc, diag ORDER BY pos) AS island
  FROM isl
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 19 AS span_end,
       CAST(MAX(pos) + 19 - MIN(pos) + 1 AS BIGINT) AS n_tokens,
       src_doc,
       MIN(pos) - diag AS src_start
FROM isl2 GROUP BY doc_id, src_doc, diag, island
ORDER BY doc_id, span_start, src_doc, src_start"""

  /** Shared minhash chain through the LSH candidate pairs. */
  private val minhashCandBase: String = {
    def a(j: Int): Long = 1299721L + 104729L * j
    def b(j: Int): Long = 15485863L * j + 32452843L
    val minCols = (0 until 16)
      .map(j => s"MIN((${a(j)} * hw + ${b(j)}) % 2147483647) AS mh$j")
      .mkString(",\n         ")
    val bandSelects = (0 until 8)
      .map(bb => s"SELECT doc_id, $bb AS band, md5(concat_ws('|', " +
        s"CAST(least(mh${2 * bb}, mh${2 * bb + 1}) AS VARCHAR), " +
        s"CAST(greatest(mh${2 * bb}, mh${2 * bb + 1}) AS VARCHAR))) AS band_hash FROM sig")
      .mkString("\n  UNION ALL ")
    shingleBase + s"""
, sig AS (
  SELECT doc_id,
         $minCols
  FROM (SELECT doc_id,
               CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS hw
        FROM sh) hs
  GROUP BY doc_id
), bands0 AS (
  $bandSelects
), bands AS (
  -- hot-bucket guard, lockstep with Dedup.capBuckets: buckets wider than
  -- 1000 docs are dropped before the candidate join
  SELECT b.* FROM bands0 b
  JOIN (SELECT band, band_hash FROM bands0
        GROUP BY band, band_hash HAVING COUNT(*) <= 1000) w
    ON b.band = w.band AND b.band_hash = w.band_hash
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
)
"""
  }

  val dedupMinhashLsh: String = {
    val matchTerms = (0 until 16)
      .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    minhashCandBase + s"""
SELECT c.doc_a, c.doc_b,
       CAST(($matchTerms) AS DOUBLE) / 16.0 AS est_jaccard
FROM cand c
JOIN sig a ON a.doc_id = c.doc_a
JOIN sig b ON b.doc_id = c.doc_b
ORDER BY c.doc_a, c.doc_b"""
  }

  /** MinHash estimator calibration: per LSH candidate pair, the 16-lane
    * estimate, the exact shingle-set Jaccard (md5-sid keyed, candidates
    * only), and the absolute error. Mirrors Dedup.minhashEval. */
  val dedupMinhashEval: String = {
    val matchTerms = (0 until 16)
      .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    minhashCandBase + s"""
, est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(($matchTerms) AS DOUBLE) / 16.0 AS est_jaccard
  FROM cand c
  JOIN sig a ON a.doc_id = c.doc_a
  JOIN sig b ON b.doc_id = c.doc_b
), sarr AS (
  -- per-doc shingle SET (sh is already distinct per doc); exact jaccard
  -- is one row-local list_intersect per pair — lockstep with
  -- Dedup.minhashEval's array_intersect formulation
  SELECT doc_id, list(shingle) AS sl FROM sh GROUP BY doc_id
), exact AS (
  SELECT e.doc_a, e.doc_b, e.est_jaccard,
         CAST(len(list_intersect(a.sl, b.sl)) AS BIGINT) AS nc,
         CAST(len(a.sl) AS BIGINT) AS na, CAST(len(b.sl) AS BIGINT) AS nb
  FROM est e
  JOIN sarr a ON a.doc_id = e.doc_a
  JOIN sarr b ON b.doc_id = e.doc_b
)
SELECT doc_a, doc_b, est_jaccard,
       CAST(nc AS DOUBLE) / CAST(na + nb - nc AS DOUBLE) AS jaccard,
       abs(est_jaccard - CAST(nc AS DOUBLE) / CAST(na + nb - nc AS DOUBLE)) AS abs_err
FROM exact
ORDER BY doc_a, doc_b"""
  }

  /** Incremental new-batch-vs-corpus admission: the symmetric candidate
    * set XOR-filtered to cross-side pairs (new = doc_id % 5 = 0), best
    * corpus match per new doc via struct-min argmax (max estimate, min
    * corpus doc on ties), admit = best estimate < 0.5. The shared
    * `cand` CTE's bucket cap counts both sides of every bucket — the
    * exact population Dedup.minhashIncremental caps. Lockstep with
    * Dedup.minhashIncremental. */
  val dedupMinhashIncremental: String = {
    val matchTerms = (0 until 16)
      .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    minhashCandBase + s"""
, xp AS (
  SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS new_doc,
         CASE WHEN doc_a % 5 = 0 THEN doc_b ELSE doc_a END AS dup_of
  FROM cand
  WHERE (doc_a % 5 = 0) <> (doc_b % 5 = 0)
), est AS (
  SELECT x.new_doc, x.dup_of,
         CAST(($matchTerms) AS DOUBLE) / 16.0 AS ej
  FROM xp x
  JOIN sig a ON a.doc_id = x.new_doc
  JOIN sig b ON b.doc_id = x.dup_of
), best AS (
  SELECT new_doc, MIN(struct_pack(ne := -ej, d := dup_of)) AS f
  FROM est GROUP BY new_doc
)
SELECT d.doc_id AS new_doc, f.d AS dup_of, -f.ne AS est_jaccard,
       (f.ne IS NULL OR -f.ne < 0.5) AS admit
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN best ON best.new_doc = d.doc_id
ORDER BY new_doc"""
  }

  /** Leakage-free cluster-aware split: recursive-CTE CC labels over the
    * LSH candidates, rep = coalesce(cluster min, own id), md5-bucket of
    * the rep string → train (<8) / val. Lockstep with
    * Dedup.leakageFreeSplit. */
  val splitLeakageFree: String =
    minhashCandBase.replaceFirst("^WITH ", "WITH RECURSIVE ") + """
, sym AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM cand
), r AS (
  SELECT DISTINCT a AS node, a AS label FROM sym
  UNION
  SELECT s.a AS node, r.label AS label FROM sym s JOIN r ON r.node = s.b
), cl AS (
  SELECT node, CAST(MIN(label) AS BIGINT) AS cluster_id FROM r GROUP BY node
), reps AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep
  FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
)
SELECT doc_id, rep,
       CASE WHEN CAST(concat('0x', substring(md5(CAST(rep AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8
            THEN 'train' ELSE 'val' END AS split
FROM reps
ORDER BY doc_id"""

  /** Chunk-granularity exact dedup: disjoint 64-word chunks, md5 per
    * chunk, corpus-wide first occurrence kept. Mirrors Dedup.chunkDedup
    * (same slicing: 1-based inclusive window of 64 words, clamped). */
  val dedupChunks: String = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 1
), ch AS (
  SELECT doc_id,
         CAST(unnest(range(0, ((len(words) - 1) // 64) + 1)) AS BIGINT) AS chunk_id,
         words
  FROM w
), h AS (
  SELECT doc_id, chunk_id,
         md5(array_to_string(
           words[(CAST(chunk_id * 64 AS INTEGER) + 1):(CAST(chunk_id * 64 AS INTEGER) + 64)],
           ' ')) AS chunk_hash
  FROM ch
)
SELECT doc_id, chunk_id, chunk_hash,
       CAST(COUNT(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS n_copies,
       (row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_id) = 1) AS kept
FROM h
ORDER BY doc_id, chunk_id"""

  /** Per-(lang, source) corpus data card: volumes + C9 quality profile,
    * decimal-exact mean. Mirrors Corpus.corpusDatasheet. */
  val corpusDatasheet: String = s"""
WITH q AS (
  SELECT doc_id, lang, source, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
           + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
           + (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS q
  FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(q) AS min_quality,
       MAX(q) AS max_quality,
       CAST(SUM(CAST(q AS DECIMAL(27,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_quality
FROM q
GROUP BY lang, source
ORDER BY lang, source"""

  /** Deterministic epoch-0 shuffle/shard assignment: md5(epoch_docid)
    * key, shard = key mod 8, pos = rank within shard. Mirrors
    * Corpus.trainingShards. */
  val trainingShards: String = """
WITH k AS (
  SELECT doc_id,
         md5(CAST(0 AS VARCHAR) || '_' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
), s AS (
  SELECT doc_id, shuffle_key,
         CAST(concat('0x', substring(shuffle_key, 1, 15)) AS BIGINT) % 8 AS shard
  FROM k
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos,
       shuffle_key
FROM s
ORDER BY shard, pos"""

  /** Shard integrity manifest: per shard, doc count plus two mod-(2^61−1)
    * checksums over 60-bit md5(text) prefixes — content (order-free sum)
    * and order (pos-weighted, per-term mod). Exact HUGEINT arithmetic
    * mirrors Spark's DECIMAL(38,0) sums term-for-term. Lockstep with
    * Corpus.shardChecksums. */
  val shardChecksums: String = """
WITH k AS (
  SELECT doc_id,
         md5(CAST(0 AS VARCHAR) || '_' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
), s AS (
  SELECT doc_id, shuffle_key,
         CAST(concat('0x', substring(shuffle_key, 1, 15)) AS BIGINT) % 8 AS shard
  FROM k
), sp AS (
  SELECT doc_id, shard,
         CAST(row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
  FROM s
), h AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT) AS h
  FROM documents
)
SELECT sp.shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(h.h AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS content_checksum,
       CAST(SUM(CAST(sp.pos AS HUGEINT) * h.h % 2305843009213693951) % 2305843009213693951 AS BIGINT) AS order_checksum
FROM sp JOIN h USING (doc_id)
GROUP BY sp.shard
ORDER BY shard"""

  /** LSH candidates CONFIRMED by Levenshtein over the 200-char prefix,
    * kept within 20 edits — mirrors Dedup.editVerified (same unit-cost
    * Levenshtein, same 1-based substring in both engines). */
  val dedupEditVerified: String = minhashCandBase + """
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(substring(da.text, 1, 200),
                        substring(db.text, 1, 200)) AS BIGINT) AS edit_dist
FROM cand c
JOIN documents da ON da.doc_id = c.doc_a
JOIN documents db ON db.doc_id = c.doc_b
WHERE levenshtein(substring(da.text, 1, 200), substring(db.text, 1, 200)) <= 20
ORDER BY c.doc_a, c.doc_b"""

  /** Deterministic ±1 Johnson–Lindenstrauss projection 64→16 dims:
    * sign(i,j) from the md5("i_j") first-hex-digit parity (the simhash
    * discipline), decimal-exact per-dimension dot, /sqrt(16). Mirrors
    * Similarity.rpProject. */
  val embedRpProject: String = """
WITH ux AS (
  -- x stays REAL: the ±1 matrix makes each term ±x exactly, so the
  -- decimal term is the float's SHORTEST-REPR string cast (the
  -- labelCentroids discipline) — exact at scale 12, no binary-expansion
  -- rounding to diverge between engines
  SELECT vec_id, CAST(CAST(x AS VARCHAR) AS DECIMAL(38,12)) AS xd, pos - 1 AS i FROM (
    SELECT vec_id, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings) t
), s AS (
  SELECT i.i, j.j,
         substring(md5(CAST(i.i AS VARCHAR) || '_' || CAST(j.j AS VARCHAR)), 1, 1)
           IN ('1','3','5','7','9','b','d','f') AS neg
  FROM (SELECT unnest(range(0, 64)) AS i) i
  CROSS JOIN (SELECT unnest(range(0, 16)) AS j) j
)
SELECT u.vec_id, CAST(s.j AS BIGINT) AS out_dim,
       CAST(SUM(CASE WHEN s.neg THEN -u.xd ELSE u.xd END) AS DOUBLE)
         / sqrt(CAST(16 AS DOUBLE)) AS y
FROM ux u JOIN s ON s.i = u.i
GROUP BY u.vec_id, s.j
ORDER BY vec_id, out_dim"""

  /** Connected components over the LSH candidate pairs via recursive CTE:
    * label = min doc_id reachable (mirrors Dedup.clusters' fixpoint). */
  val dedupClusters: String =
    minhashCandBase.replaceFirst("^WITH ", "WITH RECURSIVE ") + """
, sym AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM cand
), r AS (
  SELECT DISTINCT a AS node, a AS label FROM sym
  UNION
  SELECT s.a AS node, r.label AS label FROM sym s JOIN r ON r.node = s.b
)
SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
FROM r
GROUP BY node
ORDER BY doc_id"""

  /** Cluster-size histogram over the recursive-CTE CC labels (power-of-
    * two buckets). Mirrors Dedup.clusterSizeHistogram. */
  val dedupClusterSizes: String =
    minhashCandBase.replaceFirst("^WITH ", "WITH RECURSIVE ") + """
, sym AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM cand
), r AS (
  SELECT DISTINCT a AS node, a AS label FROM sym
  UNION
  SELECT s.a AS node, r.label AS label FROM sym s JOIN r ON r.node = s.b
), cl AS (
  SELECT node, CAST(MIN(label) AS BIGINT) AS cluster_id FROM r GROUP BY node
), sz AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size FROM cl GROUP BY cluster_id
), b AS (
  SELECT CAST(length(format('{:b}', size)) - 1 AS BIGINT) AS bucket, size FROM sz
)
SELECT bucket,
       CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS size_lo,
       CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS size_hi,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(size) AS BIGINT) AS n_docs
FROM b GROUP BY bucket
ORDER BY bucket"""

  /** Quality-aware cluster representative selection: recursive-CTE CC
    * over the LSH candidates (singletons = own cluster), keep the
    * highest-quality copy per cluster (C9 score, doc_id tiebreak).
    * Mirrors Dedup.clusterRepresentatives. */
  val dedupKeepBest: String =
    minhashCandBase.replaceFirst("^WITH ", "WITH RECURSIVE ") + s"""
, sym AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM cand
), r AS (
  SELECT DISTINCT a AS node, a AS label FROM sym
  UNION
  SELECT s.a AS node, r.label AS label FROM sym s JOIN r ON r.node = s.b
), cc AS (
  SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
  FROM r GROUP BY node
), q AS (
  SELECT doc_id,
         least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 + unique_ratio * 0.3
           + (1.0 - stopword_ratio) * 0.3 AS quality_score
  FROM (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS unique_ratio,
           CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
    FROM documents) t
)
SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id, q.quality_score,
       (row_number() OVER (PARTITION BY COALESCE(cc.cluster_id, d.doc_id)
                           ORDER BY q.quality_score DESC, d.doc_id) = 1) AS kept
FROM documents d
JOIN q ON q.doc_id = d.doc_id
LEFT JOIN cc ON cc.doc_id = d.doc_id
ORDER BY d.doc_id"""

  /** Hybrid clustering: MinHash candidate pairs ∪ embedding-cosine pairs
    * (≥ 0.3, via the shared trained-quantizer cell blocking —
    * dedup_embedding's candidate chain verbatim) → recursive-CTE
    * connected components (mirrors Dedup.hybridClusters). */
  val dedupHybridClusters: String = {
    minhashCandBase.replaceFirst("^WITH ", "WITH RECURSIVE ") + ", " +
      featCore + quantCont(2, autoKExpr) + cellPairCont + s"""
, allpairs AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION ALL
  SELECT vec_a AS a, vec_b AS b FROM sdots WHERE cosine >= 0.3
), sym AS MATERIALIZED (
  SELECT a, b FROM allpairs
  UNION ALL
  SELECT b AS a, a AS b FROM allpairs
), r AS (
  SELECT DISTINCT a AS node, a AS label FROM sym
  UNION
  SELECT s.a AS node, r.label AS label FROM sym s JOIN r ON r.node = s.b
)
SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
FROM r
GROUP BY node
ORDER BY doc_id"""
  }

  val dedupSimhash: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN substr(md5(w), CAST(b + 1 AS INTEGER), 1)
                       IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS s
  FROM tok CROSS JOIN (SELECT unnest(range(32)) AS b) bs
  GROUP BY doc_id, b
), sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT doc_id, simhash, (simhash >> 16) AS bucket
FROM sim
ORDER BY doc_id"""

  val dedupNgramJaccard: String = shingleBase + """
, shi AS (
  -- 60-bit md5-prefix shingle ids, lockstep with Dedup.ngramJaccard's
  -- shuffle-narrowing projection (identical md5 → identical merges even
  -- under a collision)
  SELECT doc_id, CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS sid
  FROM sh
), keep AS (
  SELECT sid FROM (SELECT sid, COUNT(*) AS df FROM shi GROUP BY sid) d
  WHERE df <= 1000
), shf AS (
  SELECT shi.doc_id, shi.sid FROM shi JOIN keep USING (sid)
), dc AS (
  SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shf a JOIN shf b ON a.sid = b.sid AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE) AS jaccard
FROM inter
JOIN dc na ON na.doc_id = doc_a
JOIN dc nb ON nb.doc_id = doc_b
ORDER BY doc_a, doc_b"""

  /** Per-doc n-gram novelty: fraction of shingles whose corpus-wide min
    * doc_id is this doc. Mirrors Dedup.ngramNovelty (md5-sid keys). */
  val ngramNovelty: String = shingleBase + """
, shi AS (
  SELECT doc_id, CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS sid
  FROM sh
), fst AS (
  SELECT sid, MIN(doc_id) AS first_doc FROM shi GROUP BY sid
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS BIGINT) AS n_novel,
       CAST(COUNT(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM shi s JOIN fst f USING (sid)
GROUP BY s.doc_id
ORDER BY s.doc_id"""

  /** One 8-bit sign band over dims [band·8, band·8+8) — generated to
    * mirror VectorFunctions.signBand term by term. */
  private def bandSql(band: Int): String = (0 until 8)
    .map(b => s"(CASE WHEN embedding[${band * 8 + b + 1}] > 0 THEN ${1L << b} ELSE 0 END)")
    .mkString(" + ")

  /** Exact-norm + sign-band feature CTEs over embeddings (continuation
    * form, no leading WITH): `bucket` is the 8-bit LSH bucket (= band 0),
    * b0..b3 the banded blocking keys (used by the LSH index oracles). */
  private def featCore: String = s"""nrm AS (
  SELECT vec_id,
         sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ux
  GROUP BY vec_id
), feat AS (
  SELECT e.vec_id, e.embedding, (${bandSql(0)}) AS bucket,
         (${bandSql(0)}) AS b0, (${bandSql(1)}) AS b1,
         (${bandSql(2)}) AS b2, (${bandSql(3)}) AS b3, n.nrm
  FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id
)
"""

  private def featBase: String = "WITH " + featCore

  /** Cell-blocked candidate pairs with decimal-exact cosine — the shared
    * continuation behind dedup_embedding / dedup_semantic /
    * dedup_hybrid_clusters: argmax cell assignment off `cdotF`, the
    * within-cell id self-join, and the exact cosine per pair. */
  private def cellPairCont: String = """
, asgF AS (
  SELECT vec_id, cid AS cell, cosc AS cos_centroid FROM (
    SELECT vec_id, cid, dot / (nrm * cnrm) AS cosc,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x WHERE rn = 1
), scand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM asgF a JOIN asgF b ON a.cell = b.cell AND a.vec_id < b.vec_id
), sdots AS (
  -- ordered double fold (≡ Spark dotFold), NOT the decimal-cast sum: at
  -- within-cell pair volume the double→decimal half-up ambiguity band
  -- is a statistical certainty (the knnPairsBase measurement: 2/2500)
  SELECT c.vec_a, c.vec_b,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(fa.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(fb.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (fa.nrm * fb.nrm) AS cosine
  FROM scand c
  JOIN feat fa ON fa.vec_id = c.vec_a
  JOIN feat fb ON fb.vec_id = c.vec_b
)"""

  /** Embedding near-dup pairs via the SELF-SCALING trained-quantizer
    * blocking — lockstep with `Dedup.embeddingNearDup` (which shares
    * `semanticScored`'s candidate machinery): the r10 fixed-1024-bucket
    * sign-band LSH is gone on both sides. */
  val dedupEmbedding: String =
    trainedQuantBase(2, autoKExpr) + cellPairCont + """
SELECT vec_a, vec_b, cosine
FROM sdots
WHERE cosine >= 0.3
ORDER BY vec_a, vec_b"""

  /** Exact brute-force top-k, parametrized — the shared truth side for
    * the recall and nDCG/MRR eval oracles. */
  private def bruteTopKSql(nQueries: Int, k: Int): String = featBase + s"""
, q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < $nQueries
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce, nrm AS c_nrm FROM feat
), dots AS (
  SELECT query_id, neighbor_id, q_nrm, c_nrm,
         CAST(SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM q JOIN c ON query_id <> neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY query_id, neighbor_id, q_nrm, c_nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * c_nrm) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= $k
ORDER BY query_id, rnk"""

  val annBruteforceTopK: String = bruteTopKSql(8, 10)

  /** Exact top-k under a metadata predicate (label = 0). Mirrors
    * Similarity.filteredTopK: the candidate set is filtered BEFORE any
    * distance arithmetic, so results are the true top-k of the filtered
    * corpus. */
  val annFilteredTopK: String = """
WITH nrm AS (
  SELECT vec_id,
         sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) ux
  GROUP BY vec_id
), feat AS (
  SELECT e.vec_id, e.embedding, e.label, n.nrm
  FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), c AS (
  SELECT vec_id AS neighbor_id, label, embedding AS ce, nrm AS c_nrm
  FROM feat WHERE label = 0
), dots AS (
  SELECT query_id, neighbor_id, label, q_nrm, c_nrm,
         CAST(SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM q JOIN c ON query_id <> neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY query_id, neighbor_id, label, q_nrm, c_nrm
), scored AS (
  SELECT query_id, neighbor_id, label, dot / (q_nrm * c_nrm) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, label, cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""

  /** nDCG@k + MRR of an approximate ranking vs a ground-truth ranking,
    * lockstep with `Similarity.rankedEval`: graded gain `k − t_rank + 1`
    * from the exact list, discount `lni(p+1)` (the base cancels in the
    * nDCG ratio so the cross-engine integer-ln tree serves), DCG/IDCG as
    * position-ordered double folds, MRR = 1/p of the true top-1. */
  private def rankedEvalSql(truthSql: String, approxSql: String, k: Int): String = s"""
WITH tr AS (
  SELECT query_id, neighbor_id, "rank" AS t_rank FROM ($truthSql) WHERE "rank" <= $k
), ap AS (
  SELECT query_id, neighbor_id, "rank" AS p FROM ($approxSql) WHERE "rank" <= $k
), j AS (
  SELECT a.query_id, a.p, COALESCE($k - t.t_rank + 1, 0) AS rel, t.t_rank
  FROM ap a LEFT JOIN tr t
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
), d AS (
  SELECT query_id,
         CAST(COUNT(t_rank) AS BIGINT) AS n_hits,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(rel AS DOUBLE) / ${lniSql("CAST(p + 1 AS BIGINT)")} ORDER BY p)),
           (acc, v) -> acc + v) AS dcg,
         MAX(CASE WHEN t_rank = 1 THEN CAST(1.0 AS DOUBLE) / CAST(p AS DOUBLE) END) AS mrr0
  FROM j GROUP BY query_id
), i AS (
  SELECT query_id,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST($k - t_rank + 1 AS DOUBLE) / ${lniSql("CAST(t_rank + 1 AS BIGINT)")} ORDER BY t_rank)),
           (acc, v) -> acc + v) AS idcg
  FROM tr GROUP BY query_id
)
SELECT i.query_id,
       COALESCE(d.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       COALESCE(d.dcg, CAST(0.0 AS DOUBLE)) AS dcg, i.idcg,
       COALESCE(d.dcg / i.idcg, CAST(0.0 AS DOUBLE)) AS ndcg,
       COALESCE(d.mrr0, CAST(0.0 AS DOUBLE)) AS mrr
FROM i LEFT JOIN d ON i.query_id = d.query_id
ORDER BY i.query_id"""

  /** One joint-subspace PQ Lloyd iteration: assignment of every SAMPLE
    * subvector to its nearest codebook entry under the ENCODE metric
    * (`−2·x_j·c + |c|²`, ties → min code), then the string-cast-decimal
    * exact mean per (subspace, code, dim) rounded to REAL, empty cells
    * keeping their previous entry — lockstep with
    * `Similarity.trainPqCodebooks`. */
  private def pqIteration(t: Int, src: String = "embeddings",
      srcCol: String = "embedding"): String = s"""
, psq$t AS (
  SELECT j, code,
         CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sumsq
  FROM pcb$t GROUP BY j, code
), pdot$t AS (
  SELECT f.vec_id, c.j, c.code,
         -2 * CAST(SUM(CAST(CAST(f.embedding[c.j*8 + c.i] AS DOUBLE) * CAST(c.v AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           + s.sumsq AS d
  FROM ptrain f CROSS JOIN pcb$t c JOIN psq$t s ON s.j = c.j AND s.code = c.code
  GROUP BY f.vec_id, c.j, c.code, s.sumsq
), pasg$t AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
    FROM pdot$t) x WHERE rn = 1
), pmean${t + 1} AS (
  SELECT a.j, a.code, ix.i,
         CAST(CAST(SUM(CAST(CAST(e.$srcCol[a.j*8 + ix.i] AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS REAL) AS v
  FROM pasg$t a JOIN $src e ON e.vec_id = a.vec_id
  CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix
  GROUP BY a.j, a.code, ix.i
), pcb${t + 1} AS MATERIALIZED (
  SELECT p.j, p.code, p.i, COALESCE(c.v, p.v) AS v
  FROM pcb$t p LEFT JOIN pmean${t + 1} c ON c.j = p.j AND c.code = p.code AND c.i = p.i
)"""

  /** PQ-ADC top-k — mirrors [[graft.operators.Similarity.pqTopK]] step by
    * step: per-subspace codebooks initialized from the first 16 vectors'
    * slices, TRAINED by two joint-subspace Lloyd iterations over the
    * md5-bucket sample ([[pqIteration]]), argmin encoding on
    * `−2·x_j·c + |c|²` (ties → min code), reconstruction by ordered
    * concat of the chosen entries, then the standard decimal-exact cosine
    * against the reconstruction. */
  /** The PQ encode chain — codebook init/training and the corpus
    * encode + reconstruction (`recn`: neighbor_id, recon, recon_nrm) —
    * shared by the standalone PQ and the composed IVF+PQ oracles,
    * lockstep with [[graft.operators.Similarity.trainPqCodebooks]] /
    * `pqCode`. Assumes `feat` and `nvec` are already defined. */
  private def pqEncodeChain(iters: Int): String = """
, js AS (SELECT unnest(range(0, 8)) AS j)
, pcb0 AS MATERIALIZED (
  SELECT j, vec_id AS code, ix.i, embedding[j*8 + ix.i] AS v
  FROM embeddings CROSS JOIN js CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix
  WHERE vec_id < 16
), ptrain AS MATERIALIZED (
  -- deterministic md5-bucket training sample, lockstep with
  -- Similarity.trainPqCodebooks: bucket < ceil(10000*4096/N), clamped
  SELECT e.vec_id, e.embedding FROM embeddings e, nvec
  WHERE CAST(concat('0x', substring(md5(CAST(e.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
        < LEAST(10000, CAST(ceil(10000.0 * 4096 / n) AS BIGINT))
)""" +
    (0 until iters).map(t => pqIteration(t)).mkString +
    s"""
, cbs AS MATERIALIZED (
  SELECT j, code, list(v ORDER BY i) AS sub
  FROM pcb$iters GROUP BY j, code
), cbq AS MATERIALIZED (
  SELECT j, code, sub,
         CAST(SUM(CAST(CAST(sub[i] AS DOUBLE) * CAST(sub[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sumsq
  FROM cbs CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix
  GROUP BY j, code, sub
), dist AS (
  SELECT e.vec_id, c.j, c.code,
         -2 * CAST(SUM(CAST(CAST(e.embedding[c.j*8 + i] AS DOUBLE) * CAST(c.sub[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           + c.sumsq AS d
  FROM embeddings e CROSS JOIN cbq c
  CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix
  GROUP BY e.vec_id, c.j, c.code, c.sumsq
), enc AS MATERIALIZED (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
    FROM dist) t
  WHERE rn = 1
), rec AS MATERIALIZED (
  SELECT en.vec_id AS neighbor_id, flatten(list(c.sub ORDER BY en.j)) AS recon
  FROM enc en JOIN cbs c ON c.j = en.j AND c.code = en.code
  GROUP BY en.vec_id
), recn AS MATERIALIZED (
  SELECT neighbor_id, recon,
         sqrt(CAST(SUM(CAST(CAST(recon[i] AS DOUBLE) * CAST(recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS recon_nrm
  FROM rec CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
  GROUP BY neighbor_id, recon
)"""

  val annPqTopK: String = {
    featBase + """
, nvec AS (
  SELECT COUNT(*) AS n FROM embeddings
)""" + pqEncodeChain(2) + """
, q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), dots AS (
  SELECT query_id, neighbor_id, q_nrm, recon_nrm,
         CAST(SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM q JOIN recn ON query_id <> neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY query_id, neighbor_id, q_nrm, recon_nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * recon_nrm) AS adc_cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * recon_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, adc_cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  /** Composed IVF+PQ oracle: the shared trained-quantizer chain routes
    * corpus vectors to cells and queries to their 2 nearest cells, the
    * shared PQ encode chain supplies each candidate's reconstruction,
    * and probed candidates are scored by the same decimal-exact ADC
    * cosine — lockstep with `Similarity.ivfPqTopK`. */
  val annIvfPqTopK: String = ivfPqTopKSql(2)

  /** [[annIvfPqTopK]] parameterized by probe budget — the quantizer and
    * codebook chains are deterministic, so re-instantiating them per
    * branch is value-identical to the Spark side's train-once. */
  private def ivfPqTopKSql(np: Int): String = {
    trainedQuantBase(2) + pqEncodeChain(2) + s"""
, asgC AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x WHERE rn = 1
), probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS qrn
    FROM cdotF WHERE vec_id < 8) t
  WHERE qrn <= $np
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN asgC a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), dots AS (
  SELECT cd.query_id, cd.neighbor_id, q.q_nrm, r.recon_nrm,
         CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(r.recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM cand cd
  JOIN q ON q.query_id = cd.query_id
  JOIN recn r ON r.neighbor_id = cd.neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.neighbor_id, q.q_nrm, r.recon_nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * recon_nrm) AS adc_cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * recon_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, adc_cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  /** ADC-vs-exact agreement of the corpus embedding index's two at-rest
    * serving paths, lockstep with the `corpus_semantic_adc` entry: the
    * state ingests the embeddings table as documents whole, so the
    * at-rest quantizer is `trainCentroids(corpus, autoCellCount(n), 2)`
    * (the autoKExpr chain) and the frozen codebooks are
    * `trainPqCodebooks(corpus, 8, 16, 2)` (the pq encode chain). Both
    * serving paths probe each query's 2 nearest cells WITHOUT self-
    * exclusion (serving treats queries as external vectors): the ADC
    * path scores candidates against their PQ reconstruction
    * (decimal-exact cosine), keeps the top 32, re-ranks those by the
    * exact ordered-fold cosine and serves the top 10; the exact path
    * ranks the same candidates by the ordered-fold cosine directly.
    * Output: per query, how many of the exact top-10 the ADC-served
    * top-10 recovered. */
  val corpusSemanticAdc: String = {
    trainedQuantBase(2, autoKExpr) + pqEncodeChain(2) + s"""
, asgA AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x WHERE rn = 1
), probesA AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS qrn
    FROM cdotF WHERE vec_id < 8) t
  WHERE qrn <= 2
), candA AS (
  SELECT p.query_id, a.vec_id AS doc_id
  FROM probesA p JOIN asgA a ON p.cell = a.cell
), qA AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), adots AS (
  SELECT cd.query_id, cd.doc_id, q.q_nrm, r.recon_nrm,
         CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(r.recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM candA cd
  JOIN qA q ON q.query_id = cd.query_id
  JOIN recn r ON r.neighbor_id = cd.doc_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.doc_id, q.q_nrm, r.recon_nrm
), short AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot / (q_nrm * recon_nrm) DESC, doc_id) AS arn
    FROM adots) t
  WHERE arn <= 32
), served AS (
  SELECT query_id, doc_id FROM (
    SELECT s.query_id, s.doc_id,
           row_number() OVER (PARTITION BY s.query_id ORDER BY
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(fc.embedding,
                 (x, i) -> CAST(x AS DOUBLE) * CAST(fq.embedding[i] AS DOUBLE))),
               (acc, v) -> acc + v) / (fc.nrm * fq.nrm) DESC, s.doc_id) AS rnk
    FROM short s
    JOIN feat fq ON fq.vec_id = s.query_id
    JOIN feat fc ON fc.vec_id = s.doc_id) t
  WHERE rnk <= 10
), exactS AS (
  SELECT query_id, doc_id FROM (
    SELECT c.query_id, c.doc_id,
           row_number() OVER (PARTITION BY c.query_id ORDER BY
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(fc.embedding,
                 (x, i) -> CAST(x AS DOUBLE) * CAST(fq.embedding[i] AS DOUBLE))),
               (acc, v) -> acc + v) / (fc.nrm * fq.nrm) DESC, c.doc_id) AS rnk
    FROM candA c
    JOIN feat fq ON fq.vec_id = c.query_id
    JOIN feat fc ON fc.vec_id = c.doc_id) t
  WHERE rnk <= 10
)
SELECT e.query_id,
       CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
         CAST(COUNT(*) AS DOUBLE) AS agreement
FROM exactS e
LEFT JOIN served s ON s.query_id = e.query_id AND s.doc_id = e.doc_id
GROUP BY e.query_id
ORDER BY e.query_id"""
  }

  /** Metadata-filtered at-rest serving with the per-query adaptive probe
    * budget, lockstep with `Corpus.semanticTopKFiltered` on the
    * `corpus_filtered_topk` state (the embeddings table ingested whole):
    * occupancy is the per-cell count of label-0 vectors under the
    * trained autoK quantizer, each query ranks ALL K cells, the budget
    * is the smallest prefix whose cumulative label mass clears 90%
    * (exact integers; K if none), candidates are the label-0 vectors of
    * the budgeted cells, and the ordered-fold cosine ranks the top 10. */
  val corpusFilteredTopK: String = {
    trainedQuantBase(2, autoKExpr) + s"""
, kcells AS (
  SELECT LEAST(256, GREATEST(16, CAST(ceil(n / 1024.0) AS BIGINT))) AS kc FROM nvec
), asgL AS (
  SELECT x.vec_id, x.cell, e.label FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x
  JOIN embeddings e ON e.vec_id = x.vec_id
  WHERE x.rn = 1
), occF AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS o FROM asgL WHERE label = 0 GROUP BY cell
), nlab AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nl FROM embeddings WHERE label = 0
), rankedQ AS (
  SELECT vec_id AS query_id, cid AS cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS p
  FROM cdotF WHERE vec_id < 8
), cumQ AS (
  SELECT r.query_id, r.cell, r.p,
         SUM(COALESCE(o.o, 0)) OVER (PARTITION BY r.query_id ORDER BY r.p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_o
  FROM rankedQ r LEFT JOIN occF o ON o.cell = r.cell
), chosen AS (
  SELECT query_id,
         CAST(COALESCE(MIN(CASE WHEN 100 * cum_o >= 90 * nl THEN p END),
           (SELECT kc FROM kcells)) AS INTEGER) AS chosen_nprobe
  FROM cumQ, nlab GROUP BY query_id
), probesF AS (
  SELECT c.query_id, ch.chosen_nprobe, c.cell
  FROM cumQ c JOIN chosen ch ON ch.query_id = c.query_id
  WHERE c.p <= ch.chosen_nprobe
), candF AS (
  SELECT p.query_id, p.chosen_nprobe, a.vec_id AS doc_id, a.label
  FROM probesF p JOIN asgL a ON a.cell = p.cell
  WHERE a.label = 0
), scoredF AS (
  SELECT c.query_id, c.chosen_nprobe, c.doc_id, c.label,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(fc.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(fq.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (fc.nrm * fq.nrm) AS cosine
  FROM candF c
  JOIN feat fq ON fq.vec_id = c.query_id
  JOIN feat fc ON fc.vec_id = c.doc_id
), rankedF AS (
  SELECT query_id, chosen_nprobe, doc_id, label, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rnk
  FROM scoredF
)
SELECT query_id, chosen_nprobe, doc_id, label, cosine,
       CAST(rnk AS INTEGER) AS "rank"
FROM rankedF WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  /** Two-column predicate conjunction on the declared (label, src)
    * occupancy — lockstep with `Corpus.semanticTopKFilteredOn(label=0,
    * src=1)` on the corpus index state (src = vec_id mod 3 declared at
    * ingest): occupancy and candidates slice on BOTH columns, the
    * budget math is the single-predicate form over the sliced counts. */
  val corpusFilteredTwoCol: String = {
    trainedQuantBase(2, autoKExpr) + s"""
, kcells AS (
  SELECT LEAST(256, GREATEST(16, CAST(ceil(n / 1024.0) AS BIGINT))) AS kc FROM nvec
), asgL AS (
  SELECT x.vec_id, x.cell, e.label, CAST(e.vec_id % 3 AS INTEGER) AS src FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x
  JOIN embeddings e ON e.vec_id = x.vec_id
  WHERE x.rn = 1
), occF AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS o FROM asgL
  WHERE label = 0 AND src = 1 GROUP BY cell
), nlab AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nl FROM embeddings
  WHERE label = 0 AND vec_id % 3 = 1
), rankedQ AS (
  SELECT vec_id AS query_id, cid AS cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS p
  FROM cdotF WHERE vec_id < 8
), cumQ AS (
  SELECT r.query_id, r.cell, r.p,
         SUM(COALESCE(o.o, 0)) OVER (PARTITION BY r.query_id ORDER BY r.p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_o
  FROM rankedQ r LEFT JOIN occF o ON o.cell = r.cell
), chosen AS (
  SELECT query_id,
         CAST(COALESCE(MIN(CASE WHEN 100 * cum_o >= 90 * nl THEN p END),
           (SELECT kc FROM kcells)) AS INTEGER) AS chosen_nprobe
  FROM cumQ, nlab GROUP BY query_id
), probesF AS (
  SELECT c.query_id, ch.chosen_nprobe, c.cell
  FROM cumQ c JOIN chosen ch ON ch.query_id = c.query_id
  WHERE c.p <= ch.chosen_nprobe
), candF AS (
  SELECT p.query_id, p.chosen_nprobe, a.vec_id AS doc_id, a.label, a.src
  FROM probesF p JOIN asgL a ON a.cell = p.cell
  WHERE a.label = 0 AND a.src = 1
), scoredF AS (
  SELECT c.query_id, c.chosen_nprobe, c.doc_id, c.label, c.src,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(fc.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(fq.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (fc.nrm * fq.nrm) AS cosine
  FROM candF c
  JOIN feat fq ON fq.vec_id = c.query_id
  JOIN feat fc ON fc.vec_id = c.doc_id
), rankedF AS (
  SELECT query_id, chosen_nprobe, doc_id, label, src, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rnk
  FROM scoredF
)
SELECT query_id, chosen_nprobe, doc_id, label, src, cosine,
       CAST(rnk AS INTEGER) AS "rank"
FROM rankedF WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  /** Filtered + encoded serving in one path, lockstep with
    * `Corpus.semanticTopKFilteredAdc(label=0, targetPct=90, rerank=32,
    * k=10)`: the occupancy budget prices each query's cells on the
    * label-0 slice, candidates of the budgeted cells score against
    * their PQ RECONSTRUCTION (the frozen plain-PQ chain), the per-query
    * top 32 ADC survivors re-rank by the exact ordered-fold cosine, and
    * the top 10 ship with both scores. */
  val corpusFilteredAdc: String = {
    trainedQuantBase(2, autoKExpr) + pqEncodeChain(2) + s"""
, kcells AS (
  SELECT LEAST(256, GREATEST(16, CAST(ceil(n / 1024.0) AS BIGINT))) AS kc FROM nvec
), asgL AS (
  SELECT x.vec_id, x.cell, e.label FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x
  JOIN embeddings e ON e.vec_id = x.vec_id
  WHERE x.rn = 1
), occF AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS o FROM asgL WHERE label = 0 GROUP BY cell
), nlab AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nl FROM embeddings WHERE label = 0
), rankedQ AS (
  SELECT vec_id AS query_id, cid AS cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS p
  FROM cdotF WHERE vec_id < 8
), cumQ AS (
  SELECT r.query_id, r.cell, r.p,
         SUM(COALESCE(o.o, 0)) OVER (PARTITION BY r.query_id ORDER BY r.p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_o
  FROM rankedQ r LEFT JOIN occF o ON o.cell = r.cell
), chosen AS (
  SELECT query_id,
         CAST(COALESCE(MIN(CASE WHEN 100 * cum_o >= 90 * nl THEN p END),
           (SELECT kc FROM kcells)) AS INTEGER) AS chosen_nprobe
  FROM cumQ, nlab GROUP BY query_id
), probesF AS (
  SELECT c.query_id, ch.chosen_nprobe, c.cell
  FROM cumQ c JOIN chosen ch ON ch.query_id = c.query_id
  WHERE c.p <= ch.chosen_nprobe
), candF AS (
  SELECT p.query_id, p.chosen_nprobe, a.vec_id AS doc_id, a.label
  FROM probesF p JOIN asgL a ON a.cell = p.cell
  WHERE a.label = 0
), adots AS (
  SELECT cd.query_id, cd.chosen_nprobe, cd.doc_id, cd.label, q.nrm AS q_nrm, r.recon_nrm,
         CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(r.recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM candF cd
  JOIN feat q ON q.vec_id = cd.query_id
  JOIN recn r ON r.neighbor_id = cd.doc_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.chosen_nprobe, cd.doc_id, cd.label, q.nrm, r.recon_nrm
), short AS (
  SELECT query_id, chosen_nprobe, doc_id, label, adc_cosine FROM (
    SELECT query_id, chosen_nprobe, doc_id, label,
           dot / (q_nrm * recon_nrm) AS adc_cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot / (q_nrm * recon_nrm) DESC, doc_id) AS arn
    FROM adots) t
  WHERE arn <= 32
), rer AS (
  SELECT s.query_id, s.chosen_nprobe, s.doc_id, s.label, s.adc_cosine,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(fc.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(fq.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (fc.nrm * fq.nrm) AS cosine
  FROM short s
  JOIN feat fq ON fq.vec_id = s.query_id
  JOIN feat fc ON fc.vec_id = s.doc_id
), rankedR AS (
  SELECT query_id, chosen_nprobe, doc_id, label, adc_cosine, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rnk
  FROM rer
)
SELECT query_id, chosen_nprobe, doc_id, label, adc_cosine, cosine,
       CAST(rnk AS INTEGER) AS "rank"
FROM rankedR WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  /** RESIDUAL PQ encode chain — lockstep with
    * `Similarity.trainPqCodebooksResidual` + the residual encoding of
    * `ivfPqResidualTopK`: every vector's cell from the trained-quantizer
    * argmax (asgR off cdotF), residual r[i] = float32(emb[i] − cent[i])
    * (exact in double, one rounding — the labelCentroids bridge), then
    * the SAME pq init/training/encoding over residual slices
    * ([[pqIteration]] with the mean source switched to resv), and the
    * reconstruction centroid + r̂ (float add, same bridge). */
  private def pqResEncodeChain(iters: Int): String = """
, asgR AS MATERIALIZED (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x WHERE rn = 1
), resv AS MATERIALIZED (
  SELECT a.vec_id, a.cell,
         list(CAST(CAST(e.embedding[c.i] AS DOUBLE) - CAST(c.v AS DOUBLE) AS REAL) ORDER BY c.i) AS res,
         list(c.v ORDER BY c.i) AS cvec
  FROM asgR a JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN cent""" + iters + """ c ON c.cid = a.cell
  GROUP BY a.vec_id, a.cell
), js AS (SELECT unnest(range(0, 8)) AS j)
, pcb0 AS MATERIALIZED (
  SELECT j, r.vec_id AS code, ix.i, r.res[j*8 + ix.i] AS v
  FROM resv r CROSS JOIN js CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix
  WHERE r.vec_id < 16
), ptrain AS MATERIALIZED (
  -- deterministic md5-bucket training sample over the RESIDUALS
  SELECT r.vec_id, r.res AS embedding FROM resv r, nvec
  WHERE CAST(concat('0x', substring(md5(CAST(r.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
        < LEAST(10000, CAST(ceil(10000.0 * 4096 / n) AS BIGINT))
)""" +
    (0 until iters).map(t => pqIteration(t, "resv", "res")).mkString +
    s"""
, cbs AS MATERIALIZED (
  SELECT j, code, list(v ORDER BY i) AS sub
  FROM pcb$iters GROUP BY j, code
), cbq AS MATERIALIZED (
  SELECT j, code, sub,
         CAST(SUM(CAST(CAST(sub[i] AS DOUBLE) * CAST(sub[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sumsq
  FROM cbs CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix
  GROUP BY j, code, sub
), dist AS (
  SELECT r.vec_id, c.j, c.code,
         -2 * CAST(SUM(CAST(CAST(r.res[c.j*8 + i] AS DOUBLE) * CAST(c.sub[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           + c.sumsq AS d
  FROM resv r CROSS JOIN cbq c
  CROSS JOIN (SELECT unnest(range(1, 9)) AS i) ix
  GROUP BY r.vec_id, c.j, c.code, c.sumsq
), enc AS MATERIALIZED (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn
    FROM dist) t
  WHERE rn = 1
), rhat AS MATERIALIZED (
  SELECT en.vec_id, flatten(list(c.sub ORDER BY en.j)) AS rh
  FROM enc en JOIN cbs c ON c.j = en.j AND c.code = en.code
  GROUP BY en.vec_id
), recn AS MATERIALIZED (
  SELECT t.neighbor_id, t.recon,
         sqrt(CAST(SUM(CAST(CAST(t.recon[i] AS DOUBLE) * CAST(t.recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS recon_nrm
  FROM (
    SELECT r.vec_id AS neighbor_id,
           list_transform(r.cvec,
             (x, i) -> CAST(CAST(x AS DOUBLE) + CAST(h.rh[i] AS DOUBLE) AS REAL)) AS recon
    FROM resv r JOIN rhat h ON h.vec_id = r.vec_id) t
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
  GROUP BY t.neighbor_id, t.recon
)"""

  /** Residual-encoded IVF+PQ, lockstep with
    * `Similarity.ivfPqResidualTopK`: the residual encode chain supplies
    * centroid + r̂ reconstructions; probing and ADC are the plain-IVFPQ
    * shapes. */
  val annIvfPqResidualTopK: String = {
    trainedQuantBase(2) + pqResEncodeChain(2) + s"""
, probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS qrn
    FROM cdotF WHERE vec_id < 8) t
  WHERE qrn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN asgR a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), dots AS (
  SELECT cd.query_id, cd.neighbor_id, q.q_nrm, r.recon_nrm,
         CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(r.recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM cand cd
  JOIN q ON q.query_id = cd.query_id
  JOIN recn r ON r.neighbor_id = cd.neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.neighbor_id, q.q_nrm, r.recon_nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * recon_nrm) AS adc_cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * recon_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, adc_cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  /** Recall of the residual-encoded IVF+PQ vs brute force — mirrors
    * Similarity.ivfPqResidualRecall. */
  val annRecallIvfpqResidual: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN ($annIvfPqResidualTopK) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** Residual-codebook twin of [[corpusSemanticAdc]] on the residual
    * corpus index state: the RESIDUAL encode chain (asgR off the autoK
    * trained quantizer, codebooks on residual slices, reconstruction
    * centroid + r̂) supplies the ADC candidates; serving probes 2 cells
    * per query without self-exclusion, re-ranks the top-32 ADC
    * shortlist exactly, and the output is per-query agreement with the
    * exact probe's top 10 — read next to corpus_semantic_adc, the
    * agreement delta is the residual gain at the same code budget. */
  val corpusAdcResidual: String = {
    trainedQuantBase(2, autoKExpr) + pqResEncodeChain(2) + s"""
, probesA AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS qrn
    FROM cdotF WHERE vec_id < 8) t
  WHERE qrn <= 2
), candA AS (
  SELECT p.query_id, a.vec_id AS doc_id
  FROM probesA p JOIN asgR a ON p.cell = a.cell
), qA AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), adots AS (
  SELECT cd.query_id, cd.doc_id, q.q_nrm, r.recon_nrm,
         CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(r.recon[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM candA cd
  JOIN qA q ON q.query_id = cd.query_id
  JOIN recn r ON r.neighbor_id = cd.doc_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.doc_id, q.q_nrm, r.recon_nrm
), short AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot / (q_nrm * recon_nrm) DESC, doc_id) AS arn
    FROM adots) t
  WHERE arn <= 32
), served AS (
  SELECT query_id, doc_id FROM (
    SELECT s.query_id, s.doc_id,
           row_number() OVER (PARTITION BY s.query_id ORDER BY
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(fc.embedding,
                 (x, i) -> CAST(x AS DOUBLE) * CAST(fq.embedding[i] AS DOUBLE))),
               (acc, v) -> acc + v) / (fc.nrm * fq.nrm) DESC, s.doc_id) AS rnk
    FROM short s
    JOIN feat fq ON fq.vec_id = s.query_id
    JOIN feat fc ON fc.vec_id = s.doc_id) t
  WHERE rnk <= 10
), exactS AS (
  SELECT query_id, doc_id FROM (
    SELECT c.query_id, c.doc_id,
           row_number() OVER (PARTITION BY c.query_id ORDER BY
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(fc.embedding,
                 (x, i) -> CAST(x AS DOUBLE) * CAST(fq.embedding[i] AS DOUBLE))),
               (acc, v) -> acc + v) / (fc.nrm * fq.nrm) DESC, c.doc_id) AS rnk
    FROM candA c
    JOIN feat fq ON fq.vec_id = c.query_id
    JOIN feat fc ON fc.vec_id = c.doc_id) t
  WHERE rnk <= 10
)
SELECT e.query_id,
       CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
         CAST(COUNT(*) AS DOUBLE) AS agreement
FROM exactS e
LEFT JOIN served s ON s.query_id = e.query_id AND s.doc_id = e.doc_id
GROUP BY e.query_id
ORDER BY e.query_id"""
  }

  val annSqTopK: String = featBase + """
, dmm AS MATERIALIZED (
  SELECT pos AS dim, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
  FROM (SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS pos
        FROM embeddings) t
  GROUP BY pos
), deqt AS MATERIALIZED (
  SELECT vec_id AS neighbor_id,
         list(CAST(CASE WHEN mx > mn
              THEN mn + floor((CAST(embedding[dim] AS DOUBLE) - mn)
                              / ((mx - mn) / 255.0) + 0.5) * ((mx - mn) / 255.0)
              ELSE mn + 0.0 * ((mx - mn) / 255.0) END AS REAL) ORDER BY dim) AS deq
  FROM embeddings CROSS JOIN dmm
  GROUP BY vec_id
), deqn AS MATERIALIZED (
  SELECT neighbor_id, deq,
         sqrt(CAST(SUM(CAST(CAST(deq[i] AS DOUBLE) * CAST(deq[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS deq_nrm
  FROM deqt CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
  GROUP BY neighbor_id, deq
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), dots AS (
  SELECT query_id, neighbor_id, q_nrm, deq_nrm,
         CAST(SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(deq[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM q JOIN deqn ON query_id <> neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY query_id, neighbor_id, q_nrm, deq_nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * deq_nrm) AS sq_cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * deq_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, sq_cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""

  val annLshTopK: String = featBase + """
, masks AS (
  SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS m
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm, xor(bucket, m) AS bucket
  FROM feat CROSS JOIN masks WHERE vec_id < 8
), c AS (
  -- hot-bucket guard on the corpus side, lockstep with Dedup.capBuckets
  SELECT vec_id AS neighbor_id, embedding AS ce, nrm AS c_nrm, bucket FROM feat
  WHERE bucket IN (SELECT bucket FROM feat GROUP BY bucket HAVING COUNT(*) <= 1000)
), dots AS (
  SELECT query_id, neighbor_id, q_nrm, c_nrm,
         CAST(SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM q JOIN c ON q.bucket = c.bucket AND query_id <> neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY query_id, neighbor_id, q_nrm, c_nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * c_nrm) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""

  /** Per-query recall@k of the LSH index against exact brute force —
    * both rankings as parenthesized subqueries of their own oracle SQL
    * (defined after both so the interpolation sees initialized vals).
    * Mirrors Similarity.lshRecall. */
  val annRecallLsh: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN ($annLshTopK) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  val annIvfTopK: String = featBase + """
, cdots AS (
  SELECT f.vec_id, f.nrm, c.cid, c.cent_nrm,
         CAST(SUM(CAST(CAST(f.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM feat f
  CROSS JOIN (SELECT vec_id AS cid, embedding, nrm AS cent_nrm FROM feat WHERE vec_id < 16) c
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY f.vec_id, f.nrm, c.cid, c.cent_nrm
), assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cent_nrm) DESC, cid) AS crn
    FROM cdots) t
  WHERE crn = 1
), probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cent_nrm) DESC, cid) AS qrn
    FROM cdots WHERE vec_id < 8) t
  WHERE qrn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assigned a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
), dots AS (
  SELECT cd.query_id, cd.neighbor_id, qf.nrm AS q_nrm, nf.nrm AS c_nrm,
         CAST(SUM(CAST(CAST(qf.embedding[i] AS DOUBLE) * CAST(nf.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM cand cd
  JOIN feat qf ON qf.vec_id = cd.query_id
  JOIN feat nf ON nf.vec_id = cd.neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.neighbor_id, qf.nrm, nf.nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * c_nrm) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""

  /** Filtered IVF probe: the annIvfTopK chain with the label predicate
    * applied to the candidate side before the probe join (assignment is
    * per-vector, so filtering first cannot change a survivor's cell).
    * Mirrors Similarity.filteredIvfTopK. */
  val annFilteredIvfTopK: String = featBase + """
, cdots AS (
  SELECT f.vec_id, f.nrm, c.cid, c.cent_nrm,
         CAST(SUM(CAST(CAST(f.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM feat f
  CROSS JOIN (SELECT vec_id AS cid, embedding, nrm AS cent_nrm FROM feat WHERE vec_id < 16) c
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY f.vec_id, f.nrm, c.cid, c.cent_nrm
), assigned AS (
  SELECT t.vec_id, t.cell, lb.label FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cent_nrm) DESC, cid) AS crn
    FROM cdots) t
  JOIN embeddings lb ON lb.vec_id = t.vec_id AND lb.label = 0
  WHERE crn = 1
), probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cent_nrm) DESC, cid) AS qrn
    FROM cdots WHERE vec_id < 8) t
  WHERE qrn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, a.label
  FROM probes p JOIN assigned a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
), dots AS (
  SELECT cd.query_id, cd.neighbor_id, cd.label, qf.nrm AS q_nrm, nf.nrm AS c_nrm,
         CAST(SUM(CAST(CAST(qf.embedding[i] AS DOUBLE) * CAST(nf.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM cand cd
  JOIN feat qf ON qf.vec_id = cd.query_id
  JOIN feat nf ON nf.vec_id = cd.neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.neighbor_id, cd.label, qf.nrm, nf.nrm
), scored AS (
  SELECT query_id, neighbor_id, label, dot / (q_nrm * c_nrm) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, label, cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""

  /** Per-filter adaptive probe budget, lockstep with
    * Similarity.adaptiveProbeBudget: full-corpus cell assignment, per
    * (label, cell) occupancy, the dense (query × label × p) cumulative
    * covered mass, the exact-integer target compare
    * (100·Σ covered ≥ 90·8·n_label, fallback 16), and the achieved
    * filtered recall at the chosen budget vs the exact filtered truth. */
  val annAdaptiveProbe: String = featBase + """
, cdots AS (
  SELECT f.vec_id, f.nrm, c.cid, c.cent_nrm,
         CAST(SUM(CAST(CAST(f.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM feat f
  CROSS JOIN (SELECT vec_id AS cid, embedding, nrm AS cent_nrm FROM feat WHERE vec_id < 16) c
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY f.vec_id, f.nrm, c.cid, c.cent_nrm
), cellrank AS (
  SELECT vec_id, cid AS cell,
         CAST(row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dot / (nrm * cent_nrm) DESC, cid) AS INTEGER) AS p
  FROM cdots
), assigned AS (
  SELECT cr.vec_id, cr.cell, e.label
  FROM cellrank cr JOIN embeddings e ON e.vec_id = cr.vec_id
  WHERE cr.p = 1
), occ AS (
  SELECT label, cell, CAST(COUNT(*) AS BIGINT) AS o FROM assigned GROUP BY 1, 2
), nl AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM assigned GROUP BY 1
), cum AS (
  SELECT g.query_id, g.label, g.p,
         SUM(COALESCE(o.o, 0)) OVER (PARTITION BY g.query_id, g.label ORDER BY g.p) AS cum_o
  FROM (SELECT cr.vec_id AS query_id, cr.cell, cr.p, l.label
        FROM cellrank cr CROSS JOIN nl l
        WHERE cr.vec_id < 8) g
  LEFT JOIN occ o ON o.cell = g.cell AND o.label = g.label
), mass AS (
  SELECT label, p, SUM(cum_o) AS s FROM cum GROUP BY 1, 2
), chosen AS (
  SELECT n.label, n.n_vectors,
         COALESCE(MIN(CASE WHEN 100 * m.s >= 90 * 8 * n.n_vectors THEN m.p END), 16) AS chosen_nprobe
  FROM nl n LEFT JOIN mass m ON m.label = n.label
  GROUP BY n.label, n.n_vectors
), pmass AS (
  SELECT c.label, c.n_vectors, c.chosen_nprobe,
         CAST(m.s AS DOUBLE) / CAST(8 * c.n_vectors AS DOUBLE) AS predicted_mass
  FROM chosen c JOIN mass m ON m.label = c.label AND m.p = c.chosen_nprobe
), tdots AS (
  SELECT qf.vec_id AS query_id, nf.vec_id AS neighbor_id, a.label,
         qf.nrm AS q_nrm, nf.nrm AS c_nrm,
         CAST(SUM(CAST(CAST(qf.embedding[i] AS DOUBLE) * CAST(nf.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM feat qf
  CROSS JOIN feat nf
  JOIN assigned a ON a.vec_id = nf.vec_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  WHERE qf.vec_id < 8 AND nf.vec_id <> qf.vec_id
  GROUP BY qf.vec_id, nf.vec_id, a.label, qf.nrm, nf.nrm
), truth AS (
  SELECT query_id, label, neighbor_id FROM (
    SELECT query_id, label, neighbor_id,
           row_number() OVER (PARTITION BY query_id, label
                              ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
    FROM tdots) t
  WHERE rnk <= 10
), approx AS (
  SELECT query_id, label, neighbor_id FROM (
    SELECT td.query_id, td.label, td.neighbor_id,
           row_number() OVER (PARTITION BY td.query_id, td.label
                              ORDER BY td.dot / (td.q_nrm * td.c_nrm) DESC, td.neighbor_id) AS rnk
    FROM tdots td
    JOIN assigned a ON a.vec_id = td.neighbor_id
    JOIN cellrank cr ON cr.vec_id = td.query_id AND cr.cell = a.cell
    JOIN chosen c ON c.label = td.label AND cr.p <= c.chosen_nprobe) t
  WHERE rnk <= 10
), rec AS (
  SELECT t.label,
         CAST(COUNT(*) AS BIGINT) AS n_truth,
         CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hits,
         CAST(COUNT(ap.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS achieved_recall
  FROM truth t LEFT JOIN approx ap
    ON ap.query_id = t.query_id AND ap.label = t.label AND ap.neighbor_id = t.neighbor_id
  GROUP BY t.label
)
SELECT p.label, p.n_vectors, CAST(p.chosen_nprobe AS INTEGER) AS chosen_nprobe,
       p.predicted_mass, r.n_truth, r.n_hits, r.achieved_recall
FROM pmass p JOIN rec r ON r.label = p.label
ORDER BY p.label"""

  /** Recall of the filtered probe vs filtered exact search. Mirrors
    * Similarity.filteredIvfRecall. */
  val annRecallFiltered: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annFilteredTopK) b
LEFT JOIN ($annFilteredIvfTopK) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** Trained-IVF oracle: the same unrolled Lloyd iterations as
    * [[graft.operators.Similarity.trainCentroids]], in pure SQL over the
    * unnested centroid representation (cid, i, v). Every arithmetic step
    * mirrors the Spark side exactly — decimal-exact dot products for the
    * assignment argmax, decimal-exact per-dimension sums divided by the
    * cell count and rounded to REAL for the update, COALESCE keeping empty
    * cells' previous centroids — so the trained index hash-matches. */
  private def ivfIteration(t: Int): String = s"""
, cnrm$t AS (
  SELECT cid, sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS cnrm
  FROM cent$t GROUP BY cid
), cdot$t AS (
  SELECT f.vec_id, f.nrm, c.cid, n.cnrm,
         CAST(SUM(CAST(CAST(f.embedding[c.i] AS DOUBLE) * CAST(c.v AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM train f CROSS JOIN cent$t c JOIN cnrm$t n ON n.cid = c.cid
  GROUP BY f.vec_id, f.nrm, c.cid, n.cnrm
), asg$t AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdot$t) x WHERE rn = 1
), cmean${t + 1} AS (
  SELECT a.cell AS cid, ix.i,
         CAST(CAST(SUM(CAST(CAST(e.embedding[ix.i] AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS REAL) AS v
  FROM asg$t a JOIN embeddings e ON e.vec_id = a.vec_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
  GROUP BY a.cell, ix.i
), cent${t + 1} AS (
  SELECT p.cid, p.i, COALESCE(c.v, p.v) AS v
  FROM cent$t p LEFT JOIN cmean${t + 1} c ON c.cid = p.cid AND c.i = p.i
)"""

  /** The full trained-quantizer chain — featBase, first-16 init, sampled
    * training set, `iters` unrolled Lloyd iterations, final centroid
    * norms and all-corpus centroid dot products (`cdotF`) — shared by
    * the trained-IVF and SemDeDup oracles so both stay in lockstep with
    * [[graft.operators.Similarity.trainCentroids]]. */
  /** Trained coarse quantizer in SQL, lockstep with
    * `Similarity.trainCentroids`. `kExpr` is the centroid-count
    * expression: the default 16 for the fixed-k consumers (C7d), or the
    * self-scaling `autoKExpr` mirroring `Similarity.autoCellCount` for
    * semantic dedup. */
  private def trainedQuantBase(iters: Int, kExpr: String = "16",
      trainPred: String = "TRUE"): String =
    featBase + quantCont(iters, kExpr, trainPred)

  /** The quantizer chain in continuation form (no WITH, assumes `feat`
    * is already defined) — so dedup_hybrid_clusters can append it to the
    * MinHash chain. */
  private def quantCont(iters: Int, kExpr: String = "16",
      trainPred: String = "TRUE"): String = s"""
, nvec AS (
  SELECT COUNT(*) AS n FROM embeddings WHERE ($trainPred)
), cent0 AS (
  SELECT vec_id AS cid, ix.i, embedding[ix.i] AS v
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
  WHERE vec_id < (""" + kExpr + s""") AND ($trainPred)
), train AS MATERIALIZED (
  -- deterministic md5-bucket training sample, lockstep with
  -- Similarity.trainCentroids: bucket < ceil(10000*4096/N), clamped.
  -- trainPred restricts the trainable universe (the at-rest index side
  -- for the incremental probe; TRUE everywhere else) — N above is the
  -- same restricted count, matching trainCentroids(idx, …).
  SELECT f.* FROM feat f, nvec
  WHERE CAST(concat('0x', substring(md5(CAST(f.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
        < LEAST(10000, CAST(ceil(10000.0 * 4096 / n) AS BIGINT))
    AND ($trainPred)
)""" +
    (0 until iters).map(ivfIteration).mkString +
    s"""
, cnrmF AS (
  SELECT cid, sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS cnrm
  FROM cent$iters GROUP BY cid
), cdotF AS (
  SELECT f.vec_id, f.nrm, c.cid, n.cnrm,
         CAST(SUM(CAST(CAST(f.embedding[c.i] AS DOUBLE) * CAST(c.v AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM feat f CROSS JOIN cent$iters c JOIN cnrmF n ON n.cid = c.cid
  GROUP BY f.vec_id, f.nrm, c.cid, n.cnrm
)"""

  /** Trained-IVF top-k at a given probe budget — the fixed-nProbe=2
    * consumer keeps its exact former text via [[annIvfTrainedTopK]];
    * the sweep instantiates 1/2/4. */
  private def ivfTrainedTopKSql(nProbe: Int): String = {
    trainedQuantBase(2) + s"""
, assigned AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x WHERE rn = 1
), probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS qrn
    FROM cdotF WHERE vec_id < 8) t
  WHERE qrn <= $nProbe
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assigned a ON p.cell = a.cell
  WHERE a.vec_id <> p.query_id
), dots AS (
  SELECT cd.query_id, cd.neighbor_id, qf.nrm AS q_nrm, nf.nrm AS c_nrm,
         CAST(SUM(CAST(CAST(qf.embedding[i] AS DOUBLE) * CAST(nf.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM cand cd
  JOIN feat qf ON qf.vec_id = cd.query_id
  JOIN feat nf ON nf.vec_id = cd.neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY cd.query_id, cd.neighbor_id, qf.nrm, nf.nrm
), scored AS (
  SELECT query_id, neighbor_id, dot / (q_nrm * c_nrm) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
  FROM dots
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS "rank"
FROM scored WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  val annIvfTrainedTopK: String = ivfTrainedTopKSql(2)

  /** Recall@10 per (nprobe, query) for nprobe ∈ {1,2,4} — the trained-IVF
    * tuning table. Mirrors Similarity.ivfNprobeSweep (quantizer chain is
    * deterministic, so re-instantiating it per branch is value-identical
    * to the Spark side's train-once). */
  def annNprobeSweep: String = hoistedUnion(
    Seq(1, 2, 4).map { np =>
      s"""
SELECT $np AS nprobe, b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN (${ivfTrainedTopKSql(np)}) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id"""
    }, "nprobe, query_id")

  /** Hoist each UNION ALL branch into its own top-level MATERIALIZED
    * CTE. A branch nested directly inside a UNION loses its inner
    * MATERIALIZED hints to the planner and re-inlines its training
    * chains per reference (measured: the ann_index_compare branches ran
    * 10–20× their standalone cost composed; sf0.1 once blew DuckDB's
    * 100 GiB cap this way). Values are identical — the hint only pins
    * evaluation order. */
  private def hoistedUnion(branches: Seq[String], orderBy: String): String = {
    val ctes = branches.indices
      .map(i => s"hb_$i AS MATERIALIZED (${branches(i)})")
      .mkString("WITH ", ",\n", "")
    val sel = branches.indices.map(i => s"SELECT * FROM hb_$i").mkString(" UNION ALL ")
    s"$ctes\nSELECT * FROM ($sel)\nORDER BY $orderBy"
  }

  /** SemDeDup oracle: the shared trained-quantizer chain assigns every
    * vector to its cell (keeping the cosine to its own centroid),
    * within-cell pairs with decimal-exact cosine ≥ 0.3 feed a
    * recursive-CTE connected-components pass, and each duplicate group
    * keeps its (cos_centroid, vec_id)-minimal member — lockstep with
    * `Dedup.semanticDedup`. */
  /** ⌈n/1024⌉ clamped to [16, 256] — `Similarity.autoCellCount` verbatim. */
  private def autoKExpr: String =
    "SELECT LEAST(256, GREATEST(16, CAST(ceil(n / 1024.0) AS BIGINT))) FROM nvec"

  val dedupSemantic: String =
    trainedQuantBase(2, autoKExpr).replaceFirst("^WITH ", "WITH RECURSIVE ") +
      cellPairCont + """
, spairs AS MATERIALIZED (
  SELECT vec_a, vec_b FROM sdots WHERE cosine >= 0.3
), sym AS MATERIALIZED (
  SELECT vec_a AS a, vec_b AS b FROM spairs
  UNION ALL
  SELECT vec_b AS a, vec_a AS b FROM spairs
), r AS (
  SELECT DISTINCT a AS node, a AS label FROM sym
  UNION
  SELECT s.a AS node, r.label AS label FROM sym s JOIN r ON r.node = s.b
), comp AS (
  SELECT node AS vec_id, CAST(MIN(label) AS BIGINT) AS cluster_id
  FROM r GROUP BY node
)
SELECT c.vec_id, g.cell, c.cluster_id, g.cos_centroid,
       (row_number() OVER (PARTITION BY c.cluster_id
                           ORDER BY g.cos_centroid, c.vec_id) = 1) AS kept
FROM comp c JOIN asgF g ON g.vec_id = c.vec_id
ORDER BY c.vec_id"""

  /** Embedding-space decontamination, lockstep with
    * Dedup.semanticContamination: the trained self-scaling quantizer,
    * train side in its single best cell, the `vec_id % 97 = 0` benchmark
    * slice probing its 2 nearest cells, ordered-fold cosines, pairs at
    * >= 0.3, then per train doc the count + closest benchmark item. */
  val contaminationSemantic: String =
    trainedQuantBase(2, autoKExpr) + """
, asgT AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x
  WHERE rn = 1 AND vec_id % 97 <> 0
), probeB AS (
  SELECT vec_id AS bench_id, cell FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF WHERE vec_id % 97 = 0) t
  WHERE rn <= 2
), cpairs AS (
  SELECT t.vec_id, p.bench_id,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(ft.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(fb.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (ft.nrm * fb.nrm) AS cosine
  FROM asgT t
  JOIN probeB p ON p.cell = t.cell
  JOIN feat ft ON ft.vec_id = t.vec_id
  JOIN feat fb ON fb.vec_id = p.bench_id
), hits AS (
  SELECT vec_id, bench_id, cosine FROM cpairs WHERE cosine >= 0.3
), counts AS (
  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_bench_near FROM hits GROUP BY vec_id
), top AS (
  SELECT vec_id, bench_id AS nearest_bench, cosine AS max_cosine FROM (
    SELECT vec_id, bench_id, cosine,
           row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, bench_id) AS rn
    FROM hits) t
  WHERE rn = 1
)
SELECT c.vec_id, c.n_bench_near, t.nearest_bench, t.max_cosine
FROM counts c JOIN top t ON t.vec_id = c.vec_id
ORDER BY c.vec_id"""

  /** Incremental embedding-index probe, lockstep with
    * `Dedup.embeddingIncremental`: the quantizer chain trains on the
    * INDEX side only (`vec_id % 10 <> 0` — the at-rest corpus; nvec and
    * the md5 sample are the restricted count, matching
    * `trainCentroids(idx, …)`), the index side sits in its single best
    * cell, the batch side (`vec_id % 10 = 0`) probes its 2 nearest
    * cells, pair cosines are the ordered double fold, and the verdict
    * is the best match per batch vector (ties: lowest index id) with
    * `admit` = no candidate or best cosine < 0.3. cdotF spans BOTH
    * sides (assignment reads the index slice, probes the batch slice). */
  val dedupEmbeddingIncremental: String = embIncSql(2)

  /** The incremental probe at a given nProbe — dedupEmbeddingIncremental
    * keeps its exact former text at 2; dedupGateProbeSweep instantiates
    * 1/2/4 (the chain is deterministic, so re-instantiating per branch
    * is value-identical to the Spark side's train-once). */
  private def embIncSql(nProbe: Int): String =
    trainedQuantBase(2, autoKExpr, "vec_id % 10 <> 0") + s"""
, asgI AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x
  WHERE rn = 1 AND vec_id % 10 <> 0
), probeN AS (
  SELECT vec_id AS new_vec, cell FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF WHERE vec_id % 10 = 0) t
  WHERE rn <= $nProbe
), epairs AS (
  SELECT p.new_vec, a.vec_id AS dup_of,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(fa.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(fb.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (fa.nrm * fb.nrm) AS cosine
  FROM probeN p
  JOIN asgI a ON a.cell = p.cell
  JOIN feat fa ON fa.vec_id = a.vec_id
  JOIN feat fb ON fb.vec_id = p.new_vec
), bestE AS (
  SELECT new_vec, dup_of, cosine AS max_cosine FROM (
    SELECT new_vec, dup_of, cosine,
           row_number() OVER (PARTITION BY new_vec ORDER BY cosine DESC, dup_of) AS rn
    FROM epairs) t
  WHERE rn = 1
)
SELECT b.vec_id AS new_vec, e.dup_of, e.max_cosine,
       (e.max_cosine IS NULL OR e.max_cosine < 0.3) AS admit
FROM embeddings b LEFT JOIN bestE e ON e.new_vec = b.vec_id
WHERE b.vec_id % 10 = 0
ORDER BY new_vec"""

  /** Probe-miss evaluation for the incremental embedding gate, lockstep
    * with `Dedup.embeddingIncrementalEval`: the probe verdict (the full
    * dedupEmbeddingIncremental statement as a subquery — DuckDB scopes
    * its WITH chain locally) joined to the exact best cosine over the
    * whole index per batch vector. */
  /** Exact whole-index best cosine per batch vector — the evaluation
    * truth side shared by dedupEmbeddingEval and dedupGateProbeSweep. */
  private def embExactSql: String = s"""
  $featBase
  SELECT fb.vec_id AS new_vec,
         MAX(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(fa.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(fb.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (fa.nrm * fb.nrm)) AS exact_max
  FROM feat fa JOIN feat fb
    ON fa.vec_id % 10 <> 0 AND fb.vec_id % 10 = 0
  GROUP BY fb.vec_id"""

  val dedupEmbeddingEval: String = s"""
SELECT p.new_vec, p.max_cosine AS probe_max, e.exact_max,
       (p.max_cosine IS NOT NULL AND p.max_cosine >= 0.3) AS probe_reject,
       (e.exact_max >= 0.3) AS exact_reject,
       ((e.exact_max >= 0.3) AND NOT (p.max_cosine IS NOT NULL AND p.max_cosine >= 0.3)) AS missed
FROM ($dedupEmbeddingIncremental) p
JOIN ($embExactSql) e ON e.new_vec = p.new_vec
ORDER BY p.new_vec"""

  /** Gate recall per probe budget, lockstep with
    * `Dedup.embeddingGateProbeSweep`: each branch re-instantiates the
    * deterministic probe chain at its nProbe and aggregates against the
    * shared exact truth. */
  def dedupGateProbeSweep: String = {
    val branches = Seq(1, 2, 4).map { np =>
      s"""
SELECT $np AS nprobe,
       CAST(COUNT(*) AS BIGINT) AS n_batch,
       CAST(SUM(CASE WHEN e.exact_max >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
       CAST(SUM(CASE WHEN e.exact_max >= 0.3 AND NOT p.admit THEN 1 ELSE 0 END) AS BIGINT) AS n_caught
FROM (${embIncSql(np)}) p
JOIN ($embExactSql) e ON e.new_vec = p.new_vec"""
    }
    // hoistedUnion shape, with the recall division applied over the union
    val ctes = branches.indices
      .map(i => s"hb_$i AS MATERIALIZED (${branches(i)})")
      .mkString("WITH ", ",\n", "")
    val sel = branches.indices.map(i => s"SELECT * FROM hb_$i").mkString(" UNION ALL ")
    s"""$ctes
SELECT nprobe, n_batch, n_exact_dups, n_caught,
       CAST(n_caught AS DOUBLE) / CAST(n_exact_dups AS DOUBLE) AS gate_recall
FROM ($sel)
ORDER BY nprobe"""
  }

  /** Built-in session_window semantics: new session at gap >= 30 min,
    * session end = last event + gap. */
  val eventsSessionWindow: String = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events
), lagd AS (
  SELECT user_id, ts_us,
         LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
  FROM ev
), marked AS (
  SELECT user_id, ts_us,
         SUM(CASE WHEN prev IS NULL OR ts_us - prev >= 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM lagd
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) + 1800000000 AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM marked
GROUP BY user_id, sid
ORDER BY user_id, session_start_us"""

  /** TF-IDF top terms, rational idf: score = tf·N/df — one exact integer
    * product and ONE double division, mirrored op-for-op in Search. */
  val tfidfTopTerms: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, w
), df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.w, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
  FROM tf JOIN df USING (w) CROSS JOIN n
), r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rnk
  FROM scored
)
SELECT doc_id, w AS term, tf, df, score, CAST(rnk AS INTEGER) AS rnk
FROM r WHERE rnk <= 5
ORDER BY doc_id, rnk"""

  /** BM25 (k1=1.2, b=0.75), rational idf — the double expression chain is
    * replicated VERBATIM from Search.bm25Search (every op correctly
    * rounded, same order ⇒ same bits); the per-doc sum is decimal-exact. */
  val bm25Search: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
), totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
), tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
  WHERE w IN ('spark', 'table', 'window') GROUP BY doc_id, w
), df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
), ts AS (
  SELECT tf.doc_id,
         (CAST(t.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS idf,
         CAST(dl.dl * t.n_docs AS DOUBLE) / CAST(t.sum_dl AS DOUBLE) AS dl_norm,
         tf.tf
  FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN totals t
), scored AS (
  SELECT doc_id,
         idf * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
           / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
              * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * dl_norm)) AS score_t
  FROM ts
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       CAST(SUM(CAST(score_t AS DECIMAL(27,6))) AS DOUBLE) AS score
FROM scored
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 20"""

  /** Bigram LM: p(w2|w1) over the corpus; successor-counted denominator so
    * per-w1 probabilities sum to exactly 1. */
  val bigramLm: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), bi AS (
  SELECT w1, w2 FROM (
    SELECT w AS w1, LEAD(w,1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok) t
  WHERE w2 IS NOT NULL
), cbi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bigram FROM bi GROUP BY w1, w2
), cw1 AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_w1 FROM bi GROUP BY w1
)
SELECT w1, w2, c_bigram, c_w1,
       CAST(c_bigram AS DOUBLE) / CAST(c_w1 AS DOUBLE) AS p
FROM cbi JOIN cw1 USING (w1)
ORDER BY c_bigram DESC, w1, w2
LIMIT 30"""

  /** Interpolated Kneser-Ney bigram LM, d = 3/4: the collapsed
    * single-ratio form [(4c−3)·|B| + 3·N1+(w1·)·N1+(·w2)] / [4·c(w1·)·|B|]
    * in exact HUGEINT arithmetic, one final double division. */
  val bigramKnLm: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), bi AS (
  SELECT w1, w2 FROM (
    SELECT w AS w1, LEAD(w,1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok) t
  WHERE w2 IS NOT NULL
), cbi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bigram FROM bi GROUP BY w1, w2
), ext AS (
  SELECT w1, w2, c_bigram,
         CAST(SUM(c_bigram) OVER (PARTITION BY w1) AS BIGINT) AS c_w1,
         CAST(COUNT(*) OVER (PARTITION BY w1) AS BIGINT) AS n1p_w1,
         CAST(COUNT(*) OVER (PARTITION BY w2) AS BIGINT) AS n1p_w2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cbi) AS n_b
  FROM cbi
)
SELECT w1, w2, c_bigram, c_w1, n1p_w1, n1p_w2,
       CAST((CAST(c_bigram AS HUGEINT) * 4 - 3) * n_b
            + CAST(n1p_w1 AS HUGEINT) * n1p_w2 * 3 AS DOUBLE)
       / CAST(CAST(c_w1 AS HUGEINT) * n_b * 4 AS DOUBLE) AS p_kn
FROM ext
ORDER BY c_bigram DESC, w1, w2
LIMIT 30"""

  val textNormalize: String = s"""
SELECT doc_id,
       array_to_string(list_filter(string_split(lower(text), ' '),
                                   w -> w NOT IN ($stopList)), ' ') AS clean_text,
       CAST(len(string_split(lower(text), ' '))
            - len(list_filter(string_split(lower(text), ' '),
                              w -> w NOT IN ($stopList))) AS BIGINT) AS n_stopwords_removed,
       CAST(len(list_filter(string_split(lower(text), ' '),
                            w -> w NOT IN ($stopList))) AS BIGINT) AS n_tokens_kept
FROM documents
ORDER BY doc_id"""

  val annRangeSearch: String = featBase + """
, q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 8
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce, nrm AS c_nrm FROM feat
), dots AS (
  SELECT query_id, neighbor_id, q_nrm, c_nrm,
         CAST(SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM q JOIN c ON query_id <> neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY query_id, neighbor_id, q_nrm, c_nrm
)
SELECT query_id, neighbor_id, dot / (q_nrm * c_nrm) AS cosine
FROM dots
WHERE dot / (q_nrm * c_nrm) >= CAST(0.3 AS DOUBLE)
ORDER BY query_id, neighbor_id"""

  /** Per-label centroids: decimal-exact per-dimension sums ÷ exact counts
    * in ONE double division; posexplode is 0-based, subscripts 1-based.
    * float→decimal via the shortest-repr string cast (≤9 sig digits ⇒
    * exact at scale 12) — see Similarity.labelCentroids. */
  val labelCentroids: String = """
WITH ux AS (
  SELECT label, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
SELECT label, CAST(pos - 1 AS BIGINT) AS pos,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS centroid
FROM ux
GROUP BY label, pos
ORDER BY label, pos"""

  /** Nearest-class-prototype assignment: label centroids (decimal-exact
    * means, the labelCentroids chain) NARROWED TO REAL — the float32
    * prototype matrix a real index stores and the Spark side inlines as a
    * literal — then decimal-exact dots and norms against the float
    * prototypes, argmax cosine with min-label tiebreak. Mirrors
    * Similarity.topicAssign. */
  val topicAssign: String = """
WITH ux AS (
  SELECT vec_id, label, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
), cents AS (
  SELECT label AS cand_label, pos,
         CAST(CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS REAL) AS cf
  FROM ux GROUP BY label, pos
), cnorm AS (
  SELECT cand_label,
         sqrt(CAST(SUM(CAST(CAST(cf AS DOUBLE) * CAST(cf AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS c_nrm
  FROM cents GROUP BY cand_label
), vnorm AS (
  SELECT vec_id,
         sqrt(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS v_nrm
  FROM ux GROUP BY vec_id
), dots AS (
  SELECT u.vec_id, u.label AS true_label, c.cand_label,
         CAST(SUM(CAST(CAST(u.x AS DOUBLE) * CAST(c.cf AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM ux u JOIN cents c ON u.pos = c.pos
  GROUP BY u.vec_id, u.label, c.cand_label
), scored AS (
  SELECT d.vec_id, d.true_label, d.cand_label,
         d.dot / (v.v_nrm * n.c_nrm) AS cosine,
         row_number() OVER (PARTITION BY d.vec_id
                            ORDER BY d.dot / (v.v_nrm * n.c_nrm) DESC, d.cand_label) AS rnk
  FROM dots d
  JOIN vnorm v ON v.vec_id = d.vec_id
  JOIN cnorm n ON n.cand_label = d.cand_label
)
SELECT vec_id, CAST(true_label AS BIGINT) AS true_label,
       CAST(cand_label AS BIGINT) AS assigned_label, cosine,
       (cand_label = true_label) AS is_correct
FROM scored WHERE rnk = 1
ORDER BY vec_id"""

  val textRepetition: String = shingleBase + """
, n AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok GROUP BY doc_id
), tw AS (
  SELECT doc_id, MAX(c) AS top_word_n FROM (
    SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w) t
  GROUP BY doc_id
), bi AS (
  SELECT doc_id, bg FROM (
    SELECT doc_id, w || ' ' || LEAD(w,1) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
    FROM tok) t
  WHERE bg IS NOT NULL
), nbi AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM bi GROUP BY doc_id
), tbi AS (
  SELECT doc_id, MAX(c) AS top_bigram_n FROM (
    SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY doc_id, bg) t
  GROUP BY doc_id
), tri AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri_distinct FROM sh GROUP BY doc_id
)
SELECT n.doc_id, n.n_tokens,
       CAST(tw.top_word_n AS DOUBLE) / CAST(n.n_tokens AS DOUBLE) AS top_word_frac,
       CAST(tbi.top_bigram_n AS DOUBLE) / CAST(nbi.n_bigrams AS DOUBLE) AS top_bigram_frac,
       CASE WHEN n.n_tokens > 2
            THEN CAST(1.0 AS DOUBLE) - CAST(tri.n_tri_distinct AS DOUBLE)
                 / CAST(n.n_tokens - 2 AS DOUBLE) END AS dup_trigram_frac
FROM n
JOIN tw  ON tw.doc_id = n.doc_id
JOIN nbi ON nbi.doc_id = n.doc_id
JOIN tbi ON tbi.doc_id = n.doc_id
JOIN tri ON tri.doc_id = n.doc_id
ORDER BY n.doc_id"""

  val topNgrams: String = shingleBase + """
SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
FROM sh
GROUP BY shingle
ORDER BY df DESC, shingle
LIMIT 20"""

  val eventsFunnel: String = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), per_user AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS s0
  FROM ev GROUP BY user_id
), c0 AS (
  SELECT e.user_id, MIN(e.ts_us) AS c0
  FROM per_user p JOIN ev e ON e.user_id = p.user_id
  WHERE e.event_type = 'click' AND e.ts_us > p.s0
  GROUP BY e.user_id
), p0 AS (
  SELECT e.user_id, MIN(e.ts_us) AS p0
  FROM c0 c JOIN ev e ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts_us > c.c0
  GROUP BY e.user_id
)
SELECT CAST(COUNT(p.s0) AS BIGINT) AS n_signup,
       CAST(COUNT(c.c0) AS BIGINT) AS n_click_after_signup,
       CAST(COUNT(p2.p0) AS BIGINT) AS n_purchase_after_click
FROM per_user p
LEFT JOIN c0 c ON c.user_id = p.user_id
LEFT JOIN p0 p2 ON p2.user_id = p.user_id"""

  val cohortRetention: String = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events
), first_seen AS (
  SELECT user_id, MIN(ts_us) AS f FROM ev GROUP BY user_id
)
SELECT CAST(f // 604800000000 AS BIGINT) AS cohort_week,
       CAST((ts_us - f) // 604800000000 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS active_users
FROM ev JOIN first_seen USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2"""

  val clickersNoPurchase: String = """
SELECT user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') t
ORDER BY user_id"""

  val userChannelProfile: String = """
SELECT user_id,
       CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_channels,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS channels
FROM events
WHERE event_type <> 'purchase'
GROUP BY user_id
ORDER BY user_id"""

  val eventsRollup: String = """
SELECT event_type, CAST(ts AS DATE) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
ORDER BY event_type NULLS FIRST, event_date NULLS FIRST"""

  val eventsPivot: String = """
SELECT CAST(ts AS DATE) AS event_date,
       CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS view,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS purchase
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY event_date"""

  val orderValuePercentiles: String = """
SELECT quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
FROM orders"""

  val textLangid: String = s"""
SELECT doc_id, declared_lang, stop_hits,
       CASE WHEN stop_hits >= 2 THEN 'en' ELSE 'unknown' END AS predicted_lang
FROM (
  SELECT doc_id, lang AS declared_lang,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS INTEGER) AS stop_hits
  FROM documents) t
ORDER BY doc_id"""

  val textQuality: String = s"""
SELECT doc_id, n_tokens, unique_ratio, stopword_ratio,
       least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 + unique_ratio * 0.3
         + (1.0 - stopword_ratio) * 0.3 AS quality_score
FROM (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS unique_ratio,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
  FROM documents) t
ORDER BY doc_id"""

  val tokenCount: String = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS bpe_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS subword_estimate
FROM documents
ORDER BY doc_id"""

  val docFingerprint: String = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
       substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 8) AS fp_bucket
FROM documents
ORDER BY doc_id"""

  val multimodalMeta: String = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
       md5(text) AS payload_md5,
       CAST(ceil(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT) AS n_chunks
FROM documents
ORDER BY doc_id"""

  /** Byte-frequency features — the stub decoder (Multimodal.decodeStub) is
    * a 16-bin byte histogram, L1-normalized, so it IS SQL-expressible:
    * bin(byte) = byte % 16 = the byte's low hex nibble, read straight out
    * of hex(payload) (char 2·i of byte i, 1-indexed). Normalization mirrors
    * the stub's float arithmetic: counts are float-exact, and
    * CAST(double_quotient AS REAL) equals the stub's float division
    * because cnt/len can never land on a float rounding tie (a tie needs
    * exactly 25 significant bits; cnt/len is either non-dyadic or dyadic
    * with ≤ 24 bits). */
  val multimodalFeatures: String = {
    val fCols = (0 until 16).map(b =>
      s"       CAST(CAST(COALESCE(SUM(CASE WHEN h.bin = $b THEN h.cnt END), 0) AS DOUBLE)" +
        s" / GREATEST(m.byte_len, 1) AS REAL) AS f$b").mkString(",\n")
    // one payload byte from the hex dump (0-based offset), as BIGINT
    def byteAt(i: Int) = s"CAST(concat('0x', substr(hx, ${2 * i + 1}, 2)) AS BIGINT)"
    // little-endian signed int32 at 0-based offset `off` — mirrors
    // Multimodal.decode's le32 (Int arithmetic wraps to signed there)
    def le32(off: Int) =
      s"""(CASE WHEN ${byteAt(off)} + 256 * ${byteAt(off + 1)} + 65536 * ${byteAt(off + 2)}
               + 16777216 * ${byteAt(off + 3)} >= 2147483648
           THEN ${byteAt(off)} + 256 * ${byteAt(off + 1)} + 65536 * ${byteAt(off + 2)}
               + 16777216 * ${byteAt(off + 3)} - 4294967296
           ELSE ${byteAt(off)} + 256 * ${byteAt(off + 1)} + 65536 * ${byteAt(off + 2)}
               + 16777216 * ${byteAt(off + 3)} END)"""
    // little-endian unsigned int16 at 0-based offset `off` — mirrors
    // Multimodal.decode's le16
    def le16(off: Int) = s"(${byteAt(off)} + 256 * ${byteAt(off + 1)})"
    // plain (non-interpolated) strings so \t/\r reach RE2 as backslash
    // sequences, exactly as Java regex sees them on the Spark side
    val ppmMatch =
      """regexp_matches(text, '^P6[ \t-\r]+[0-9]{1,9}[ \t-\r]+[0-9]{1,9}[ \t-\r]')"""
    val ppmDims =
      """regexp_extract(text, '^P6[ \t-\r]+([0-9]{1,9})[ \t-\r]+([0-9]{1,9})[ \t-\r]', %d)"""
    // canonical-WAV magic: RIFF @0, WAVE @8, 'fmt ' @12, data @36 as hex
    val wavMatch = "byte_len >= 44 AND substr(hx, 1, 8) = '52494646'" +
      " AND substr(hx, 17, 8) = '57415645' AND substr(hx, 25, 8) = '666D7420'" +
      " AND substr(hx, 73, 8) = '64617461'"
    s"""
WITH meta AS (
  SELECT doc_id, text, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
         hex(encode(text)) AS hx
  FROM documents
), typed AS (
  SELECT doc_id, text, byte_len, hx,
         CASE WHEN $wavMatch THEN 'wav'
              WHEN byte_len >= 26 AND substr(hx, 1, 4) = '424D' THEN 'bmp'
              WHEN $ppmMatch THEN 'ppm'
              ELSE 'raw' END AS format
  FROM meta
), dims AS (
  SELECT doc_id, byte_len, hx, format,
         CAST(CASE WHEN format = 'bmp' THEN ${le32(18)}
                   WHEN format = 'ppm' THEN TRY_CAST(${ppmDims.format(1)} AS BIGINT)
                   WHEN format = 'wav' THEN 0
                   ELSE byte_len % 640 END AS INTEGER) AS width,
         CAST(CASE WHEN format = 'bmp' THEN ${le32(22)}
                   WHEN format = 'ppm' THEN TRY_CAST(${ppmDims.format(2)} AS BIGINT)
                   WHEN format = 'wav' THEN 0
                   ELSE byte_len % 480 END AS INTEGER) AS height,
         CAST(CASE WHEN format = 'wav' THEN ${le32(24)} ELSE 0 END AS INTEGER)
           AS sample_rate,
         CAST(CASE WHEN format = 'wav' THEN ${le16(22)} ELSE 0 END AS INTEGER)
           AS n_channels,
         CAST(CASE WHEN format = 'wav' THEN ${le16(34)} ELSE 0 END AS INTEGER)
           AS bit_depth
  FROM typed
), wavpeak AS (
  SELECT doc_id,
         CAST(MAX(CASE WHEN s >= 32768 THEN 65536 - s ELSE s END) AS INTEGER) AS peak
  FROM (
    SELECT d.doc_id,
           CAST(concat('0x', substr(d.hx, CAST(89 + 4 * ix.i AS INTEGER), 2)) AS BIGINT)
             + 256 * CAST(concat('0x', substr(d.hx, CAST(91 + 4 * ix.i AS INTEGER), 2)) AS BIGINT)
             AS s
    FROM dims d
    CROSS JOIN (SELECT unnest(range(0, 64)) AS i) ix
    WHERE d.format = 'wav' AND d.bit_depth = 16 AND ix.i < (d.byte_len - 44) // 2
  ) q GROUP BY doc_id
), hist AS (
  SELECT doc_id, bin, COUNT(*) AS cnt
  FROM (SELECT doc_id,
               strpos('0123456789ABCDEF',
                      substr(hx, CAST(2 * i AS INTEGER), 1)) - 1 AS bin
        FROM (SELECT doc_id, hx, unnest(range(1, byte_len + 1)) AS i FROM meta) t) u
  GROUP BY doc_id, bin
)
SELECT m.doc_id, m.byte_len, m.format, m.width, m.height,
       m.sample_rate, m.n_channels, m.bit_depth,
       CAST(COALESCE(ANY_VALUE(w.peak), 0) AS INTEGER) AS pcm_peak,
$fCols
FROM dims m
LEFT JOIN wavpeak w ON w.doc_id = m.doc_id
LEFT JOIN hist h ON h.doc_id = m.doc_id
GROUP BY m.doc_id, m.byte_len, m.format, m.width, m.height,
         m.sample_rate, m.n_channels, m.bit_depth
ORDER BY m.doc_id"""
  }

  val multimodalFrameSample: String = """
SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
       md5(substring(text, CAST(k*128 + 1 AS BIGINT), 64)) AS frame_md5,
       CAST(least(length(text) - k*128, 64) AS BIGINT) AS frame_len
FROM documents
CROSS JOIN (SELECT unnest(range(0, 4)) AS k) f
WHERE k*128 < length(text)
ORDER BY doc_id, frame_idx"""

  /** Shared per-doc 64-bit perceptual average-hash chain (CTE `ah`),
    * lockstep with [[graft.functions.AHashImpl.ahash64]]: format-aware
    * body offset (WAV 44 / BMP pixel-array field / PPM header end / raw
    * 0), 64 equal-share cells over the body bytes, bit c =
    * [sum_c·n >= total·cnt_c] — an all-integer compare (the sums run in
    * DuckDB's HUGEINT, exact), bit 63's addend spelled as BIGINT.MIN.
    * Bodies under 64 bytes are excluded on both sides. */
  private def aHashChain: String = {
    def byteAt(i: Int) = s"CAST(concat('0x', substr(hx, ${2 * i + 1}, 2)) AS BIGINT)"
    def le32(off: Int) =
      s"""(CASE WHEN ${byteAt(off)} + 256 * ${byteAt(off + 1)} + 65536 * ${byteAt(off + 2)}
               + 16777216 * ${byteAt(off + 3)} >= 2147483648
           THEN ${byteAt(off)} + 256 * ${byteAt(off + 1)} + 65536 * ${byteAt(off + 2)}
               + 16777216 * ${byteAt(off + 3)} - 4294967296
           ELSE ${byteAt(off)} + 256 * ${byteAt(off + 1)} + 65536 * ${byteAt(off + 2)}
               + 16777216 * ${byteAt(off + 3)} END)"""
    val ppmMatch =
      """regexp_matches(text, '^P6[ \t-\r]+[0-9]{1,9}[ \t-\r]+[0-9]{1,9}[ \t-\r]')"""
    val ppmHdrLen =
      """length(regexp_extract(text, '^P6[ \t-\r]+[0-9]{1,9}[ \t-\r]+[0-9]{1,9}[ \t-\r]', 0))"""
    val wavMatch = "byte_len >= 44 AND substr(hx, 1, 8) = '52494646'" +
      " AND substr(hx, 17, 8) = '57415645' AND substr(hx, 25, 8) = '666D7420'" +
      " AND substr(hx, 73, 8) = '64617461'"
    s"""
WITH meta AS (
  SELECT doc_id, text, CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
         hex(encode(text)) AS hx
  FROM documents
), offs AS (
  SELECT doc_id, byte_len, hx,
         CAST(CASE WHEN $wavMatch THEN 44
              WHEN byte_len >= 26 AND substr(hx, 1, 4) = '424D'
                THEN GREATEST(0, LEAST(byte_len, ${le32(10)}))
              WHEN $ppmMatch THEN $ppmHdrLen
              ELSE 0 END AS INTEGER) AS off
  FROM meta
), bidx AS (
  SELECT doc_id, hx, off, byte_len - off AS n,
         unnest(range(0, byte_len - off)) AS i
  FROM offs WHERE byte_len - off >= 64
), body AS (
  SELECT doc_id, n, CAST((i * 64) // n AS INTEGER) AS cell,
         CAST(concat('0x', substr(hx, CAST(2 * (off + i) + 1 AS INTEGER), 2)) AS BIGINT) AS v
  FROM bidx
), cells AS (
  SELECT doc_id, n, cell, SUM(v) AS s, COUNT(*) AS c
  FROM body GROUP BY doc_id, n, cell
), tot AS (
  SELECT doc_id, SUM(s) AS total FROM cells GROUP BY doc_id
), ah AS (
  SELECT c.doc_id,
         CAST(SUM(CASE WHEN c.s * c.n < t.total * c.c THEN 0
                       WHEN c.cell = 63 THEN -9223372036854775807 - 1
                       ELSE (CAST(1 AS BIGINT) << c.cell) END) AS BIGINT) AS ahash
  FROM cells c JOIN tot t USING (doc_id)
  GROUP BY c.doc_id
)"""
  }

  val multimodalAhash: String = aHashChain + """
SELECT doc_id, ahash FROM ah ORDER BY doc_id"""

  /** Per-doc 64-bit perceptual DIFFERENCE-hash, lockstep with
    * [[graft.functions.DHashImpl.dhash64]]: same format-aware body
    * offset as the aHash chain, 65 equal-share cells, bit c (0..63) =
    * [s(c+1)·cnt(c) > s(c)·cnt(c+1)] — an all-integer adjacent-cell
    * compare; bodies under 65 bytes excluded. */
  val multimodalDhash: String = {
    // reuse the aHash chain's meta/offs CTEs verbatim; only the cell
    // count (65) and the compare (adjacent, strict) differ
    val common = aHashChain
    val upToOffs = common.substring(0, common.indexOf("), bidx AS ("))
    upToOffs + """
), bidx65 AS (
  SELECT doc_id, hx, off, byte_len - off AS n,
         unnest(range(0, byte_len - off)) AS i
  FROM offs WHERE byte_len - off >= 65
), body65 AS (
  SELECT doc_id, CAST((i * 65) // n AS INTEGER) AS cell,
         CAST(concat('0x', substr(hx, CAST(2 * (off + i) + 1 AS INTEGER), 2)) AS BIGINT) AS v
  FROM bidx65
), cells65 AS (
  SELECT doc_id, cell, SUM(v) AS s, COUNT(*) AS c
  FROM body65 GROUP BY doc_id, cell
), dh AS (
  SELECT a.doc_id,
         CAST(SUM(CASE WHEN b.s * a.c <= a.s * b.c THEN 0
                       WHEN a.cell = 63 THEN -9223372036854775807 - 1
                       ELSE (CAST(1 AS BIGINT) << a.cell) END) AS BIGINT) AS dhash
  FROM cells65 a JOIN cells65 b ON b.doc_id = a.doc_id AND b.cell = a.cell + 1
  GROUP BY a.doc_id
)
SELECT doc_id, dhash FROM dh ORDER BY doc_id"""
  }

  /** Perceptual near-dup image pairs — all-pairs verify at oracle scale
    * (the Spark side blocks by the Manku C(6,3) tables; pigeonhole makes
    * the band join lossless at Hamming ≤ 3, so the SETS agree). */
  val multimodalPhashNeardup: String = aHashChain + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
FROM ah a JOIN ah b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
ORDER BY doc_a, doc_b"""

  val streamWindowedCounts: String = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2"""

  /** Backward as-of join (most recent session strictly before each
    * conversion) — SQL keeps the join + row_number form; the Spark plan is
    * the union + running-last window (Temporal.asofLastSession). */
  val asofLastSession: String = attrBase + """
SELECT conv_id, user_id, conv_ts_us, last_session_id, last_channel, gap_us FROM (
  SELECT c.conv_id, c.user_id, c.conv_ts_us,
         s.session_id AS last_session_id, s.channel_name AS last_channel,
         c.conv_ts_us - s.ts_us AS gap_us,
         row_number() OVER (PARTITION BY c.conv_id
                            ORDER BY s.ts_us DESC NULLS LAST, s.session_id DESC NULLS LAST) AS rn
  FROM conversions c LEFT JOIN sessions s
    ON s.user_id = c.user_id AND s.ts_us < c.conv_ts_us) t
WHERE rn = 1
ORDER BY conv_id"""

  /** Bounded range join: sessions within [conv_ts − 6 h, conv_ts). */
  val rangeSessionCount: String = attrBase + """
SELECT c.conv_id,
       CAST(COUNT(s.session_id) AS BIGINT) AS n_recent,
       CAST(COALESCE(SUM(s.holder_engagement), 0) AS BIGINT) AS n_holder
FROM conversions c LEFT JOIN sessions s
  ON s.user_id = c.user_id
 AND s.ts_us < c.conv_ts_us
 AND s.ts_us >= c.conv_ts_us - 21600000000
GROUP BY c.conv_id
ORDER BY c.conv_id"""

  /** Winnowing fingerprints: positioned 3-gram shingle hashes, sliding
    * 4-window minima, DISTINCT per doc (mirrors ShingleImpl.winnow; docs
    * with < 4 shingles contribute their global min via the idx=0 partial
    * window). */
  /** Shared winnowing-fingerprint CTE chain ending in
    * `wfp(doc_id, fingerprint)` — used by both the C14 query and the
    * contamination check. */
  private val winnowCte: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), shp AS (
  SELECT doc_id, pos,
         w || ' ' || LEAD(w,1) OVER win || ' ' || LEAD(w,2) OVER win AS shingle
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY shingle IS NOT NULL
), h AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS hv,
         COUNT(*) OVER (PARTITION BY doc_id) AS cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS idx,
         pos
  FROM shp
), wmin AS (
  SELECT doc_id,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY idx
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint,
         idx, cnt
  FROM h
), wfp AS MATERIALIZED (
  SELECT DISTINCT doc_id, fingerprint FROM wmin
  WHERE idx <= cnt - 4 OR (cnt < 4 AND idx = 0)
)"""

  val winnowFingerprints: String = winnowCte + """
SELECT doc_id, fingerprint FROM wfp
ORDER BY doc_id, fingerprint"""

  /** Decontamination: training docs sharing any winnowing fingerprint
    * with the holdout stratum (mirrors Corpus.contaminationCheck). */
  val contaminationCheck: String = winnowCte + """
, bench AS (
  SELECT fingerprint, doc_id AS bench_doc FROM wfp WHERE doc_id % 97 = 0
)
SELECT t.doc_id,
       CAST(COUNT(DISTINCT t.fingerprint) AS BIGINT) AS n_shared_fingerprints,
       CAST(COUNT(DISTINCT b.bench_doc) AS BIGINT) AS n_bench_docs
FROM wfp t JOIN bench b ON b.fingerprint = t.fingerprint
WHERE t.doc_id % 97 <> 0
GROUP BY t.doc_id
ORDER BY t.doc_id"""

  /** PII scrub (mirrors Corpus.piiScrub — the same three patterns, counts
    * over the original text, ordered global redaction, md5 of the
    * result). */
  val textPiiScrub: String = {
    import graft.operators.Corpus.Pii
    s"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '${Pii.Email}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text, '${Pii.Ipv4}')) AS INTEGER) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '${Pii.DigitRun}')) AS INTEGER) AS n_digit_runs,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(text, '${Pii.Email}', '<EMAIL>', 'g'),
               '${Pii.Ipv4}', '<IP>', 'g'),
             '${Pii.DigitRun}', '<NUM>', 'g')) AS scrubbed_md5
FROM documents
ORDER BY doc_id"""
  }

  /** Curation capstone: exact-dedup representatives above the quality
    * threshold (mirrors Corpus.curation). */
  val corpusCuration: String = s"""
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), q AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
           + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3
           + (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS quality_score
  FROM documents
)
SELECT q.doc_id, q.lang, q.n_tokens, q.quality_score
FROM q JOIN reps ON q.doc_id = reps.doc_id
WHERE q.quality_score >= 0.64
ORDER BY q.doc_id"""

  /** Deterministic stratified hash sample (10% en / 30% other). */
  val docChunking: String = """
WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n
  FROM documents),
s AS (
  SELECT doc_id, lang, words, n,
         unnest(generate_series(0, ((n - 1) // 48) * 48, 48)) AS start
  FROM w
  WHERE n >= 1)
SELECT doc_id, CAST(start // 48 AS INTEGER) AS chunk_id, lang,
       CAST(least(64, n - start) AS BIGINT) AS n_tokens,
       array_to_string(words[start + 1:start + 64], ' ') AS chunk_text
FROM s
ORDER BY doc_id, chunk_id"""

  val sequencePacking: String = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard
  FROM documents),
c AS (
  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t)
SELECT doc_id, lang, shard, n_tokens,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
       CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
FROM c
ORDER BY doc_id"""

  val dataMixtureSample: String = """
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
         CASE WHEN lang = 'en' THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.15 AS DOUBLE) END AS w
  FROM documents GROUP BY lang),
feas AS (SELECT MIN(n / w) AS t FROM counts),
rates AS (SELECT lang, w * t / n AS rate FROM counts, feas)
SELECT doc_id, lang, source
FROM documents JOIN rates USING (lang)
WHERE CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
      AS DOUBLE) < rate * 1000000.0
ORDER BY doc_id"""

  val qualityCurriculum: String = s"""
WITH base AS (
  SELECT doc_id, lang,
         least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 + unique_ratio * 0.3
           + (1.0 - stopword_ratio) * 0.3 AS q
  FROM (
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS unique_ratio,
           CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
    FROM documents) t),
ranked AS (
  SELECT lang, CAST(ntile(4) OVER (PARTITION BY lang ORDER BY q, doc_id) AS INTEGER) AS stage, q
  FROM base)
SELECT lang, stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(q) AS min_quality, MAX(q) AS max_quality,
       CAST(SUM(CAST(q AS DECIMAL(27,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_quality
FROM ranked
GROUP BY lang, stage
ORDER BY lang, stage"""

  val lmDocScore: String = """
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), bi AS MATERIALIZED (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, w AS w1, LEAD(w,1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok) t
  WHERE w2 IS NOT NULL
), cbi AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY w1, w2
), cw1 AS (
  SELECT w1, COUNT(*) AS cw FROM bi GROUP BY w1
), probs AS MATERIALIZED (
  SELECT w1, w2, CAST(cb AS DOUBLE) / CAST(cw AS DOUBLE) AS p
  FROM cbi JOIN cw1 USING (w1))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(p AS DECIMAL(27,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_lik
FROM bi JOIN probs USING (w1, w2)
GROUP BY doc_id
ORDER BY doc_id"""

  /** Per-language LM-likelihood tiles (CCNet head/middle/tail). Mirrors
    * Search.lmPplBuckets: C30's score CTEs, then ntile per lang (the
    * exact SQL ntile Quantiles.ntileFromRank reproduces), then the
    * bounded cell agg — no mean of the full-mantissa avg_lik. */
  val lmPplBuckets: String = """
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), bi AS MATERIALIZED (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, w AS w1, LEAD(w,1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok) t
  WHERE w2 IS NOT NULL
), cbi AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bi GROUP BY w1, w2
), cw1 AS (
  SELECT w1, COUNT(*) AS cw FROM bi GROUP BY w1
), probs AS MATERIALIZED (
  SELECT w1, w2, CAST(cb AS DOUBLE) / CAST(cw AS DOUBLE) AS p
  FROM cbi JOIN cw1 USING (w1)
), sc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(CAST(p AS DECIMAL(27,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_lik
  FROM bi JOIN probs USING (w1, w2)
  GROUP BY doc_id
), j AS (
  SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_lik
  FROM sc s JOIN documents d USING (doc_id)
), r AS (
  SELECT lang,
         CAST(ntile(3) OVER (PARTITION BY lang ORDER BY avg_lik DESC, doc_id) AS INTEGER) AS bucket,
         n_bigrams, avg_lik
  FROM j
)
SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       MIN(avg_lik) AS min_lik, MAX(avg_lik) AS max_lik
FROM r GROUP BY lang, bucket
ORDER BY lang, bucket"""

  /** Held-out LM scoring: the lmDocScore chain with the model trained on
    * even doc_ids only and applied to the odd half (unseen bigrams
    * contribute 0). Mirrors Search.lmHeldoutScore. */
  val lmHeldoutScore: String = """
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), bi AS MATERIALIZED (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, w AS w1, LEAD(w,1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok) t
  WHERE w2 IS NOT NULL
), cbi AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bi WHERE doc_id % 2 = 0 GROUP BY w1, w2
), cw1 AS (
  SELECT w1, COUNT(*) AS cw FROM bi WHERE doc_id % 2 = 0 GROUP BY w1
), probs AS MATERIALIZED (
  SELECT w1, w2, CAST(cb AS DOUBLE) / CAST(cw AS DOUBLE) AS p
  FROM cbi JOIN cw1 USING (w1))
SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CAST(COALESCE(p.p, 0.0) AS DECIMAL(27,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_lik
FROM bi b LEFT JOIN probs p ON p.w1 = b.w1 AND p.w2 = b.w2
WHERE b.doc_id % 2 = 1
GROUP BY b.doc_id
ORDER BY b.doc_id"""

  /** The implementation's LSH S-curve (8 bands × 2 rows): explicit
    * square-multiply power tree, sqrt threshold. Mirrors
    * Dedup.minhashSCurve. */
  val minhashSCurve: String = """
WITH s AS (
  SELECT CAST(i AS DOUBLE) / 20.0 AS jaccard
  FROM (SELECT unnest(range(1, 20)) AS i)
), c AS (
  SELECT jaccard, jaccard * jaccard AS s2 FROM s
), q AS (
  SELECT jaccard, 1.0 - s2 AS q FROM c
), e AS (
  SELECT jaccard, q * q AS q2 FROM q
), e2 AS (
  SELECT jaccard, q2 * q2 AS q4 FROM e
)
SELECT jaccard, 1.0 - q4 * q4 AS p_candidate, sqrt(0.125) AS threshold_s
FROM e2
ORDER BY jaccard"""

  /** Per-source quality profile. Mirrors Corpus.sourceQualityProfile. */
  val sourceQualityProfile: String = s"""
WITH q AS (
  SELECT source, ${qualitySql("text")} AS q,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS t
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(t) AS BIGINT) AS n_tokens,
       MIN(q) AS min_quality, MAX(q) AS max_quality,
       CAST(SUM(CAST(q AS DECIMAL(27,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_quality
FROM q GROUP BY source
ORDER BY source"""

  /** Quality-decile × exact-dup cells with within-decile shares. Mirrors
    * Corpus.qualityDupGrid. */
  val qualityDupGrid: String = s"""
WITH scored AS (
  SELECT doc_id, md5(text) AS h, ${qualitySql("text")} AS q
  FROM documents
), groups AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM scored GROUP BY h
), cells AS (
  SELECT CAST(floor(s.q * 10.0) AS BIGINT) AS q_decile, g.n > 1 AS is_dup,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM scored s JOIN groups g ON g.h = s.h
  GROUP BY 1, 2
)
SELECT q_decile, is_dup, n_docs,
       CAST(n_docs AS DOUBLE)
         / CAST(SUM(n_docs) OVER (PARTITION BY q_decile) AS DOUBLE) AS decile_share
FROM cells
ORDER BY q_decile, is_dup"""

  /** AMS sign-sketch join-size estimate vs truth. Mirrors
    * Sketches.amsJoinSize (bitwise sign bit, HUGEINT sign-sum products
    * ≡ the Spark DECIMAL(38,0) accumulation, exact-integer median over
    * the 5 rows). */
  val sketchJoinSize: String = """
WITH ka AS (
  SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS f FROM orders GROUP BY 1
), ca AS (
  SELECT d.r, h % 256 AS bucket,
         CASE WHEN (h & 256) = 0 THEN f ELSE -f END AS sf
  FROM (
    SELECT d.r AS r, f,
           CAST(concat('0x', substring(md5(concat(CAST(d.r AS VARCHAR), ':',
                CAST(k AS VARCHAR))), 1, 15)) AS BIGINT) AS h
    FROM ka CROSS JOIN (SELECT unnest(range(0, 5)) AS r) d) d
), ga AS (
  SELECT r, bucket, CAST(SUM(sf) AS BIGINT) AS s FROM ca GROUP BY r, bucket
), kb AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS f FROM lineitem GROUP BY 1
), cb AS (
  SELECT d.r, h % 256 AS bucket,
         CASE WHEN (h & 256) = 0 THEN f ELSE -f END AS sf
  FROM (
    SELECT d.r AS r, f,
           CAST(concat('0x', substring(md5(concat(CAST(d.r AS VARCHAR), ':',
                CAST(k AS VARCHAR))), 1, 15)) AS BIGINT) AS h
    FROM kb CROSS JOIN (SELECT unnest(range(0, 5)) AS r) d) d
), gb AS (
  SELECT r, bucket, CAST(SUM(sf) AS BIGINT) AS s_b FROM cb GROUP BY r, bucket
), per0 AS (
  SELECT a.r, SUM(CAST(a.s AS HUGEINT) * b.s_b) AS est
  FROM ga a JOIN gb b ON b.r = a.r AND b.bucket = a.bucket
  GROUP BY a.r
), per AS (
  -- d-row spine: a sketch row sharing no occupied bucket with the other
  -- side has inner product exactly 0, and the median needs all d rows
  SELECT COALESCE(p.est, 0) AS est
  FROM (SELECT unnest(range(0, 5)) AS r) d LEFT JOIN per0 p ON p.r = d.r
), est AS (
  SELECT CAST(list_sort(list(est))[3] AS BIGINT) AS est_join_size FROM per
), tru AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_join_size
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT est_join_size, true_join_size,
       CASE WHEN true_join_size = 0 THEN NULL
            ELSE CAST(est_join_size - true_join_size AS DOUBLE)
                   / CAST(true_join_size AS DOUBLE) END AS rel_error
FROM est CROSS JOIN tru"""

  val sampleStratified: String = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT) % 1000 AS bucket
  FROM documents) t
WHERE bucket < CASE WHEN lang = 'en' THEN 100 ELSE 300 END
ORDER BY doc_id"""

  /** Priority sampling (Duffield–Lund–Thorup): priority = w·2^60/(h+1)
    * with the md5-hash uniform proxy; τ = the (k+1)-th priority per
    * stratum; ŵ = max(w, τ). Identical IEEE trees as the Spark side. */
  val samplePriority: String = """
WITH pri AS (
  SELECT doc_id, lang, n_chars,
         CAST(n_chars AS DOUBLE) *
           (1152921504606846976.0 /
            CAST(CAST(concat('0x', substring(md5(concat('ps:',
                 CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) + 1 AS DOUBLE)) AS q
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rnk
  FROM pri
), tau AS (
  SELECT lang, MAX(CASE WHEN rnk = 21 THEN q END) AS tau
  FROM ranked WHERE rnk <= 21 GROUP BY lang
), totals AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang
)
SELECT r.lang, CAST(r.rnk AS INTEGER) AS rnk, r.doc_id, r.n_chars,
       GREATEST(CAST(r.n_chars AS DOUBLE), COALESCE(t.tau, 0.0)) AS w_est,
       g.n_docs, g.total_chars
FROM ranked r
JOIN tau t ON r.lang = t.lang
JOIN totals g ON r.lang = g.lang
WHERE r.rnk <= 20
ORDER BY r.lang, r.rnk"""

  /** Bloom semi-join prune: the (j, pos) partitioned position sets and
    * the all-k-hit pass rule replayed literally; counts only. */
  val sketchBloomPrune: String = """
WITH urgent AS (
  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
), pos AS (
  SELECT DISTINCT d.j,
         CAST(concat('0x', substring(md5(concat('bf', CAST(d.j AS VARCHAR), ':',
              CAST(o_orderkey AS VARCHAR))), 1, 15)) AS BIGINT) % 16384 AS p
  FROM urgent CROSS JOIN (SELECT unnest(range(0, 3)) AS j) d
), keys AS (
  SELECT DISTINCT l_orderkey FROM lineitem
), khit AS (
  SELECT k.l_orderkey, CAST(COUNT(pos.p) AS BIGINT) AS hits
  FROM keys k
  CROSS JOIN (SELECT unnest(range(0, 3)) AS j) d
  LEFT JOIN pos ON pos.j = d.j
    AND pos.p = CAST(concat('0x', substring(md5(concat('bf',
          CAST(d.j AS VARCHAR), ':', CAST(k.l_orderkey AS VARCHAR))),
          1, 15)) AS BIGINT) % 16384
  GROUP BY k.l_orderkey
), passkeys AS (
  SELECT l_orderkey FROM khit WHERE hits = 3
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_fact,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey IN (SELECT l_orderkey FROM passkeys)) AS n_bloom_pass,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM urgent)) AS n_exact,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey IN (SELECT l_orderkey FROM passkeys))
  - (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM urgent)) AS n_false_pos"""

  /** The salted two-phase aggregate must equal the direct aggregate. */
  val saltedChannelAgg: String = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type"""

  val eventsDowHourHeatmap: String = """
SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
       CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2"""

  val eventsCube: String = """
SELECT event_type, CAST(ts AS DATE) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
ORDER BY event_type NULLS FIRST, event_date NULLS FIRST"""

  val ordersMovingAvg: String = """
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER w AS DOUBLE)
         / CAST(COUNT(*) OVER w AS DOUBLE) AS avg_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey"""

  val eventsDailyDense: String = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
), spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS event_date
  FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
)
SELECT t.event_type, s.event_date,
       COALESCE(d.n, 0) AS n, COALESCE(d.total_value, 0.0) AS total_value
FROM spine s CROSS JOIN types t
LEFT JOIN daily d ON d.event_type = t.event_type AND d.event_date = s.event_date
ORDER BY t.event_type, s.event_date"""

  val q14PromoRevenue: String = """
SELECT 100.0 *
       CAST(SUM(CAST(CASE WHEN p_type = 'ECONOMY'
                          THEN l_extendedprice * (1.0 - l_discount)
                          ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE) /
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'"""

  val q17SmallQuantityRevenue: String = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN (
  SELECT l_partkey AS pk,
         (CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE)) * 0.2 AS lim
  FROM lineitem GROUP BY l_partkey) t
 ON l.l_partkey = t.pk AND l.l_quantity < t.lim"""

  val eventsLatestPerUser: String = """
SELECT user_id, event_id, ts_us, event_type, value FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
ORDER BY user_id"""

  val q4OrderPriority: String = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""

  val q13CustDist: String = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""

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

  /** Shared 60-bit md5-prefix hash of the (user, day) pair — lockstep
    * with [[graft.operators.Sketches]]' h60. */
  private val sketchHashed: String = """
WITH hashed AS (
  SELECT event_type AS channel,
         CAST(concat('0x', substring(md5(concat(CAST(user_id AS VARCHAR), '|',
              CAST(CAST(ts AS DATE) AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM events
)"""

  /** KMV sketch oracle: same distinct-hash ranking and the same
    * two-op IEEE estimate tree (division first, k−1 scaling second) as
    * `Sketches.kmvDistinct`. */
  val sketchKmvDistinct: String = sketchHashed + """
, dh AS (
  SELECT DISTINCT channel, h FROM hashed
), ranked AS (
  SELECT channel, h, row_number() OVER (PARTITION BY channel ORDER BY h) AS rn
  FROM dh
), kept AS (
  SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS h_k
  FROM ranked WHERE rn <= 64 GROUP BY channel
), ex AS (
  SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_exact FROM dh GROUP BY channel
)
SELECT k.channel, e.n_exact, k.n_kept,
       CASE WHEN k.n_kept < 64 THEN CAST(k.n_kept AS DOUBLE)
            ELSE CAST(63 AS DOUBLE)
                 * (CAST(1152921504606846976 AS DOUBLE) / CAST(k.h_k AS DOUBLE)) END
         AS est_distinct
FROM kept k JOIN ex e ON e.channel = k.channel
ORDER BY 1"""

  /** KMV theta-intersection oracle: per channel pair, θ = min of the two
    * k-th hashes (2^60 when unsaturated), common-below-θ scaled by
    * 2^60/θ — mirrors Sketches.kmvIntersection. */
  val sketchKmvIntersection: String = sketchHashed + """
, dh AS (
  SELECT DISTINCT channel, h FROM hashed
), ranked AS (
  SELECT channel, h, row_number() OVER (PARTITION BY channel ORDER BY h) AS rn
  FROM dh
), st AS (
  SELECT channel, h FROM ranked WHERE rn <= 64
), th AS (
  SELECT channel,
         CASE WHEN COUNT(*) < 64 THEN CAST(1152921504606846976 AS DOUBLE)
              ELSE CAST(MAX(h) AS DOUBLE) END AS theta
  FROM st GROUP BY channel
), prs AS (
  SELECT a.channel AS ch_a, b.channel AS ch_b, least(a.theta, b.theta) AS theta
  FROM th a JOIN th b ON a.channel < b.channel
), cm AS (
  SELECT sa.channel AS ch_a, sb.channel AS ch_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM st sa JOIN st sb ON sa.h = sb.h AND sa.channel < sb.channel
  JOIN prs p ON p.ch_a = sa.channel AND p.ch_b = sb.channel
  WHERE CAST(sa.h AS DOUBLE) < p.theta
  GROUP BY 1, 2
)
SELECT p.ch_a, p.ch_b,
       CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(c.n_common, 0) AS DOUBLE)
         * (CAST(1152921504606846976 AS DOUBLE) / p.theta) AS est_intersection
FROM prs p
LEFT JOIN cm c ON c.ch_a = p.ch_a AND c.ch_b = p.ch_b
ORDER BY p.ch_a, p.ch_b"""

  /** Count-min sketch oracle: d=4 rows × w=64 buckets, probe users < 10,
    * estimate = min over rows — same "r:user" hash input as
    * `Sketches.cmsFrequency`. */
  val sketchCmsFrequency: String = """
WITH rws AS (
  SELECT event_type AS channel, user_id FROM events
), cells AS (
  SELECT channel, user_id, d.r,
         CAST(concat('0x', substring(md5(concat(CAST(d.r AS VARCHAR), ':',
              CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 64 AS bucket
  FROM rws CROSS JOIN (SELECT unnest(range(0, 4)) AS r) d
), sketch AS (
  SELECT channel, r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY channel, r, bucket
), exact AS (
  SELECT channel, user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM rws WHERE user_id < 10 GROUP BY channel, user_id
), probe AS (
  SELECT e.channel, e.user_id, e.n_exact, d.r,
         CAST(concat('0x', substring(md5(concat(CAST(d.r AS VARCHAR), ':',
              CAST(e.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 64 AS bucket
  FROM exact e CROSS JOIN (SELECT unnest(range(0, 4)) AS r) d
)
SELECT p.channel, p.user_id, p.n_exact, MIN(s.cnt) AS n_cms
FROM probe p
JOIN sketch s ON s.channel = p.channel AND s.r = p.r AND s.bucket = p.bucket
GROUP BY p.channel, p.user_id, p.n_exact
ORDER BY 1, 2"""

  /** BPE merge-candidate counts: distinct-token frequency table, then
    * weighted adjacent char pairs — lockstep with `Search.bpeTopMerges`. */
  /** BPE train + encode (`Search.bpeLearn` + `Search.bpeEncode`), fully
    * unrolled: 30 learning rounds as MATERIALIZED CTE pairs (best-pair
    * argmax, then one greedy left-to-right non-overlapping rewrite) —
    * the Lloyd/MMR unroll trick applied to tokenizer training.
    *
    * Representation: each vocabulary word is kept as its symbols joined
    * by a DOUBLE space with double-space sentinels ("  a  b  c  "), so
    * one `replace(' x  y ', ' xy ')` per round implements EXACTLY the
    * greedy skip-2 merge pass (adjacent occurrences never share a
    * separator character, so left-to-right non-overlapping `replace`
    * can't miss the second of two touching matches). A round with no
    * remaining pairs yields an empty p_r; the LEFT JOIN ON TRUE then
    * passes words through unchanged, mirroring `bpeLearn`'s early stop.
    *
    * Fertility re-aggregates from the final vocabulary tokenization;
    * every document word is in the vocabulary because the 65536 cap is
    * far above this corpus's distinct-word count (the Spark side's
    * truncation would equally only matter beyond the cap). */
  /** The shared 30-round unrolled BPE learning chain (v0 → v30) used by
    * [[bpeEncode]] and [[bpeCoverage]]. */
  private def bpeChain(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH v0 AS MATERIALIZED (
  SELECT w, freq, '  ' || regexp_replace(w, '(.)', '\1  ', 'g') AS s
  FROM (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w ORDER BY freq DESC, w LIMIT 65536) vocab
)"""
    for (r <- 1 to nMerges) {
      sb ++= s"""
, p$r AS MATERIALIZED (
  SELECT c1, c2 FROM (
    SELECT syms[CAST(i AS INTEGER)] AS c1, syms[CAST(i AS INTEGER) + 1] AS c2, freq
    FROM (
      SELECT freq, syms, unnest(range(1, len(syms))) AS i
      FROM (SELECT freq, string_split(trim(s), '  ') AS syms FROM v${r - 1}) z) zz
  ) GROUP BY c1, c2 ORDER BY SUM(freq) DESC, c1, c2 LIMIT 1
), v$r AS MATERIALIZED (
  SELECT v.w, v.freq,
         CASE WHEN p.c1 IS NULL THEN v.s
              ELSE replace(v.s, ' ' || p.c1 || '  ' || p.c2 || ' ',
                                ' ' || p.c1 || p.c2 || ' ') END AS s
  FROM v${r - 1} v LEFT JOIN p$r p ON TRUE
)"""
    }
    sb.result()
  }

  val bpeEncode: String = {
    val nMerges = 30
    val sb = new StringBuilder
    sb ++= bpeChain(nMerges)
    sb ++= s"""
, wtok AS (
  SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_tok,
         CAST(length(w) AS BIGINT) AS n_chr
  FROM v$nMerges WHERE w <> ''
), tokd AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT d.doc_id,
       CAST(COUNT(t.w) AS BIGINT) AS n_words,
       CAST(COALESCE(SUM(wt.n_chr), 0) AS BIGINT) AS n_chars,
       CAST(COALESCE(SUM(wt.n_tok), 0) AS BIGINT) AS n_tokens,
       CASE WHEN COUNT(t.w) = 0 THEN 0.0
            ELSE CAST(COALESCE(SUM(wt.n_tok), 0) AS DOUBLE) / CAST(COUNT(t.w) AS DOUBLE)
       END AS tokens_per_word
FROM documents d
LEFT JOIN tokd t ON d.doc_id = t.doc_id
LEFT JOIN wtok wt ON t.w = wt.w
GROUP BY d.doc_id
ORDER BY d.doc_id"""
    sb.result()
  }

  /** Per-language tokenizer coverage: the learning chain re-tokenizes
    * the vocabulary; (lang, word) occurrences join back for the
    * fertility / single-token rollup — lockstep with
    * `Search.bpeCoverage`. */
  val bpeCoverage: String = {
    val nMerges = 30
    bpeChain(nMerges) + s"""
, wtok AS (
  SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_tok
  FROM v$nMerges WHERE w <> ''
), tokd AS (
  SELECT lang, w
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) z
  WHERE w <> ''
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(wt.n_tok) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE wt.n_tok = 1) AS BIGINT) AS n_single,
       CAST(SUM(wt.n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS tokens_per_word,
       CAST(COUNT(*) FILTER (WHERE wt.n_tok = 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS single_frac
FROM tokd t JOIN wtok wt ON t.w = wt.w
GROUP BY t.lang
ORDER BY t.lang"""
  }

  /** One Viterbi pass as a RECURSIVE CTE — the SQL twin of
    * `Search.unigramViterbi` run over every word of `src` at once. Each
    * recursion step advances every word one position, carrying a
    * 4-deep sliding window of dp scores (`d0..d3` = dp(j)..dp(j−3))
    * and of best-path segmentations (`s0..s3`, pieces joined by single
    * spaces), so the path never needs a backward decode. Candidates are
    * the ≤4 trailing substrings ending at the new position; multi-cp
    * pieces must LEFT-JOIN into the round's count table (`len = 1 OR
    * piece IS NOT NULL` — the smoothed single-cp UNK path), scored
    * `dp(j−len) + (lni(c+1) − lnt)` with [[lniSql]], and the argmax is
    * a struct-max over (score DESC, −len ... shortest-wins) — exactly
    * the Scala loop's ascending-len strict-`>` scan. DuckDB substring/
    * length are code-point-based, matching `codePointSymbols`. */
  private def unigramVit(
      name: String, src: String, cnt: String, lntCte: String,
      withFreq: Boolean): String = {
    val fcol = if (withFreq) "freq, " else ""
    val fsel = if (withFreq) "v.freq, " else ""
    s"""$name AS (
  SELECT w, ${fcol}length(w) AS n, 0 AS j,
         CAST(0.0 AS DOUBLE) AS d0, CAST(0.0 AS DOUBLE) AS d1,
         CAST(0.0 AS DOUBLE) AS d2, CAST(0.0 AS DOUBLE) AS d3,
         '' AS s0, '' AS s1, '' AS s2, '' AS s3
  FROM $src
  UNION ALL
  SELECT w, ${fcol}n, j + 1,
         best.sc AS d0, d0 AS d1, d1 AS d2, d2 AS d3,
         best.seg AS s0, s0 AS s1, s1 AS s2, s2 AS s3
  FROM (
    SELECT w, ${fcol}n, j, d0, d1, d2, d3, s0, s1, s2, s3,
           max(struct_pack(sc := sc, negl := -l, seg := cseg)) AS best
    FROM (
      SELECT v.w, ${fsel}v.n, v.j, v.d0, v.d1, v.d2, v.d3, v.s0, v.s1, v.s2, v.s3,
             CAST(ll.l AS INTEGER) AS l,
             (CASE ll.l WHEN 1 THEN v.d0 WHEN 2 THEN v.d1 WHEN 3 THEN v.d2 ELSE v.d3 END)
               + (${lniSql("COALESCE(c.c, 0) + 1")} - t.lnt) AS sc,
             (CASE ll.l WHEN 1 THEN v.s0 WHEN 2 THEN v.s1 WHEN 3 THEN v.s2 ELSE v.s3 END)
               || ' ' || substring(v.w, CAST(v.j + 2 - ll.l AS INTEGER), CAST(ll.l AS INTEGER)) AS cseg
      FROM $name v
      CROSS JOIN (SELECT unnest(range(1, 5)) AS l) ll
      CROSS JOIN $lntCte t
      LEFT JOIN $cnt c
        ON c.piece = substring(v.w, CAST(v.j + 2 - ll.l AS INTEGER), CAST(ll.l AS INTEGER))
      WHERE v.j < v.n AND ll.l <= v.j + 1 AND (ll.l = 1 OR c.piece IS NOT NULL)
    ) cand
    GROUP BY ALL
  ) ranked
)"""
  }

  /** Unigram-LM (SentencePiece-family) tokenizer TRAINING, fully
    * unrolled — the `Search.unigramLearn` twin, in lockstep: top-65536
    * (freq DESC, w) vocabulary, seed counts from every 1..4-cp
    * substring (ALL singles + top-200 multis by score DESC, piece ASC),
    * then 2 hard-EM rounds each = one [[unigramVit]] Viterbi E-step
    * over the vocabulary + an M-step re-count restricted to the FIXED
    * inventory (`cnt0 LEFT JOIN m_r` keeps zero-count pieces alive).
    * Round totals smooth as `Σc + |inventory|`; every ln is [[lniSql]],
    * so each double reproduces the Scala side bit-for-bit. Ends with
    * `cnt2` (the final model) and `lnt2` (its ln-total). */
  private def unigramChain: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH RECURSIVE vocab AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w ORDER BY freq DESC, w LIMIT 65536
), seedsub AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c FROM (
    SELECT substring(w, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece, freq
    FROM (SELECT w, freq, unnest(range(1, length(w) + 1)) AS i FROM vocab) a
    CROSS JOIN (SELECT unnest(range(1, 5)) AS l) ll
    WHERE CAST(i AS INTEGER) + CAST(l AS INTEGER) - 1 <= length(a.w)
  ) GROUP BY piece
), cnt0 AS MATERIALIZED (
  SELECT piece, c FROM seedsub WHERE length(piece) = 1
  UNION ALL
  SELECT piece, c FROM (
    SELECT piece, c FROM seedsub WHERE length(piece) > 1
    ORDER BY c DESC, piece LIMIT 200)
)"""
    for (r <- 1 to 2) {
      val prev = s"cnt${r - 1}"
      sb ++= s""", lnt${r - 1} AS (
  SELECT ${lniSql("total")} AS lnt
  FROM (SELECT CAST(SUM(c) + COUNT(*) AS BIGINT) AS total FROM $prev)
), """
      sb ++= unigramVit(s"vit$r", "vocab", prev, s"lnt${r - 1}", withFreq = true)
      sb ++= s""", m$r AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(trim(s0), ' ')) AS piece, freq
        FROM vit$r WHERE j = n)
  GROUP BY piece
), cnt$r AS MATERIALIZED (
  SELECT i.piece, CAST(COALESCE(m.c, 0) AS BIGINT) AS c
  FROM $prev i LEFT JOIN m$r m ON m.piece = i.piece
)"""
    }
    sb ++= s""", lnt2 AS (
  SELECT ${lniSql("total")} AS lnt
  FROM (SELECT CAST(SUM(c) + COUNT(*) AS BIGINT) AS total FROM cnt2)
)"""
    sb.result()
  }

  /** Distinct corpus words + one encode-time Viterbi pass under the
    * final model — shared by [[unigramEncode]] and [[unigramFertility]].
    * Encode segments EVERY corpus word (not just the capped training
    * vocabulary), exactly as `Search.unigramEncode` does. */
  private def unigramEncodePass: String =
    unigramChain + ", " + unigramVit(
      "vite",
      "(SELECT DISTINCT w FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) WHERE w <> '')",
      "cnt2", "lnt2", withFreq = false) + """
, wpieces AS (
  SELECT w, CAST(len(string_split(trim(s0), ' ')) AS BIGINT) AS n_pieces,
         CAST(length(w) AS BIGINT) AS n_chr
  FROM vite WHERE j = n
)"""

  /** Final trained piece table — lockstep with `Search.unigramPieces`. */
  val unigramPieces: String =
    unigramChain + "\nSELECT piece, c FROM cnt2 ORDER BY piece"

  /** Per-doc unigram segmentation counts — lockstep with
    * `Search.unigramEncode`. */
  val unigramEncode: String = unigramEncodePass + """
, tokd AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT d.doc_id,
       CAST(COUNT(t.w) AS BIGINT) AS n_words,
       CAST(COALESCE(SUM(wp.n_chr), 0) AS BIGINT) AS n_chars,
       CAST(COALESCE(SUM(wp.n_pieces), 0) AS BIGINT) AS n_pieces,
       CASE WHEN COUNT(t.w) = 0 THEN 0.0
            ELSE CAST(COALESCE(SUM(wp.n_pieces), 0) AS DOUBLE) / CAST(COUNT(t.w) AS DOUBLE)
       END AS pieces_per_word
FROM documents d
LEFT JOIN tokd t ON d.doc_id = t.doc_id
LEFT JOIN wpieces wp ON t.w = wp.w
GROUP BY d.doc_id
ORDER BY d.doc_id"""

  /** Per-language unigram fertility — lockstep with
    * `Search.unigramFertility`. */
  val unigramFertility: String = unigramEncodePass + """
, tokd AS (
  SELECT lang, w
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(wp.n_pieces) AS BIGINT) AS n_pieces,
       CAST(COUNT(*) FILTER (WHERE wp.n_pieces = 1) AS BIGINT) AS n_single,
       CAST(SUM(wp.n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pieces_per_word,
       CAST(COUNT(*) FILTER (WHERE wp.n_pieces = 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS single_frac
FROM tokd t JOIN wpieces wp ON t.w = wp.w
GROUP BY t.lang
ORDER BY t.lang"""

  val bpeTopMerges: String = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM tok WHERE length(w) >= 2 GROUP BY w
), positions AS (
  SELECT w, freq, unnest(range(1, length(w))) AS i FROM vocab
), pairs AS (
  SELECT substring(w, CAST(i AS INTEGER), 1) AS c1,
         substring(w, CAST(i + 1 AS INTEGER), 1) AS c2, freq
  FROM positions
)
SELECT c1, c2, CAST(SUM(freq) AS BIGINT) AS pair_freq
FROM pairs
GROUP BY c1, c2
ORDER BY pair_freq DESC, c1, c2
LIMIT 30"""

  /** Forward as-of: earliest session strictly after each conversion —
    * the relational (fan-out) form as the oracle for the union+window
    * implementation in `Temporal.asofNextSession`. */
  val asofNextSession: String = attrBase + """
SELECT conv_id, user_id, conv_ts_us, next_session_id, next_channel, gap_us FROM (
  SELECT c.conv_id, c.user_id, c.conv_ts_us,
         s.session_id AS next_session_id, s.channel_name AS next_channel,
         s.ts_us - c.conv_ts_us AS gap_us,
         row_number() OVER (PARTITION BY c.conv_id
                            ORDER BY s.ts_us ASC NULLS LAST, s.session_id ASC NULLS LAST) AS rn
  FROM conversions c LEFT JOIN sessions s
    ON s.user_id = c.user_id AND s.ts_us > c.conv_ts_us) t
WHERE rn = 1
ORDER BY conv_id"""

  /** RFM quartile segmentation, lockstep with `Analytics.rfmSegments`. */
  val rfmSegments: String = """
WITH per_user AS (
  SELECT user_id, MAX(epoch_us(ts)) AS last_ts_us,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS monetary
  FROM events GROUP BY user_id
), scored AS (
  SELECT *,
         CAST(ntile(4) OVER (ORDER BY last_ts_us DESC, user_id) AS BIGINT) AS r_quartile,
         CAST(ntile(4) OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS f_quartile,
         CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_quartile
  FROM per_user
)
SELECT user_id, last_ts_us, n_events, monetary,
       r_quartile, f_quartile, m_quartile,
       concat(r_quartile, f_quartile, m_quartile) AS segment
FROM scored
ORDER BY user_id"""

  /** Mixed grouping sets, lockstep with `Analytics.eventsGroupingSets`. */
  val eventsGroupingSets: String = """
SELECT event_type, CAST(ts AS DATE) AS event_date,
       (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type),
                        ((epoch_us(ts) // 86400000000 + 4) % 7))
ORDER BY event_type NULLS FIRST, event_date NULLS FIRST, dow NULLS FIRST"""

  /** INTERSECT of distinct clicker/purchaser user sets. */
  val clickersWhoPurchased: String = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id"""

  /** Windowed ordered funnel: sequentially-dependent window mins over
    * one user partitioning, lockstep with `Analytics.windowFunnel`. */
  val eventsWindowFunnel: String = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), w1 AS (
  SELECT user_id, event_type, ts_us,
         MIN(CASE WHEN event_type = 'view' THEN ts_us END)
           OVER (PARTITION BY user_id) AS t1
  FROM ev
), w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t1
                      AND ts_us <= t1 + 86400000000 THEN ts_us END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'signup' AND ts_us > t2
                      AND ts_us <= t1 + 86400000000 THEN ts_us END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2
), w4 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t3
                      AND ts_us <= t1 + 86400000000 THEN ts_us END)
              OVER (PARTITION BY user_id) AS t4
  FROM w3
)
SELECT DISTINCT user_id, t1, t2, t3, t4,
       CAST(CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
                 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS funnel_depth
FROM w4
WHERE t1 IS NOT NULL
ORDER BY user_id"""

  /** Oracle for the MERGED KMV sketch: deliberately the FULL-data
    * computation — merging bottom-k states must be lossless
    * (`bottomK(bottomK(A) ∪ bottomK(B)) = bottomK(A ∪ B)`), so matching
    * this hash IS the merge-correctness proof. */
  val sketchKmvMerged: String = sketchHashed + """
, dh AS (
  SELECT DISTINCT channel, h FROM hashed
), ranked AS (
  SELECT channel, h, row_number() OVER (PARTITION BY channel ORDER BY h) AS rn
  FROM dh
), kept AS (
  SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS h_k
  FROM ranked WHERE rn <= 64 GROUP BY channel
)
SELECT channel, n_kept,
       CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
            ELSE CAST(63 AS DOUBLE)
                 * (CAST(1152921504606846976 AS DOUBLE) / CAST(h_k AS DOUBLE)) END
         AS est_distinct
FROM kept
ORDER BY 1"""

  /** Oracle for the MERGED HLL registers: the FULL-data computation —
    * register-wise max over slice states must reproduce the full-data
    * registers exactly. */
  val sketchHllMerged: String = sketchHashed + """
, regs AS (
  SELECT channel, h % 64 AS idx,
         MAX(CASE WHEN (h >> 6) > 0 THEN 55 - length(bin(h >> 6)) ELSE 55 END) AS rnk
  FROM hashed GROUP BY channel, h % 64
), spine AS (
  SELECT c.channel, ix.idx
  FROM (SELECT DISTINCT channel FROM hashed) c
  CROSS JOIN (SELECT unnest(range(0, 64)) AS idx) ix
), filled AS (
  SELECT s.channel, COALESCE(r.rnk, 0) AS rnk
  FROM spine s LEFT JOIN regs r ON r.channel = s.channel AND r.idx = s.idx
)
SELECT channel,
       CAST(SUM(CASE WHEN rnk > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_registers_hit,
       CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
         / CAST(CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - rnk AS INTEGER)) AS BIGINT) AS DOUBLE) AS est_hll
FROM filled
GROUP BY channel
ORDER BY 1"""

  /** Histogram-quantile sketch oracle: 16-cent equi-width bins via
    * `floor(value · 6.25)` (6.25 is exact binary — one IEEE multiply +
    * floor, identical cross-engine), estimate = first bin whose
    * cumulative count reaches ceil(q·n) as its integer-cent upper
    * boundary; exact columns are the discrete rank-`ceil(q·n)` values
    * under the (value, event_id) total order. */
  val sketchHistQuantiles: String = """
WITH ev AS (
  SELECT event_type AS channel, value, event_id FROM events
), hist AS (
  SELECT channel, LEAST(4095, CAST(FLOOR(value * 6.25) AS BIGINT)) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT channel, b,
         CAST(SUM(cnt) OVER (PARTITION BY channel ORDER BY b) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY channel) AS BIGINT) AS n
  FROM hist
), est AS (
  SELECT channel, MAX(n) AS n,
         MIN(CASE WHEN cum >= CAST(CEIL(0.5 * n) AS BIGINT)
                  THEN CAST((b + 1) * 16 AS BIGINT) END) AS p50_cents_est,
         MIN(CASE WHEN cum >= CAST(CEIL(0.9 * n) AS BIGINT)
                  THEN CAST((b + 1) * 16 AS BIGINT) END) AS p90_cents_est,
         MIN(CASE WHEN cum >= CAST(CEIL(0.99 * n) AS BIGINT)
                  THEN CAST((b + 1) * 16 AS BIGINT) END) AS p99_cents_est
  FROM cum GROUP BY channel
), rk AS (
  SELECT channel, value,
         row_number() OVER (PARTITION BY channel ORDER BY value, event_id) AS rnk,
         CAST(COUNT(*) OVER (PARTITION BY channel) AS BIGINT) AS nr
  FROM ev
), ex AS (
  SELECT channel,
         MAX(CASE WHEN rnk = CAST(CEIL(0.5 * nr) AS BIGINT) THEN value END) AS p50_exact,
         MAX(CASE WHEN rnk = CAST(CEIL(0.9 * nr) AS BIGINT) THEN value END) AS p90_exact,
         MAX(CASE WHEN rnk = CAST(CEIL(0.99 * nr) AS BIGINT) THEN value END) AS p99_exact
  FROM rk GROUP BY channel
)
SELECT e.channel, e.n, e.p50_cents_est, e.p90_cents_est, e.p99_cents_est,
       x.p50_exact, x.p90_exact, x.p99_exact
FROM est e JOIN ex x ON x.channel = e.channel
ORDER BY 1"""

  /** Oracle for the MERGED histogram: the FULL-data computation —
    * cell-wise-sum merging of slice grids must reproduce the full grid
    * exactly (count linearity), so matching this hash IS the merge
    * proof. */
  val sketchHistMerged: String = """
WITH ev AS (
  SELECT event_type AS channel, value FROM events
), hist AS (
  SELECT channel, LEAST(4095, CAST(FLOOR(value * 6.25) AS BIGINT)) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT channel, b,
         CAST(SUM(cnt) OVER (PARTITION BY channel ORDER BY b) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY channel) AS BIGINT) AS n
  FROM hist
)
SELECT channel, MAX(n) AS n,
       MIN(CASE WHEN cum >= CAST(CEIL(0.5 * n) AS BIGINT)
                THEN CAST((b + 1) * 16 AS BIGINT) END) AS p50_cents_est,
       MIN(CASE WHEN cum >= CAST(CEIL(0.9 * n) AS BIGINT)
                THEN CAST((b + 1) * 16 AS BIGINT) END) AS p90_cents_est,
       MIN(CASE WHEN cum >= CAST(CEIL(0.99 * n) AS BIGINT)
                THEN CAST((b + 1) * 16 AS BIGINT) END) AS p99_cents_est
FROM cum
GROUP BY channel
ORDER BY 1"""

  /** HyperLogLog oracle: m=64 registers, rank from bin() bit length,
    * integer-scaled register sum (exact BIGINTs), and the identical
    * left-to-right double product for the raw estimate. */
  val sketchHllDistinct: String = sketchHashed + """
, regs AS (
  SELECT channel, h % 64 AS idx,
         MAX(CASE WHEN (h >> 6) > 0 THEN 55 - length(bin(h >> 6)) ELSE 55 END) AS rnk
  FROM hashed GROUP BY channel, h % 64
), spine AS (
  SELECT c.channel, ix.idx
  FROM (SELECT DISTINCT channel FROM hashed) c
  CROSS JOIN (SELECT unnest(range(0, 64)) AS idx) ix
), filled AS (
  SELECT s.channel, COALESCE(r.rnk, 0) AS rnk
  FROM spine s LEFT JOIN regs r ON r.channel = s.channel AND r.idx = s.idx
), agg AS (
  SELECT channel,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - rnk AS INTEGER)) AS BIGINT) AS s_scaled,
         CAST(SUM(CASE WHEN rnk > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_registers_hit
  FROM filled GROUP BY channel
), ex AS (
  SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM (SELECT DISTINCT channel, h FROM hashed) GROUP BY channel
)
SELECT a.channel, e.n_exact, a.n_registers_hit,
       CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
         / CAST(a.s_scaled AS DOUBLE) AS est_hll
FROM agg a JOIN ex e ON e.channel = a.channel
ORDER BY 1"""

  /** Hot-span removal: 4-grams in >= 3 distinct docs are hot; covered
    * positions drop, survivors re-join in order. Mirrors
    * Dedup.hotSpanRemoval (n = 4, minDf = 3). */
  val dedupHotSpans: String = """
WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents
), g AS (
  SELECT doc_id, p AS start, array_to_string(ws[p + 1:p + 4], ' ') AS gram
  FROM w, unnest(generate_series(0, n - 4)) AS t(p)
  WHERE n >= 4
), hot AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram) x
  WHERE df >= 3
), cov AS (
  SELECT DISTINCT g.doc_id, g.start + o AS pos
  FROM g JOIN hot USING (gram), unnest(generate_series(0, 3)) AS u(o)
), tok AS (
  SELECT doc_id, p - 1 AS pos, ws[p] AS word
  FROM w, unnest(generate_series(1, n)) AS t(p)
), kept AS (
  SELECT t.doc_id, t.pos, t.word
  FROM tok t
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(word, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id, w.lang, CAST(w.n AS BIGINT) AS n_words,
       COALESCE(a.n_kept, 0) AS n_kept,
       CAST(w.n AS BIGINT) - COALESCE(a.n_kept, 0) AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM w LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id"""

  /** Trained quality classifier — FULL REPLAY of Corpus.qualityClassifier:
    * hashed-unigram features (md5 % 32, length-normalized, +bias), the
    * deterministic md5-ranked <=2048 training sample, and THREE unrolled
    * full-batch logistic-GD iterations with the rational sigmoid
    * p = 1/2 + z/(2(1+|z|)) and lr 0.25 on the mean gradient — every sum
    * an ordered left fold (`list_reduce(list_prepend(0.0, …))`: z over
    * bucket order, gradients over doc_id order), so the SQL executes the
    * identical IEEE op sequence as the Spark/driver trainer. */
  private def qcChain: String = {
    val B = 32
    val dims = B + 1
    val zeros = Seq.fill(dims)("CAST(0.0 AS DOUBLE)").mkString("[", ", ", "]")
    def iter(t: Int): String = {
      val prevW = if (t == 1) "w0" else s"w${t - 1}"
      s"""
z$t AS (
  SELECT s.doc_id, s.y, s.x,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, ${dims + 1}), j -> s.x[j] * w.w[j])),
           (a, b) -> a + b) AS z
  FROM samp s CROSS JOIN $prevW w
), r$t AS (
  SELECT doc_id, x, y - (0.5 + z / (2.0 * (1.0 + abs(z)))) AS r FROM z$t
), g$t AS (
  SELECT jj.j AS j,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(r.r * r.x[jj.j] ORDER BY r.doc_id)), (a, b) -> a + b) AS gj
  FROM r$t r CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS j) jj
  GROUP BY jj.j
), w$t AS (
  SELECT list(wv ORDER BY j) AS w FROM (
    SELECT g.j AS j, w.w[g.j] + 0.25 * (g.gj / n.n) AS wv
    FROM g$t g CROSS JOIN $prevW w CROSS JOIN nn n) t
)"""
    }
    s"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
              THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
         string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS doclen
  FROM documents
), toks AS (
  SELECT doc_id,
         CAST(CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT) % $B AS INTEGER) AS bucket
  FROM (SELECT doc_id, unnest(ws) AS w FROM base) t
), cnts AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS cnt FROM toks GROUP BY 1, 2
), feats AS (
  SELECT b.doc_id, b.y,
         list(COALESCE(c.cnt, CAST(0.0 AS DOUBLE)) / b.doclen ORDER BY g.j)
           || [CAST(1.0 AS DOUBLE)] AS x
  FROM base b
  CROSS JOIN (SELECT unnest(range(0, $B)) AS j) g
  LEFT JOIN cnts c ON c.doc_id = b.doc_id AND c.bucket = g.j
  GROUP BY b.doc_id, b.y, b.doclen
), samp0 AS (
  SELECT doc_id, y, x,
         row_number() OVER (
           ORDER BY md5(concat('qc:', CAST(doc_id AS VARCHAR))), doc_id) AS rnk
  FROM feats
), samp AS (
  SELECT doc_id, y, x FROM samp0 WHERE rnk <= 2048
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM samp
), w0 AS (
  SELECT $zeros AS w
), ${iter(1)}, ${iter(2)}, ${iter(3)}, qcscored AS (
  SELECT f.doc_id, CAST(f.y AS INTEGER) AS is_positive,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, ${dims + 1}), j -> f.x[j] * w.w[j])),
           (a, b) -> a + b) AS score
  FROM feats f CROSS JOIN w3 w
)"""
  }

  val qualityClassifierScore: String = qcChain + """
SELECT doc_id, is_positive, score FROM qcscored ORDER BY doc_id"""

  /** Calibration table for the trained classifier, lockstep with
    * Corpus.qualityClassifierEval: score deciles (NTILE over score ASC,
    * doc_id) × the curated-slice label — per decile the positive count
    * and rate, plus the cumulative precision reading from the TOP
    * decile down (what a pipeline thresholds on). */
  val qualityClassifierEval: String = qcChain + """
, ranked AS (
  SELECT is_positive, score,
         CAST(ntile(10) OVER (ORDER BY score, doc_id) AS INTEGER) AS decile
  FROM qcscored
), cells AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(is_positive) AS BIGINT) AS n_positive,
         MIN(score) AS min_score, MAX(score) AS max_score
  FROM ranked GROUP BY decile
)
SELECT decile, n_docs, n_positive,
       CAST(n_positive AS DOUBLE) / CAST(n_docs AS DOUBLE) AS positive_rate,
       min_score, max_score,
       CAST(SUM(n_positive) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_positive,
       CAST(SUM(n_docs) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_docs,
       CAST(SUM(n_positive) OVER (ORDER BY decile DESC) AS DOUBLE)
         / CAST(SUM(n_docs) OVER (ORDER BY decile DESC) AS DOUBLE) AS cum_precision
FROM cells
ORDER BY decile"""

  /** Token-budget selection ordered by the trained classifier score —
    * the C56 running-sum cut along C105's learned ranking. Mirrors
    * Corpus.classifierBudgetSelect (same DECIMAL(27,6) accumulation as
    * corpusBudgetSelect). */
  val classifierBudgetSelect: String = qcChain + """
, ctok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), cjoin AS (
  SELECT s.doc_id, s.score, t.n_tokens,
         SUM(CAST(t.n_tokens AS DECIMAL(27,6))) OVER (
           ORDER BY s.score DESC, s.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM qcscored s JOIN ctok t ON t.doc_id = s.doc_id
)
SELECT doc_id, score, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       (CAST(cum AS BIGINT) <= 20000) AS selected
FROM cjoin
ORDER BY score DESC, doc_id"""

  /** Deployable threshold cut over the trained classifier scores,
    * lockstep with Corpus.classifierThresholdSelect: every doc is a
    * candidate cut in (score DESC, doc_id) order; TP/FP/FN from exact
    * integer running counts; `max_f1` picks the F1 argmax (ties → the
    * smaller kept set), `precision_floor_90` the largest kept set with
    * TP·100 ≥ kept·90 (exact integer compare — no rounding in the
    * decision; every reported ratio is one IEEE division of exact
    * integers). */
  val classifierThresholdSelect: String = qcChain + """
, rankedc AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk,
         CAST(SUM(is_positive) OVER (ORDER BY score DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
         CAST(SUM(is_positive) OVER () AS BIGINT) AS totpos
  FROM qcscored
), cand AS (
  SELECT score AS threshold_score, doc_id AS cut_doc_id, rk AS kept_docs,
         cp AS tp, rk - cp AS fp, totpos - cp AS fn,
         CAST(cp AS DOUBLE) / CAST(rk AS DOUBLE) AS "precision",
         CAST(cp AS DOUBLE) / CAST(totpos AS DOUBLE) AS recall,
         2.0 * CAST(cp AS DOUBLE) / CAST(rk + totpos AS DOUBLE) AS f1
  FROM rankedc
)
SELECT * FROM (
  SELECT 'max_f1' AS criterion, threshold_score, cut_doc_id, kept_docs,
         tp, fp, fn, "precision", recall, f1
  FROM cand ORDER BY f1 DESC, kept_docs LIMIT 1
)
UNION ALL
SELECT * FROM (
  SELECT 'precision_floor_90' AS criterion, threshold_score, cut_doc_id,
         kept_docs, tp, fp, fn, "precision", recall, f1
  FROM cand WHERE tp * 100 >= kept_docs * 90
  ORDER BY kept_docs DESC LIMIT 1
)
ORDER BY criterion"""

  /** DSIR importance selection: hashed-bigram buckets (md5 % 256),
    * add-one smoothed target ('en') vs raw bucket masses, rational score
    * = (sum_t * (Nr+B)) / (sum_r * (Nt+B)), global top-100. Mirrors
    * Corpus.dsirSelect. */
  val dsirSelect: String = """
WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents
), g AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substring(md5(ws[p + 1] || ' ' || ws[p + 2]), 1, 15)) AS BIGINT) % 256 AS bucket
  FROM w, unnest(generate_series(0, n - 2)) AS t(p)
  WHERE n >= 2
), raw AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM g GROUP BY bucket
), tgt AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM g WHERE lang = 'en' GROUP BY bucket
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nr,
         CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS nt
  FROM g
), sc AS (
  SELECT g.doc_id, g.lang, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(COALESCE(t.ct, 0) + 1) AS BIGINT) AS sum_t,
         CAST(SUM(r.cr + 1) AS BIGINT) AS sum_r
  FROM g
  JOIN raw r USING (bucket)
  LEFT JOIN tgt t USING (bucket)
  GROUP BY g.doc_id, g.lang
)
SELECT doc_id, lang, n_grams,
       CAST(CAST(sum_t AS HUGEINT) * (tot.nr + 256) AS DOUBLE) /
       CAST(CAST(sum_r AS HUGEINT) * (tot.nt + 256) AS DOUBLE) AS score
FROM sc, tot
ORDER BY score DESC, doc_id
LIMIT 100"""

  /** SCD2 dimension: gaps-and-islands over (user, event_type) runs,
    * half-open validity intervals, NULL valid_to on the open version.
    * Mirrors Analytics.scd2UserState. */
  val scd2UserState: String = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
), marked AS (
  SELECT *, CASE WHEN LAG(event_type) OVER win IS NULL
                   OR LAG(event_type) OVER win <> event_type
                 THEN 1 ELSE 0 END AS is_change
  FROM ev WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), runs AS (
  SELECT *, SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
  FROM marked
), versions AS (
  SELECT user_id, CAST(version AS BIGINT) AS version,
         MIN(event_type) AS state, MIN(ts_us) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, version
)
SELECT user_id, version, state, valid_from_us,
       LEAD(valid_from_us) OVER win AS valid_to_us, n_events,
       (LEAD(valid_from_us) OVER win IS NULL) AS is_current
FROM versions WINDOW win AS (PARTITION BY user_id ORDER BY valid_from_us)
ORDER BY user_id, version"""

  /** RRF hybrid retrieval: the BM25 top-20 and the exact-cosine top-20
    * around query vector 0 fused with 1/(60+rank) — lockstep with
    * `Search.rrfFusion` (same tie rules, same fixed-order two-term
    * double sum). */
  val searchRrfFusion: String = featBase + """
, tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
), totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
), tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
  WHERE w IN ('spark', 'table', 'window') GROUP BY doc_id, w
), df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
), ts AS (
  SELECT tf.doc_id,
         (CAST(t.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS idf,
         CAST(dl.dl * t.n_docs AS DOUBLE) / CAST(t.sum_dl AS DOUBLE) AS dl_norm,
         tf.tf
  FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN totals t
), lexscored AS (
  SELECT doc_id,
         idf * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
           / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
              * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * dl_norm)) AS score_t
  FROM ts
), lexagg AS (
  SELECT doc_id, CAST(SUM(CAST(score_t AS DECIMAL(27,6))) AS DOUBLE) AS score
  FROM lexscored GROUP BY doc_id
), lexk AS (
  SELECT doc_id, r_lex FROM (
    SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS r_lex
    FROM lexagg) x WHERE r_lex <= 20
), q0 AS (
  SELECT embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id = 0
), ddots AS (
  SELECT c.vec_id AS doc_id, c.nrm AS c_nrm, q.q_nrm,
         CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM feat c CROSS JOIN q0 q
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id, c.nrm, q.q_nrm
), densek AS (
  SELECT doc_id, r_dense FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY dot / (q_nrm * c_nrm) DESC, doc_id) AS INTEGER) AS r_dense
    FROM ddots) x WHERE r_dense <= 20
), fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.r_lex, d.r_dense,
         COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + l.r_lex AS DOUBLE), CAST(0.0 AS DOUBLE))
           + COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + d.r_dense AS DOUBLE), CAST(0.0 AS DOUBLE)) AS rrf_score
  FROM lexk l FULL OUTER JOIN densek d ON l.doc_id = d.doc_id
)
SELECT doc_id, r_lex, r_dense, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS fused_rank
FROM fused ORDER BY fused_rank"""

  /** Per-query recall@k of the TRAINED-quantizer IVF index against exact
    * brute force — the two full oracle statements as subqueries, the
    * [[annRecallLsh]] pattern. Mirrors Similarity.ivfTrainedRecall. */
  val annRecallIvfTrained: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN ($annIvfTrainedTopK) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** nDCG@10 + MRR of trained IVF vs brute force — mirrors
    * Similarity.ivfTrainedNdcg. */
  val annNdcgIvf: String = rankedEvalSql(annBruteforceTopK, annIvfTrainedTopK, 10)

  /** nDCG@10 + MRR of the sign-LSH index vs brute force — mirrors
    * Similarity.lshNdcg. */
  val annNdcgLsh: String = rankedEvalSql(annBruteforceTopK, annLshTopK, 10)

  /** nDCG@20 + MRR of the RRF-fused ranking vs the exact dense ranking —
    * mirrors Search.rrfNdcg. */
  val searchNdcgRrf: String = rankedEvalSql(
    bruteTopKSql(1, 20),
    s"""SELECT CAST(0 AS BIGINT) AS query_id, doc_id AS neighbor_id, fused_rank AS "rank"
FROM ($searchRrfFusion)""",
    20)

  /** Shared cell-blocked pair chain (trained-quantizer assignment →
    * within-cell directed pairs → ordered-fold cosines) — the base of
    * the kNN-graph and contrastive-pair oracles, lockstep with
    * `Similarity.cellScoredPairs`. */
  private def knnPairsBase: String = trainedQuantBase(2, autoKExpr) + """
, asgK AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x WHERE rn = 1
), kcand AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM asgK a JOIN asgK b ON a.cell = b.cell AND a.vec_id <> b.vec_id
), kdots AS (
  -- ordered double fold (≡ Spark dotFold), NOT the decimal-cast sum: at
  -- this pair volume the double→decimal half-up ambiguity band is a
  -- statistical certainty (measured 2/2500 rows)
  SELECT c.src, c.dst, fa.nrm AS na, fb.nrm AS nb,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(fa.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(fb.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) AS dot
  FROM kcand c
  JOIN feat fa ON fa.vec_id = c.src
  JOIN feat fb ON fb.vec_id = c.dst
)"""

  /** Cell-blocked k-NN graph: within-cell ordered-fold cosines, top-5
    * per source — lockstep with `Similarity.knnGraph` (self-scaling cell
    * count, same tie rules). */
  val annKnnGraph: String = knnPairsBase + """
, kranked AS (
  SELECT src, dst, dot / (na * nb) AS cosine,
         row_number() OVER (PARTITION BY src ORDER BY dot / (na * nb) DESC, dst) AS rnk
  FROM kdots
)
SELECT src AS vec_id, dst AS neighbor_id, cosine, CAST(rnk AS INTEGER) AS "rank"
FROM kranked WHERE rnk <= 5
ORDER BY vec_id, rnk"""

  /** Greedy beam search over the kNN proximity graph, lockstep with
    * Similarity.graphSearch: per-cell medoid entry points (each cell's
    * min vec_id — a single fixed entry measured recall 0.075 before the
    * medoid seeding, see the e0 CTE), beam 4, 3 unrolled hops over the
    * top-5 cell-blocked edge set, ordered-fold query cosines,
    * (cosine DESC, node) ties, top-10 of everything evaluated. */
  val annGraphSearch: String = graphSearchSql(4)

  /** The graph beam search at a given BEAM width — annGraphSearch keeps
    * its exact former text at beam=4; annBeamSweep instantiates 2/4/8
    * (the quantizer+graph chain is deterministic, so re-instantiating it
    * per branch is value-identical to the Spark side's build-once). */
  private def graphSearchSql(beam: Int): String =
    graphChainSql(beam) + """
SELECT query_id, neighbor_id, cosine, CAST(rnk AS INTEGER) AS "rank" FROM (
  SELECT e.query_id, e.node AS neighbor_id, q.cosine,
         row_number() OVER (PARTITION BY e.query_id
                            ORDER BY q.cosine DESC, e.node) AS rnk
  FROM e3 e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node
  WHERE e.node <> e.query_id) t
WHERE rnk <= 10
ORDER BY query_id, rnk"""

  /** The quantizer + kNN-graph + beam-navigation chain through e3 (the
    * full visited set), shared by the top-k final and — as the OPENING
    * of the index-compare dashboard's WITH — by its graph recall and
    * visited-count CTEs. */
  private def graphChainSql(beam: Int): String = {
    // every hop CTE is MATERIALIZED: e_t is referenced twice (directly
    // and through f_t), so plain CTEs would inline the whole chain
    // exponentially — 2^hops copies of the quantizer+graph subtree blew
    // DuckDB past 100 GiB at sf0.1 before this
    def hop(t: Int): String = s"""
, e$t AS MATERIALIZED (
  SELECT query_id, node FROM e${t - 1}
  UNION
  SELECT f.query_id, g.dst AS node
  FROM f${t - 1} f JOIN gedges g ON g.src = f.node
), f$t AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT e.query_id, e.node,
           row_number() OVER (PARTITION BY e.query_id
                              ORDER BY q.cosine DESC, e.node) AS rnk
    FROM e$t e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node) t
  WHERE rnk <= $beam
)"""
    knnPairsBase + """
, gedges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dot / (na * nb) DESC, dst) AS rnk
    FROM kdots) t WHERE rnk <= 5
), qd AS MATERIALIZED (
  SELECT q.vec_id AS query_id, f.vec_id AS node,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(q.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(f.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (q.nrm * f.nrm) AS cosine
  FROM feat q CROSS JOIN feat f
  WHERE q.vec_id < 8
), e0 AS MATERIALIZED (
  -- per-cell medoid stand-ins (each cell's min vec_id) as entry points,
  -- from the same asgK assignment the graph build uses
  SELECT qq.query_id, m.node
  FROM (SELECT MIN(vec_id) AS node FROM asgK GROUP BY cell) m
  CROSS JOIN (SELECT DISTINCT vec_id AS query_id FROM feat WHERE vec_id < 8) qq
), f0 AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT e.query_id, e.node,
           row_number() OVER (PARTITION BY e.query_id
                              ORDER BY q.cosine DESC, e.node) AS rnk
    FROM e0 e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node) t
  WHERE rnk <= """ + beam + ")" + hop(1) + hop(2) + hop(3)
  }

  /** Recall of the graph beam search vs brute force — mirrors
    * Similarity.graphRecall. */
  val annRecallGraph: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN ($annGraphSearch) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** Recall@10 per (beam, query) for beam ∈ {2,4,8} — the graph family's
    * tuning table, mirroring Similarity.graphBeamSweep. SHARED-CHAIN
    * form (r16): the quantizer + kNN-graph + query-cosine + entry CTEs
    * and the brute-force truth each materialize ONCE at top level; only
    * the beam-dependent navigation (f0→e3, ~|visited| rows) and its
    * top-10 instantiate per width — the Spark side's build-once shape.
    * The former per-branch `graphSearchSql(b)` instantiation rebuilt
    * the whole graph chain three times AND (nested inside a UNION ALL)
    * lost its inner MATERIALIZED hints to the planner — the
    * ann_index_compare lesson; this was the suite's #4 DuckDB cost. */
  def annBeamSweep: String = {
    def nav(b: Int): String = {
      def hop(t: Int): String = s"""
, e${t}_$b AS MATERIALIZED (
  SELECT query_id, node FROM e${if (t == 1) "0" else s"${t - 1}_$b"}
  UNION
  SELECT f.query_id, g.dst AS node
  FROM f${t - 1}_$b f JOIN gedges g ON g.src = f.node
), f${t}_$b AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT e.query_id, e.node,
           row_number() OVER (PARTITION BY e.query_id
                              ORDER BY q.cosine DESC, e.node) AS rnk
    FROM e${t}_$b e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node) t
  WHERE rnk <= $b
)"""
      s"""
, f0_$b AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT e.query_id, e.node,
           row_number() OVER (PARTITION BY e.query_id
                              ORDER BY q.cosine DESC, e.node) AS rnk
    FROM e0 e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node) t
  WHERE rnk <= $b
)""" + hop(1) + hop(2) + hop(3) + s"""
, s_$b AS MATERIALIZED (
  SELECT $b AS beam, bt.query_id,
         CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
         CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
  FROM bf bt
  LEFT JOIN (
    SELECT query_id, neighbor_id FROM (
      SELECT e.query_id, e.node AS neighbor_id,
             row_number() OVER (PARTITION BY e.query_id
                                ORDER BY q.cosine DESC, e.node) AS rnk
      FROM e3_$b e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node
      WHERE e.node <> e.query_id) t
    WHERE rnk <= 10) l
  ON bt.query_id = l.query_id AND bt.neighbor_id = l.neighbor_id
  GROUP BY bt.query_id
)"""
    }
    knnPairsBase + """
, gedges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dot / (na * nb) DESC, dst) AS rnk
    FROM kdots) t WHERE rnk <= 5
), qd AS MATERIALIZED (
  SELECT q.vec_id AS query_id, f.vec_id AS node,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(q.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(f.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (q.nrm * f.nrm) AS cosine
  FROM feat q CROSS JOIN feat f
  WHERE q.vec_id < 8
), e0 AS MATERIALIZED (
  SELECT qq.query_id, m.node
  FROM (SELECT MIN(vec_id) AS node FROM asgK GROUP BY cell) m
  CROSS JOIN (SELECT DISTINCT vec_id AS query_id FROM feat WHERE vec_id < 8) qq
), bf AS MATERIALIZED (""" + annBruteforceTopK + ")" +
      Seq(2, 4, 8).map(nav).mkString + """
SELECT * FROM (
  SELECT * FROM s_2 UNION ALL SELECT * FROM s_4 UNION ALL SELECT * FROM s_8)
ORDER BY beam, query_id"""
  }

  /** FILTERED beam search over the kNN proximity graph (ACORN-1
    * navigation), lockstep with Similarity.filteredGraphSearch: the beam
    * holds only label-0 nodes; a frontier node's non-matching neighbor
    * contributes ITS out-neighbors (filtered to matching) instead of
    * itself; entries are the 2 smallest matching vec_ids per quantizer
    * cell; graph degree 16, beam 32, 3 unrolled hops, ordered-fold query
    * cosines, (cosine DESC, node) ties, top-10 of everything evaluated.
    * Every hop CTE is MATERIALIZED (plain CTEs inline the quantizer
    * subtree exponentially — the annGraphSearch lesson). */
  val annFilteredGraph: String = {
    def hop(t: Int): String = s"""
, n$t AS MATERIALIZED (
  SELECT DISTINCT f.query_id, g.dst AS node
  FROM f${t - 1} f JOIN gedges g ON g.src = f.node
), c$t AS MATERIALIZED (
  -- ACORN-1 expansion: matching 1-hop neighbors, plus matching 2-hop
  -- neighbors reached THROUGH a non-matching intermediate
  SELECT n.query_id, n.node FROM n$t n JOIN mnodes m ON m.vec_id = n.node
  UNION
  SELECT n.query_id, g2.dst AS node
  FROM n$t n JOIN gedges g2 ON g2.src = n.node
  JOIN mnodes m2 ON m2.vec_id = g2.dst
  WHERE n.node NOT IN (SELECT vec_id FROM mnodes)
), e$t AS MATERIALIZED (
  SELECT query_id, node FROM e${t - 1}
  UNION
  SELECT query_id, node FROM c$t
), f$t AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT e.query_id, e.node,
           row_number() OVER (PARTITION BY e.query_id
                              ORDER BY q.cosine DESC, e.node) AS rnk
    FROM e$t e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node) t
  WHERE rnk <= 32
)"""
    knnPairsBase + """
, gedges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dot / (na * nb) DESC, dst) AS rnk
    FROM kdots) t WHERE rnk <= 16
), mnodes AS MATERIALIZED (
  SELECT vec_id FROM embeddings WHERE label = 0
), qd AS MATERIALIZED (
  -- only matching nodes are ever scored (the beam holds matching nodes
  -- exclusively), so the query-cosine frame is |Q| x |matching|
  SELECT q.vec_id AS query_id, f.vec_id AS node,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(q.embedding,
               (x, i) -> CAST(x AS DOUBLE) * CAST(f.embedding[i] AS DOUBLE))),
           (acc, v) -> acc + v) / (q.nrm * f.nrm) AS cosine
  FROM feat q CROSS JOIN feat f
  JOIN mnodes m ON m.vec_id = f.vec_id
  WHERE q.vec_id < 8
), e0 AS MATERIALIZED (
  -- per-(cell x label-present) entry stand-ins: the 2 smallest matching
  -- vec_ids of every cell that holds any matching node, from the same
  -- asgK assignment the graph build uses
  SELECT qq.query_id, m.node
  FROM (SELECT node FROM (
          SELECT a.vec_id AS node,
                 row_number() OVER (PARTITION BY a.cell ORDER BY a.vec_id) AS er
          FROM asgK a JOIN mnodes mm ON mm.vec_id = a.vec_id) t
        WHERE er <= 2) m
  CROSS JOIN (SELECT DISTINCT vec_id AS query_id FROM feat WHERE vec_id < 8) qq
), f0 AS MATERIALIZED (
  SELECT query_id, node FROM (
    SELECT e.query_id, e.node,
           row_number() OVER (PARTITION BY e.query_id
                              ORDER BY q.cosine DESC, e.node) AS rnk
    FROM e0 e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node) t
  WHERE rnk <= 32
)""" + hop(1) + hop(2) + hop(3) + """
SELECT query_id, neighbor_id, CAST(0 AS INTEGER) AS label, cosine,
       CAST(rnk AS INTEGER) AS "rank" FROM (
  SELECT e.query_id, e.node AS neighbor_id, q.cosine,
         row_number() OVER (PARTITION BY e.query_id
                            ORDER BY q.cosine DESC, e.node) AS rnk
  FROM e3 e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node
  WHERE e.node <> e.query_id) t
WHERE rnk <= 10
ORDER BY query_id, rnk"""
  }

  /** Recall of the filtered graph beam search vs the exact filtered
    * truth — mirrors Similarity.filteredGraphRecall. */
  val annRecallFilteredGraph: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annFilteredTopK) b
LEFT JOIN ($annFilteredGraph) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** Contrastive-triplet mining: per anchor, nearest within-cell
    * neighbor at cosine ≥ 0.3 as positive, farthest within-cell
    * neighbor as the semi-hard negative. Mirrors
    * Similarity.contrastivePairs. */
  val contrastivePairs: String = knnPairsBase + """
, cranked AS (
  SELECT src, dst, dot / (na * nb) AS cosine,
         row_number() OVER (PARTITION BY src ORDER BY dot / (na * nb) DESC, dst) AS rp,
         row_number() OVER (PARTITION BY src ORDER BY dot / (na * nb) ASC, dst) AS rn
  FROM kdots
), cpos AS (
  SELECT src AS anchor, dst AS positive_id, cosine AS pos_cos
  FROM cranked WHERE rp = 1 AND cosine >= 0.3
), cneg AS (
  SELECT src AS anchor, dst AS negative_id, cosine AS neg_cos
  FROM cranked WHERE rn = 1
)
SELECT p.anchor, p.positive_id, p.pos_cos, n.negative_id, n.neg_cos
FROM cpos p JOIN cneg n USING (anchor)
WHERE p.positive_id <> n.negative_id
ORDER BY p.anchor"""

  /** One unrolled MMR greedy step: among candidates not yet selected,
    * score = λ·rel − (1−λ)·max sim to the selected set, pick the
    * (score DESC, vec_id ASC) best. (1−λ) is COMPUTED as 1.0 − 0.7 —
    * not the literal 0.3 — because the Spark driver computes
    * `mu = 1.0 - lambda` and the two doubles differ in the last ulp. */
  private def mmrStep(t: Int): String = s"""
, pick$t AS MATERIALIZED (
  SELECT query_id, vec_id, rel, score FROM (
    SELECT y.*, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id) AS pk
    FROM (
      SELECT c.query_id, c.vec_id, c.rel,
             CAST(0.7 AS DOUBLE) * c.rel
               - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * (
                   SELECT MAX(p.sim) FROM psim p
                   JOIN sel${t - 1} s ON s.query_id = p.query_id AND p.b = s.vec_id
                   WHERE p.query_id = c.query_id AND p.a = c.vec_id) AS score
      FROM relk c
      WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s2
                        WHERE s2.query_id = c.query_id AND s2.vec_id = c.vec_id)) y) z
  WHERE pk = 1
), sel$t AS MATERIALIZED (
  SELECT query_id, vec_id, mmr_rank, rel, score FROM sel${t - 1}
  UNION ALL SELECT query_id, vec_id, $t AS mmr_rank, rel, score FROM pick$t
)"""

  /** MMR diversity re-rank of the exact top-20 around query vector 0,
    * greedy unrolled to 10 selections — lockstep with
    * `Similarity.mmrRerank` (same λ-blend tree, same tie rules). */
  val searchMmrRerank: String = featBase + """
, qs AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS q_nrm FROM feat WHERE vec_id < 4
), rdots AS (
  SELECT q.query_id, c.vec_id, c.nrm AS c_nrm, q.q_nrm,
         CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM feat c CROSS JOIN qs q
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  WHERE c.vec_id <> q.query_id
  GROUP BY q.query_id, c.vec_id, c.nrm, q.q_nrm
), relk AS MATERIALIZED (
  SELECT query_id, vec_id, rel FROM (
    SELECT query_id, vec_id, dot / (q_nrm * c_nrm) AS rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot / (q_nrm * c_nrm) DESC, vec_id) AS rn
    FROM rdots) x WHERE rn <= 20
), cfeat AS (
  SELECT r.query_id, f.vec_id, f.embedding, f.nrm
  FROM feat f JOIN relk r ON r.vec_id = f.vec_id
), psim AS MATERIALIZED (
  SELECT a.query_id, a.vec_id AS a, b.vec_id AS b,
         CAST(SUM(CAST(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           / (a.nrm * b.nrm) AS sim
  FROM cfeat a JOIN cfeat b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY a.query_id, a.vec_id, b.vec_id, a.nrm, b.nrm
), pick1 AS MATERIALIZED (
  SELECT query_id, vec_id, rel, score FROM (
    SELECT query_id, vec_id, rel, CAST(0.7 AS DOUBLE) * rel AS score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, vec_id) AS pk
    FROM relk) z WHERE pk = 1
), sel1 AS MATERIALIZED (
  SELECT query_id, vec_id, 1 AS mmr_rank, rel, score FROM pick1
)""" + (2 to 10).map(mmrStep).mkString + """
SELECT query_id, vec_id, CAST(mmr_rank AS INTEGER) AS mmr_rank, rel, score
FROM sel10 ORDER BY query_id, mmr_rank"""

  /** Quality-ordered token-budget selection: decimal-exact running token
    * total in (quality DESC, doc_id) order, selected while ≤ 20000 —
    * mirrors Corpus.budgetSelect (whose distributed prefix sum is
    * bit-equal to this single-window form). */
  val corpusBudgetSelect: String = s"""
WITH q AS (
  SELECT doc_id,
         least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
           + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
           + (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS quality,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, quality, n_tokens,
         SUM(CAST(n_tokens AS DECIMAL(27,6))) OVER (
           ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM q
)
SELECT doc_id, quality, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       (CAST(cum AS BIGINT) <= 20000) AS selected
FROM c
ORDER BY quality DESC, doc_id"""

  /** Per-language token-budget selection: the budget-select running
    * total PARTITIONED by lang. Mirrors Corpus.budgetSelectPerLang. */
  val corpusBudgetByLang: String = s"""
WITH q AS (
  SELECT doc_id, lang,
         least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
           + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
           + (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS quality,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, quality, n_tokens,
         SUM(CAST(n_tokens AS DECIMAL(27,6))) OVER (
           PARTITION BY lang
           ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM q
)
SELECT lang, doc_id, quality, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       (CAST(cum AS BIGINT) <= 5000) AS selected
FROM c
ORDER BY lang, quality DESC, doc_id"""

  /** ABC/Pareto customer classification: cumulative revenue share in
    * (revenue DESC, custkey) order, decimal-exact running sum — mirrors
    * Analytics.abcClassification (whose distributed prefix-sum is
    * bit-equal to this single-window form by construction). */
  val ordersAbcPareto: String = """
WITH pc AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
), c AS (
  SELECT o_custkey, revenue,
         SUM(CAST(revenue AS DECIMAL(27,6))) OVER (
           ORDER BY revenue DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(revenue AS DECIMAL(27,6))) OVER () AS tot
  FROM pc
)
SELECT o_custkey, revenue,
       CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share,
       CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.7 THEN 'A'
            WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.9 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c
ORDER BY revenue DESC, o_custkey"""

  /** Year-over-year monthly revenue growth: exact-date-arithmetic
    * self-join (month − 12), decimal-exact revenue, NULL growth when no
    * prior-year month. Mirrors Analytics.yoyGrowth. */
  val ordersYoyGrowth: String = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
), p AS (
  SELECT CAST(month + INTERVAL 12 MONTH AS DATE) AS month,
         revenue AS prev_year_revenue
  FROM m
)
SELECT m.month, m.revenue, p.prev_year_revenue,
       CASE WHEN p.prev_year_revenue IS NOT NULL
            THEN (m.revenue - p.prev_year_revenue) / p.prev_year_revenue END AS yoy_growth
FROM m LEFT JOIN p USING (month)
ORDER BY month"""

  /** Per-query recall@k of the PQ-ADC index against exact brute force —
    * the [[annRecallLsh]] subquery-composition pattern. Mirrors
    * Similarity.pqRecall. */
  val annRecallPq: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN ($annPqTopK) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** Prefix-truncation (Matryoshka) recall: the 16-dim-prefix ranking's
    * recall against the full-dimension exact top-k. The truncated chain
    * is the brute-force SQL with `range(1, 17)` norms/dots. Mirrors
    * Similarity.matryoshkaRecall. */
  val annMatryoshkaRecall: String = s"""
WITH tnrm AS (
  SELECT vec_id,
         sqrt(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 17)) AS i) ix
  GROUP BY vec_id
), tq AS (
  SELECT e.vec_id AS query_id, e.embedding AS qe, n.nrm AS q_nrm
  FROM embeddings e JOIN tnrm n USING (vec_id) WHERE e.vec_id < 8
), tc AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS ce, n.nrm AS c_nrm
  FROM embeddings e JOIN tnrm n USING (vec_id)
), tdots AS (
  SELECT query_id, neighbor_id, q_nrm, c_nrm,
         CAST(SUM(CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM tq JOIN tc ON query_id <> neighbor_id
  CROSS JOIN (SELECT unnest(range(1, 17)) AS i) idx
  GROUP BY query_id, neighbor_id, q_nrm, c_nrm
), tapprox AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot / (q_nrm * c_nrm) DESC, neighbor_id) AS rnk
    FROM tdots) x WHERE rnk <= 10
)
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN tapprox l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** Per-dimension embedding stats: float-string scale-12 decimal moment
    * sums, the second moment over FLOAT32 squares (see
    * Similarity.dimStats for why scale-24 exact squares are avoided),
    * variance = E[x²] − mean² in double. */
  val embedDimStats: String = """
WITH ux AS (
  SELECT unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
  FROM embeddings
), m AS (
  SELECT i,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean,
         CAST(SUM(CAST(CAST(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS REAL) AS VARCHAR)
                  AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean_sq,
         CAST(MIN(x) AS DOUBLE) AS min_x,
         CAST(MAX(x) AS DOUBLE) AS max_x
  FROM ux GROUP BY i
)
SELECT CAST(i - 1 AS BIGINT) AS pos, n, mean,
       mean_sq - mean * mean AS variance,
       min_x, max_x
FROM m
ORDER BY pos"""

  /** Per-dimension whitening: (x − μ)/√(σ²+1e-6) with the dimStats
    * moment bridges — mirrors Similarity.whiten. */
  /** Embedding outlier screen: per-dimension decimal-exact moments (the
    * dimStats discipline), |z| per element, per-vector max with the
    * largest-index tie-break — lockstep with `Similarity.embedOutliers`. */
  val embedOutliers: String = """
WITH ux AS (
  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
  FROM embeddings
), m AS (
  SELECT i,
         CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean,
         CAST(SUM(CAST(CAST(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS REAL) AS VARCHAR)
                  AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean_sq
  FROM ux GROUP BY i
), z AS (
  SELECT u.vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
         abs((CAST(u.x AS DOUBLE) - m.mean)
             / sqrt((m.mean_sq - m.mean * m.mean) + 1e-6)) AS z
  FROM ux u JOIN m ON m.i = u.i
), mx AS (
  SELECT vec_id, pos, z, MAX(z) OVER (PARTITION BY vec_id) AS max_z FROM z
)
SELECT vec_id, MAX(pos) AS worst_pos, MAX(z) AS max_z, (MAX(z) > 4.0) AS is_outlier
FROM mx WHERE z = max_z
GROUP BY vec_id
ORDER BY vec_id"""

  /** Exact Shapley attribution over the journey channel-set game —
    * bitmask coalitions, subset-containment v(S), factorial weights and
    * an ascending-mask ordered fold, in lockstep with
    * `Reporting.shapleyAttribution`. */
  val shapleyAttribution: String = attrBase + """
, sets AS (
  SELECT conv_id, list_sort(list(DISTINCT channel_name)) AS chset
  FROM assigned GROUP BY conv_id
), k AS (
  SELECT list_sort(list(DISTINCT channel_name)) AS u,
         CAST(len(list(DISTINCT channel_name)) AS INTEGER) AS kk
  FROM assigned
), jm AS (
  SELECT s.conv_id,
         list_reduce(list_prepend(0,
           list_transform(s.chset, c -> (1 << (list_position(k.u, c) - 1)))),
           (a, b) -> a + b) AS mask
  FROM sets s CROSS JOIN k
), mc AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n FROM jm GROUP BY mask
), coal AS (
  SELECT CAST(unnest(range(0, 1 << kk)) AS INTEGER) AS S FROM k
), v AS (
  SELECT c.S,
         CAST(COALESCE(SUM(CASE WHEN (mc.mask & c.S) = mc.mask THEN mc.n END), 0) AS BIGINT) AS v
  FROM coal c LEFT JOIN mc ON (mc.mask & c.S) = mc.mask
  GROUP BY c.S
), chan AS (
  SELECT unnest(u) AS channel, CAST(generate_subscripts(u, 1) AS INTEGER) AS i, kk FROM k
), terms AS (
  SELECT ch.channel, v0.S,
         ((CAST(factorial(bit_count(CAST(v0.S AS BIGINT))) AS DOUBLE) *
           CAST(factorial(ch.kk - bit_count(CAST(v0.S AS BIGINT)) - 1) AS DOUBLE))
            / CAST(factorial(ch.kk) AS DOUBLE))
           * CAST(v1.v - v0.v AS DOUBLE) AS term
  FROM chan ch
  JOIN v v0 ON (v0.S & (1 << (ch.i - 1))) = 0
  JOIN v v1 ON v1.S = v0.S + (1 << (ch.i - 1))
)
SELECT channel,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY S)),
                   (a, b) -> a + b) AS shapley
FROM terms GROUP BY channel ORDER BY channel"""

  /** Welch t over md5-armed per-user revenue — exact decimal moments
    * (DECIMAL(12,6) revenue, exact squares within both engines' native
    * widths), the identical t/dof IEEE tree as `Analytics.abTestWelch`. */
  val abTestWelch: String = """
WITH rev AS (
  SELECT user_id,
         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
                       AS DECIMAL(12,6))) AS DECIMAL(12,6)) AS rev
  FROM events GROUP BY user_id
), armed AS (
  SELECT rev,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS arm
  FROM rev
), ag AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
    CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
    CAST(SUM(rev) FILTER (WHERE arm = 0) AS DOUBLE) AS sx_a,
    CAST(SUM(rev) FILTER (WHERE arm = 1) AS DOUBLE) AS sx_b,
    CAST(SUM(CAST(rev AS DECIMAL(24,6)) * rev) FILTER (WHERE arm = 0) AS DOUBLE) AS sxx_a,
    CAST(SUM(CAST(rev AS DECIMAL(24,6)) * rev) FILTER (WHERE arm = 1) AS DOUBLE) AS sxx_b
  FROM armed
), mm AS (
  SELECT *, sx_a / CAST(n_a AS DOUBLE) AS mean_a, sx_b / CAST(n_b AS DOUBLE) AS mean_b
  FROM ag
), vv AS (
  SELECT *,
    (sxx_a - (CAST(n_a AS DOUBLE) * (mean_a * mean_a))) / CAST(n_a - 1 AS DOUBLE) AS var_a,
    (sxx_b - (CAST(n_b AS DOUBLE) * (mean_b * mean_b))) / CAST(n_b - 1 AS DOUBLE) AS var_b
  FROM mm
), ss AS (
  SELECT *, var_a / CAST(n_a AS DOUBLE) AS se_a, var_b / CAST(n_b AS DOUBLE) AS se_b
  FROM vv
)
SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
       (mean_a - mean_b) / sqrt(se_a + se_b) AS t_stat,
       ((se_a + se_b) * (se_a + se_b)) /
         (((se_a * se_a) / CAST(n_a - 1 AS DOUBLE)) +
          ((se_b * se_b) / CAST(n_b - 1 AS DOUBLE))) AS dof
FROM ss"""

  /** Journey latency distribution: per-conversion first-touch→conversion
    * gap, interpolated quartiles (≡ the exact-rank interpolation) and
    * the decimal-exact mean. */
  val timeToConvert: String = attrBase + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_journeys,
       quantile_cont(gap, 0.25) AS p25_us,
       quantile_cont(gap, 0.5) AS p50_us,
       quantile_cont(gap, 0.75) AS p75_us,
       CAST(SUM(CAST(gap AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_us
FROM (
  SELECT conv_id, CAST(MIN(conv_ts_us) - MIN(ts_us) AS DOUBLE) AS gap
  FROM assigned GROUP BY conv_id) g"""

  val embedWhiten: String = """
WITH ux AS (
  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
  FROM embeddings
), m AS (
  SELECT i,
         CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean,
         CAST(SUM(CAST(CAST(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS REAL) AS VARCHAR)
                  AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean_sq
  FROM ux GROUP BY i
)
SELECT u.vec_id, CAST(u.i - 1 AS BIGINT) AS pos,
       (CAST(u.x AS DOUBLE) - m.mean)
         / sqrt((m.mean_sq - m.mean * m.mean) + 1e-6) AS y
FROM ux u JOIN m ON m.i = u.i
ORDER BY vec_id, pos"""

  /** Mean-center + L2-renormalize: decimal-exact per-dimension means
    * (the labelCentroids discipline), one IEEE center-subtract narrowed
    * to REAL, then a SEQUENTIAL left-to-right double fold for the norm
    * (list_reduce with a prepended 0 accumulator ≡ Spark's
    * `aggregate(cvec, 0.0, acc + c²)`) — the double→decimal cast path is
    * deliberately avoided: full-mantissa centered floats hit its half-up
    * ambiguity band. Lockstep with `Similarity.centerNormalize`. */
  val embedCenterNorm: String = """
WITH ux AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), mean AS (
  SELECT i,
         CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mean
  FROM ux GROUP BY i
), mlist AS (
  SELECT list(mean ORDER BY i) AS m FROM mean
), cent AS (
  SELECT e.vec_id,
         list_transform(e.embedding,
           (x, i) -> CAST(CAST(x AS DOUBLE) - m[i] AS REAL)) AS cvec
  FROM embeddings e CROSS JOIN mlist
), nrmed AS (
  SELECT vec_id, cvec,
         sqrt(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(cvec, c -> CAST(c AS DOUBLE))),
           (acc, c) -> acc + c * c)) AS nrm
  FROM cent
)
SELECT vec_id, CAST(ix.i - 1 AS BIGINT) AS pos,
       CAST(cvec[ix.i] AS DOUBLE) / nrm AS y
FROM nrmed CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix
ORDER BY vec_id, pos"""

  /** Recall@k of the composed IVF+PQ index vs exact brute force —
    * completing the per-index recall family. Mirrors
    * Similarity.ivfPqRecall. */
  val annRecallIvfPq: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN ($annIvfPqTopK) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** Recall@10 per (nprobe, query) for the COMPOSED IVF+PQ index,
    * nprobe ∈ {1,2,4} — the tuning table for the index a deployment
    * actually serves. Mirrors Similarity.ivfPqNprobeSweep (the quantizer
    * and codebook chains are deterministic, so per-branch
    * re-instantiation is value-identical to the Spark train-once). */
  def annNprobeSweepIvfPq: String = hoistedUnion(
    Seq(1, 2, 4).map { np =>
      s"""
SELECT $np AS nprobe, b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN (${ivfPqTopKSql(np)}) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id"""
    }, "nprobe, query_id")

  /** Recall@k of the scalar-quantized index vs exact brute force — the
    * [[annRecallLsh]]/[[annRecallPq]] composition. Mirrors
    * Similarity.sqRecall. */
  val annRecallSq: String = s"""
SELECT b.query_id,
       CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
FROM ($annBruteforceTopK) b
LEFT JOIN ($annSqTopK) l
  ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id"""

  /** kNN majority-vote label prediction over the exact top-10 neighbor
    * lists — modal label, ties to the smaller label id. Mirrors
    * Similarity.knnClassify. */
  val knnClassify: String = s"""
WITH nb AS (
  SELECT query_id, neighbor_id FROM ($annBruteforceTopK)
), v AS (
  SELECT nb.query_id, e.label, CAST(COUNT(*) AS BIGINT) AS votes
  FROM nb JOIN embeddings e ON e.vec_id = nb.neighbor_id
  GROUP BY nb.query_id, e.label
), r AS (
  SELECT query_id, label, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label) AS rk
  FROM v
)
SELECT query_id, label AS predicted_label, votes, CAST(10 AS BIGINT) AS k
FROM r WHERE rk = 1
ORDER BY query_id"""

  /** SimHash near-dup pairs within Hamming distance 3 — all-pairs verify
    * at oracle scale (the Spark side blocks by 4×16-bit bands of a 64-bit
    * simhash; pigeonhole makes the band join lossless, so the SETS
    * agree). 64-bit vote derivation twin of
    * [[graft.functions.SimHashImpl.simhash64]]: vote bit b = bit (b & 1)
    * of hex nibble (b >> 1) of md5(token) — even bits test the digit's
    * low bit (odd digits), odd bits its second bit. Bit 63's addend is
    * BIGINT.MIN (the sign bit as an opaque pattern); the vote sum runs in
    * DuckDB's HUGEINT and lands back in BIGINT exactly. */
  val dedupSimhashNear: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (b % 2 = 0 AND substr(md5(w), CAST(b // 2 + 1 AS INTEGER), 1)
                          IN ('1','3','5','7','9','b','d','f'))
                    OR (b % 2 = 1 AND substr(md5(w), CAST(b // 2 + 1 AS INTEGER), 1)
                          IN ('2','3','6','7','a','b','e','f'))
                  THEN 1 ELSE -1 END) AS s
  FROM tok CROSS JOIN (SELECT unnest(range(64)) AS b) bs
  GROUP BY doc_id, b
), sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s < 0 THEN 0
                       WHEN b = 63 THEN -9223372036854775807 - 1
                       ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b"""

  /** Asymmetric n-gram containment over df-capped shingles — the
    * [[dedupNgramJaccard]] pair machinery with per-side ratios and an
    * either-direction threshold. Mirrors Dedup.ngramContainment. */
  val dedupNgramContainment: String = shingleBase + """
, shi AS (
  SELECT doc_id, CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS sid
  FROM sh
), keep AS (
  SELECT sid FROM (SELECT sid, COUNT(*) AS df FROM shi GROUP BY sid) d
  WHERE df <= 1000
), shf AS (
  SELECT shi.doc_id, shi.sid FROM shi JOIN keep USING (sid)
), dc AS (
  SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shf a JOIN shf b ON a.sid = b.sid AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE) / CAST(na.n AS DOUBLE) AS containment_a,
       CAST(n_common AS DOUBLE) / CAST(nb.n AS DOUBLE) AS containment_b
FROM inter
JOIN dc na ON na.doc_id = doc_a
JOIN dc nb ON nb.doc_id = doc_b
WHERE greatest(CAST(n_common AS DOUBLE) / CAST(na.n AS DOUBLE),
               CAST(n_common AS DOUBLE) / CAST(nb.n AS DOUBLE)) >= 0.5
ORDER BY doc_a, doc_b"""

  /** Deterministic cross-engine `ln` of a positive BIGINT expression —
    * the op-for-op SQL twin of [[graft.functions.LnIntImpl.ln]] (see its
    * scaladoc for why NO platform ln can be hash-gated: StrictMath,
    * Math.log, and glibc disagree pairwise in the last ulp on real
    * inputs). exponent = binary-format length (exact integer op),
    * mantissa via exact power-of-two division, √2 range reduction, then
    * the same atanh Horner tree — every step one correctly-rounded IEEE
    * double op in both engines. */
  private def lniSql(x: String): String = {
    val e0 = s"(length(format('{:b}', $x)) - 1)"
    val m0 = s"(CAST($x AS DOUBLE) / CAST((CAST(1 AS BIGINT) << $e0) AS DOUBLE))"
    val ee = s"(CASE WHEN $m0 > 1.4142135623730951 THEN $e0 + 1 ELSE $e0 END)"
    val m  = s"(CASE WHEN $m0 > 1.4142135623730951 THEN $m0 / 2.0 ELSE $m0 END)"
    val t  = s"(($m - 1.0) / ($m + 1.0))"
    val t2 = s"($t * $t)"
    val h  = s"(0.3333333333333333 + $t2 * (0.2 + $t2 * (0.14285714285714285 + " +
      s"$t2 * (0.1111111111111111 + $t2 * (0.09090909090909091 + " +
      s"$t2 * (0.07692307692307693 + $t2 * (0.06666666666666667 + " +
      s"$t2 * 0.058823529411764705)))))))"
    s"(CAST($ee AS DOUBLE) * 0.6931471805599453 + 2.0 * ($t * (1.0 + $t2 * $h)))"
  }

  /** Top-30 bigram collocations by PMI (support ≥ 5), ranked by the EXACT
    * integer ratio; the reported PMI is lni(c·N) − lni(c_l·c_r) over
    * integer products via [[lniSql]]. Mirrors Search.tokenPmi. */
  val tokenPmi: String = s"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), bi AS (
  SELECT w1, w2 FROM (
    SELECT w AS w1, LEAD(w,1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok) t
  WHERE w2 IS NOT NULL
), cbi AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bigram FROM bi GROUP BY w1, w2
), m AS (
  SELECT w1, w2, c_bigram,
         CAST(SUM(c_bigram) OVER (PARTITION BY w1) AS BIGINT) AS c_left,
         CAST(SUM(c_bigram) OVER (PARTITION BY w2) AS BIGINT) AS c_right,
         CAST(SUM(c_bigram) OVER () AS BIGINT) AS n_total
  FROM cbi
)
SELECT w1, w2, c_bigram, c_left, c_right,
       (${lniSql("c_bigram")} + ${lniSql("n_total")})
         - (${lniSql("c_left")} + ${lniSql("c_right")}) AS pmi
FROM m
WHERE c_bigram >= 5
ORDER BY (CAST(c_bigram AS DOUBLE) * CAST(n_total AS DOUBLE))
           / (CAST(c_left AS DOUBLE) * CAST(c_right AS DOUBLE)) DESC, w1, w2
LIMIT 30"""

  /** Per-document character-level Shannon entropy in the integer-ln form
    * H = ln n − (Σ c·ln c)/n: ln only on INTEGER counts via [[lniSql]],
    * per-doc ORDERED fold over char-sorted terms (the tokenZipf
    * list_reduce discipline), bits = nats / the LN2 literal. Mirrors
    * Corpus.textEntropy. ASCII corpus: DuckDB's code-point chars ≡
    * Spark's UTF-16 chars. */
  val textEntropy: String = s"""
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
), cnt AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM ch WHERE ch <> '' GROUP BY doc_id, ch
), terms AS (
  SELECT doc_id, ch, c,
         CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
  FROM cnt
), lnt AS (
  SELECT doc_id, ch, c, n,
         CAST(c AS DOUBLE) * ${lniSql("c")} AS term,
         ${lniSql("n")} AS lnn
  FROM terms
), folded AS (
  SELECT doc_id,
         MAX(n) AS n_chars_counted,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
         MAX(lnn) AS lnn,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY ch)),
           (a, b) -> a + b) AS s
  FROM lnt GROUP BY doc_id
)
SELECT doc_id, n_chars_counted, n_distinct_chars,
       lnn - s / CAST(n_chars_counted AS DOUBLE) AS entropy_nats,
       (lnn - s / CAST(n_chars_counted AS DOUBLE)) / 0.6931471805599453 AS entropy_bits
FROM folded
ORDER BY doc_id"""

  /** Referential-integrity audit: per FK edge, total fact rows and
    * orphans (no parent key). Mirrors Analytics.integrityAudit. */
  val integrityAudit: String = {
    def edge(name: String, fact: String, fk: String, parent: String, pk: String) = s"""
SELECT '$name' AS relation,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM $fact) AS fk_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM $fact f
        WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = f.$fk)) AS orphan_rows"""
    Seq(
      edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("", "\nUNION ALL", "\nORDER BY relation")
  }

  /** Daily DAU / trailing-7-day WAU. The WAU side re-anchors each
    * distinct (user, day) to day..day+6 — identical to the Spark
    * explode — then counts distinct users per anchor. Mirrors
    * Analytics.userStickiness. */
  val userStickiness: String = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS event_date FROM events
), dau AS (
  SELECT event_date, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY event_date
), wau AS (
  SELECT CAST(event_date + CAST(o.k AS INTEGER) AS DATE) AS event_date,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM ud CROSS JOIN (SELECT unnest(range(7)) AS k) o
  GROUP BY 1
)
SELECT d.event_date, d.dau, w.wau,
       CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
FROM dau d JOIN wau w USING (event_date)
ORDER BY d.event_date"""

  /** Lookback-window IHC: the assignment filtered to sessions within 2
    * days of their conversion, then the SAME flag + I/H/C windows over
    * the surviving touches (credit renormalizes per journey by
    * construction). Mirrors Journeys.lookbackFilter → IhcAttribution. */
  val ihcLookback: String = attrBase + """
, lb AS (
  SELECT * FROM assigned WHERE conv_ts_us - ts_us <= 172800000000
), lbf AS (
  SELECT *, CASE WHEN row_number() OVER (PARTITION BY conv_id ORDER BY ts_us DESC, session_id ASC) = 1
                 THEN 1 ELSE 0 END AS conversion
  FROM lb
), lbihc AS (
  SELECT *,
    ((CASE WHEN row_number() OVER (PARTITION BY conv_id ORDER BY ts_us ASC, session_id ASC) = 1 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN SUM(holder_engagement) OVER (PARTITION BY conv_id) > 0
          THEN CAST(holder_engagement AS DOUBLE) / CAST(SUM(holder_engagement) OVER (PARTITION BY conv_id) AS DOUBLE)
          ELSE 1.0 / CAST(COUNT(*) OVER (PARTITION BY conv_id) AS DOUBLE) END)
     + (CASE WHEN SUM(closer_engagement) OVER (PARTITION BY conv_id) > 0
          THEN CAST(closer_engagement AS DOUBLE) / CAST(SUM(closer_engagement) OVER (PARTITION BY conv_id) AS DOUBLE)
          ELSE CAST(conversion AS DOUBLE) END)) / 3.0 AS ihc
  FROM lbf
)
SELECT conv_id, session_id, channel_name, ihc
FROM lbihc
ORDER BY conv_id, session_id"""

  /** Channel co-occurrence (support + lift per unordered pair) across
    * journeys. Mirrors Journeys.channelOverlap. */
  val channelOverlap: String = attrBase + """
, cc AS (
  SELECT DISTINCT conv_id, channel_name FROM assigned
), nconv AS (
  SELECT CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs FROM assigned
), chc AS (
  SELECT channel_name, CAST(COUNT(*) AS BIGINT) AS n FROM cc GROUP BY channel_name
), prs AS (
  SELECT a.channel_name AS ch_a, b.channel_name AS ch_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM cc a JOIN cc b ON a.conv_id = b.conv_id AND a.channel_name < b.channel_name
  GROUP BY 1, 2
)
SELECT ch_a, ch_b, n_ab, na.n AS n_a, nb.n AS n_b, n_convs,
       CAST(n_ab AS DOUBLE) / CAST(n_convs AS DOUBLE) AS support,
       (CAST(n_ab AS DOUBLE) * CAST(n_convs AS DOUBLE))
         / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)) AS lift
FROM prs
JOIN chc na ON na.channel_name = ch_a
JOIN chc nb ON nb.channel_name = ch_b
CROSS JOIN nconv
ORDER BY ch_a, ch_b"""

  /** Packing-efficiency rollup over the sequencePacking bins. Mirrors
    * Corpus.packingEfficiency. */
  val packingEfficiency: String = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard
  FROM documents),
c AS (
  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t),
packed AS (
  SELECT lang, shard, n_tokens, CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin FROM c)
SELECT lang, shard,
       CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((MAX(bin) + 1) * 2048 AS BIGINT) AS capacity,
       CAST(SUM(n_tokens) AS DOUBLE) / CAST((MAX(bin) + 1) * 2048 AS DOUBLE) AS fill_rate
FROM packed
GROUP BY lang, shard
ORDER BY lang, shard"""

  /** Per-shard token balance for the epoch-0 shard assignment. Mirrors
    * Corpus.shardSkew. */
  val shardSkew: String = """
WITH s AS (
  SELECT CAST(concat('0x', substring(md5(CAST(0 AS VARCHAR) || '_' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), per AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM s GROUP BY shard
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per
)
SELECT shard, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share,
       (CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) * 8.0 AS token_skew
FROM per CROSS JOIN tot
ORDER BY shard"""

  /** Five closed-form attribution models side by side + spread — each
    * model CTE is the verbatim formula of its standalone oracle over the
    * shared attrBase CTEs. Mirrors Reporting.modelCompare. */
  val attributionModelCompare: String = attrBase + """
, ft AS (
  SELECT channel_name, CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS rev
  FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                                 ORDER BY ts_us ASC, session_id ASC) AS rn
    FROM assigned) t
  WHERE rn = 1 GROUP BY channel_name
), lt AS (
  SELECT channel_name, CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS rev
  FROM flagged WHERE conversion = 1 GROUP BY channel_name
), lin AS (
  SELECT channel_name,
         CAST(round(SUM(CAST(credit AS DECIMAL(10,9)) * CAST(revenue AS DECIMAL(12,6))), 9) AS DOUBLE) AS rev
  FROM (
    SELECT channel_name, revenue,
           CAST(1.0 AS DOUBLE) / CAST(COUNT(*) OVER (PARTITION BY conv_id) AS DOUBLE) AS credit
    FROM assigned) l
  GROUP BY channel_name
), td0 AS (
  SELECT channel_name, revenue, conv_id,
         CAST(1.0 AS DOUBLE)
           / (CAST(1.0 AS DOUBLE) + CAST((conv_ts_us - ts_us) // 86400000000 AS DOUBLE)) AS w
  FROM assigned
), tdn0 AS (
  SELECT channel_name, revenue,
         w / CAST(SUM(CAST(w AS DECIMAL(27,9))) OVER (PARTITION BY conv_id) AS DOUBLE) AS credit
  FROM td0
), td AS (
  SELECT channel_name,
         CAST(round(SUM(CAST(credit AS DECIMAL(10,9)) * CAST(revenue AS DECIMAL(12,6))), 9) AS DOUBLE) AS rev
  FROM tdn0 GROUP BY channel_name
), pos0 AS (
  SELECT channel_name, revenue,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts_us ASC, session_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY conv_id) AS n
  FROM assigned
), pcredit0 AS (
  SELECT channel_name, revenue,
         CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
              WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
              WHEN rn = 1 OR rn = n THEN CAST(0.4 AS DOUBLE)
              ELSE CAST(0.2 AS DOUBLE) / CAST(n - 2 AS DOUBLE) END AS credit
  FROM pos0
), pos AS (
  SELECT channel_name,
         CAST(round(SUM(CAST(credit AS DECIMAL(10,9)) * CAST(revenue AS DECIMAL(12,6))), 9) AS DOUBLE) AS rev
  FROM pcredit0 GROUP BY channel_name
), chans AS (
  SELECT DISTINCT channel_name FROM assigned
)
SELECT c.channel_name,
       COALESCE(ft.rev, 0.0) AS rev_first,
       COALESCE(lt.rev, 0.0) AS rev_last,
       COALESCE(lin.rev, 0.0) AS rev_linear,
       COALESCE(td.rev, 0.0) AS rev_decay,
       COALESCE(pos.rev, 0.0) AS rev_position,
       greatest(COALESCE(ft.rev, 0.0), COALESCE(lt.rev, 0.0), COALESCE(lin.rev, 0.0),
                COALESCE(td.rev, 0.0), COALESCE(pos.rev, 0.0))
       - least(COALESCE(ft.rev, 0.0), COALESCE(lt.rev, 0.0), COALESCE(lin.rev, 0.0),
               COALESCE(td.rev, 0.0), COALESCE(pos.rev, 0.0)) AS spread
FROM chans c
LEFT JOIN ft USING (channel_name)
LEFT JOIN lt USING (channel_name)
LEFT JOIN lin USING (channel_name)
LEFT JOIN td USING (channel_name)
LEFT JOIN pos USING (channel_name)
ORDER BY c.channel_name"""

  /** Day-of-week revenue seasonality. Mirrors Analytics.ordersSeasonality
    * (DuckDB dayofweek ≡ Spark dayofweek − 1, both 0 = Sunday). */
  val ordersSeasonality: String = """
WITH b AS (
  SELECT CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue FROM b
)
SELECT dow, n_orders, revenue,
       revenue / total_revenue AS revenue_share,
       (revenue / total_revenue) * 7.0 AS seasonality_index
FROM b CROSS JOIN t
ORDER BY dow"""

  /** Power-of-two token-length histogram per language (integer bit-length
    * buckets — no log2). Mirrors Corpus.docLenHistogram. */
  /** Batch-vs-corpus length-distribution drift per power-of-two bucket:
    * KS cumulative gaps as single IEEE ops over exact counts, PSI term
    * via the [[lniSql]] integer-ln tree over integer products. Lockstep
    * with Corpus.corpusDrift. */
  def corpusDriftChain: String = s"""
WITH t AS (
  SELECT (doc_id % 5 = 0) AS is_new,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), b0 AS (
  SELECT is_new, CAST(length(format('{:b}', n_tokens)) - 1 AS BIGINT) AS bucket
  FROM t WHERE n_tokens > 0
), b AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_ref
  FROM b0 GROUP BY bucket
), tot AS (
  SELECT CAST(SUM(n_new) AS BIGINT) AS t_new, CAST(SUM(n_ref) AS BIGINT) AS t_ref FROM b
), c AS (
  -- zero-doc side => empty output, never NaN shares (lockstep guard)
  SELECT bucket, n_new, n_ref, t_new, t_ref,
         CAST(SUM(n_new) OVER (ORDER BY bucket) AS BIGINT) AS cum_new,
         CAST(SUM(n_ref) OVER (ORDER BY bucket) AS BIGINT) AS cum_ref,
         CAST(n_new AS DOUBLE) / CAST(t_new AS DOUBLE) AS p_new,
         CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE) AS p_ref
  FROM b, tot
  WHERE t_new > 0 AND t_ref > 0
), drift AS (
  SELECT bucket, n_new, n_ref, p_new, p_ref, cum_new, cum_ref,
         abs(CAST(cum_new AS DOUBLE) / CAST(t_new AS DOUBLE)
             - CAST(cum_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)) AS ks_diff,
         CASE WHEN n_new > 0 AND n_ref > 0
              THEN (p_new - p_ref) * (${lniSql("CAST(n_new * t_ref AS BIGINT)")}
                                      - ${lniSql("CAST(n_ref * t_new AS BIGINT)")})
              ELSE 0.0 END AS psi_term
  FROM c
)"""

  val corpusDrift: String = corpusDriftChain + """
SELECT bucket, n_new, n_ref, p_new, p_ref, cum_new, cum_ref, ks_diff, psi_term
FROM drift ORDER BY bucket"""

  /** Scalar drift gate: KS max, ordered-fold PSI, bucket accounting.
    * Mirrors Corpus.corpusDriftSummary. */
  val corpusDriftSummary: String = corpusDriftChain + """
SELECT max(ks_diff) AS ks,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(psi_term ORDER BY bucket)),
                   (a, b) -> a + b) AS psi,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(CASE WHEN n_new = 0 OR n_ref = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped
FROM drift"""

  val docLenHistogram: String = """
WITH t AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
), b AS (
  SELECT lang, CAST(length(format('{:b}', n_tokens)) - 1 AS BIGINT) AS bucket, n_tokens
  FROM t WHERE n_tokens > 0
)
SELECT lang, bucket,
       CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS bucket_lo,
       CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS bucket_hi,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM b GROUP BY lang, bucket
ORDER BY lang, bucket"""

  /** Winnow-fingerprint overlap pairs with df cap + support floor.
    * Mirrors Corpus.winnowOverlap. */
  val winnowOverlap: String = winnowCte + """
, keep AS (
  SELECT fingerprint FROM (
    SELECT fingerprint, COUNT(*) AS df FROM wfp GROUP BY fingerprint) d
  WHERE df <= 1000
), f AS (
  SELECT wfp.doc_id, wfp.fingerprint FROM wfp JOIN keep USING (fingerprint)
), dc AS (
  SELECT doc_id, COUNT(*) AS n FROM f GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM f a JOIN f b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE) AS overlap
FROM inter
JOIN dc na ON na.doc_id = doc_a
JOIN dc nb ON nb.doc_id = doc_b
ORDER BY doc_a, doc_b"""

  /** Quality-decile × length-bucket grid with exact decimal mean quality.
    * Mirrors Corpus.qualityLengthGrid. */
  val qualityLengthGrid: String = s"""
WITH base AS (
  SELECT least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
           + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.3
           + (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3 AS q,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), b AS (
  SELECT CAST(floor(q * 10.0) AS BIGINT) AS q_decile,
         CAST(length(format('{:b}', n_tokens)) - 1 AS BIGINT) AS len_bucket, q
  FROM base WHERE n_tokens > 0
)
SELECT q_decile, len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(q AS DECIMAL(27,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_quality
FROM b GROUP BY q_decile, len_bucket
ORDER BY q_decile, len_bucket"""

  /** The C9 quality score as a SQL fragment over a `text` column —
    * identical IEEE tree to `TextFunctions.qualityScore` (shared by the
    * grid, ablation, and cap oracles). */
  private def qualitySql(text: String): String =
    s"""least(CAST(len(string_split($text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
           + CAST(len(list_distinct(string_split($text, ' '))) AS DOUBLE)
             / CAST(len(string_split($text, ' ')) AS DOUBLE) * 0.3
           + (1.0 - CAST(len(list_filter(string_split($text, ' '), w -> w IN ($stopList))) AS DOUBLE)
                    / CAST(len(string_split($text, ' ')) AS DOUBLE)) * 0.3"""

  /** Temperature-scaled source mixing weights. Mirrors
    * Corpus.mixtureTemperature: sqrt is correctly rounded by IEEE
    * standard in both engines; denominators are source-ordered folds. */
  val mixtureTemperature: String = """
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, n_docs, n_tokens,
         sqrt(CAST(n_tokens AS DOUBLE)) AS s2,
         sqrt(sqrt(CAST(n_tokens AS DOUBLE))) AS s4
  FROM per
), t AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(s2 ORDER BY source)),
                     (a, b) -> a + b) AS t2,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(s4 ORDER BY source)),
                     (a, b) -> a + b) AS t4,
         CAST(SUM(n_tokens) AS BIGINT) AS n_total
  FROM s
)
SELECT source, n_docs, n_tokens,
       s2 / t2 AS w_t2,
       s4 / t4 AS w_t4,
       s2 / t2 * CAST(n_total AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS boost_t2
FROM s CROSS JOIN t
ORDER BY source"""

  /** Per-source quality-capped keepers. Mirrors Corpus.domainCapSample. */
  val domainCapSample: String = s"""
WITH q AS (
  SELECT source, doc_id, ${qualitySql("text")} AS q
  FROM documents
), r AS (
  SELECT source, doc_id, q,
         row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rk
  FROM q
)
SELECT source, doc_id, q, CAST(rk AS INTEGER) AS rk
FROM r WHERE rk <= 5
ORDER BY source, rk"""

  /** Quality-threshold retention curve. Mirrors Corpus.qualityAblation. */
  val qualityAblation: String = s"""
WITH b AS (
  SELECT CAST(floor((${qualitySql("text")}) * 10.0) AS BIGINT) AS q_decile,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS t
  FROM documents
), d AS (
  SELECT q_decile, CAST(COUNT(*) AS BIGINT) AS docs, CAST(SUM(t) AS BIGINT) AS toks
  FROM b GROUP BY q_decile
), c AS (
  SELECT q_decile,
         CAST(SUM(docs) OVER (ORDER BY q_decile DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS docs_kept,
         CAST(SUM(toks) OVER (ORDER BY q_decile DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tokens_kept
  FROM d
), tt AS (
  SELECT CAST(SUM(docs) AS BIGINT) AS t_docs, CAST(SUM(toks) AS BIGINT) AS t_toks FROM d
)
SELECT q_decile, CAST(q_decile AS DOUBLE) / 10.0 AS threshold,
       docs_kept, tokens_kept,
       CAST(docs_kept AS DOUBLE) / CAST(t_docs AS DOUBLE) AS doc_share,
       CAST(tokens_kept AS DOUBLE) / CAST(t_toks AS DOUBLE) AS token_share
FROM c CROSS JOIN tt
ORDER BY q_decile"""

  /** Multinomial NB language classifier, add-one smoothing. Mirrors
    * Search.nbClassify: every ln is [[lniSql]] over exact integers, the
    * per-doc likelihood is a position-ordered fold, and the final score
    * tree is the identical IEEE shape, so the argmax compares identical
    * doubles. */
  val nbClassify: String = s"""
WITH tok AS (
  SELECT doc_id, lang, term, pos FROM (
    SELECT doc_id, lang,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents) t
  WHERE term <> ''
), cc AS (
  SELECT lang AS cls, term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), mm AS (
  SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS m FROM tok GROUP BY 1
), pr AS (
  SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_docs_c FROM documents GROUP BY 1
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), vv AS (
  SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tok
), cls AS (
  SELECT pr.cls, pr.n_docs_c, mm.m, nn.n_docs, vv.v
  FROM pr JOIN mm ON mm.cls = pr.cls CROSS JOIN nn CROSS JOIN vv
), sc AS (
  SELECT t.doc_id, t.lang, c.cls, c.n_docs_c, c.m, c.n_docs, c.v,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(${lniSql("CAST(COALESCE(x.c, 0) + 1 AS BIGINT)")} ORDER BY t.pos)),
           (a, b) -> a + b) AS sum_ll,
         CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tok t
  CROSS JOIN cls c
  LEFT JOIN cc x ON x.cls = c.cls AND x.term = t.term
  GROUP BY t.doc_id, t.lang, c.cls, c.n_docs_c, c.m, c.n_docs, c.v
), fin AS (
  SELECT doc_id, lang, cls,
         ${lniSql("n_docs_c")} - ${lniSql("n_docs")} + sum_ll
           - CAST(n_tok AS DOUBLE) * ${lniSql("CAST(m + v AS BIGINT)")} AS score,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY (${lniSql("n_docs_c")} - ${lniSql("n_docs")} + sum_ll
             - CAST(n_tok AS DOUBLE) * ${lniSql("CAST(m + v AS BIGINT)")}) DESC, cls) AS rk
  FROM sc
)
SELECT doc_id, lang, cls AS pred_lang, cls = lang AS correct, score
FROM fin WHERE rk = 1
ORDER BY doc_id"""

  /** Channel opener/closer/middle position shares. Mirrors
    * Journeys.channelPositionBias. */
  val channelPositionBias: String = attrBase + """
, pos AS (
  SELECT channel_name,
         row_number() OVER (PARTITION BY conv_id ORDER BY ts_us ASC, session_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY conv_id) AS n
  FROM assigned
)
SELECT channel_name,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_opener,
       CAST(COUNT(CASE WHEN rn = n THEN 1 END) AS BIGINT) AS n_closer,
       CAST(COUNT(CASE WHEN rn <> 1 AND rn <> n THEN 1 END) AS BIGINT) AS n_middle,
       CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS opener_share,
       CAST(COUNT(CASE WHEN rn = n THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS closer_share
FROM pos GROUP BY channel_name
ORDER BY channel_name"""

  /** Journeys and revenue by touch count. Mirrors
    * Journeys.lengthDistribution. */
  val journeyLengthDistribution: String = attrBase + """
, per AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches, MAX(revenue) AS revenue
  FROM assigned GROUP BY conv_id
)
SELECT n_touches,
       CAST(COUNT(*) AS BIGINT) AS n_journeys,
       CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_revenue
FROM per GROUP BY n_touches
ORDER BY n_touches"""

  /** One-row events DQ audit. Mirrors Analytics.eventsQualityAudit. */
  val eventsQualityAudit: String = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS n_dup_event_ids,
       CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT) AS n_null_user,
       CAST(COUNT(CASE WHEN value < 0.0 THEN 1 END) AS BIGINT) AS n_negative_value,
       CAST(COUNT(CASE WHEN event_type NOT IN ('purchase','click','view','signup','error') THEN 1 END) AS BIGINT) AS n_unknown_type,
       MIN(CAST(ts AS DATE)) AS min_date,
       MAX(CAST(ts AS DATE)) AS max_date
FROM events"""

  /** Vocabulary-growth deciles (Heaps curve). Mirrors Corpus.vocabGrowth. */
  val vocabGrowth: String = """
WITH nd AS (
  SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n FROM documents
), tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), firsts AS (
  SELECT w, MIN(doc_id) AS first_doc FROM tok WHERE w <> '' GROUP BY w
), byd AS (
  SELECT (first_doc * 10) // n AS decile, CAST(COUNT(*) AS BIGINT) AS new_tokens
  FROM firsts CROSS JOIN nd GROUP BY 1
), dpd AS (
  SELECT (doc_id * 10) // n AS decile, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents CROSS JOIN nd GROUP BY 1
)
SELECT d.decile, d.n_docs,
       CAST(SUM(d.n_docs) OVER (ORDER BY d.decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS docs_cum,
       COALESCE(b.new_tokens, 0) AS new_tokens,
       CAST(SUM(COALESCE(b.new_tokens, 0)) OVER (ORDER BY d.decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
FROM dpd d LEFT JOIN byd b USING (decile)
ORDER BY d.decile"""

  /** Language-ID confusion matrix with per-declared recall rates.
    * Mirrors Corpus.langConfusion. */
  val langConfusion: String = s"""
WITH p AS (
  SELECT lang AS declared_lang,
         CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) >= 2
              THEN 'en' ELSE 'unknown' END AS predicted_lang
  FROM documents
), cells AS (
  SELECT declared_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY declared_lang, predicted_lang
)
SELECT declared_lang, predicted_lang, n,
       CAST(SUM(n) OVER (PARTITION BY declared_lang) AS BIGINT) AS n_declared,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY declared_lang) AS DOUBLE) AS rate
FROM cells
ORDER BY declared_lang, predicted_lang"""

  /** Jaccard-decile pair counts + at-or-above cumulative over the C4 pair
    * frame. Mirrors Corpus.dedupThresholdSweep. */
  val dedupThresholdSweep: String = shingleBase + """
, shi AS (
  SELECT doc_id, CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS sid
  FROM sh
), keep AS (
  SELECT sid FROM (SELECT sid, COUNT(*) AS df FROM shi GROUP BY sid) d
  WHERE df <= 1000
), shf AS (
  SELECT shi.doc_id, shi.sid FROM shi JOIN keep USING (sid)
), dc AS (
  SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shf a JOIN shf b ON a.sid = b.sid AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), jac AS (
  SELECT CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE) AS jaccard
  FROM inter
  JOIN dc na ON na.doc_id = doc_a
  JOIN dc nb ON nb.doc_id = doc_b
), byb AS (
  SELECT CAST(floor(jaccard * 10.0) AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM jac GROUP BY 1
)
SELECT bucket, CAST(bucket AS DOUBLE) / 10.0 AS threshold_lo, n_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY bucket DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_at_or_above
FROM byb
ORDER BY bucket"""

  /** Exact LTV deciles over the distributed rank. Mirrors
    * Analytics.customerLtvDeciles. */
  val customerLtvDeciles: String = """
WITH ltv AS (
  SELECT o_custkey AS custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS ltv
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT ltv,
         row_number() OVER (ORDER BY ltv, custkey) AS rk,
         COUNT(*) OVER () AS n
  FROM ltv
)
SELECT ((rk - 1) * 10) // n AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(ltv AS DECIMAL(27,6))) AS DOUBLE) AS total_ltv,
       CAST(SUM(CAST(ltv AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_ltv
FROM ranked
GROUP BY 1
ORDER BY decile"""

  /** Within-journey inter-touch gap quartiles + mean. Mirrors
    * Analytics.touchGapQuantiles (quantile_cont ≡ the exact
    * interpolation tree, the timeToConvert precedent). */
  val touchGapQuantiles: String = attrBase + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       quantile_cont(gap, 0.25) AS p25_us,
       quantile_cont(gap, 0.5) AS p50_us,
       quantile_cont(gap, 0.75) AS p75_us,
       CAST(SUM(CAST(gap AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_us
FROM (
  SELECT CAST(nxt - ts_us AS DOUBLE) AS gap FROM (
    SELECT ts_us, LEAD(ts_us, 1) OVER (PARTITION BY conv_id
                                       ORDER BY ts_us, session_id) AS nxt
    FROM assigned) t
  WHERE nxt IS NOT NULL) g"""

  /** Per-nation supplier HHI over SHARES with the TWO-LEVEL ordered
    * share² fold — bridge-free (the wide-decimal Σrev²/(Σrev)² form dies
    * on the past-2^53 decimal→double cast), and the exact chain of
    * Analytics.supplierHhi's bucketed form: per-(nation, suppkey div
    * 65536) inner folds in suppkey order, then an outer fold of bucket
    * subtotals in bucket order. Mirrors Analytics.supplierHhi. */
  val supplierHhi: String = """
WITH srev AS (
  SELECT l.l_suppkey,
         CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS srev
  FROM lineitem l GROUP BY l.l_suppkey
), j AS (
  SELECT n.n_name, s2.l_suppkey, s2.srev FROM srev s2
  JOIN supplier s ON s.s_suppkey = s2.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
), sh AS (
  SELECT n_name, l_suppkey, srev,
         CAST(SUM(CAST(srev AS DECIMAL(27,6))) OVER (PARTITION BY n_name) AS DOUBLE) AS nrev
  FROM j
), sub AS (
  SELECT n_name, l_suppkey // 65536 AS bkt,
         CAST(COUNT(*) AS BIGINT) AS nb,
         MAX(nrev) AS nrev,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list((srev / nrev) * (srev / nrev) ORDER BY l_suppkey)),
           (a, b) -> a + b) AS s
  FROM sh GROUP BY n_name, bkt
)
SELECT n_name,
       CAST(SUM(nb) AS BIGINT) AS n_suppliers,
       MAX(nrev) AS revenue,
       list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY bkt)),
         (a, b) -> a + b) AS hhi
FROM sub GROUP BY n_name
ORDER BY n_name"""

  /** Hour-of-day activity profile (integer µs hour). Mirrors
    * Analytics.eventsHourProfile. */
  val eventsHourProfile: String = """
WITH b AS (
  SELECT CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), t AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS total_events FROM b
)
SELECT hour, n_events,
       CAST(n_events AS DOUBLE) / CAST(total_events AS DOUBLE) AS share,
       (CAST(n_events AS DOUBLE) / CAST(total_events AS DOUBLE)) * 24.0 AS activity_index
FROM b CROSS JOIN t
ORDER BY hour"""

  /** One-row corpus language-mixture entropy — the C67 integer-ln form
    * via [[lniSql]]. Mirrors Corpus.mixtureEntropy. */
  val corpusMixtureEntropy: String = s"""
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang
), t AS (
  SELECT lang, c, CAST(c AS DOUBLE) * ${lniSql("c")} AS term FROM c
), f AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY lang)),
                     (a, b) -> a + b) AS s
  FROM t
)
SELECT n_docs, n_langs,
       ${lniSql("n_docs")} - s / CAST(n_docs AS DOUBLE) AS entropy_nats,
       (${lniSql("n_docs")} - s / CAST(n_docs AS DOUBLE)) / 0.6931471805599453 AS entropy_bits
FROM f"""

  /** ACF of the daily revenue series at lags 1..14 — every sum an
    * ordered fold in day order (the tokenZipf/EWMA discipline), with the
    * engine's SAME degenerate guard: a series under 2 days or with zero
    * variance emits NO rows (never 0/0 NaNs). Mirrors
    * Analytics.ordersAutocorrelation. */
  val ordersAutocorrelation: String = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
), arr AS (
  SELECT list(revenue ORDER BY day) AS xs, CAST(COUNT(*) AS BIGINT) AS n FROM daily
), m AS (
  SELECT xs, n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs), (a, b) -> a + b)
           / CAST(n AS DOUBLE) AS mean
  FROM arr
), den AS (
  SELECT xs, n, mean,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(xs, x -> (x - mean) * (x - mean))), (a, b) -> a + b) AS ss
  FROM m
), lags AS (
  SELECT unnest(range(1, 15)) AS lag
)
SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(range(1, n - lag + 1),
           i -> (xs[i] - mean) * (xs[i + lag] - mean))), (a, b) -> a + b) / ss AS acf
FROM den CROSS JOIN lags
WHERE n >= 2 AND ss <> 0.0
ORDER BY lag"""

  /** Per-channel journey-participation rate. Mirrors
    * Reporting.channelConversionRate. */
  val channelConversionRate: String = attrBase + """
, alls AS (
  SELECT channel_name, CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM sessions GROUP BY channel_name
), inj AS (
  SELECT channel_name, CAST(COUNT(*) AS BIGINT) AS n_in_journeys
  FROM assigned GROUP BY channel_name
)
SELECT a.channel_name, a.n_sessions,
       COALESCE(i.n_in_journeys, 0) AS n_in_journeys,
       CAST(COALESCE(i.n_in_journeys, 0) AS DOUBLE) / CAST(a.n_sessions AS DOUBLE) AS journey_rate
FROM alls a LEFT JOIN inj i USING (channel_name)
ORDER BY a.channel_name"""

  /** Purchases-per-user histogram with the zero bucket. Mirrors
    * Analytics.userPurchaseHistogram. */
  val userPurchaseHistogram: String = """
WITH p AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), hist AS (
  SELECT n_purchases, CAST(COUNT(*) AS BIGINT) AS n_users FROM p GROUP BY n_purchases
), z AS (
  SELECT CAST(0 AS BIGINT) AS n_purchases,
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
           - (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_users
)
SELECT * FROM hist UNION ALL SELECT * FROM z
ORDER BY n_purchases"""

  /** One-row chunk-duplication summary (the dedupChunks chunking CTEs +
    * a rollup). Mirrors Dedup.chunkDupStats. */
  val chunkDupStats: String = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 1
), ch AS (
  SELECT doc_id,
         CAST(unnest(range(0, ((len(words) - 1) // 64) + 1)) AS BIGINT) AS chunk_id,
         words
  FROM w
), h AS (
  SELECT md5(array_to_string(
           words[(CAST(chunk_id * 64 AS INTEGER) + 1):(CAST(chunk_id * 64 AS INTEGER) + 64)],
           ' ')) AS chunk_hash
  FROM ch
)
SELECT CAST(COUNT(*) AS BIGINT) AS total_chunks,
       CAST(COUNT(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks,
       1.0 - CAST(COUNT(DISTINCT chunk_hash) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_chunk_rate
FROM h"""

  /** Shingle document-frequency histogram on power-of-two buckets.
    * Mirrors Dedup.shingleDfHistogram. */
  val shingleDfHistogram: String = shingleBase + """
, shi AS (
  SELECT CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS sid FROM sh
), d AS (
  SELECT sid, CAST(COUNT(*) AS BIGINT) AS df FROM shi GROUP BY sid
), b AS (
  SELECT CAST(length(format('{:b}', df)) - 1 AS BIGINT) AS bucket, df FROM d
)
SELECT bucket,
       CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS df_lo,
       CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS df_hi,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(df) AS BIGINT) AS total_occurrences
FROM b GROUP BY bucket
ORDER BY bucket"""

  /** Mean conversion lag per OPENER channel. Mirrors Journeys.lagByOpener. */
  val journeyLagByOpener: String = attrBase + """
, op AS (
  SELECT channel_name, conv_ts_us - ts_us AS lag_us FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                                 ORDER BY ts_us ASC, session_id ASC) AS rn
    FROM assigned) t
  WHERE rn = 1
)
SELECT channel_name, CAST(COUNT(*) AS BIGINT) AS n_journeys,
       CAST(CAST(SUM(lag_us) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_lag_us
FROM op GROUP BY channel_name
ORDER BY channel_name"""

  /** Per-nation supply vs demand with the net. Mirrors
    * Analytics.nationTradeBalance. */
  val nationTradeBalance: String = """
WITH supply AS (
  SELECT n.n_name,
         CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS supply_revenue
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name
), demand AS (
  SELECT n.n_name,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS demand_spend
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
)
SELECT COALESCE(s.n_name, d.n_name) AS n_name,
       COALESCE(s.supply_revenue, 0.0) AS supply_revenue,
       COALESCE(d.demand_spend, 0.0) AS demand_spend,
       COALESCE(s.supply_revenue, 0.0) - COALESCE(d.demand_spend, 0.0) AS net_balance
FROM supply s FULL OUTER JOIN demand d ON s.n_name = d.n_name
ORDER BY n_name"""

  /** Per-source exact-dup rate. Mirrors Corpus.dupRateBySource. */
  val dupRateBySource: String = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
       1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM documents GROUP BY source
ORDER BY source"""

  /** Token-balanced epoch shards: a shard boundary every total/n tokens
    * along the md5 shuffle order, exclusive prefix sum, integer
    * arithmetic end to end. Mirrors Corpus.trainingShardsBalanced. */
  val trainingShardsBalanced: String = """
WITH k AS (
  SELECT doc_id,
         md5(CAST(0 AS VARCHAR) || '_' || CAST(doc_id AS VARCHAR)) AS sk,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS t
  FROM documents
), c AS (
  SELECT doc_id, t,
         SUM(t) OVER (ORDER BY sk, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS cum_ex,
         SUM(t) OVER () AS tot
  FROM k
), a AS (
  SELECT (cum_ex * 8) // tot AS shard, t FROM c
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t) AS BIGINT) AS n_tokens
FROM a GROUP BY shard
ORDER BY shard"""

  /** Index-selection dashboard: each approximate index's overall
    * recall@10 vs brute force, aggregated from the SAME per-query
    * recall chains the gated rows run. Mirrors Similarity.indexCompare. */
  /** The pq/sq full ADC scan: every query scores the whole corpus minus
    * itself. */
  private def fullScanCountSql: String =
    "SELECT CAST(8 * (COUNT(*) - 1) AS BIGINT) FROM embeddings"

  /** Candidates the trained-IVF probe join scores (shared by ivf,
    * ivf_pq and ivf_pq_res — same quantizer, same probe budget):
    * |probes ⋈ assigned| minus self rows, lockstep with
    * `Similarity.probeCandidates(…, cents16, 8, 2).count()`. */
  private def ivfCandCountSql: String = trainedQuantBase(2) + s"""
, asgC AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS rn
    FROM cdotF) x WHERE rn = 1
), probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cid AS cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot / (nrm * cnrm) DESC, cid) AS qrn
    FROM cdotF WHERE vec_id < 8) t
  WHERE qrn <= 2
)
SELECT CAST(COUNT(*) AS BIGINT)
FROM probes p JOIN asgC a ON p.cell = a.cell
WHERE a.vec_id <> p.query_id"""

  /** Candidates the LSH multi-probe bucket join scores — the capped
    * bucket pairs minus self, lockstep with
    * `Similarity.lshCandidates(…, 8).count()`. */
  private def lshCandCountSql: String = featBase + """
, masks AS (
  SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS m
), q AS (
  SELECT vec_id AS query_id, xor(bucket, m) AS bucket
  FROM feat CROSS JOIN masks WHERE vec_id < 8
), c AS (
  SELECT vec_id AS neighbor_id, bucket FROM feat
  WHERE bucket IN (SELECT bucket FROM feat GROUP BY bucket HAVING COUNT(*) <= 1000)
)
SELECT CAST(COUNT(*) AS BIGINT)
FROM q JOIN c ON q.bucket = c.bucket AND query_id <> neighbor_id"""

  val annIndexCompare: String = {
    // Every candidate chain MATERIALIZES EXACTLY ONCE as a top-level
    // 1-row CTE, and the per-family rows join the scalar back in. The
    // naive form — inlining the cand subquery into each row's SELECT —
    // instantiates the quantizer chain per reference (the r13
    // plain-CTE lesson), which blew DuckDB past its 100 GiB cap at
    // sf0.1 (the graph chain alone ran 3×: once for recall, twice for
    // the two cand columns).
    //
    // The RECALL branches get the same treatment (r16): each branch is
    // its own top-level MATERIALIZED CTE, not a subquery inside the
    // UNION ALL. Nested inside the union, DuckDB's planner stops
    // honoring the branches' inner MATERIALIZED hints and re-inlines
    // their training chains per reference — measured at sf0.01, the
    // ivf_pq branch ran 29 s composed vs 3.3 s standalone and the
    // residual branch 97 s vs 4.6 s (the whole dashboard 160 s); with
    // the branches hoisted the identical values compute in ~1/4 the
    // wall. This oracle is the suite's #1 DuckDB cost — the r15 empty
    // driver artifact is plausibly a timeout-killed gate, so its cost
    // is a correctness-process concern, not vanity (ORACLE_COST.json
    // tracks it per round).
    // Shared-chain form: the graph chain (quantizer→kNN graph→beam
    // navigation→e3) opens the dashboard's WITH and serves BOTH the
    // graph recall and the graph candidates count (formerly two full
    // instantiations), and the brute-force truth `bf` materializes once
    // for all seven families (formerly once per family). The six
    // non-graph families keep their standalone top-k chains, nested —
    // their quantizer variants differ (k=16 vs autoK), so deeper
    // sharing would mean renaming every inner CTE for marginal gain.
    val topks = Seq(
      "lsh" -> annLshTopK, "ivf" -> annIvfTrainedTopK,
      "pq" -> annPqTopK, "sq" -> annSqTopK, "ivf_pq" -> annIvfPqTopK,
      "ivf_pq_res" -> annIvfPqResidualTopK)
    def recallCte(n: String, topRef: String) = s"""r_$n AS MATERIALIZED (
SELECT '$n' AS "index", CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(n_hits) AS BIGINT) AS n_hits,
       CAST(SUM(n_hits) AS DOUBLE) / CAST(COUNT(*) * 10 AS DOUBLE) AS recall_at_k
FROM (
  SELECT b.query_id, CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits
  FROM bf b LEFT JOIN $topRef l
    ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
  GROUP BY b.query_id))"""
    val topkCtes = topks.map { case (n, s) => s"t_$n AS MATERIALIZED ($s)" }
      .mkString(",\n")
    val recallCtes = (recallCte("graph", "g_top") +:
      topks.map { case (n, _) => recallCte(n, s"t_$n") }).mkString(",\n")
    val recalls = ("graph" +: topks.map(_._1)).map(n => s"SELECT * FROM r_$n")
      .mkString("(", " UNION ALL ", ")")
    // The graph chain lives INSIDE one CTE (its inner WITH is scoped):
    // DuckDB's binder rejects a nested CTE alias that collides with the
    // ENCLOSING WITH list, so the chain's feat/train/… names must not
    // sit at the dashboard's top level where every nested family chain
    // redefines them. g_scored = the navigation's full visited set with
    // query cosines — one evaluation serving both the recall row and
    // the candidates count.
    s"""WITH g_scored AS MATERIALIZED (
${graphChainSql(4)}
SELECT e.query_id, e.node, q.cosine
FROM e3 e JOIN qd q ON q.query_id = e.query_id AND q.node = e.node
), g_top AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, node AS neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, node) AS rnk
    FROM g_scored
    WHERE node <> query_id) t
  WHERE rnk <= 10
), bf AS MATERIALIZED ($annBruteforceTopK),
graph_cand AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM g_scored),
ivf_cand AS MATERIALIZED (SELECT ($ivfCandCountSql) AS c),
lsh_cand AS MATERIALIZED (SELECT ($lshCandCountSql) AS c),
full_cand AS MATERIALIZED (SELECT ($fullScanCountSql) AS c),
$topkCtes,
$recallCtes,
cands AS (
  SELECT 'graph' AS idx, c FROM graph_cand UNION ALL
  SELECT 'lsh', c FROM lsh_cand UNION ALL
  SELECT 'ivf', c FROM ivf_cand UNION ALL
  SELECT 'pq', c FROM full_cand UNION ALL
  SELECT 'sq', c FROM full_cand UNION ALL
  SELECT 'ivf_pq', c FROM ivf_cand UNION ALL
  SELECT 'ivf_pq_res', c FROM ivf_cand)
SELECT r."index", r.n_queries, r.n_hits, r.recall_at_k,
       CAST(c.c AS BIGINT) AS candidates,
       CAST(c.c AS DOUBLE) / CAST(r.n_queries AS DOUBLE) AS cand_per_query
FROM $recalls r JOIN cands c ON c.idx = r."index"
ORDER BY r."index""""
  }
}
