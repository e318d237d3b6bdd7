package graft.operators

import graft.functions.Exact.dsum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General analytics surface (SURVEY.md §2.B): TPC-H-shaped joins/aggs,
  * windows, sessionization, JSON extraction.
  *
  * Scale notes: dimension sides (region/nation/customer/supplier at these
  * shapes) are explicitly `broadcast()`; fact-fact joins stay sort-merge.
  * Windowed queries partition by high-cardinality keys (user, customer) so
  * no single partition concentrates the data; the only unpartitioned
  * window (global top-k rank) runs over an already-aggregated, tiny frame.
  */
object Analytics {

  /** B1-adjacent shipping-priority top-N (TPC-H Q3 shape). */
  def q3TopUnshipped(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = orders
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = lineitem
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** Six-way star join, revenue by region/nation (TPC-H Q5 shape). */
  def q5RegionRevenue(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("r_name", "n_name")

  /** Top-k customers by lifetime spend, ranked. The per-customer
    * aggregate is |customers|-sized, so the top-k runs as a distributed
    * sort+LIMIT (per-partition partial top-k merged on the driver —
    * `TakeOrderedAndProject`), and only the surviving ≤ k rows pass
    * through the rank window; ranking the full aggregate through one
    * unpartitioned window task would bottleneck at warehouse scale. */
  def topCustomers(customer: DataFrame, orders: DataFrame, k: Int): DataFrame = {
    val rev = orders
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("revenue"))
      .join(broadcast(customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
    val rk = Window.orderBy(col("revenue").desc, col("c_custkey"))
    rev.select(col("c_custkey"), col("c_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey")).limit(k)
      .withColumn("rk", row_number().over(rk))
      .orderBy("rk")
  }

  /** Per-customer running spend over time (cumulative window; exact
    * decimal so segment-tree vs sequential evaluation can't differ). */
  def runningTotal(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").cast("date").as("order_date"),
      sum(col("o_totalprice").cast(DecimalType(27, 6))).over(w)
        .cast("double").as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Gap-based sessionization (2 h inactivity gap) — the batch twin of the
    * streaming sessionizer in [[graft.streaming]]. lag → flag → cumulative
    * sum → per-session aggregate; all integer arithmetic, fully exact. */
  /** Gap-threshold sweep for sessionization — session counts at SEVERAL
    * inactivity thresholds from ONE pass over the per-user gaps (the
    * C76/C91 one-pass-sweep move applied to B6): choosing a session gap
    * is a tuning decision, and re-running sessionization per candidate
    * is the naive cost this avoids. A user's session count at threshold
    * T is `1 + #(gap > T)`, so each threshold is one conditional sum
    * over the same lag frame; `n_sessions` is exactly what B6 yields at
    * that gap (spec-pinned at the 2 h default).
    *
    * Scale shape: one user-partitioned lag window (B6's own shuffle),
    * one global agg computing all thresholds' sums map-side, a 4-row
    * unpivot. events/session is a single IEEE division of exact ints. */
  def sessionizeGapSweep(
      events: DataFrame,
      gapsUs: Seq[Long] = Seq(1800000000L, 3600000000L, 7200000000L, 14400000000L))
      : DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val g = events.select("event_id", "user_id", "ts_us")
      .withColumn("__gap", col("ts_us") - lag("ts_us", 1).over(byUser))
    val sums = gapsUs.zipWithIndex.map { case (t, i) =>
      // coalesce: SUM over an empty stream is null, and 0 + null would
      // silently null the session count
      coalesce(sum(when(col("__gap") > t, 1L).otherwise(0L)), lit(0L)).as(s"__b$i")
    }
    val base = g.agg(
      countDistinct(col("user_id")).as("__u"),
      (count(lit(1)).as("__n") +: sums.map(c => c: Column)): _*)
    val rows = gapsUs.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("gap_us"), (col("__u") + col(s"__b$i")).as("n_sessions"))
    }
    base.select(col("__n"), explode(array(rows: _*)).as("r"))
      .select(
        col("r.gap_us"), col("r.n_sessions"), col("__n").as("n_events"),
        // an empty stream has no sessions to divide by (ANSI)
        when(col("r.n_sessions") === 0L, lit(null).cast("double"))
          .otherwise(col("__n").cast("double") / col("r.n_sessions").cast("double"))
          .as("events_per_session"))
      .orderBy("gap_us")
  }

  def sessionize(events: DataFrame, gapUs: Long = 7200000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select("event_id", "user_id", "ts_us")
      .withColumn("is_new",
        when(col("ts_us") - lag("ts_us", 1).over(byUser) > gapUs, 1).otherwise(0))
      .withColumn("session_idx", sum("is_new").over(run))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"))
      .orderBy("user_id", "session_idx")
  }

  /** SCD2 dimension build (slowly-changing dimension, type 2): collapse
    * each user's event stream into versioned state intervals. The "state"
    * is the event type; consecutive events with the same type merge into
    * one interval, a type change closes the open interval and opens the
    * next. Emits `[valid_from_us, valid_to_us)` half-open intervals with
    * `valid_to_us` NULL on the current (open) version — the standard
    * warehouse dimension-history contract.
    *
    * Gaps-and-islands with every window PARTITIONED by `user_id`
    * (ordered by `ts_us, event_id` so duplicate timestamps stay
    * deterministic): a change flag via `lag`, a running `sum` numbering
    * the islands, one per-(user, version) partial agg, and a `lead` for
    * the interval close. Per-user work is per-user-history sized; no
    * global sort, no unpartitioned window — the same plan holds when the
    * dimension covers a billion users. */
  def scd2UserState(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val versions = events
      .select("event_id", "user_id", "ts_us", "event_type")
      .withColumn("is_change",
        when(lag("event_type", 1).over(byUser).isNull ||
          lag("event_type", 1).over(byUser) =!= col("event_type"), 1).otherwise(0))
      .withColumn("version", sum("is_change").over(run))
      .groupBy("user_id", "version")
      .agg(
        min("event_type").as("state"),
        min("ts_us").as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy("user_id").orderBy("valid_from_us")
    versions
      .withColumn("valid_to_us", lead("valid_from_us", 1).over(byVersion))
      .select(
        col("user_id"), col("version").cast("long").as("version"),
        col("state"), col("valid_from_us"), col("valid_to_us"),
        col("n_events"), col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** Built-in `session_window` sessionization — the idiomatic Spark form
    * of [[sessionize]]: a new session starts when the inter-event gap is
    * >= the timeout and the session end extends to last event + gap.
    * Plans as a single SessionWindow aggregate (one user_id shuffle), and
    * the same expression drives the streaming variant unchanged. */
  def sessionWindow(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .groupBy(session_window(col("event_ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")

  /** JSON property extraction + aggregation (codegen'd `get_json_object`,
    * no UDF). */
  def jsonExtractAgg(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_bucket"),
        col("value"))
      .groupBy("event_type", "k_bucket")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("event_type", "k_bucket")

  /** Conversion funnel (signup → first later click → first later
    * purchase): per-user stage timestamps via conditional min-aggregates +
    * two join/min passes; one output row of stage counts. */
  /** RFM segmentation (B41): per-user recency (last event time),
    * frequency (event count), monetary (decimal-exact value sum), each
    * scored into quartiles, concatenated into the classic 3-digit segment
    * label. Descending metric order → quartile 1 is the best cohort on
    * every axis; user_id breaks ties so the labeling is deterministic.
    *
    * Each quartile is the EXACT ntile(4) — but computed via
    * [[Quantiles.withExactRank]]'s range-bucketed distributed rank
    * (broadcast per-bucket offsets + a window PARTITIONED by the bucket),
    * never an unpartitioned window: at billion-user scale no single task
    * sorts the user dimension. [[rfmSegmentsSingleTask]] pins the
    * semantics. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val perUser = events.groupBy("user_id").agg(
      max(col("ts_us")).as("last_ts_us"),
      count(lit(1)).as("n_events"),
      dsum(col("value")).as("monetary"))
    val scored = Seq("last_ts_us" -> "r_quartile", "n_events" -> "f_quartile",
      "monetary" -> "m_quartile").foldLeft(perUser) { case (df, (metric, out)) =>
      Quantiles
        .withExactRank(df, Nil, Seq((metric, false), ("user_id", true)), "__rk", "__nn")
        .withColumn(out, Quantiles.ntileFromRank(col("__rk"), col("__nn"), 4))
        .drop("__rk", "__nn")
    }
    scored
      .withColumn("segment", concat(
        col("r_quartile").cast("string"), col("f_quartile").cast("string"),
        col("m_quartile").cast("string")))
      .orderBy("user_id")
  }

  /** Single-task reference form of [[rfmSegments]] (unpartitioned ntile
    * windows) — spec-pinned semantic oracle, not the scale path. */
  def rfmSegmentsSingleTask(events: DataFrame): DataFrame = {
    val perUser = events.groupBy("user_id").agg(
      max(col("ts_us")).as("last_ts_us"),
      count(lit(1)).as("n_events"),
      dsum(col("value")).as("monetary"))
    def q(metric: String) = ntile(4).over(
      Window.orderBy(col(metric).desc, col("user_id"))).cast("long")
    perUser
      .withColumn("r_quartile", q("last_ts_us"))
      .withColumn("f_quartile", q("n_events"))
      .withColumn("m_quartile", q("monetary"))
      .withColumn("segment", concat(
        col("r_quartile").cast("string"), col("f_quartile").cast("string"),
        col("m_quartile").cast("string")))
      .orderBy("user_id")
  }

  /** Windowed ORDERED funnel (the ClickHouse `windowFunnel` shape, B40):
    * per user, the greedy step chain view → click → signup → purchase
    * where every later step must land within `windowUs` of the step-1
    * time — t1 = first view, t_i = first step-i event after t_{i-1} and
    * inside the window. Emits one row per user who entered the funnel,
    * with each reached step's timestamp and the depth.
    *
    * Unlike [[funnel]]'s staged joins, the whole chain is FOUR window
    * expressions over ONE user_id partitioning: sequentially dependent
    * mins (t2 references t1, …) become successive Window operators that
    * all reuse the same exchange — one shuffle total however deep the
    * funnel, never a self-join per step. */
  def windowFunnel(events: DataFrame, windowUs: Long = 86400000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    def stepMin(tpe: String, prev: org.apache.spark.sql.Column) =
      min(when(col("event_type") === tpe &&
        col("ts_us") > prev && col("ts_us") <= col("t1") + windowUs,
        col("ts_us"))).over(byUser)
    events
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_us"))).over(byUser))
      .withColumn("t2", stepMin("click", col("t1")))
      .withColumn("t3", stepMin("signup", col("t2")))
      .withColumn("t4", stepMin("purchase", col("t3")))
      .filter(col("t1").isNotNull)
      .select("user_id", "t1", "t2", "t3", "t4")
      .distinct()
      .withColumn("funnel_depth",
        when(col("t4").isNotNull, 4).when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2).otherwise(1).cast("long"))
      .orderBy("user_id")
  }

  def funnel(events: DataFrame): DataFrame = {
    val perUser = events.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts_us"))).as("s0"))
    val c0 = perUser
      .join(events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cts")), Seq("user_id"))
      .filter(col("cts") > col("s0"))
      .groupBy("user_id").agg(min("cts").as("c0"))
    val p0 = c0
      .join(events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("pts")), Seq("user_id"))
      .filter(col("pts") > col("c0"))
      .groupBy("user_id").agg(min("pts").as("p0"))
    perUser
      .join(c0, Seq("user_id"), "left")
      .join(p0, Seq("user_id"), "left")
      .agg(
        count(col("s0")).as("n_signup"),
        count(col("c0")).as("n_click_after_signup"),
        count(col("p0")).as("n_purchase_after_click"))
  }

  /** Weekly cohort retention: users bucketed by first-activity week,
    * distinct actives per (cohort_week, week_offset). */
  def cohortRetention(events: DataFrame): DataFrame = {
    val first = events.groupBy("user_id").agg(min("ts_us").as("f"))
    events.select("user_id", "ts_us")
      .join(first, "user_id")
      .select(
        expr("CAST(f DIV 604800000000 AS BIGINT)").as("cohort_week"),
        expr("CAST((ts_us - f) DIV 604800000000 AS BIGINT)").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Set operation: users who clicked but never purchased (EXCEPT ≡
    * left-anti on distinct keys). */
  def clickersWhoNeverPurchased(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click").select("user_id").distinct()
      .except(events.filter(col("event_type") === "purchase").select("user_id").distinct())
      .orderBy("user_id")

  /** Per-user channel profile: breadth + a deterministic string rendering
    * of the distinct channel set (strings, not arrays, so every engine
    * renders it identically). */
  def userChannelProfile(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") =!= "purchase")
      .groupBy("user_id")
      .agg(
        countDistinct("event_type").cast("int").as("n_channels"),
        array_join(sort_array(collect_set(col("event_type"))), ",").as("channels"))
      .orderBy("user_id")

  /** ROLLUP aggregation: per (event_type, date) subtotals, per event_type
    * totals, and a grand total in one pass (GROUPING SETS). */
  def eventsRollup(events: DataFrame): DataFrame =
    events
      .rollup(col("event_type"), col("event_date"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("event_date"))

  /** Dense daily series per event type — the date-spine gap-fill ETL
    * shape: a generated complete day spine (corpus min..max date) cross
    * joined with the type dimension, left-joined to the actual daily
    * aggregate, gaps zero-filled. The spine is `sequence()`-generated
    * (rows are born distributed, no driver loop) and the aggregate is
    * computed BEFORE the join, so the outer join touches |types|×|days|
    * rows, not raw events. */
  def eventsDailyDense(events: DataFrame): DataFrame = {
    val daily = events.groupBy("event_type", "event_date")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    val bounds = events.agg(
      min("event_date").as("d0"), max("event_date").as("d1"))
    val spine = bounds.select(
      explode(expr("sequence(d0, d1, interval 1 day)")).as("event_date"))
    val types = events.select("event_type").distinct()
    spine.crossJoin(types)
      .join(daily, Seq("event_type", "event_date"), "left")
      .select(
        col("event_type"), col("event_date"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("event_type", "event_date")
  }

  /** Promotion revenue share (TPC-H Q14 shape): conditional aggregation
    * over a broadcast dimension join — the share of discounted revenue
    * from ECONOMY-type parts in one month. Both the conditional and the
    * total sum come out of a single pass. */
  def q14PromoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          dsum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0.0))) /
          dsum(rev)).as("promo_revenue"))
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems below 20% of
    * their part's average quantity. The correlation decorrelates into a
    * per-part aggregate joined back to the fact — one extra shuffle on
    * l_partkey instead of a per-row subquery. */
  def q17SmallQuantityRevenue(lineitem: DataFrame): DataFrame = {
    val lim = lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(((dsum(col("l_quantity")) / count(lit(1)).cast("double")) * 0.2).as("lim"))
    lineitem
      .join(lim, col("l_partkey") === col("pk") && col("l_quantity") < col("lim"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** Product-profit rollup by (nation, year) — the TPC-H Q9 plan shape
    * adapted to this schema (no `partsupp`: supply cost stands in as
    * `0.6 · p_retailprice · l_quantity`, a broadcast-dim expression with
    * the same join/agg structure). The fact table joins three BROADCAST
    * dims (part filtered on a name token, supplier, nation) and shuffles
    * once for the orders join on l_orderkey, then one partial-agg groupBy
    * on the ~|nations|·|years| key space. */
  def q9ProfitByNation(
      part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      orders: DataFrame, nation: DataFrame, nameToken: String = "widget"): DataFrame =
    lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(part.filter(col("p_name").contains(nameToken))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
      .groupBy("nation", "o_year")
      .agg(dsum(col("amount")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Min-price supplier per part — the TPC-H Q2 correlated-subquery shape
    * (no `partsupp`: the part-supplier offer relation derives from
    * lineitem as each supplier's DECIMAL-exact average unit price per
    * part). The correlated `MIN` is a per-part partial agg joined back by
    * (partkey, price == min) — exact equality is safe because both sides
    * compute the identical decimal-sum/one-division tree. Region
    * restriction lands on the broadcast supplier→nation dim; the only
    * fact shuffle is the (part, supplier) offer rollup. */
  def q2MinPriceSupplier(
      part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      nation: DataFrame, region: DataFrame,
      marketRegion: String = "EUROPE", partType: String = "STANDARD"): DataFrame = {
    val suppGeo = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === marketRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val offers = lineitem
      .join(broadcast(suppGeo.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part.filter(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg((dsum(col("l_extendedprice")) / dsum(col("l_quantity"))).as("unit_price"))
    val minOffer = offers
      .groupBy(col("p_partkey").as("mp"))
      .agg(min(col("unit_price")).as("min_price"))
    offers
      .join(broadcast(minOffer),
        col("p_partkey") === col("mp") && col("unit_price") === col("min_price"))
      .join(broadcast(suppGeo), offers("l_suppkey") === suppGeo("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name").as("nation"),
        col("p_partkey"), col("unit_price"))
      .orderBy(col("s_acctbal").desc, col("nation"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Important-parts filter — the TPC-H Q11 shape (group totals kept only
    * above a fraction of the GLOBAL total): per-part revenue from one
    * nation's suppliers, kept above `mult ×` the MEAN per-part share
    * (Q11's literal fraction is spec-scaled by 1/SF; the mean-share form
    * is the scale-free equivalent, biting identically at every corpus
    * size). The global (total, part count) scalar is a one-row broadcast
    * cross join (never a driver collect); both sides of the comparison
    * reuse the same per-part partial agg. */
  def q11ImportantParts(
      supplier: DataFrame, lineitem: DataFrame, nation: DataFrame,
      targetNation: String = "NATION_3", mult: Double = 2.0): DataFrame = {
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === targetNation)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = lineitem
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("part_value"))
    val total = perPart.agg(
      dsum(col("part_value")).as("grand_total"),
      count(lit(1)).cast("double").as("npart"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > lit(mult) * col("grand_total") / col("npart"))
      .select("l_partkey", "part_value")
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** Shipping-delay priority counts — the TPC-H Q12 shape (per-class
    * URGENT/non-urgent conditional counts): lineitems bucket by their
    * ship delay vs the order date in RAW MICROSECONDS (synthetic data
    * ships some items before the order date — thresholds on the signed
    * diff, no division, bit-identical cross-engine), urgent = priority
    * 1-URGENT/2-HIGH. One orders join (the fact shuffle) + one
    * three-row groupBy. */
  def q12ShippingPriority(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val day: Long = 86400000000L
    // parquet stores TIMESTAMP_NTZ; the UTC session makes the cast exact
    val diff = unix_micros(col("l_shipdate").cast("timestamp")) -
      unix_micros(col("o_orderdate").cast("timestamp"))
    val urgent = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    lineitem.select("l_orderkey", "l_shipdate")
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        when(diff < lit(30L * day), "FAST")
          .when(diff < lit(90L * day), "MEDIUM")
          .otherwise("SLOW").as("ship_class"),
        when(urgent, 1L).otherwise(0L).as("is_urgent"))
      .groupBy("ship_class")
      .agg(
        sum(col("is_urgent")).as("high_line_count"),
        sum(lit(1L) - col("is_urgent")).as("low_line_count"))
      .orderBy("ship_class")
  }

  /** Supplier counts by part attribute — the TPC-H Q16 shape (DISTINCT
    * suppliers per (brand, type, size) with a NOT-IN supplier exclusion):
    * the excluded set (here `s_acctbal < 1000` standing in for the
    * complaints LIKE) is a broadcast anti-join; the distinct count
    * shuffles the (attrs, suppkey) pairs once. */
  def q16SupplierCounts(
      part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      excludeBrand: String = "Brand#5", minAcctbal: Double = 1000.0): DataFrame =
    lineitem.select("l_partkey", "l_suppkey")
      .join(broadcast(part.filter(col("p_brand") =!= excludeBrand)
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.filter(col("s_acctbal") < minAcctbal)
        .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** Suppliers who kept orders waiting — the TPC-H Q21 EXISTS/NOT-EXISTS
    * chain: finished multi-supplier orders where exactly ONE supplier
    * shipped late (≥ 80 days after the order date), counted against that
    * supplier (restricted to one nation). Both EXISTS conditions collapse
    * into ONE per-order partial agg — distinct suppliers and distinct
    * LATE suppliers — re-joined to the late rows; the fact shuffles once
    * on l_orderkey for the agg and once for the re-join, never
    * per-subquery. */
  def q21WaitingSuppliers(
      supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
      nation: DataFrame, targetNation: String = "NATION_3"): DataFrame = {
    val lateUs = 80L * 86400000000L
    val li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", // NTZ → UTC-session cast, as in q12
        unix_micros(col("l_shipdate").cast("timestamp")) -
          unix_micros(col("o_orderdate").cast("timestamp")) >= lit(lateUs))
    val perOrder = li
      .groupBy(col("l_orderkey").as("agg_ok"))
      .agg(
        countDistinct(col("l_suppkey")).as("nsupp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("nlate"))
    li.filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("agg_ok"))
      .filter(col("nsupp") >= 2 && col("nlate") === 1)
      .join(broadcast(supplier
        .join(broadcast(nation.filter(col("n_name") === targetNation)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Daily-revenue trend per order priority — closed-form distributed
    * OLS: regress each priority class's daily revenue on the day index
    * and report slope / intercept / R² (slope and intercept in CENTS —
    * the exact-integer domain). The whole regression is two partial-agg
    * passes (daily cents rollup, then the five integer moment sums Σx,
    * Σy, Σxy, Σx², Σy²) and a final row of arithmetic —
    * no iteration, no solver, no driver-side math: the moments ARE the
    * model, which is why this scales to any number of groups at 100 TB.
    * R² uses the squared-correlation form, so the only operations are
    * +, −, ×, ÷ on deterministic values — bit-identical cross-engine
    * (no sqrt needed). */
  def revenueTrendOls(orders: DataFrame): DataFrame = {
    // the ENTIRE moment computation stays in exact integers: day index ×
    // daily revenue in cents (prices are exact cents, so the ×100 cast
    // is lossless). No double product ever meets a decimal cast — the
    // one per-engine rounding step is the final exact-integer → double
    // conversion, which IEEE rounds identically everywhere.
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    val daily = orders
      .select(col("o_orderpriority").as("priority"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("x"),
        col("o_totalprice"))
      .groupBy("priority", "x")
      .agg((sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(27, 6)))
        * 100).cast("long").as("yc"))
    val m0 = daily.groupBy("priority").agg(
      count(lit(1)).as("n_days"),
      sum(col("x")).as("isx"),
      sum(col("yc").cast(dec)).as("isy"),
      sum(col("x").cast(dec) * col("yc").cast(dec)).as("isxy"),
      sum(col("x") * col("x")).as("isxx"),
      sum(col("yc").cast(dec) * col("yc").cast(dec)).as("isyy"))
    val m = m0.select(col("priority"), col("n_days"),
      col("n_days").cast("double").as("n"),
      col("isx").cast("double").as("sx"), col("isy").cast("double").as("sy"),
      col("isxy").cast("double").as("sxy"), col("isxx").cast("double").as("sxx"),
      col("isyy").cast("double").as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    // explicit nulls on degenerate groups (single day / zero y-variance)
    // rather than ANSI divide-by-zero; identical CASE trees in the oracle.
    // slope/intercept are in CENTS (per day / level), matching yc.
    val slope = when(denx === 0.0, lit(null)).otherwise(num / denx)
    m.select(
      col("priority"), col("n_days"),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
      when(denx * deny === 0.0, lit(null)).otherwise((num * num) / (denx * deny))
        .as("r2"))
      .orderBy("priority")
  }

  /** Excess-stock promo suppliers — the TPC-H Q20 nested-semi-join shape
    * (no `partsupp`: a supplier "holds excess stock" of a PROMO part when
    * their shipped quantity of it exceeds `mult ×` the per-(supplier,
    * part) average for that part). The inner correlated aggregate
    * collapses into one per-(part, supplier) partial agg — the single
    * fact shuffle — whose per-part rollup (≤ |parts| rows) joins back
    * BROADCAST; the supplier dim restriction (one nation) is a broadcast
    * semi at the end. Never a per-subquery fact pass. */
  def q20PromoSuppliers(
      part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      nation: DataFrame, targetNation: String = "NATION_3",
      partType: String = "PROMO", mult: Double = 2.0): DataFrame = {
    val sp = lineitem
      .join(broadcast(part.filter(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(dsum(col("l_quantity")).as("qty"))
    val perPart = sp.groupBy(col("l_partkey").as("pk"))
      .agg(dsum(col("qty")).as("tot"), count(lit(1)).cast("double").as("nsupp"))
    sp.join(broadcast(perPart), col("l_partkey") === col("pk"))
      .filter(col("qty") > lit(mult) * (col("tot") / col("nsupp")))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_excess_parts"), dsum(col("qty")).as("excess_qty"))
      .join(broadcast(supplier
        .join(broadcast(nation.filter(col("n_name") === targetNation)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "n_excess_parts", "excess_qty")
      .orderBy("s_name")
  }

  /** Dedup-by-key (keep the latest event per user) — the ETL staple.
    * rn = 1 over (ts desc, id desc); Spark's WindowGroupLimit prunes to
    * one row per key per partition BEFORE the shuffle, so this is
    * max-struct-cheap at any scale. */
  def latestEventPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts_us", "event_type", "value")
      .orderBy("user_id")
  }

  /** Activity heatmap by (day-of-week, hour-of-day) — datetime bucketing
    * done in epoch arithmetic (`1970-01-01` was a Thursday, hence the +4
    * rotation to Sunday=0), which is bit-identical in every engine; SQL
    * `dayofweek`-style functions number days differently across engines. */
  def eventsDowHourHeatmap(events: DataFrame): DataFrame =
    events
      .select(
        expr("(ts_us DIV 86400000000 + 4) % 7").as("dow"),
        expr("(ts_us % 86400000000) DIV 3600000000").as("hour"),
        col("value"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("dow", "hour")

  /** CUBE aggregation: all four grouping sets over (event_type,
    * event_date) in one pass — the full-lattice sibling of
    * [[eventsRollup]]. */
  def eventsCube(events: DataFrame): DataFrame =
    events
      .cube(col("event_type"), col("event_date"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("event_date"))

  /** Mixed GROUPING SETS (B42): daily detail per (type, date), per-type
    * totals, AND a day-of-week profile in ONE pass over the events — the
    * shape neither ROLLUP nor CUBE can express (dow is not drawn from a
    * prefix lattice of (type, date)). One scan feeds all three
    * aggregation granularities; the grouping-id columns disambiguate
    * which set a row belongs to. */
  def eventsGroupingSets(events: DataFrame): DataFrame = {
    val withDow = events.select(
      col("event_type"), col("event_date"),
      expr("(ts_us DIV 86400000000 + 4) % 7").as("dow"), col("value"))
    withDow
      .groupingSets(
        Seq(
          Seq(col("event_type"), col("event_date")),
          Seq(col("event_type")),
          Seq(col("dow"))),
        col("event_type"), col("event_date"), col("dow"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("event_date"),
        asc_nulls_first("dow"))
  }

  /** INTERSECT set operation — the missing third of the set-op family
    * (EXCEPT is [[clickersWhoNeverPurchased]], UNION is everywhere):
    * users who BOTH clicked and purchased. Distinct + intersect plans as
    * a left-semi over aggregated sides — no row explosion. */
  def clickersWhoPurchased(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click").select("user_id").distinct()
      .intersect(
        events.filter(col("event_type") === "purchase").select("user_id").distinct())
      .orderBy("user_id")

  /** Trailing 30-day moving average of order value per customer — a
    * RANGE-frame window (event-time interval, not row count), ordered on
    * epoch-µs so the frame bound is plain integer arithmetic in every
    * engine. Decimal-exact sum ÷ count keeps the average bit-stable under
    * any evaluation order. */
  def ordersMovingAvg(orders: DataFrame, windowUs: Long = 2592000000000L): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      // parquet stores TIMESTAMP_NTZ; the UTC session makes the cast's
      // wall-clock reading identical to DuckDB's epoch_us
      .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
      .rangeBetween(-windowUs, 0)
    orders.select(
      col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("date").as("order_date"),
      (sum(col("o_totalprice").cast(DecimalType(27, 6))).over(w).cast("double") /
        count(lit(1)).over(w).cast("double")).as("avg_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ABC / Pareto customer classification: customers ranked by revenue
    * descending, classified by the CUMULATIVE revenue share up to and
    * including them — A ≤ 70%, B ≤ 90%, C the tail (the classic
    * inventory/CRM segmentation). The running total is the
    * [[Quantiles.withExactPrefixSum]] distributed prefix sum — the naive
    * unpartitioned running-sum window is the single-task OOM shape the
    * exact-rank machinery exists to avoid, and the prefix-sum sibling
    * applies the identical range-bucket pattern (per-bucket decimal
    * subtotals → broadcast offsets → bucket-local running sums).
    * Decimal-exact accumulation keeps every share bit-stable at any
    * parallelism. */
  def abcClassification(orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("revenue"))
    Quantiles.withExactPrefixSum(perCust, Nil,
        Seq(("revenue", false), ("o_custkey", true)), "revenue", "__cum", "__tot")
      .withColumn("cum_share", col("__cum").cast("double") / col("__tot").cast("double"))
      .withColumn("abc_class",
        when(col("cum_share") <= 0.7, "A")
          .when(col("cum_share") <= 0.9, "B").otherwise("C"))
      .select(col("o_custkey"), col("revenue"), col("cum_share"), col("abc_class"))
      .orderBy(col("revenue").desc, col("o_custkey"))
  }

  /** Year-over-year monthly revenue growth — the reporting staple the
    * moving-average window can't express: each month joined to the month
    * EXACTLY 12 months earlier by date arithmetic (`add_months`), not a
    * lag-12 row window, so gaps in the month sequence can never silently
    * compare the wrong periods. growth = (rev − prev)/prev, NULL when no
    * prior-year month exists (the ÷0-style rule the reference's CPO/ROAS
    * columns use).
    *
    * Scale shape: one partial-agg groupBy collapses the fact table to
    * |months| rows; the self-join and output sort run on that bounded
    * frame. Revenue sums ride the decimal-exact [[graft.functions.Exact]]
    * pattern so growth ratios are bit-stable. */
  def yoyGrowth(orders: DataFrame): DataFrame = {
    val monthly = orders
      .select(trunc(col("o_orderdate").cast("date"), "month").as("month"),
        col("o_totalprice"))
      .groupBy("month").agg(dsum(col("o_totalprice")).as("revenue"))
    val prev = monthly.select(
      add_months(col("month"), 12).as("month"),
      col("revenue").as("prev_year_revenue"))
    monthly.join(prev, Seq("month"), "left")
      .withColumn("yoy_growth",
        when(col("prev_year_revenue").isNotNull,
          (col("revenue") - col("prev_year_revenue")) / col("prev_year_revenue")))
      .select("month", "revenue", "prev_year_revenue", "yoy_growth")
      .orderBy("month")
  }

  /** Market-basket pair mining over order lines: support / confidence /
    * lift for every co-purchased part pair (a<b), the association-rule
    * statistics a merchandising or data-mixture pipeline reads.
    *
    * Scale shape: orders collapse to one sorted-distinct-items BASKET row
    * each (one groupBy shuffle — the only pass over raw lineitem), and
    * that collapsed frame is localCheckpointed ONCE (~1% of lineitem
    * bytes: a handful of ints per order) to serve all three statistics.
    * Pairs then generate ROW-LOCALLY inside each basket (a codegen'd
    * slice/transform over the sorted array — Σ basket², bounded by max
    * basket size, linear in orders) instead of the previous okey
    * self-join, which shuffled the (order, item) frame twice more and
    * re-derived the distinct per consumer (measured 1.48 s → the join +
    * 3 re-aggregations dominated). Per-item counts and the order total
    * are partial-agg groupBys over the SAME checkpoint; the total rides
    * in as a ONE-ROW broadcast (never a driver scalar), and the `topK`
    * cut is TakeOrdered, not a global sort.
    * Determinism: all counts are exact longs; support/confidence/lift
    * are single IEEE divisions of exact integers, ties on the output
    * order break (lift desc, n_ab desc, item_a, item_b). */
  def basketLift(lineitem: DataFrame, minPairCount: Long = 3, topK: Int = 100): DataFrame = {
    val baskets = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .groupBy("okey").agg(sort_array(collect_set(col("item"))).as("items"))
      .localCheckpoint() // one materialization serves pairs, item counts, n_orders
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val itemCounts = baskets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n"))
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |            y -> struct(x AS item_a, y AS item_b))))""".stripMargin)).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.select(col("item").as("item_a"), col("n").as("n_a")), "item_a")
      .join(itemCounts.select(col("item").as("item_b"), col("n").as("n_b")), "item_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("support",
        col("n_ab").cast("double") / col("n_orders").cast("double"))
      .withColumn("confidence",
        col("n_ab").cast("double") / col("n_a").cast("double"))
      .withColumn("lift",
        (col("n_ab").cast("double") * col("n_orders").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .select("item_a", "item_b", "n_ab", "n_a", "n_b", "support", "confidence", "lift")
      .orderBy(col("lift").desc, col("n_ab").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Exponentially-weighted moving average over the daily revenue series:
    * `s_1 = x_1`, `s_t = α·x_t + (1−α)·s_{t−1}` — the classic
    * smoothing/forecast baseline next to [[revenueTrendOls]]'s linear
    * fit.
    *
    * Scale shape: the data-sized work is ONE decimal-exact daily rollup
    * (partial-agg groupBy over all orders); the recurrence then runs
    * driver-side over the CALENDAR-sized day series (bounded metadata,
    * the Markov/OLS collect class — days, not rows). Determinism: day
    * totals are exact decimal sums; the fold applies the same IEEE tree
    * `(α·x) + (β·s)` per step that the oracle's recursive CTE replays,
    * so every smoothed value is bit-equal. */
  def ordersEwma(orders: DataFrame, alpha: Double = 0.3): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val daily = orders
      .select(col("o_orderdate").cast("date").as("day"), col("o_totalprice"))
      .groupBy("day").agg(dsum(col("o_totalprice")).as("revenue"))
      .orderBy("day")
      .collect()
      .map(r => (r.getDate(0), r.getDouble(1)))
    val beta = 1.0 - alpha
    val out = Seq.newBuilder[(java.sql.Date, Double, Double)]
    var s = 0.0
    var first = true
    daily.foreach { case (day, x) =>
      s = if (first) { first = false; x } else (alpha * x) + (beta * s)
      out += ((day, x, s))
    }
    out.result().toDF("day", "revenue", "ewma").orderBy("day")
  }

  /** Autocorrelation function of the daily revenue series at lags
    * 1..maxLag — the seasonality detector that tells you WHICH period
    * (weekly spike at lag 7, monthly at ~30) the B68 index and a
    * forecast's seasonal adjustment should use.
    *
    * Scale shape: the data-sized work is ONE decimal-exact daily rollup;
    * the ACF then runs driver-side over the CALENDAR-sized series (the
    * ordersEwma collect class — days, not rows). Determinism: every sum
    * is a left fold in day order (mean, denominator, each lag's
    * numerator), the identical sequence the oracle's list_reduce over
    * the day-ordered list computes; products/divisions are single IEEE
    * ops on identical doubles. */
  def ordersAutocorrelation(orders: DataFrame, maxLag: Int = 14): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val xs: Array[Double] = orders
      .select(col("o_orderdate").cast("date").as("day"), col("o_totalprice"))
      .groupBy("day").agg(dsum(col("o_totalprice")).as("revenue"))
      .orderBy("day")
      .collect()
      .map(_.getDouble(1))
    val n = xs.length
    var s = 0.0
    xs.foreach(x => s = s + x)
    val mean = s / n.toDouble
    var ss = 0.0
    xs.foreach(x => ss = ss + (x - mean) * (x - mean))
    // degenerate series (under 2 days, or zero variance) have no defined
    // ACF — empty frame, never NaN rows (the Markov degenerate-guard rule)
    if (n < 2 || ss == 0.0)
      return Seq.empty[(Long, Long, Double)].toDF("lag", "n_days", "acf")
    val rows = (1 to maxLag).map { k =>
      var num = 0.0
      var i = 0
      while (i + k < n) { num = num + (xs(i) - mean) * (xs(i + k) - mean); i += 1 }
      (k.toLong, n.toLong, num / ss)
    }
    rows.toDF("lag", "n_days", "acf").orderBy("lag")
  }

  /** A/B experiment readout with WELCH's unequal-variance t-statistic:
    * users hash-split into two arms (deterministic md5 coin — identical
    * assignment on any cluster and any re-run), per-user total purchase
    * revenue compared across arms, with the Welch–Satterthwaite degrees
    * of freedom. No p-value (the t CDF is not bit-reproducible across
    * engines); a consumer thresholds |t| directly.
    *
    * Scale shape: one per-user rollup + ONE conditional aggregate row —
    * all sums are exact fixed-scale DECIMAL (the per-user revenue is
    * DECIMAL(18,6), its square exact in DECIMAL(37,12)), so the arm
    * moments are order-independent and bit-equal to the oracle at any
    * parallelism; the t/dof arithmetic is a fixed IEEE tree on six
    * scalars. Revenue is bounded per user well below the DECIMAL(12,6)
    * ceiling (1e6) — widen the type alongside the oracle if that ever
    * changes. */
  def abTestWelch(events: DataFrame): DataFrame = {
    val d6 = DecimalType(12, 6) // ≤1e6 per-user revenue: product stays DECIMAL(25,12)
    // in Spark and DECIMAL(24,12) in DuckDB — exact in both, no precision-loss
    // rescale (18,6)² would trip Spark's 38-cap and DuckDB's int64 path
    val rev = events.groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0).cast(d6)).cast(d6).as("rev")) // re-narrow: the sum's
      // widened precision would blow the product type past both engines' caps
      .withColumn("arm",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(2L)))
    val ag = rev.agg(
      count(when(col("arm") === 0, 1)).as("n_a"),
      count(when(col("arm") === 1, 1)).as("n_b"),
      sum(when(col("arm") === 0, col("rev"))).cast("double").as("sx_a"),
      sum(when(col("arm") === 1, col("rev"))).cast("double").as("sx_b"),
      // widen one factor so the exact product lands in DECIMAL(~36,12) on
      // BOTH engines (DuckDB's (12,6)² binds to an int64 DECIMAL(18,12)
      // that overflows; Spark's (18,6)² would trip the 38-cap rescale)
      sum(when(col("arm") === 0,
        col("rev").cast(DecimalType(24, 6)) * col("rev"))).cast("double").as("sxx_a"),
      sum(when(col("arm") === 1,
        col("rev").cast(DecimalType(24, 6)) * col("rev"))).cast("double").as("sxx_b"))
    def meanOf(s: String, n: String): Column = col(s) / col(n).cast("double")
    ag
      .withColumn("mean_a", meanOf("sx_a", "n_a"))
      .withColumn("mean_b", meanOf("sx_b", "n_b"))
      .withColumn("var_a",
        (col("sxx_a") - (col("n_a").cast("double") * (col("mean_a") * col("mean_a")))) /
          (col("n_a") - 1).cast("double"))
      .withColumn("var_b",
        (col("sxx_b") - (col("n_b").cast("double") * (col("mean_b") * col("mean_b")))) /
          (col("n_b") - 1).cast("double"))
      .withColumn("se_a", col("var_a") / col("n_a").cast("double"))
      .withColumn("se_b", col("var_b") / col("n_b").cast("double"))
      .withColumn("t_stat",
        (col("mean_a") - col("mean_b")) / sqrt(col("se_a") + col("se_b")))
      .withColumn("dof",
        ((col("se_a") + col("se_b")) * (col("se_a") + col("se_b"))) /
          (((col("se_a") * col("se_a")) / (col("n_a") - 1).cast("double")) +
            ((col("se_b") * col("se_b")) / (col("n_b") - 1).cast("double"))))
      .select("n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b", "t_stat", "dof")
  }

  /** PIVOT: one row per date, one value column per channel (fixed,
    * deterministic column set — never inferred at plan time at scale). */
  def eventsPivot(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_date"))
      .pivot("event_type", Seq("click", "view", "signup", "error", "purchase"))
      .agg(dsum(col("value")))
      .orderBy("event_date")

  /** Exact interpolated percentiles (bit-equal to Spark `percentile` /
    * DuckDB `quantile_cont`) + exact total — computed distributed.
    *
    * Spark's own `percentile(...)` is an ImperativeAggregate that buffers
    * every (value, count) pair in ONE aggregation buffer — an executor OOM
    * at 100 TB of orders. Here the exact rank of every value comes from
    * [[Quantiles.withExactRank]] (range-bucketed, all sorts partitioned),
    * the ≤6 boundary rows are filtered map-side, and the interpolation
    * `(⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi` (Percentile's exact double
    * expression, pos = p·(n−1)) runs on that 6-row frame.
    * [[orderValuePercentilesSingleTask]] pins the semantics. */
  /** One-row exact interpolated quartiles over `(__v double, __k long)`
    * — the distributed [[Quantiles.withExactRank]] machinery shared by
    * [[orderValuePercentiles]] and [[timeToConvertQuantiles]]; emits
    * `__q25/__q50/__q75` with Percentile's exact interpolation tree. */
  private def interpolatedQuartiles(vals: DataFrame): DataFrame = {
    val ranked = Quantiles.withExactRank(
      vals, Nil, Seq(("__v", true), ("__k", true)), "__rk", "__nn",
      materialize = false) // bare pruned scan: re-reading beats checkpointing
    val ps = Seq("25" -> 0.25, "50" -> 0.5, "75" -> 0.75)
    val withPos = ps.foldLeft(ranked) { case (df, (tag, p)) =>
      df.withColumn(s"__pos$tag", lit(p) * (col("__nn") - lit(1L)).cast("double"))
    }
    val needed = ps.map { case (tag, _) =>
      val pos = col(s"__pos$tag")
      col("__rk") === floor(pos).cast("long") + lit(1L) ||
        col("__rk") === ceil(pos).cast("long") + lit(1L)
    }.reduce(_ || _)
    val aggs = ps.flatMap { case (tag, _) =>
      val pos = col(s"__pos$tag")
      Seq(
        max(when(col("__rk") === floor(pos).cast("long") + lit(1L), col("__v")))
          .as(s"__lo$tag"),
        max(when(col("__rk") === ceil(pos).cast("long") + lit(1L), col("__v")))
          .as(s"__hi$tag"),
        max(pos).as(s"__p$tag"))
    }
    def interp(tag: String): Column = {
      val pos = col(s"__p$tag")
      when(floor(pos) === ceil(pos), col(s"__lo$tag"))
        .otherwise((ceil(pos) - pos) * col(s"__lo$tag") +
          (pos - floor(pos)) * col(s"__hi$tag"))
    }
    withPos.filter(needed).agg(aggs.head, aggs.tail: _*)
      .select(interp("25").as("__q25"), interp("50").as("__q50"),
        interp("75").as("__q75"))
  }

  def orderValuePercentiles(orders: DataFrame): DataFrame = {
    val vals = orders.select(col("o_totalprice").as("__v"), col("o_orderkey").as("__k"))
    val totals = orders.agg(dsum(col("o_totalprice")).as("total"))
    interpolatedQuartiles(vals).crossJoin(broadcast(totals)).select(
      col("__q25").as("p25"), col("__q50").as("p50"), col("__q75").as("p75"),
      col("total"))
  }

  /** Time-to-convert distribution: per journey, the µs gap from the
    * FIRST assigned touch to the conversion; exact interpolated
    * quartiles + exact mean over all journeys — the latency lens on the
    * attribution output (how long the funnel actually takes).
    *
    * Scale shape: one journey-partitioned aggregate produces the gap
    * series, then the [[interpolatedQuartiles]] range-bucketed rank
    * machinery — no single-task sort, no Percentile buffer. Mean =
    * exact decimal sum / count, one IEEE division. */
  def timeToConvertQuantiles(assigned: DataFrame): DataFrame = {
    // checkpointed once for the same reason as [[touchGapQuantiles]]:
    // the journey-assignment chain under `assigned` must not re-run per
    // rank-machinery pass
    val gaps = Materialize(assigned
      .groupBy("conv_id")
      .agg((min(col("conv_ts_us")) - min(col("ts_us"))).cast("double").as("__v"))
      .select(col("__v"), col("conv_id").as("__k")))
    val summary = gaps.agg(
      count(lit(1)).as("n_journeys"),
      (dsum(col("__v")) / count(lit(1)).cast("double")).as("avg_us"))
    interpolatedQuartiles(gaps).crossJoin(broadcast(summary)).select(
      col("n_journeys"),
      col("__q25").as("p25_us"), col("__q50").as("p50_us"), col("__q75").as("p75_us"),
      col("avg_us"))
  }

  /** Single-task reference form of [[orderValuePercentiles]] (Spark's
    * one-buffer `percentile` aggregate) — spec-pinned semantic oracle. */
  def orderValuePercentilesSingleTask(orders: DataFrame): DataFrame =
    orders.agg(
      expr("percentile(o_totalprice, 0.25)").as("p25"),
      expr("percentile(o_totalprice, 0.5)").as("p50"),
      expr("percentile(o_totalprice, 0.75)").as("p75"),
      dsum(col("o_totalprice")).as("total"))

  /** Order-priority counts over orders with a late shipment — EXISTS
    * subquery as a left-semi join (TPC-H Q4 shape, adapted to this
    * schema's columns: "late" = any lineitem shipped after the order
    * date). The semi join never materializes matched lineitem columns. */
  def q4OrderPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .join(lineitem.select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT JOIN with a
    * join-side predicate (not a WHERE — customers with zero matching
    * orders must survive with c_count = 0), then the distribution of
    * per-customer counts. Two aggregations, each one shuffle. */
  def q13CustDist(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select("c_custkey")
      .join(orders.filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Two-phase salted aggregation — the skew-mitigation pattern as a
    * first-class operator: phase 1 aggregates (key, salt) so a hot key's
    * rows spread over `nSalts` reducers; phase 2 merges the tiny partials.
    * Decimal partials make the merge exact, so the result is bit-equal to
    * the direct single-phase aggregate (which is what the oracle runs). */
  def saltedChannelAgg(events: DataFrame, nSalts: Int = 16): DataFrame =
    events
      .withColumn("__salt", pmod(hash(col("event_id")), lit(nSalts)))
      .groupBy("event_type", "__salt")
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(27, 6))).as("pv"))
      .groupBy("event_type")
      .agg(
        sum("pn").as("n"),
        sum("pv").cast("double").as("total_value"))
      .orderBy("event_type")

  /** Wide denormalizing enrichment join (classic ETL shape) — every
    * dimension broadcast, zero shuffles on the fact side. */
  def ordersEnrich(
      orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("o_orderkey", "o_orderdate", "o_totalprice",
        "c_name", "c_mktsegment", "n_name", "r_name")
      .orderBy("o_orderkey")

  /** One-pass table profile — the data-quality gate of an ETL landing
    * zone: row/null/distinct counts, value ranges, and an exact checksum
    * column in a single aggregate over the table. Distinct counts expand
    * map-side and partial-aggregate like any groupBy; nothing is driver
    * bound, so profiling a 100 TB table is one scan. */
  def dataProfile(orders: DataFrame): DataFrame =
    orders.agg(
      count(lit(1)).as("n_rows"),
      count(col("o_custkey")).as("custkey_nonnull"),
      countDistinct(col("o_custkey")).as("n_customers"),
      countDistinct(col("o_orderstatus")).as("n_statuses"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"),
      dsum(col("o_totalprice")).as("sum_price"),
      min(col("o_orderdate")).as("first_order"),
      max(col("o_orderdate")).as("last_order"))

  /** Trailing z-score anomaly detection on daily event volumes — the
    * monitoring staple over a metrics stream: each (event_type, day)'s
    * count against the mean/std of its own trailing 7 closed days.
    * Integer count sums make mean and variance inputs exact (the frame
    * sums longs, not doubles); the variance/σ/z computation is then one
    * identical IEEE tree on both engines, so even `is_anomaly` at the
    * |z|>2 boundary cannot flip. Warmup rows (<3 trailing days) are
    * dropped rather than scored against noise.
    *
    * Scale shape: one partial-agg daily rollup, then ONE window keyed by
    * event_type over |types|×|days| rows — already-aggregated data,
    * never raw events, so the window input is millions of rows at most
    * even when the event stream is 100 TB. */
  def eventsAnomaly(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), col("event_date"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("event_date")
      .rowsBetween(-7, -1)
    daily
      .withColumn("w_n", count(col("n")).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_sumsq", sum(col("n") * col("n")).over(w))
      .filter(col("w_n") >= 3)
      .withColumn("mean7", col("w_sum").cast("double") / col("w_n").cast("double"))
      .withColumn("var7",
        col("w_sumsq").cast("double") / col("w_n").cast("double") -
          col("mean7") * col("mean7"))
      .withColumn("std7", sqrt(greatest(col("var7"), lit(0.0))))
      .withColumn("zscore",
        when(col("std7") > 0.0,
          (col("n").cast("double") - col("mean7")) / col("std7"))
          .otherwise(lit(0.0)))
      .select(col("event_type"), col("event_date"), col("n"),
        col("mean7"), col("std7"), col("zscore"),
        (abs(col("zscore")) > 2.0).as("is_anomaly"))
      .orderBy("event_type", "event_date")
  }

  /** Bilateral nation-pair trade volume by ship year (TPC-H Q7 shape).
    * The disjunctive nation-pair predicate is applied AFTER the two
    * broadcast nation lookups, so the fact side still sees only hash
    * joins against broadcast dims and the pair filter is a cheap map-side
    * predicate — no join-condition OR that would force a nested loop. */
  def q7VolumeShipping(
      supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** National market share inside one region's PROMO-part trade by order
    * year (TPC-H Q8 shape). Share = Σ(target-nation volume)/Σ(volume),
    * both sums decimal-exact so the double division is bit-deterministic
    * regardless of shuffle order. */
  def q8MarketShare(
      part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
      orders: DataFrame, customer: DataFrame, nation: DataFrame,
      region: DataFrame, targetNation: String = "NATION_3",
      marketRegion: String = "EUROPE", partType: String = "PROMO"): DataFrame = {
    val custNations = nation
      .join(broadcast(region.filter(col("r_name") === marketRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNations = nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val vol = lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(part.filter(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("c_nk"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNations), col("s_nationkey") === col("s_nk"))
      .select(year(col("o_orderdate")).as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        col("supp_nation"))
    vol.groupBy("o_year")
      .agg(
        (dsum(when(col("supp_nation") === targetNation, col("volume")).otherwise(lit(0.0))) /
          dsum(col("volume"))).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Top returned-revenue customers in a quarter (TPC-H Q10 shape). The
    * returnflag filter lands on the lineitem scan (PushedFilters), the
    * orderdate window on the orders scan; customer+nation broadcast. */
  def q10ReturnedItems(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      nation: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(orders
        .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Supplier(s) achieving the maximum quarterly revenue (TPC-H Q15
    * shape). The revenue aggregate shuffles once on l_suppkey; the
    * "= max" scalar subquery becomes a one-row max aggregate attached by
    * broadcast cross join — no second scan of lineitem, no driver round
    * trip, and (unlike an unpartitioned window max) no plan step that
    * funnels the |suppliers|-row aggregate through a single task. */
  def q15TopSupplier(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      .transform(Materialize(_)) // one materialization feeds the max and the probe
    rev
      .crossJoin(broadcast(rev.agg(max(col("total_revenue")).as("__mx"))))
      .filter(col("total_revenue") === col("__mx"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** Large-volume orders: customers whose single order exceeds a quantity
    * threshold (TPC-H Q18 shape). The HAVING subquery is one partial-agg
    * groupBy on the fact table; qualifying orderkeys are a tiny frame
    * joined back broadcast — lineitem is scanned twice but shuffled on
    * l_orderkey only once (the second pass joins broadcast). */
  def q18LargeVolume(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minQty: Double = 250.0): DataFrame = {
    val bigOrders = lineitem
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders
      .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Disjunctive brand/size/quantity revenue (TPC-H Q19 shape). The
    * OR-of-ANDs predicate references both sides, but each disjunct's
    * part-only conjuncts (brand, size) are pushed into the broadcast dim
    * scan by Catalyst's predicate-through-join rewrite; quantity bounds
    * prune the fact scan via the derived l_quantity range. */
  def q19DiscountedRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val joined = lineitem
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
    joined.filter(
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 11.0)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10.0, 20.0)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(1, 25) &&
        col("l_quantity").between(20.0, 30.0)))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Well-funded customers with no RECENT order, by market segment (TPC-H
    * Q22 shape; the date window plays the role of Q22's "7-year dormancy").
    * The scalar avg threshold is a one-row broadcast cross join (not a
    * collect); "no recent order" is a left-anti against the distinct
    * custkeys of windowed orders — an aggregate-then-anti that shuffles
    * orders once on o_custkey and keeps the anti-join key-local. The avg
    * is decimal-sum/count so the threshold is shuffle-order-independent. */
  def q22GlobalSales(customer: DataFrame, orders: DataFrame): DataFrame = {
    val threshold = customer
      .filter(col("c_acctbal") > 0.0)
      .agg((dsum(col("c_acctbal")) / count(lit(1)).cast("double")).as("__avg_bal"))
    customer
      .crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("__avg_bal"))
      .join(orders
        .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey").distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** Day-of-week seasonality index over order revenue: each weekday's
    * share of total revenue scaled by 7, so 1.0 = a flat week and the
    * index reads directly as over/under-trading — the calendar profile a
    * forecast (B52/B61) is seasonally adjusted with.
    *
    * dow is 0 = Sunday … 6 = Saturday (Spark `dayofweek` − 1 ≡ DuckDB
    * `dayofweek`). One partial-agg groupBy to 7 rows; the total rides in
    * as a one-row broadcast; share/index are divisions of exact decimal
    * sums. */
  def ordersSeasonality(orders: DataFrame): DataFrame = {
    val byDow = orders
      .select((dayofweek(col("o_orderdate").cast("date")) - 1).cast("long").as("dow"),
        col("o_totalprice"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    val total = byDow.agg(dsum2(col("revenue")).as("total_revenue"))
    byDow.crossJoin(broadcast(total))
      .withColumn("revenue_share", col("revenue") / col("total_revenue"))
      .withColumn("seasonality_index", col("revenue_share") * 7.0)
      .select("dow", "n_orders", "revenue", "revenue_share", "seasonality_index")
      .orderBy("dow")
  }

  /** Exact re-sum of already-exact per-group decimal sums (the totals are
    * scale-6-exact doubles, so the re-cast is lossless). */
  private def dsum2(c: Column): Column =
    sum(c.cast(DecimalType(27, 6))).cast("double")

  /** Customer-lifetime-value deciles: customers ranked by total order
    * value, rolled up per decile (count, total, mean LTV) — the
    * concentration readout behind every "top-decile drives X% of
    * revenue" statement, exact rather than sampled.
    *
    * The global rank uses the distributed range-bucketed
    * [[Quantiles.withExactRank]] (never a single-task window); the
    * decile is integer arithmetic ((rank−1)·10 div n); the rollup is one
    * 10-row agg. Ties break on custkey, so the decile assignment is
    * deterministic cross-engine. */
  def customerLtvDeciles(orders: DataFrame): DataFrame = {
    val ltv = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(dsum(col("o_totalprice")).as("ltv"))
    val ranked = Quantiles.withExactRank(
      ltv, group = Nil, order = Seq(("ltv", true), ("custkey", true)),
      rankCol = "rk", nCol = "n")
    ranked
      .withColumn("decile", expr("((rk - 1) * 10) div n"))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("ltv")).as("total_ltv"))
      .withColumn("avg_ltv", col("total_ltv") / col("n_customers").cast("double"))
      .orderBy("decile")
  }

  /** Within-journey inter-touch gap distribution: exact interpolated
    * quartiles + exact mean of the µs gaps between CONSECUTIVE touches in
    * converting journeys — the cadence complement of B64's
    * first-touch-to-conversion span (how often the funnel touches, not
    * just how long it runs; the number that sizes a session-timeout or
    * retargeting window).
    *
    * One journey-partitioned lead() pass produces the gap series; then
    * the shared [[interpolatedQuartiles]] range-bucketed rank machinery —
    * no single-task sort, no Percentile buffer. */
  def touchGapQuantiles(assigned: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("ts_us", "session_id")
    // checkpoint the 2-column gap series ONCE: its input is the full
    // journey-assignment window chain, and the rank machinery (sample,
    // counts, ranked output) plus the summary agg would otherwise
    // recompute that chain four times (interpolatedQuartiles's
    // materialize=false is tuned for bare pruned scans, not chains)
    val gaps = Materialize(assigned
      .withColumn("nxt", lead("ts_us", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select((col("nxt") - col("ts_us")).cast("double").as("__v"),
        col("session_id").as("__k")))
    val summary = gaps.agg(
      count(lit(1)).as("n_gaps"),
      (dsum(col("__v")) / count(lit(1)).cast("double")).as("avg_us"))
    interpolatedQuartiles(gaps).crossJoin(broadcast(summary)).select(
      col("n_gaps"),
      col("__q25").as("p25_us"), col("__q50").as("p50_us"), col("__q75").as("p75_us"),
      col("avg_us"))
  }

  /** Supplier revenue concentration per nation — the Herfindahl–Hirschman
    * index (Σ share², 1/n = perfectly even, 1.0 = monopoly) a supply-
    * chain risk review reads: a nation whose parts revenue concentrates
    * in one supplier is a single point of failure.
    *
    * HHI computes over SHARES (scale-invariant): share = srev/nation
    * revenue (both scale-6-exact doubles, one correctly-rounded
    * division), then Σ share² as an ORDERED double fold in supplier-key
    * order — the bridge-free §3 discipline. The rejected alternative,
    * Σrev²/(Σrev)² in wide decimal, dies on the decimal→double cast: the
    * squares' unscaled values sit far past 2^53, where that conversion
    * is engine-specific in the last ulp (measured 8/25 divergent
    * nations). One revenue rollup shuffle keyed on supplier, a broadcast
    * nation attach, one nation-partitioned window + agg.
    *
    * The share² fold is TWO-LEVEL so no aggregation buffer is
    * proportional to a nation's supplier count: suppliers bucket by
    * `l_suppkey div bucketWidth` (bucket id monotone in suppkey, so the
    * bucket-then-key order IS the global key order), each bucket folds
    * its ≤ bucketWidth shares in suppkey order, then the per-nation fold
    * runs over the bucket subtotals in bucket order — every buffer is
    * ≤ max(bucketWidth, n_buckets) structs, and a third level composes
    * the same way if n/bucketWidth ever gets large. The chain is
    * deterministic at any scale, and whenever a nation's suppliers land
    * in ONE bucket (every test SF: keys ≤ 10⁴ < bucketWidth·1) it is
    * bit-equal to the flat single fold, because the outer chain
    * degenerates to 0.0 + s₁ and adding +0.0 to a positive partial is
    * exact — the spec pins both properties. */
  def supplierHhi(
      supplier: DataFrame, nation: DataFrame, lineitem: DataFrame,
      bucketWidth: Long = 65536L): DataFrame =
    supplierShares(supplier, nation, lineitem)
      .withColumn("bkt", expr(s"l_suppkey div $bucketWidth"))
      .groupBy("n_name", "bkt")
      .agg(
        count(lit(1)).as("nb"),
        max("nrev").as("nrev"),
        aggregate(
          transform(sort_array(collect_list(struct(col("l_suppkey"), col("share")))),
            s => s.getField("share")),
          lit(0.0), (acc, sh) => acc + sh * sh).as("s"))
      .groupBy("n_name")
      .agg(
        sum("nb").as("n_suppliers"),
        max("nrev").as("revenue"),
        aggregate(
          transform(sort_array(collect_list(struct(col("bkt"), col("s")))),
            b => b.getField("s")),
          lit(0.0), (acc, s) => acc + s).as("hhi"))
      .select("n_name", "n_suppliers", "revenue", "hhi")
      .orderBy("n_name")

  /** The (n_name, l_suppkey, srev, nrev, share) frame [[supplierHhi]]
    * folds over — exposed so the fold-chain spec can recompute the flat
    * and bucketed chains driver-side against the engine's OWN shares. */
  private[graft] def supplierShares(
      supplier: DataFrame, nation: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .groupBy("l_suppkey")
      .agg(dsum(col("r")).as("srev"))
      .join(broadcast(supplier.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))),
        "l_suppkey")
      .join(broadcast(nation.select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
        "s_nationkey")
      .withColumn("nrev",
        sum(col("srev").cast(DecimalType(27, 6)))
          .over(Window.partitionBy("n_name")).cast("double"))
      .withColumn("share", col("srev") / col("nrev"))

  /** Hour-of-day activity profile over the raw event stream (share × 24 =
    * the activity index; 1.0 = flat day) — the intra-day twin of B68's
    * weekday index, read when sizing streaming capacity and batch
    * windows. Hour = integer µs arithmetic, identical in both engines. */
  def eventsHourProfile(events: DataFrame): DataFrame = {
    val byHour = events
      .select(expr("(ts_us % 86400000000) div 3600000000").as("hour"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n_events"))
    val total = byHour.agg(sum("n_events").as("total_events"))
    byHour.crossJoin(broadcast(total))
      .withColumn("share", col("n_events").cast("double") / col("total_events").cast("double"))
      .withColumn("activity_index", col("share") * 24.0)
      .select("hour", "n_events", "share", "activity_index")
      .orderBy("hour")
  }

  /** Purchases-per-user histogram including the ZERO bucket (actives who
    * never bought) — the repeat-purchase shape behind retention and LTV
    * work: a heavy 1-purchase bucket with an empty tail means
    * acquisition without loyalty.
    *
    * Two partial aggs (per-user purchase counts; distinct actives) and a
    * metadata union for the zero bucket. */
  def userPurchaseHistogram(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
    val hist = p.groupBy("n_purchases").agg(count(lit(1)).as("n_users"))
    val actives = events.agg(countDistinct("user_id").as("nu"))
    val purchasers = p.agg(count(lit(1)).as("np"))
    val zeroRow = actives.crossJoin(purchasers)
      .select(lit(0L).as("n_purchases"), (col("nu") - col("np")).as("n_users"))
    hist.unionByName(zeroRow).orderBy("n_purchases")
  }

  /** Per-nation trade balance inside the warehouse: revenue SUPPLIED by
    * a nation's suppliers vs spend DEMANDED by its customers, with the
    * net — the cross-dimension rollup that joins the q5 (demand) and q9
    * (supply) perspectives one level up.
    *
    * Two independent fact rollups (lineitem by supplier nation; orders
    * by customer nation), each with broadcast dims, joined on the
    * |nations|-row key; exact decimal sums, one subtraction. */
  def nationTradeBalance(
      supplier: DataFrame, customer: DataFrame, nation: DataFrame,
      orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val supply = lineitem
      .select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .join(broadcast(supplier.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))),
        "l_suppkey")
      .join(broadcast(nation.select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
        "s_nationkey")
      .groupBy("n_name")
      .agg(dsum(col("r")).as("supply_revenue"))
    val demand = orders
      .select(col("o_custkey"), col("o_totalprice"))
      .join(broadcast(customer.select(col("c_custkey").as("o_custkey"), col("c_nationkey"))),
        "o_custkey")
      .join(broadcast(nation.select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
      .groupBy("n_name")
      .agg(dsum(col("o_totalprice")).as("demand_spend"))
    supply.join(demand, Seq("n_name"), "full_outer")
      .withColumn("supply_revenue", coalesce(col("supply_revenue"), lit(0.0)))
      .withColumn("demand_spend", coalesce(col("demand_spend"), lit(0.0)))
      .withColumn("net_balance", col("supply_revenue") - col("demand_spend"))
      .select("n_name", "supply_revenue", "demand_spend", "net_balance")
      .orderBy("n_name")
  }

  /** One-row data-quality audit over the raw event stream — the landing
    * gate run before anything derives from events: duplicate event ids
    * (every downstream distinct/join silently dedups or fans out on
    * them), null users (unjoinable), negative values (corrupt revenue),
    * unknown event types (schema drift — every derivation here branches
    * on the type vocabulary), and the observed date range (a future or
    * ancient timestamp is an encoding bug, the r7 lesson).
    *
    * One aggregate pass; the duplicate count is rows − distinct ids,
    * partial-aggregable like any distinct. */
  def eventsQualityAudit(events: DataFrame): DataFrame = {
    val knownTypes = Seq("purchase", "click", "view", "signup", "error")
    events.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("n_dup_event_ids"),
      count(when(col("user_id").isNull, 1)).as("n_null_user"),
      count(when(col("value") < 0.0, 1)).as("n_negative_value"),
      count(when(!col("event_type").isin(knownTypes: _*), 1)).as("n_unknown_type"),
      min(col("event_date")).as("min_date"),
      max(col("event_date")).as("max_date"))
  }

  /** Referential-integrity audit across every FK edge of the warehouse —
    * the data-quality gate a 100 TB ingest runs before anything else
    * touches the tables: per relation, total FK rows and how many are
    * ORPHANED (no matching parent key). A nonzero orphan count on any
    * edge means upstream extraction dropped parents and every join-based
    * result downstream silently undercounts.
    *
    * Plan per edge: one left-anti join from fact to the parent's
    * DISTINCT keys — dimension parents (region/nation/customer/supplier/
    * part) broadcast; the one fact-fact edge (lineitem→orders) stays a
    * key-local sort-merge anti on the join key both sides already
    * shuffle by. Each edge aggregates to a single row before the final
    * metadata-sized union — nothing wide ever leaves an executor. */
  def integrityAudit(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, part: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    def edge(
        name: String, fact: DataFrame, fk: String,
        parent: DataFrame, pk: String, broadcastParent: Boolean): DataFrame = {
      val keys = parent.select(col(pk)).distinct()
      val parentSide = if (broadcastParent) broadcast(keys) else keys
      val orphans = fact.select(col(fk))
        .join(parentSide, col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("orphan_rows"))
      val totals = fact.agg(count(lit(1)).as("fk_rows"))
      totals.crossJoin(orphans).select(
        lit(name).as("relation"), col("fk_rows"), col("orphan_rows"))
    }
    edge("lineitem.l_orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey",
        broadcastParent = false)
      .unionByName(edge("lineitem.l_partkey->part", lineitem, "l_partkey",
        part, "p_partkey", broadcastParent = true))
      .unionByName(edge("lineitem.l_suppkey->supplier", lineitem, "l_suppkey",
        supplier, "s_suppkey", broadcastParent = true))
      .unionByName(edge("orders.o_custkey->customer", orders, "o_custkey",
        customer, "c_custkey", broadcastParent = true))
      .unionByName(edge("customer.c_nationkey->nation", customer, "c_nationkey",
        nation, "n_nationkey", broadcastParent = true))
      .unionByName(edge("supplier.s_nationkey->nation", supplier, "s_nationkey",
        nation, "n_nationkey", broadcastParent = true))
      .unionByName(edge("nation.n_regionkey->region", nation, "n_regionkey",
        region, "r_regionkey", broadcastParent = true))
      .orderBy("relation")
  }

  /** Daily stickiness — DAU / trailing-7-day active users, the engagement
    * ratio every growth dashboard tracks (stickiness 1.0 = everyone
    * active today was the whole week's audience; low values = broad but
    * infrequent reach).
    *
    * The trailing-window DISTINCT is the interesting part at scale: count
    * distinct over a sliding range window isn't partial-aggregable, so
    * instead the (user, day) DISTINCT frame (one dedup shuffle, ∝ active
    * user-days, far smaller than events) joins a ±6-day date offset
    * explode — 7 rows per user-day — and a second groupBy counts distinct
    * users per anchor day. Both shuffles key on day/user; nothing is
    * proportional to raw event volume after the first dedup. */
  def userStickiness(events: DataFrame): DataFrame = {
    val userDays = events.select(col("user_id"), col("event_date")).distinct()
    val dau = userDays.groupBy("event_date").agg(count(lit(1)).as("dau"))
    val wau = userDays
      .withColumn("anchor",
        explode(sequence(col("event_date"), date_add(col("event_date"), 6))))
      .groupBy(col("anchor").as("event_date"))
      .agg(countDistinct("user_id").as("wau"))
    // inner join: an anchor day with no activity of its own has dau=0 and
    // is reported only through its neighbors' windows — drop it, matching
    // the dashboard convention (and the oracle)
    dau.join(wau, "event_date")
      .select(col("event_date"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
      .orderBy("event_date")
  }
}
