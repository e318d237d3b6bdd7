package graft

import graft.operators.{Analytics, Dedup, Reporting, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("clickers-no-purchase EXCEPT emits exactly the non-purchasing clickers") {
    // At sf0.01 every clicker also purchases, so the driver gate only ever
    // sees this query produce 0 rows — this golden input proves the EXCEPT
    // path actually emits: users 1 and 3 click without purchasing, user 2
    // clicks and purchases, user 4 only purchases.
    import spark.implicits._
    val ev = Seq(
      (1L, "click"), (1L, "view"),
      (2L, "click"), (2L, "purchase"),
      (3L, "click"), (3L, "click"),
      (4L, "purchase"))
      .toDF("user_id", "event_type")
    val out = Analytics.clickersWhoNeverPurchased(ev).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 3L))
  }

  test("window funnel: ordered chain, window bound enforced, one exchange for all steps") {
    import spark.implicits._
    val H = 86400000000L // the funnel window (24 h in µs)
    val ev = Seq(
      // user 1: full ordered chain inside the window -> depth 4
      (1L, 1L, "view", 0L), (2L, 1L, "click", 1000L),
      (3L, 1L, "signup", 2000L), (4L, 1L, "purchase", 3000L),
      // user 2: click BEFORE the first view must not count -> depth 1
      (5L, 2L, "click", 0L), (6L, 2L, "view", 1000L),
      // user 3: signup lands outside t1+window -> depth 2
      (7L, 3L, "view", 0L), (8L, 3L, "click", 1000L),
      (9L, 3L, "signup", H + 2000L),
      // user 4: never views -> not in the funnel at all
      (10L, 4L, "purchase", 0L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Analytics.windowFunnel(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("funnel_depth")).toMap
    assert(out === Map(1L -> 4L, 2L -> 1L, 3L -> 2L))
    // all four sequentially-dependent window mins share ONE user_id
    // exchange; the only other exchanges are distinct + output ordering
    val plan = Analytics.windowFunnel(ev).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).toSet.size <= 3, plan)
  }

  test("RFM segments: quartiles balanced within 1, best metrics land in quartile 1") {
    val out = Analytics.rfmSegments(Tables.events(spark, sfDir)).collect()
    assert(out.nonEmpty)
    Seq("r_quartile", "f_quartile", "m_quartile").foreach { qc =>
      val sizes = out.groupBy(_.getAs[Long](qc)).view.mapValues(_.length)
      assert(sizes.keySet === Set(1L, 2L, 3L, 4L), s"$qc labels")
      assert(sizes.values.max - sizes.values.min <= 1, s"$qc unbalanced: $sizes")
    }
    val topSpender = out.maxBy(r => (r.getAs[Double]("monetary"), -r.getAs[Long]("user_id")))
    assert(topSpender.getAs[Long]("m_quartile") === 1L)
    out.foreach(r => assert(r.getAs[String]("segment") ===
      s"${r.getAs[Long]("r_quartile")}${r.getAs[Long]("f_quartile")}${r.getAs[Long]("m_quartile")}"))
  }

  test("window funnel depth is monotone in the window size") {
    val events = Tables.events(spark, sfDir)
    val narrow = Analytics.windowFunnel(events, windowUs = 3600000000L).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("funnel_depth")).toMap
    val wide = Analytics.windowFunnel(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("funnel_depth")).toMap
    // same entrants (step 1 has no window constraint); a wider window can
    // only let MORE steps qualify... but not fewer: note this holds for
    // step 2 (its candidate set grows with W) — later steps chain off a
    // possibly-different t2, so only the step-2 level is truly monotone
    assert(narrow.keySet === wide.keySet)
    narrow.foreach { case (u, d) =>
      if (d >= 2) assert(wide(u) >= 2, s"user $u lost step 2 with a wider window")
    }
  }

  test("funnel stages are monotonically non-increasing") {
    val r = Analytics.funnel(Tables.events(spark, sfDir)).head
    val (s, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s >= c && c >= p)
    assert(s > 0)
  }

  test("cohort retention: offsets non-negative, week-0 actives equal cohort size") {
    val df = Analytics.cohortRetention(Tables.events(spark, sfDir))
    assert(df.filter(col("week_offset") < 0).count() === 0)
    // every user appears in their cohort's week 0 (their first event)
    val week0 = df.filter(col("week_offset") === 0)
      .agg(sum("active_users")).head.getLong(0)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(week0 === users)
  }

  test("percentiles are ordered and bounded by min/max") {
    val o = Tables.orders(spark, sfDir)
    val r = Analytics.orderValuePercentiles(o).head
    val (p25, p50, p75) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val mm = o.agg(min("o_totalprice"), max("o_totalprice")).head
    assert(mm.getDouble(0) <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mm.getDouble(1))
  }

  test("IVF top-k cosines agree with brute-force scores for shared neighbors") {
    val emb = Tables.embeddings(spark, sfDir)
    val bf = Similarity.bruteForceTopK(emb, nQueries = 4, k = 50).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    val ivf = Similarity.ivfTopK(emb, nQueries = 4, k = 10).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bf.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12))
    }
  }

  test("incremental attribution: missingConversions is an exact set difference") {
    val conv = Tables.conversions(spark, sfDir)
    val existing = conv.filter(col("conv_id") % 3 === 0).select("conv_id")
    val missing = Reporting.missingConversions(conv, existing)
    assert(missing.filter(col("conv_id") % 3 === 0).count() === 0)
    assert(missing.count() + existing.count() === conv.count())
  }

  test("top shingles are returned in df-descending order") {
    val t = Dedup.topShingles(Tables.documents(spark, sfDir), k = 10).collect()
    val dfs = t.map(_.getAs[Long]("df")).toSeq
    assert(dfs === dfs.sorted.reverse)
    assert(t.length === 10)
  }

  test("q7 bilateral trade: only the requested nation pair appears, both directions summed") {
    val df = Analytics.q7VolumeShipping(
      Tables.supplier(spark, sfDir), Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.nation(spark, sfDir), nationA = "NATION_12", nationB = "NATION_10")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_12", "NATION_10"), ("NATION_10", "NATION_12"))))
    assert(rows.forall(_.getAs[Double]("revenue") > 0.0))
    assert(rows.forall { r => val y = r.getAs[Int]("l_year"); y == 1996 || y == 1997 })
  }

  test("q8 market share is a proper fraction per year") {
    val rows = Analytics.q8MarketShare(
      Tables.part(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("q10 returned-items top list is revenue-descending and capped at 20") {
    val rows = Analytics.q10ReturnedItems(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir), Tables.nation(spark, sfDir)).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs === revs.sorted.reverse)
  }

  test("q15 returns exactly the argmax supplier(s) of quarterly revenue") {
    val rows = Analytics.q15TopSupplier(
      Tables.supplier(spark, sfDir), Tables.lineitem(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length === 1) // all tied at the max
  }

  test("q18 large-volume orders all exceed the quantity threshold") {
    val rows = Analytics.q18LargeVolume(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250.0))
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices === prices.sorted.reverse)
  }

  test("q19 disjunctive revenue equals the sum of its three disjunct revenues") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val pt = Tables.part(spark, sfDir)
    val total = Analytics.q19DiscountedRevenue(li, pt).head.getAs[Double]("revenue")
    // disjuncts are mutually exclusive on (brand), so revenues must add up
    def branch(brand: String, maxSize: Int, qLo: Double, qHi: Double): Double = {
      val r = li.join(pt, col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand && col("p_size").between(1, maxSize) &&
          col("l_quantity").between(qLo, qHi))
        .agg(graft.functions.Exact.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
        .head
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    val parts = branch("Brand#12", 15, 1.0, 11.0) +
      branch("Brand#23", 20, 10.0, 20.0) + branch("Brand#24", 25, 20.0, 30.0)
    assert(math.abs(total - parts) < 1e-6)
  }

  test("q22 golden: anti-join keeps only above-average customers without recent orders") {
    import spark.implicits._
    val cust = Seq(
      (1L, "A", 100.0), // above avg, no recent order -> kept
      (2L, "A", 100.0), // above avg, HAS recent order -> dropped
      (3L, "B", 10.0),  // below avg -> dropped
      (4L, "B", -5.0))  // negative, excluded from avg and below it -> dropped
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val ord = Seq(
      (2L, java.sql.Timestamp.valueOf("2001-06-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("1999-06-01 00:00:00"))) // too old, ignored
      .toDF("o_custkey", "o_orderdate")
    // avg positive bal = (100+100+10)/3 = 70 -> custkeys 1 and 2 qualify
    val rows = Analytics.q22GlobalSales(cust, ord).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("c_mktsegment") === "A")
    assert(rows.head.getAs[Long]("numcust") === 1L)
    assert(rows.head.getAs[Double]("totacctbal") === 100.0)
  }

  test("events anomaly: planted 10x spike is flagged, steady days are not") {
    import spark.implicits._
    // 11 quiet days of 5 events, then a 50-event spike on day 12
    val rows = (1 to 11).flatMap(d =>
      (1 to 5).map(i => ("click", java.sql.Date.valueOf(f"2024-01-$d%02d")))) ++
      (1 to 50).map(i => ("click", java.sql.Date.valueOf("2024-01-12")))
    val ev = rows.toDF("event_type", "event_date")
    val out = Analytics.eventsAnomaly(ev).collect()
    val byDate = out.map(r => r.getAs[java.sql.Date]("event_date").toString -> r).toMap
    // warmup days (<3 trailing) are absent: days 1-3 missing, day 4 scored
    assert(!byDate.contains("2024-01-01") && !byDate.contains("2024-01-03"))
    assert(byDate.contains("2024-01-04"))
    // steady days: zero variance -> z = 0, not anomalous
    assert(byDate("2024-01-10").getAs[Double]("zscore") === 0.0)
    assert(!byDate("2024-01-10").getAs[Boolean]("is_anomaly"))
    // the spike scores against a trailing window of constant 5s: sigma=0
    // there too, so plant variance: rerun with a wobble
    val rows2 = (1 to 11).flatMap(d =>
      (1 to (if (d % 2 == 0) 6 else 5)).map(i =>
        ("click", java.sql.Date.valueOf(f"2024-01-$d%02d")))) ++
      (1 to 50).map(i => ("click", java.sql.Date.valueOf("2024-01-12")))
    val out2 = Analytics.eventsAnomaly(rows2.toDF("event_type", "event_date")).collect()
    val spike = out2.find(_.getAs[java.sql.Date]("event_date").toString == "2024-01-12").get
    assert(spike.getAs[Boolean]("is_anomaly"))
    assert(spike.getAs[Double]("zscore") > 2.0)
  }

  test("channel pagerank golden: symmetric cycle is uniform; sink gains rank") {
    import spark.implicits._
    // assigned-journey shape: conv_id, session_id, ts_us, channel_name
    def journeys(chains: Seq[Seq[String]]): org.apache.spark.sql.DataFrame =
      chains.zipWithIndex.flatMap { case (chain, ci) =>
        chain.zipWithIndex.map { case (ch, si) =>
          (ci.toLong, (ci * 100 + si).toLong, (si * 1000).toLong, ch)
        }
      }.toDF("conv_id", "session_id", "ts_us", "channel_name")
    // two-channel cycle a->b, b->a (one conv each): uniform 0.5/0.5
    val cyc = graft.operators.Markov.channelPagerank(
      journeys(Seq(Seq("a", "b"), Seq("b", "a")))).collect()
    assert(cyc.length === 2)
    cyc.foreach(r => assert(math.abs(r.getAs[Double]("pr") - 0.5) < 1e-12))
    // a->b with b dangling: b ends above a, ranks sum to 1
    val sink = graft.operators.Markov.channelPagerank(
      journeys(Seq(Seq("a", "b")))).collect()
    val prs = sink.map(r => r.getAs[String]("channel") -> r.getAs[Double]("pr")).toMap
    assert(prs("b") > prs("a"))
    assert(math.abs(prs.values.sum - 1.0) < 1e-9)
    // real data: a proper distribution over all channels
    val real = graft.operators.Markov.channelPagerank(
      graft.operators.Journeys.assign(
        Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))).collect()
    assert(real.length >= 3)
    assert(math.abs(real.map(_.getAs[Double]("pr")).sum - 1.0) < 1e-6)
    val sorted = real.map(_.getAs[Double]("pr")).toSeq
    assert(sorted === sorted.sorted.reverse)
  }

  test("channel HITS golden: pure router is the hub, pure sink the authority") {
    import spark.implicits._
    def journeys(chains: Seq[Seq[String]]): org.apache.spark.sql.DataFrame =
      chains.zipWithIndex.flatMap { case (chain, ci) =>
        chain.zipWithIndex.map { case (ch, si) =>
          (ci.toLong, (ci * 100 + si).toLong, (si * 1000).toLong, ch)
        }
      }.toDF("conv_id", "session_id", "ts_us", "channel_name")
    // star: r routes into s1/s2/s3 (and nothing routes into r):
    // r is the only hub, the sinks split the authority mass by weight
    val star = graft.operators.Markov.channelHits(
      journeys(Seq(Seq("r", "s1"), Seq("r", "s2"), Seq("r", "s2"), Seq("r", "s3"))))
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Double]("hub"), r.getAs[Double]("authority"))).toMap
    assert(star("r")._1 === 1.0) // all hub mass
    assert(star("r")._2 === 0.0) // no inbound → zero authority
    assert(star.filter(_._1 != "r").values.forall(_._1 == 0.0))
    val auths = star.filter(_._1 != "r").values.map(_._2).sum
    assert(math.abs(auths - 1.0) < 1e-9) // authority mass sums to 1
    assert(star("s2")._2 > star("s1")._2) // double weight → more authority
    // cycle: symmetric roles, uniform scores
    val cyc = graft.operators.Markov.channelHits(
      journeys(Seq(Seq("a", "b"), Seq("b", "a")))).collect()
    cyc.foreach { r =>
      assert(math.abs(r.getAs[Double]("hub") - 0.5) < 1e-12)
      assert(math.abs(r.getAs[Double]("authority") - 0.5) < 1e-12)
    }
    // real data: distributions over all channels, both sides normalized
    val real = graft.operators.Markov.channelHits(
      graft.operators.Journeys.assign(
        Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))).collect()
    assert(real.length >= 3)
    assert(math.abs(real.map(_.getAs[Double]("hub")).sum - 1.0) < 1e-9)
    assert(math.abs(real.map(_.getAs[Double]("authority")).sum - 1.0) < 1e-9)
  }

  test("generic pagerank: arbitrary edge frames, weights honored, mass conserved") {
    import spark.implicits._
    // weighted star: hub h links to a (3×) and b (1×); a, b link back.
    val edges = Seq(
      (100L, 1L, 3L), (100L, 2L, 1L),
      (1L, 100L, 1L), (2L, 100L, 1L)).toDF("src", "dst", "weight")
    val pr = graft.operators.Markov.pagerank(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("pr")).toMap
    assert(pr.size === 3)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(1L) > pr(2L)) // 3× the inbound weight → more rank
    assert(pr(100L) > pr(1L)) // the hub receives from both
    // dangling node: 1 -> 2, 2 absorbs and redistributes; sums to 1
    val dang = graft.operators.Markov.pagerank(
      Seq((1L, 2L, 1L)).toDF("src", "dst", "weight")).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("pr")).toMap
    assert(dang(2L) > dang(1L))
    assert(math.abs(dang.values.sum - 1.0) < 1e-9)
    // string node type works the same (the channel instance relies on it)
    val s = graft.operators.Markov.pagerank(
      Seq(("x", "y", 1L), ("y", "x", 1L)).toDF("src", "dst", "weight")).collect()
    s.foreach(r => assert(math.abs(r.getAs[Double]("pr") - 0.5) < 1e-12))
  }

  test("OLS trend golden: exact line recovered, R² = 1; flat series slope 0") {
    import spark.implicits._
    // y = 100 + 2.5x on days 0..9 for one group; constant 50 for another
    val rows =
      (0 until 10).map(i => (1L + i, "LINE", 100.0 + 2.5 * i,
        java.sql.Timestamp.valueOf(f"1995-01-${i + 1}%02d 00:00:00"))) ++
      (0 until 10).map(i => (100L + i, "FLAT", 50.0,
        java.sql.Timestamp.valueOf(f"1995-01-${i + 1}%02d 00:00:00")))
    val orders = rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    val out = Analytics.revenueTrendOls(orders).collect()
      .map(r => r.getString(0) -> r).toMap
    // slope/intercept are in cents: 2.5 $/day = 250 cents/day
    val line = out("LINE")
    assert(math.abs(line.getAs[Double]("slope") - 250.0) < 1e-9)
    assert(math.abs(line.getAs[Double]("intercept") - 10000.0) < 1e-9)
    assert(math.abs(line.getAs[Double]("r2") - 1.0) < 1e-9)
    assert(line.getAs[Long]("n_days") === 10L)
    // a perfectly flat series: slope 0, intercept = the level
    val flat = out("FLAT")
    assert(math.abs(flat.getAs[Double]("slope")) < 1e-9)
    assert(math.abs(flat.getAs[Double]("intercept") - 5000.0) < 1e-9)
    // two same-day orders roll up before the fit (daily grain, not order grain)
    val dup = Analytics.revenueTrendOls(orders.unionAll(orders)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(dup("LINE").getAs[Double]("slope") - 500.0) < 1e-9)
  }

  test("CSV export writes a single header'd file matching the report") {
    val report = Reporting.channelReporting(
      graft.operators.IhcAttribution.attribute(
        graft.operators.Journeys.flagConversion(
          graft.operators.Journeys.assign(
            Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir)))),
      Tables.sessions(spark, sfDir), Tables.sessionCosts(spark, sfDir),
      Tables.conversions(spark, sfDir))
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Reporting.exportCsv(report, s"$dir/report")
    val back = spark.read.option("header", "true").csv(s"$dir/report")
    assert(back.count() === report.count())
    assert(back.columns.toSet === report.columns.toSet)
  }

  test("SCD2 collapses same-state runs into half-open versioned intervals") {
    import spark.implicits._
    // user 1: view,view @t=10,20 | click @30 | view @40  -> 3 versions
    // user 2: a single event -> one open version
    val ev = Seq(
      (101L, 1L, "view", 10L), (102L, 1L, "view", 20L),
      (103L, 1L, "click", 30L), (104L, 1L, "view", 40L),
      (201L, 2L, "purchase", 99L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Analytics.scd2UserState(ev).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L).sortBy(_.getAs[Long]("version"))
    assert(u1.map(_.getAs[String]("state")).toSeq === Seq("view", "click", "view"))
    assert(u1.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L, 1L))
    assert(u1.map(_.getAs[Long]("valid_from_us")).toSeq === Seq(10L, 30L, 40L))
    // half-open chain: each valid_to equals the next valid_from; last is open
    assert(u1.init.map(_.getAs[Long]("valid_to_us")).toSeq === u1.tail.map(_.getAs[Long]("valid_from_us")).toSeq)
    assert(u1.last.isNullAt(u1.last.fieldIndex("valid_to_us")) && u1.last.getAs[Boolean]("is_current"))
    assert(u1.init.forall(!_.getAs[Boolean]("is_current")))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length === 1 && u2.head.getAs[Boolean]("is_current")
      && u2.head.getAs[Long]("version") === 1L)
  }

  test("SCD2 orders duplicate timestamps by event_id deterministically") {
    import spark.implicits._
    // Same ts for both events: event_id order decides, so state runs are
    // (click)(view), not timestamp-ambiguous.
    val ev = Seq(
      (1L, 7L, "click", 50L), (2L, 7L, "view", 50L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = Analytics.scd2UserState(ev).collect().sortBy(_.getAs[Long]("version"))
    assert(out.map(_.getAs[String]("state")).toSeq === Seq("click", "view"))
    assert(out.head.getAs[Long]("valid_to_us") === 50L)
  }

  test("ABC classification: distributed prefix sum ≡ single-window running total") {
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val out = Analytics.abcClassification(orders).collect()
    assert(out.nonEmpty)
    // shares strictly increase down the ranking and end exactly at 1.0
    val shares = out.map(_.getDouble(2))
    shares.zip(shares.tail).foreach { case (a, b) => assert(a < b) }
    assert(shares.last == 1.0)
    // classes partition the ranking in A..B..C order
    val classes = out.map(_.getString(3))
    assert(classes.mkString.matches("A*B*C*"))
    assert(classes.contains("A") && classes.contains("C"))
    // bit-equality with the naive single-task running sum
    val naive = {
      val pc = orders.groupBy("o_custkey")
        .agg(graft.functions.Exact.dsum(col("o_totalprice")).as("revenue"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (k, r) => (-r, k) }
      def dec6(d: Double) = new java.math.BigDecimal(d.toString)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      var cum = java.math.BigDecimal.ZERO.setScale(6)
      val tot = pc.map(x => dec6(x._2))
        .foldLeft(java.math.BigDecimal.ZERO.setScale(6))(_.add(_))
      pc.map { case (k, r) =>
        cum = cum.add(dec6(r))
        (k, cum.doubleValue() / tot.doubleValue())
      }.toMap
    }
    out.foreach(r => assert(r.getDouble(2) == naive(r.getLong(0)),
      s"share mismatch for customer ${r.getLong(0)}"))
  }

  test("YoY growth joins month-12 by date arithmetic: gaps can't misalign periods") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 1995: Jan=100, Feb=200. 1996: Jan=200 (growth exactly 1.0); Feb
    // ABSENT; Mar=50 with NO 1995-Mar — growth NULL, and crucially Mar
    // must NOT pick up 1995-Feb (a lag-12 row window would).
    val orders = Seq(
      (1L, 1L, "O", 100.0, ts("1995-01-15 00:00:00"), "1-URGENT"),
      (2L, 1L, "O", 200.0, ts("1995-02-15 00:00:00"), "1-URGENT"),
      (3L, 1L, "O", 200.0, ts("1996-01-10 00:00:00"), "1-URGENT"),
      (4L, 1L, "O", 50.0, ts("1996-03-10 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = Analytics.yoyGrowth(orders).collect()
      .map(r => (r.getDate(0).toString, Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out("1995-01-01").isEmpty && out("1995-02-01").isEmpty)
    assert(out("1996-01-01").contains(1.0))
    assert(out("1996-03-01").isEmpty, "gap month must not borrow a misaligned period")
  }

  test("basketLift golden: hand-computed support/confidence/lift, threshold filters") {
    import spark.implicits._
    // baskets: {A,B,C}, {A,B}, {A,B}, {C} (item ids 1=A, 2=B, 3=C);
    // duplicate line for (order 1, item 1) must collapse via distinct
    val li = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val all = Analytics.basketLift(li, minPairCount = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val ab = all((1L, 2L))
    assert(ab.getLong(2) === 3L)                         // n_ab
    assert(ab.getLong(3) === 3L && ab.getLong(4) === 3L) // n_a, n_b
    assert(ab.getDouble(5) === 3.0 / 4.0)                // support
    assert(ab.getDouble(6) === 3.0 / 3.0)                // confidence
    assert(ab.getDouble(7) === (3.0 * 4.0) / (3.0 * 3.0)) // lift
    assert(all.contains((1L, 3L)) && all.contains((2L, 3L)))
    // default threshold (3) keeps only the (A,B) pair
    val filtered = Analytics.basketLift(li).collect()
    assert(filtered.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("ordersEwma golden: the recurrence folds day by day over exact daily totals") {
    import spark.implicits._
    val orders = Seq(
      ("1996-01-01 00:00:00", 4.0), ("1996-01-01 00:00:00", 6.0), // day 1 = 10
      ("1996-01-02 00:00:00", 20.0),
      ("1996-01-03 00:00:00", 30.0))
      .toDF("o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val out = Analytics.ordersEwma(orders, alpha = 0.3).collect()
      .map(r => r.getDate(0).toString -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("1996-01-01") === ((10.0, 10.0)))
    assert(out("1996-01-02") === ((20.0, (0.3 * 20.0) + (0.7 * 10.0))))
    val s2 = (0.3 * 20.0) + (0.7 * 10.0)
    assert(out("1996-01-03") === ((30.0, (0.3 * 30.0) + (0.7 * s2))))
  }

  test("labelPropagation: two dense cliques joined by a weak edge split into two communities") {
    import spark.implicits._
    def clique(ns: Seq[String], w: Long) =
      for (a <- ns; b <- ns if a < b) yield (a, b, w)
    val edges = (clique(Seq("a", "b", "c"), 5L) ++ clique(Seq("d", "e", "f"), 5L) :+
      (("c", "d", 1L))).toDF("src", "dst", "weight")
    val out = graft.operators.Markov.labelPropagation(edges, iters = 4).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set("a", "b", "c").map(out).size === 1, s"left clique split: $out")
    assert(Set("d", "e", "f").map(out).size === 1, s"right clique split: $out")
    assert(out("a") !== out("d"), s"cliques merged: $out")
    // isolated node keeps its own label
    val iso = graft.operators.Markov.labelPropagation(
      (clique(Seq("a", "b"), 1L) :+ (("z", "z", 1L))).toDF("src", "dst", "weight"),
      iters = 2).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(iso("z") === "z")
  }

  test("labelPropagation: double weights route to the distributed path, path-independent communities") {
    import spark.implicits._
    // fractional weights BELOW 1 truncate to 0 under the driver fold's
    // longValue — communities would differ by path; the type gate must
    // send this frame distributed even though it's tiny
    val edges = Seq(
      ("a", "b", 0.9), ("b", "c", 0.9), ("a", "c", 0.9),
      ("d", "e", 0.9), ("e", "f", 0.9), ("d", "f", 0.9),
      ("c", "d", 0.1)).toDF("src", "dst", "weight")
    val auto = graft.operators.Markov.labelPropagation(edges, iters = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).sorted.toSeq
    val forcedDistributed = graft.operators.Markov.labelPropagation(
      edges, iters = 4, driverSolveMaxEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).sorted.toSeq
    assert(auto === forcedDistributed,
      "double-weighted edges must produce the same communities regardless of edge count")
    val m = auto.toMap
    assert(Set("a", "b", "c").map(m).size === 1 && Set("d", "e", "f").map(m).size === 1)
  }

  test("timeToConvertQuantiles golden: gaps from first touch, interpolated quartiles") {
    import spark.implicits._
    // journeys (conv_ts − first touch): 100, 200, 300, 400 µs
    val assigned = Seq(
      (1L, 10L, 110L, 1L), (1L, 50L, 110L, 2L),      // conv 1: first ts 10 → gap 100
      (2L, 100L, 300L, 3L),                          // conv 2: gap 200
      (3L, 0L, 300L, 4L), (3L, 200L, 300L, 5L),      // conv 3: gap 300
      (4L, 600L, 1000L, 6L))                         // conv 4: gap 400
      .toDF("conv_id", "ts_us", "conv_ts_us", "session_id")
    val out = Analytics.timeToConvertQuantiles(assigned).collect().head
    assert(out.getLong(0) === 4L)
    assert(out.getDouble(1) === 175.0) // p25: pos=0.75 → 0.25·100 + 0.75·200
    assert(out.getDouble(2) === 250.0) // p50
    assert(out.getDouble(3) === 325.0) // p75
    assert(out.getDouble(4) === 250.0) // mean
  }

  test("embedOutliers: a planted corrupt vector dominates, clean vectors stay under threshold") {
    import spark.implicits._
    // 50 well-behaved vectors + one with a wild value in dim 3
    val vecs = (0 until 50).map { i =>
      val arr = Array.tabulate(8)(d => (d + 1).toFloat + 0.01f * ((i * 7 + d) % 11))
      (i.toLong, if (i == 13) { arr(3) = 1e6f; arr } else arr)
    }.toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.embedOutliers(vecs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out(13L)._1 === 3L, "worst dim must be the corrupted one")
    assert(out(13L)._3, "corrupt vector must flag as outlier")
    assert(out.count(_._2._3) === 1, "exactly one outlier planted")
    assert(out.filterNot(_._1 == 13L).values.forall(_._2 < 4.0))
  }

  test("bpeCoverage golden: fully-merged language vs fragmenting language") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab ab", "en", "s", 1L),
      (2L, "abab ab", "en", "s", 1L),
      (3L, "xy zz", "de", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val merges = graft.operators.Search.bpeLearn(docs, nMerges = 2)
    // merges learned on token freqs: (a,b) then (ab,ab) — en words collapse
    val out = graft.operators.Search.bpeCoverage(docs, merges).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // en: words abab×3, ab×2 → all single tokens after both merges
    assert(out("en") === ((5L, 5L, 5L, 1.0, 1.0)))
    // de: xy → 2 tokens, zz → 2 tokens; nothing merged
    assert(out("de") === ((2L, 4L, 0L, 2.0, 0.0)))
  }

  test("abTestWelch: hash arms partition users, moments exact, Welch dof in bounds") {
    val events = Tables.events(spark, sfDir)
    val out = Analytics.abTestWelch(events).collect().head
    val (na, nb) = (out.getLong(0), out.getLong(1))
    assert(na + nb === events.select("user_id").distinct().count())
    // deterministic md5 coin ≈ balances arms
    assert(math.abs(na - nb).toDouble / (na + nb) < 0.2, s"arms skewed: $na vs $nb")
    val (va, vb) = (out.getDouble(4), out.getDouble(5))
    assert(va > 0.0 && vb > 0.0)
    assert(!out.getDouble(6).isNaN, "t_stat must be finite")
    val dof = out.getDouble(7)
    assert(dof >= math.min(na, nb) - 1.0 && dof <= na + nb - 2.0,
      s"Welch dof out of bounds: $dof")
    // same inputs → bit-identical readout (the hash coin is deterministic)
    assert(Analytics.abTestWelch(events).collect().head === out)
  }

  test("tokenZipf: negative slope on real text, exact fit on a synthetic power law") {
    val real = graft.operators.Corpus.tokenZipf(Tables.documents(spark, sfDir)).collect().head
    assert(real.getLong(0) > 10)
    assert(real.getDouble(1) < 0.0, s"zipf slope must be negative: $real")
    assert(!real.getDouble(2).isNaN)
    // exact power law freq = 64 / rank: ln f = ln 64 − 1·ln r → slope −1
    import spark.implicits._
    val text = (1 to 64).flatMap(r => Seq.fill(64 / r)(s"w$r")).mkString(" ")
    val doc = Seq((1L, text)).toDF("doc_id", "text")
    val fit = graft.operators.Corpus.tokenZipf(doc, topN = 4).collect().head
    // ranks 1,2,4(tie w3/w4 broken by word)…: top-4 = w1(64), w2(32), w3(21), w4(16)
    assert(fit.getLong(0) === 4L)
    assert(fit.getDouble(1) < -0.8 && fit.getDouble(1) > -1.2, s"slope: $fit")
  }

  test("integrityAudit counts planted orphans per FK edge") {
    import spark.implicits._
    val region = Seq((0L, "r0")).toDF("r_regionkey", "r_name")
    val nation = Seq((0L, 0L), (1L, 9L)).toDF("n_nationkey", "n_regionkey") // 1 orphan
    val customer = Seq((10L, 0L)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((20L, 0L), (21L, 0L)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((100L, 10L), (101L, 99L)).toDF("o_orderkey", "o_custkey") // 1 orphan
    val part = Seq((200L, "p")).toDF("p_partkey", "p_name")
    val lineitem = Seq(
      (100L, 200L, 20L), (100L, 999L, 21L), (555L, 200L, 20L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey") // 1 order-orphan, 1 part-orphan
    val out = Analytics.integrityAudit(region, nation, customer, supplier, part, orders, lineitem)
      .collect().map(r => r.getAs[String]("relation") ->
        (r.getAs[Long]("fk_rows"), r.getAs[Long]("orphan_rows"))).toMap
    assert(out("lineitem.l_orderkey->orders") === ((3L, 1L)))
    assert(out("lineitem.l_partkey->part") === ((3L, 1L)))
    assert(out("lineitem.l_suppkey->supplier") === ((3L, 0L)))
    assert(out("orders.o_custkey->customer") === ((2L, 1L)))
    assert(out("nation.n_regionkey->region") === ((2L, 1L)))
  }

  test("userStickiness: DAU over trailing-7-day distinct actives") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"),
      (1L, "2024-01-05"),
      (3L, "2024-01-20"))
      .toDF("user_id", "d")
      .select(col("user_id"), to_date(col("d")).as("event_date"))
    val out = Analytics.userStickiness(ev).collect()
      .map(r => r.getAs[java.sql.Date]("event_date").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Double]("stickiness"))).toMap
    // Jan 1: dau 2, wau {1,2} = 2 → 1.0
    assert(out("2024-01-01") === ((2L, 2L, 1.0)))
    // Jan 5: dau 1 (user 1), trailing window Dec 30..Jan 5 actives {1,2} → 0.5
    assert(out("2024-01-05") === ((1L, 2L, 0.5)))
    // Jan 20: isolated → 1.0; days with no activity are absent
    assert(out("2024-01-20") === ((1L, 1L, 1.0)))
    assert(out.size === 3)
  }

  test("ordersSeasonality: shares sum to 1, index averages 1") {
    val out = Analytics.ordersSeasonality(Tables.orders(spark, sfDir)).collect()
    assert(out.length <= 7)
    assert(out.map(_.getAs[Long]("dow")).forall(d => d >= 0 && d <= 6))
    val shareSum = out.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val idxMean = out.map(_.getAs[Double]("seasonality_index")).sum / 7.0
    assert(math.abs(idxMean - 1.0) < 1e-9)
  }

  test("eventsQualityAudit counts planted defects") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1000L, Some(1L), "click", 1.0),
      (1L, 2000L, Some(1L), "view", 2.0),     // dup event_id
      (2L, 3000L, None, "purchase", 5.0),     // null user
      (3L, 4000L, Some(2L), "weird", -1.0))   // unknown type + negative
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("event_date", expr("CAST(timestamp_micros(ts_us) AS DATE)"))
    val r = Analytics.eventsQualityAudit(ev).head()
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("n_dup_event_ids") === 1L)
    assert(r.getAs[Long]("n_null_user") === 1L)
    assert(r.getAs[Long]("n_negative_value") === 1L)
    assert(r.getAs[Long]("n_unknown_type") === 1L)
  }

  test("customerLtvDeciles: deciles partition customers, decile 9 is richest") {
    val orders = Tables.orders(spark, sfDir)
    val out = Analytics.customerLtvDeciles(orders).collect().sortBy(_.getAs[Long]("decile"))
    val nCust = orders.select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_customers")).sum === nCust)
    val avgs = out.map(_.getAs[Double]("avg_ltv"))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a <= b },
      s"decile means must be nondecreasing: ${avgs.mkString(",")}")
  }

  test("supplierHhi: monopoly scores 1.0, an even duopoly 0.5") {
    import spark.implicits._
    val supplier = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((0L, "DUO"), (1L, "MONO")).toDF("n_nationkey", "n_name")
    val li = Seq(
      (1L, 100.0, 0.0), (2L, 100.0, 0.0), // nation DUO: 50/50 split
      (3L, 70.0, 0.0))                    // nation MONO: single supplier
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val out = Analytics.supplierHhi(supplier, nation, li).collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_suppliers"), r.getAs[Double]("hhi"))).toMap
    assert(out("MONO") === ((1L, 1.0)))
    assert(out("DUO")._1 === 2L)
    assert(math.abs(out("DUO")._2 - 0.5) < 1e-12)
  }

  test("supplierHhi: two-level fold bit-equals the flat fold when a nation fits one bucket, and pins the bucketed chain across buckets") {
    import spark.implicits._
    val n = 40
    val supplier = (1 to n).map(i => (i.toLong, 0L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((0L, "ONE")).toDF("n_nationkey", "n_name")
    val li = (1 to n).map(i =>
      (i.toLong, 10.0 + i * 0.37, 0.01 * (i % 7))).toDF("l_suppkey", "l_extendedprice", "l_discount")
    // the engine's own shares, in global suppkey order
    val shares = Analytics.supplierShares(supplier, nation, li)
      .select("l_suppkey", "share").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    // flat chain reference (the pre-bucketing definition)
    val flat = shares.foldLeft(0.0) { case (acc, (_, sh)) => acc + sh * sh }
    val hhiDefault = Analytics.supplierHhi(supplier, nation, li)
      .collect().head.getAs[Double]("hhi")
    // default width 65536 => every key in bucket 0 => outer chain is
    // 0.0 + s1, exact for positive s1 => BIT-equal to the flat fold
    assert(java.lang.Double.doubleToLongBits(hhiDefault)
      === java.lang.Double.doubleToLongBits(flat),
      s"single-bucket two-level fold must bit-equal the flat fold: $hhiDefault vs $flat")
    // width 7 => 6 buckets; the engine must produce exactly the
    // two-level chain (inner folds in key order, outer in bucket order)
    val twoLevel = shares.groupBy { case (k, _) => k / 7 }.toSeq.sortBy(_._1)
      .map { case (_, b) => b.sortBy(_._1).foldLeft(0.0) { case (a, (_, sh)) => a + sh * sh } }
      .foldLeft(0.0)(_ + _)
    val hhi7 = Analytics.supplierHhi(supplier, nation, li, bucketWidth = 7L)
      .collect().head.getAs[Double]("hhi")
    assert(java.lang.Double.doubleToLongBits(hhi7)
      === java.lang.Double.doubleToLongBits(twoLevel),
      s"bucketed fold chain drifted: $hhi7 vs $twoLevel")
    // determinism: a different physical layout must not move a bit
    val hhi7b = Analytics.supplierHhi(
      supplier.repartition(7), nation, li.repartition(13), bucketWidth = 7L)
      .collect().head.getAs[Double]("hhi")
    assert(java.lang.Double.doubleToLongBits(hhi7b)
      === java.lang.Double.doubleToLongBits(hhi7))
  }

  test("eventsHourProfile: shares sum to 1, 24 buckets max, index mean 1") {
    val out = Analytics.eventsHourProfile(Tables.events(spark, sfDir)).collect()
    assert(out.length <= 24)
    assert(out.map(_.getAs[Long]("hour")).forall(h => h >= 0 && h <= 23))
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
  }

  test("touchGapQuantiles: quartiles ordered, mean within range") {
    val assigned = graft.operators.Journeys.assign(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    val r = Analytics.touchGapQuantiles(assigned).head()
    val (p25, p50, p75) = (r.getAs[Double]("p25_us"), r.getAs[Double]("p50_us"),
      r.getAs[Double]("p75_us"))
    assert(p25 <= p50 && p50 <= p75)
    assert(r.getAs[Long]("n_gaps") > 0)
    assert(r.getAs[Double]("avg_us") > 0)
  }

  test("ordersAutocorrelation: perfect period-7 series scores acf(7) near 1") {
    import spark.implicits._
    // 70 days of a strict weekly pattern
    val rows = (0 until 70).map { d =>
      (d.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)),
        100.0 + 50.0 * (d % 7))
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val acf = Analytics.ordersAutocorrelation(rows).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    assert(acf(7L) > 0.85, s"weekly series must autocorrelate at lag 7: ${acf(7L)}")
    assert(acf(7L) > acf(3L), "lag 7 must beat an off-period lag")
  }

  test("userPurchaseHistogram: buckets partition all active users") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.userPurchaseHistogram(ev).collect()
    val totalUsers = ev.select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === totalUsers)
    assert(out.map(_.getAs[Long]("n_purchases")).distinct.length === out.length)
  }

  test("nationTradeBalance: net reconciles and covers every nation with activity") {
    val out = Analytics.nationTradeBalance(
      Tables.supplier(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.nation(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val net = r.getAs[Double]("net_balance")
      assert(net === r.getAs[Double]("supply_revenue") - r.getAs[Double]("demand_spend"))
    }
    // global supply equals the discounted lineitem revenue
    val totalSupply = out.map(_.getAs[Double]("supply_revenue")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .agg(graft.functions.Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .head().getDouble(0)
    assert(math.abs(totalSupply - expected) < 1e-4)
  }
}
