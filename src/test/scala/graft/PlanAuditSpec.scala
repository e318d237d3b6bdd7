package graft

import graft.operators.{Analytics, Corpus, Dedup, Temporal}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** SURVEY §5's scale claims, asserted against the actual physical plans —
  * not just documented. Counts use the pre-AQE `sparkPlan` so exchanges
  * are visible deterministically. */
class PlanAuditSpec extends SparkSpec {

  /** Distinct shuffle-Exchange nodes in the final (post-EnsureRequirements)
    * plan — `sparkPlan` predates exchange insertion, so parse the
    * formatted explain, where every node appears as "(id) Exchange". */
  private def shuffles(df: DataFrame): Int = {
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    "\\(\\d+\\) Exchange\\b".r.findAllIn(s).toSet.size
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  test("q6: every predicate reaches the parquet scan; schema pruned to 4 columns") {
    val df = SparkEntry.queries("q6_forecast_revenue")(spark, sfDir)
    val scan = scans(df).head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"missing pushdown: $pushed")
    assert(scan.schema.fieldNames.toSet ===
      Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"))
  }

  /** One pushdown assertion per filtered-scan FAMILY (r8 verdict task 3) —
    * de-pushing any of these turns `sbt test` red instead of silently
    * shipping a full-table read at 100 TB. */
  test("scan families push their filters: events ts-window + type, orders date, lineitem date") {
    def pushedAll(df: DataFrame): Seq[String] = scans(df).map(_.metadata("PushedFilters"))
    // events family, windowed extract (r8 verdict task 1): the raw-ts
    // lower bound must reach the scan, alongside the event_type filter
    val conv = pushedAll(SparkEntry.queries("conversions_extract")(spark, sfDir))
    assert(conv.exists(p => p.contains("GreaterThanOrEqual(ts") &&
      p.contains("EqualTo(event_type,purchase)")), conv.mkString("\n"))
    // two-sided window: BOTH bounds must push on the sessions-side scan
    val win = pushedAll(SparkEntry.queries("channel_reporting_window")(spark, sfDir))
    assert(win.exists(p => p.contains("GreaterThanOrEqual(ts") &&
      p.contains("LessThan(ts")), win.mkString("\n"))
    // orders family: the q4 date window must prune the orders scan
    val q4 = pushedAll(SparkEntry.queries("q4_order_priority")(spark, sfDir))
    assert(q4.exists(p => p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate")), q4.mkString("\n"))
    // lineitem family beyond q6: q14's ship-date window
    val q14 = pushedAll(SparkEntry.queries("q14_promo_revenue")(spark, sfDir))
    assert(q14.exists(_.contains("l_shipdate")), q14.mkString("\n"))
    // events family, unwindowed pipeline extracts: the event_type
    // derivation predicate itself must prune row groups
    val sess = pushedAll(graft.sources.Tables.sessions(spark, sfDir))
    assert(sess.exists(_.contains("Not(EqualTo(event_type,purchase))")), sess.mkString("\n"))
  }

  test("TPC-H shapes B44-B49: dims broadcast, bounded fact shuffles, no cartesian blowup") {
    def explain(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // q9: part/supplier/nation ride broadcast; the only exchanges are the
    // orders equi-join, the final agg, and the output sort
    val q9 = SparkEntry.queries("q9_profit_by_nation")(spark, sfDir)
    assert(shuffles(q9) <= 4, s"q9 shuffles: ${shuffles(q9)}")
    assert(explain("q9_profit_by_nation").contains("BroadcastHashJoin"))
    // q2: the correlated-MIN join-back and the supplier re-join are
    // broadcast; only the offer rollup shuffles the fact
    assert(explain("q2_min_price_supplier").contains("BroadcastHashJoin"))
    // q11: the global scalar is a BROADCAST nested-loop of ONE row —
    // never a shuffled cartesian
    val q11 = explain("q11_important_parts")
    assert(q11.contains("BroadcastNestedLoopJoin") || q11.contains("BroadcastHashJoin"))
    assert(!q11.contains("CartesianProduct"), "q11 plans a cartesian product")
    // q16: the NOT-IN exclusion plans as a broadcast anti join, not a
    // per-row subquery
    assert(explain("q16_supplier_counts").contains("BroadcastHashJoin LeftAnti") ||
      explain("q16_supplier_counts").contains("LeftAnti"))
    // q21: both EXISTS conditions fold into per-order aggregation —
    // bounded exchanges, no cartesian
    val q21 = SparkEntry.queries("q21_waiting_suppliers")(spark, sfDir)
    assert(shuffles(q21) <= 6, s"q21 shuffles: ${shuffles(q21)}")
    assert(!explain("q21_waiting_suppliers").contains("CartesianProduct"))
  }

  test("bloom prune probes map-side: one fact pass, broadcast flags, no sort-merge") {
    val df = SparkEntry.queries("sketch_bloom_prune")(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the k slot probes and the exact flag are ALL broadcast left joins —
    // the fact table is never exchanged for a join, and the single fact
    // scan feeds one partial agg (exchanges = dim-side distincts + the
    // one-row final agg, never hashpartitioning on a fact key)
    assert("BroadcastHashJoin .*LeftOuter".r.findAllIn(plan).size >= 4, plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "fact-side join shuffled")
    assert(!plan.contains("hashpartitioning(l_orderkey"), "fact exchanged")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).count(_ => true) >= 1)
  }

  test("priority sample rank is WindowGroupLimit-pruned; q20 dims broadcast") {
    val plan = Corpus.prioritySample(Tables.documents(spark, sfDir))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // map partitions forward k+1 rows per stratum, not the corpus
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    // 5 = offer rollup (appears on both comparison sides), per-part
    // rollup, supplier agg, output sort — all on post-agg key spaces
    val q20 = SparkEntry.queries("q20_promo_suppliers")(spark, sfDir)
    assert(shuffles(q20) <= 5, s"q20 shuffles: ${shuffles(q20)}")
    assert(!q20.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .contains("SortMergeJoin"))
  }

  test("minhash signature is a pure map stage — zero shuffles") {
    assert(shuffles(Dedup.minhashSignature(Tables.documents(spark, sfDir))) === 0)
  }

  test("winnowing / stratified sampling shuffle only for the output ordering") {
    assert(shuffles(Corpus.winnowFingerprints(Tables.documents(spark, sfDir))) === 1)
    assert(shuffles(Corpus.stratifiedSample(Tables.documents(spark, sfDir))) === 1)
  }

  test("as-of join: one per-user shuffle plus the output ordering") {
    val df = Temporal.asofLastSession(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    assert(shuffles(df) === 2)
  }

  test("denormalizing enrichment joins only via broadcast — one shuffle (ordering)") {
    val df = Analytics.ordersEnrich(
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.nation(spark, sfDir), Tables.region(spark, sfDir))
    assert(shuffles(df) === 1)
  }

  test("attribution models: scans prune to the journey columns, no cartesian products") {
    val assigned = graft.operators.Journeys.assign(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    Seq(
      graft.operators.Reporting.linearAttribution(assigned),
      graft.operators.Reporting.timeDecayAttribution(assigned),
      graft.operators.Reporting.positionBasedAttribution(assigned)
    ).foreach { df =>
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
      // the event scan must not read the JSON props payload
      scans(df).foreach(s =>
        assert(!s.schema.fieldNames.contains("props"), s.schema.fieldNames.mkString(",")))
    }
  }

  test("markov transition counting: windowed passes only, no cartesian, props pruned") {
    val df = graft.operators.Markov.transitionCounts(
      Tables.sessions(spark, sfDir),
      graft.operators.Journeys.assign(
        Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir)))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"))
    scans(df).foreach(s => assert(!s.schema.fieldNames.contains("props")))
  }

  test("text repetition: document scan pruned to (doc_id, text)") {
    val df = Corpus.repetitionMetrics(Tables.documents(spark, sfDir))
    scans(df).foreach { s =>
      assert(s.schema.fieldNames.toSet.subsetOf(Set("doc_id", "text")),
        s.schema.fieldNames.mkString(","))
    }
  }

  test("PII scrub is a pure map stage — shuffles only for the output ordering") {
    assert(shuffles(Corpus.piiScrub(Tables.documents(spark, sfDir))) === 1)
  }

  test("contamination check: fingerprint-keyed join, no cartesian, text pruned late") {
    val df = Corpus.contaminationCheck(Tables.documents(spark, sfDir))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    scans(df).foreach(s =>
      assert(s.schema.fieldNames.toSet.subsetOf(Set("doc_id", "text"))))
  }

  test("PQ encoding carries codes, not raw vectors, into the scoring join") {
    // the encoded side's join output columns are codes/recon — the raw
    // 64-float embedding column must not survive past the encode project
    val df = graft.operators.Similarity.pqTopK(
      Tables.embeddings(spark, sfDir), iters = 0)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct")) // broadcast-join shape
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    // the query<->corpus pairing is a broadcast nested-loop on the tiny
    // query side (8 rows) — its STREAMED side must project codes only
    assert(joins.nonEmpty)
    // the query side projects `qe`, the corpus side codes/recon — neither
    // may carry the raw `embedding` column into the join
    val joinInputCols = joins.head.children.flatMap(_.output.map(_.name)).toSet
    assert(!joinInputCols.contains("embedding"),
      s"raw embeddings leaked past encoding: $joinInputCols")
  }

  test("date-partitioned sink: reads prune partitions, rows round-trip") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = Tables.events(spark, sfDir)
    events.write.partitionBy("event_date").mode("overwrite").parquet(out)
    val day = lit("2024-01-05").cast("date")
    val back = spark.read.parquet(out).filter(col("event_date") === day)
    assert(back.count() === events.filter(col("event_date") === day).count())
    assert(back.count() > 0)
    val scan = back.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.partitionFilters.exists(_.toString.contains("event_date")),
      s"no partition filter: ${scan.partitionFilters}")
    // only the matching partition's files are read
    assert(scan.relation.location.inputFiles.length > 1)
    assert(scan.metadata("Location").contains(out))
  }

  private def broadcastJoins(df: DataFrame): Int = {
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    "\\(\\d+\\) BroadcastHashJoin\\b".r.findAllIn(s).toSet.size
  }

  private def noCartesian(df: DataFrame): Unit = {
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!s.contains("CartesianProduct") || s.contains("1 rows"),
      "unexpected cartesian product")
  }

  test("round-5 TPC-H queries: dims broadcast, no cartesians, bounded shuffles") {
    // (minBroadcastJoins, maxShuffles): every dimension table must come in
    // via broadcast; shuffles are only the fact join(s) + agg + ordering.
    // minimums, not exact counts — at the test SF the optimizer may also
    // broadcast a small fact side, which is fine and SF-dependent.
    val expect = Map(
      "q7_volume_shipping"     -> (4, 4), // supplier, customer, nation x2
      "q8_market_share"        -> (6, 4), // part, cust, supp, nation x2, region
      "q10_returned_items"     -> (2, 3), // customer, nation
      "q15_top_supplier"       -> (1, 3), // supplier
      "q18_large_volume"       -> (2, 3), // customer + the tiny HAVING frame
      "q19_discounted_revenue" -> (1, 2), // part
      "q22_global_sales"       -> (1, 4)) // one-row threshold
    expect.foreach { case (q, (minBhj, maxSh)) =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      noCartesian(df)
      assert(broadcastJoins(df) >= minBhj, s"$q: too few broadcast joins")
      assert(shuffles(df) <= maxSh, s"$q: ${shuffles(df)} shuffles > $maxSh")
    }
  }

  test("curation operators: chunking is map-only; packing/curriculum shuffle once per window") {
    val docs = Tables.documents(spark, sfDir)
    // chunking: the ONLY exchange is the output ordering
    assert(shuffles(Corpus.chunkDocuments(docs)) === 1)
    // packing: the (lang, shard) cumulative window + the output ordering
    assert(shuffles(Corpus.sequencePacking(docs)) === 2)
    // curriculum: per-lang ntile window + stage agg (+ ordering folded in)
    assert(shuffles(Corpus.qualityCurriculum(docs)) <= 3)
    // mixture: two tiny rate aggregates + broadcast admission + ordering —
    // the corpus side itself is never hash-repartitioned
    val mix = Corpus.mixtureSample(docs)
    assert(broadcastJoins(mix) >= 1)
    assert(shuffles(mix) <= 4)
  }

  test("SQ ANN scores as a broadcast-nested-loop over the corpus — window + ordering only") {
    val df = graft.operators.Similarity.sqTopK(Tables.embeddings(spark, sfDir))
    noCartesian(df)
    assert(shuffles(df) === 2)
  }

  test("lm doc scoring: all shuffles keyed on content, one groupBy for counts") {
    val df = graft.operators.Search.lmScore(Tables.documents(spark, sfDir))
    noCartesian(df)
    assert(shuffles(df) <= 5)
  }

  test("IVF+PQ: broadcast probe join, encoded side is a pure map — rank + ordering shuffles only") {
    val df = graft.operators.Similarity.ivfPqTopK(Tables.embeddings(spark, sfDir))
    noCartesian(df)
    // probes broadcast into the cell join; the encoded corpus reaches it
    // straight from the scan (encode/reconstruct are projections), so the
    // only exchanges are the per-query rank and the output ordering
    assert(shuffles(df) === 2)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), "probe join must be broadcast")
  }

  test("semantic dedup: candidate cell join carries ids only, no cartesian anywhere") {
    val emb = Tables.embeddings(spark, sfDir)
    noCartesian(graft.operators.Dedup.semanticDedup(emb))
    // the within-cell id self-join must not carry the 64-float payload —
    // embeddings re-join AFTER candidate generation. Audited on the
    // candidate stage directly: the adaptive CC executes it eagerly, so
    // it no longer appears in the final frame's plan.
    val (_, pairs) = graft.operators.Dedup.semanticScored(
      emb, nCentroids = 0, iters = 2, threshold = 0.3)
    noCartesian(pairs)
    val joins = pairs.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    val cellJoins = joins.filter(_.children.forall(
      !_.output.map(_.name).contains("embedding")))
    assert(cellJoins.nonEmpty, "no payload-free candidate join found")
  }

  test("forward as-of / RFM / BPE: bounded shuffles, no cartesians") {
    val nxt = graft.operators.Temporal.asofNextSession(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    noCartesian(nxt)
    // same shape as the backward form: one per-user shuffle + ordering
    assert(shuffles(nxt) === 2)
    val rfm = graft.operators.Analytics.rfmSegments(Tables.events(spark, sfDir))
    noCartesian(rfm)
    val bpe = graft.operators.Search.bpeTopMerges(Tables.documents(spark, sfDir))
    noCartesian(bpe)
    // vocabulary groupBy + pair groupBy; the top-k is TakeOrdered, not a sort
    assert(shuffles(bpe) <= 3)
  }

  test("sketches: CMS/HLL are one partial-agg pass each; KMV adds only the bounded rank") {
    val events = Tables.events(spark, sfDir)
    val cms = graft.operators.Sketches.cmsFrequency(events)
    noCartesian(cms)
    val hll = graft.operators.Sketches.hllDistinct(events)
    noCartesian(hll)
    // sketch build: explode + groupBy (1 shuffle), probe/spine joins are
    // small-side broadcasts or reuse the agg partitioning; ordering last
    assert(shuffles(cms) <= 4)
    assert(shuffles(hll) <= 5)
    // kmv intersection (scale path): the only nested-loop join is the
    // broadcast |channels|² theta pairing — both BNLJ inputs are
    // metadata-sized theta frames, never a data-sized side, and the
    // corpus-sized exact-overlap self-join is OFF by default
    val kmvI = graft.operators.Sketches.kmvIntersection(events)
    noCartesian(kmvI)
    val bnlj = kmvI.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    bnlj.foreach { j =>
      val cols = j.children.flatMap(_.output.map(_.name)).toSet
      assert(cols.subsetOf(Set("ch_a", "ch_b", "theta_a", "theta_b", "channel", "theta")),
        s"data-sized frame in sketch nested-loop join: $cols")
    }
    assert(!kmvI.columns.contains("n_exact"), "exact overlap must be off on the scale path")
    // the n_exact companion branch re-aggregates the same distinct frame
    // (identical canonical subplans — merged by ReuseExchange at runtime);
    // statically that is 5 exchanges: distinct, bounded rank, distinct
    // again, per-channel count, output ordering
    assert(shuffles(graft.operators.Sketches.kmvDistinct(events)) <= 5)
  }

  test("order statistics are never single-task: every WindowExec partitioned, no Percentile") {
    // The three former weak-plan queries (B9/B41/C29): exact order
    // statistics must come from the Quantiles range-bucketed rank — an
    // unpartitioned WindowExec or a Percentile one-buffer aggregate in
    // the final plan is the 100 TB executor-OOM shape.
    val plans = Seq(
      "user_rfm_segments" ->
        graft.operators.Analytics.rfmSegments(Tables.events(spark, sfDir)),
      "quality_curriculum" ->
        graft.operators.Corpus.qualityCurriculum(Tables.documents(spark, sfDir)),
      "order_value_percentiles" ->
        graft.operators.Analytics.orderValuePercentiles(Tables.orders(spark, sfDir)))
    plans.foreach { case (name, df) =>
      val windows = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$name: unpartitioned WindowExec\n${w.simpleStringWithNodeId()}"))
      val agg = df.queryExecution.sparkPlan.toString
      assert(!agg.contains("percentile("), s"$name plans a Percentile aggregate")
      noCartesian(df)
    }
  }

  test("wave-6 shapes: shard window partitioned, datasheet one agg, verified dedup no cartesian") {
    val docs = Tables.documents(spark, sfDir)
    // training_shards: the rank window must be PARTITIONED by shard (a
    // global unpartitioned sort is the 100 TB single-task killer)
    val shards = graft.operators.Corpus.trainingShards(docs)
    val windows = shards.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned WindowExec:\n${w.simpleStringWithNodeId()}"))
    noCartesian(shards)
    // corpus_datasheet: one partial-agg groupBy + output sort, nothing else
    val ds = graft.operators.Corpus.corpusDatasheet(docs)
    assert(shuffles(ds) <= 2, s"datasheet shuffles: ${shuffles(ds)}")
    noCartesian(ds)
    // edit-verified dedup: candidate join + verify joins, never a cartesian
    noCartesian(graft.operators.Dedup.editVerified(docs))
    // random projection: pure map before the output ordering
    val rp = graft.operators.Similarity.rpProject(
      Tables.embeddings(spark, sfDir))
    assert(shuffles(rp) <= 1, s"rpProject shuffles: ${shuffles(rp)}")
    assert(!rp.queryExecution.sparkPlan.toString.contains("Join"))
  }

  test("wave-7 retrieval shapes: center+norm is map-only, knn graph cell-blocked, rrf bounded") {
    val emb = Tables.embeddings(spark, sfDir)
    // centerNormalize pass 2: the means are inlined literals, so the
    // output frame is one map over the scan + the output sort — exactly
    // one exchange, no join, no aggregate
    val cn = graft.operators.Similarity.centerNormalize(emb)
    assert(shuffles(cn) <= 1, s"centerNormalize shuffles: ${shuffles(cn)}")
    assert(!cn.queryExecution.sparkPlan.toString.contains("Join"))
    // knnGraph: candidates come ONLY from the cell equi-join — never a
    // cartesian; exchanges = cell join + rank window + output sort
    val knn = graft.operators.Similarity.knnGraph(emb)
    noCartesian(knn)
    assert(shuffles(knn) <= 4, s"knnGraph shuffles: ${shuffles(knn)}")
    // rrfFusion: corpus work lives in the two modality top-ks; the dense
    // corpus pass joins against a BROADCAST query side (one row), and the
    // global rank windows run post-limit on bounded lists
    val rrf = graft.operators.Search.rrfFusion(Tables.documents(spark, sfDir), emb)
    noCartesian(rrf)
    val rplan = rrf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(rplan.contains("Broadcast"), "dense query side should broadcast")
  }

  test("ABC prefix sum windows partition by bucket — no full-frame single-task sort") {
    val df = graft.operators.Analytics.abcClassification(Tables.orders(spark, sfDir))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the running-sum window must carry the __bkt partition key; the only
    // unpartitioned sort allowed is the bounded output ordering
    assert(plan.contains("__bkt"), "prefix-sum window lost its bucket partitioning")
    val win = "\\(\\d+\\) Window\\b".r.findAllIn(plan).size
    assert(win >= 1)
    assert(!plan.contains("CartesianProduct"))
  }

  test("r9 operators: basket pairs key on the order, triangles hash-close, interval join one per-key sort") {
    val bl = Analytics.basketLift(Tables.lineitem(spark, sfDir))
    noCartesian(bl)
    // candidate pairs come ONLY from the okey equi-join — never a
    // nested-loop over the item universe; the order total joins as a
    // one-row broadcast
    val blPlan = bl.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!blPlan.contains("CartesianProduct"))
    assert(blPlan.contains("BroadcastNestedLoopJoin") || blPlan.contains("BroadcastHashJoin"))
    val assigned = graft.operators.Journeys.assign(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    val tri = graft.operators.Markov.triangleCount(
      graft.operators.Journeys.channelTransitions(assigned)
        .selectExpr("from_channel AS src", "to_channel AS dst"))
    noCartesian(tri)
    // interval join: the dimension pick is ONE per-key window sort over
    // the union — every WindowExec partitioned, no range-join fan-out
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts_us", "event_type")
    val ij = graft.operators.Temporal.intervalJoin(
      ev, Analytics.scd2UserState(ev),
      keyCol = "user_id", tsCol = "ts_us", dimTieBreak = Seq("version"))
    noCartesian(ij)
    ij.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty, "unpartitioned WindowExec in intervalJoin"))
    assert(shuffles(ij) <= 4, s"intervalJoin shuffles: ${shuffles(ij)}")
    // LPA rounds: label mass joins + node argmax windows, no cartesian
    val lpa = graft.operators.Markov.labelPropagation(
      graft.operators.Journeys.channelTransitions(assigned)
        .selectExpr("from_channel AS src", "to_channel AS dst", "n AS weight"), iters = 2)
    noCartesian(lpa)
  }

  test("wave-8/9 shapes: banded near-dup equi-joins, entropy join-free, audits broadcast dims") {
    val docs = Tables.documents(spark, sfDir)
    // simhashNear: candidates ONLY from the (band, band_key) equi-join
    val near = Dedup.simhashNear(docs)
    noCartesian(near)
    assert(shuffles(near) <= 5, s"simhashNear shuffles: ${shuffles(near)}")
    // containment shares the df-capped sid blocking — no cartesian
    noCartesian(Dedup.ngramContainment(docs))
    // textEntropy: one count groupBy + per-doc window/fold — NO join
    val ent = Corpus.textEntropy(docs)
    assert(!ent.queryExecution.sparkPlan.toString.contains("Join"),
      "textEntropy must not plan a join")
    assert(shuffles(ent) <= 3, s"textEntropy shuffles: ${shuffles(ent)}")
    // tokenPmi: the top-k must be TakeOrdered, never a global sort
    val pmi = graft.operators.Search.tokenPmi(docs)
    assert(pmi.queryExecution.sparkPlan.toString.contains("TakeOrderedAndProject"),
      "tokenPmi top-k must plan as TakeOrderedAndProject")
    // stickiness: the 7x explode runs over the deduped user-day frame;
    // bounded shuffles, no cartesian
    val stick = Analytics.userStickiness(Tables.events(spark, sfDir))
    noCartesian(stick)
    // user-day dedup + dau agg + countDistinct's two-phase expand + the
    // day-keyed join + ordering — all keyed on user/day aggregates, none
    // proportional to raw events after the first dedup
    assert(shuffles(stick) <= 6, s"userStickiness shuffles: ${shuffles(stick)}")
    // integrity audit: every dimension parent joins as broadcast; only
    // the fact-fact edge may sort-merge
    val audit = Analytics.integrityAudit(
      Tables.region(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.part(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir))
    noCartesian(audit)
    val auditPlan = audit.queryExecution.sparkPlan.toString
    assert(auditPlan.contains("BroadcastHashJoin"), "audit dims must broadcast")
    // knnClassify: the label join is a broadcast over |Q|*k rows
    val knn = graft.operators.Similarity.knnClassify(
      Tables.embeddings(spark, sfDir))
    assert(knn.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "knnClassify label join must broadcast")
    // basketLift's rewritten pair stage generates pairs ROW-LOCALLY: the
    // only joins left are the count/broadcast attach — no okey self-join
    val bl = Analytics.basketLift(Tables.lineitem(spark, sfDir))
    val blJoins = bl.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(blJoins.size <= 2, s"basketLift re-grew join stages: ${blJoins.size}")
    // channelOverlap shares the basket shape
    val assigned = graft.operators.Journeys.assign(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    noCartesian(graft.operators.Journeys.channelOverlap(assigned))
    // packing/shard reports: windows partitioned, totals broadcast
    val pe = Corpus.packingEfficiency(docs)
    pe.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty, "unpartitioned packing window"))
    val sk = Corpus.shardSkew(docs)
    assert(sk.queryExecution.sparkPlan.toString.contains("BroadcastNestedLoopJoin") ||
      sk.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "shardSkew total must attach as broadcast")
  }

  test("wave-10/14 shapes: model compare reuses one checkpoint, ranks partitioned, dims broadcast") {
    val assigned = graft.operators.Journeys.assign(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    // modelCompare: the five model rollups must read the SAME checkpoint
    // (scan reuse), not five copies of the assignment DAG — post-
    // checkpoint the plan contains no window over the raw events scan
    val mc = graft.operators.Reporting.modelCompare(assigned)
    noCartesian(mc)
    val mcScans = mc.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(mcScans.isEmpty, "modelCompare must consume the checkpoint, not re-scan parquet")
    // LTV deciles: every window partitioned (the exact-rank machinery),
    // no Percentile aggregate
    val ltv = Analytics.customerLtvDeciles(Tables.orders(spark, sfDir))
    ltv.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty, "unpartitioned LTV window"))
    assert(!ltv.queryExecution.sparkPlan.toString.contains("Percentile"))
    // supplier HHI: both dims broadcast; the per-nation share window is
    // nation-partitioned
    val hhi = Analytics.supplierHhi(
      Tables.supplier(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.lineitem(spark, sfDir))
    assert(hhi.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
    hhi.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty, "unpartitioned HHI window"))
    // seasonality / hour profile / len histogram / dup rate: one
    // aggregation pass + broadcast total, bounded shuffles
    Seq(
      Analytics.ordersSeasonality(Tables.orders(spark, sfDir)),
      Analytics.eventsHourProfile(Tables.events(spark, sfDir)),
      graft.operators.Corpus.docLenHistogram(Tables.documents(spark, sfDir)),
      graft.operators.Corpus.dupRateBySource(Tables.documents(spark, sfDir))
    ).foreach { df =>
      noCartesian(df)
      assert(shuffles(df) <= 4, s"profile rollup shuffles: ${shuffles(df)}")
    }
    // vocab growth: the token explode feeds ONE min-agg; no join back to
    // the token frame (the decile attach joins 10-row aggregates)
    val vg = graft.operators.Corpus.vocabGrowth(Tables.documents(spark, sfDir))
    noCartesian(vg)
  }

  test("topic assignment scores all prototypes map-side: no join, ordering-only shuffle") {
    // The r7 shape was posexplode ⋈ broadcast-on-pos — n·d·L rows into the
    // partial agg. The literal-prototype-matrix pass must plan with NO join
    // and NO aggregate at all: one map over the scan, then the output sort.
    val df = graft.operators.Similarity.topicAssign(Tables.embeddings(spark, sfDir))
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), s"topic_assign plans a join:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"topic_assign plans an aggregate:\n$plan")
    assert(shuffles(df) <= 1, s"topic_assign shuffles: ${shuffles(df)}")
  }
}
