package graft

import graft.operators.{IhcAttribution, Journeys, Reporting, Skew}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join") {
    val sessions = Tables.sessions(spark, sfDir).select("session_id", "user_id")
    val conv = Tables.conversions(spark, sfDir).select("conv_id", "user_id")
    val plain = sessions.join(conv, "user_id")
      .select("session_id", "conv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val salted = Skew.saltedJoin(sessions, conv, "user_id", "session_id", 8)
      .select("session_id", "conv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(salted === plain)
  }

  test("empty conversions: the whole pipeline yields empty results, not errors") {
    val sessions = Tables.sessions(spark, sfDir)
    val noConv = Tables.conversions(spark, sfDir).filter(lit(false))
    val assigned = Journeys.assign(sessions, noConv)
    assert(assigned.count() === 0)
    val attributed = IhcAttribution.attribute(Journeys.flagConversion(assigned))
    assert(IhcAttribution.sumCheck(attributed).count() === 0)
    val report = Reporting.withMetrics(Reporting.channelReporting(
      attributed, sessions, Tables.sessionCosts(spark, sfDir), noConv))
    assert(report.count() === 0)
  }

  test("round-5 operators on degenerate inputs: empty frames out, no errors") {
    val noEvents = Tables.events(spark, sfDir).filter(lit(false))
    // sketches: no channels -> no rows (not a crash, not a 0-estimate row)
    assert(graft.operators.Sketches.kmvDistinct(noEvents).count() === 0)
    assert(graft.operators.Sketches.hllDistinct(noEvents).count() === 0)
    assert(graft.operators.Sketches.cmsFrequency(noEvents).count() === 0)
    assert(graft.operators.Sketches.kmvMerged(noEvents).count() === 0)
    // funnel / RFM on no events
    assert(graft.operators.Analytics.windowFunnel(noEvents).count() === 0)
    assert(graft.operators.Analytics.rfmSegments(noEvents).count() === 0)
    // forward as-of with no sessions: left semantics, all-null markers
    val conv = Tables.conversions(spark, sfDir)
    val noSess = Tables.sessions(spark, sfDir).filter(lit(false))
    val nxt = graft.operators.Temporal.asofNextSession(noSess, conv)
    assert(nxt.count() === conv.count())
    assert(nxt.filter(col("next_session_id").isNotNull).count() === 0)
    // BPE counting on docs with only 1-char tokens: empty, not an error
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(graft.operators.Search.bpeTopMerges(tiny).count() === 0)
  }

  test("csv/json/orc round-trips preserve the events row set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts_us", "event_type", "value")
    val want = ev.collect().map(_.toSeq).toSet
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    ev.write.mode("overwrite").json(s"$dir/json")
    ev.write.mode("overwrite").orc(s"$dir/orc")
    val back = Seq(
      spark.read.option("header", "true").schema(ev.schema).csv(s"$dir/csv"),
      spark.read.schema(ev.schema).json(s"$dir/json"),
      spark.read.orc(s"$dir/orc"))
    back.foreach(b => assert(b.collect().map(_.toSeq).toSet === want))
  }

  test("corrupt JSON records: PERMISSIVE quarantines, DROPMALFORMED filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    val lines = Seq(
      """{"event_id": 1, "value": 1.5}""",
      """{"event_id": 2, "value": }""", // malformed
      """not json at all""",
      """{"event_id": 4, "value": 4.5}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.json"),
      String.join("\n", lines: _*).getBytes)
    val schema = "event_id BIGINT, value DOUBLE, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // Spark refuses _corrupt_record predicates on raw file scans
    assert(permissive.count() === 4)
    assert(permissive.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull).count() === 2)
    val dropped = spark.read.schema("event_id BIGINT, value DOUBLE")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() === 2)
    assert(dropped.agg(org.apache.spark.sql.functions.sum("event_id")).head.getLong(0) === 5L)
  }

  test("approx_count_distinct tracks exact distinct within 5%") {
    val ev = Tables.events(spark, sfDir)
    val r = ev.agg(
      countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id").as("approx")).head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05)
  }

  test("round-9 operators on degenerate inputs: empty/zero out, no NaN rows") {
    import spark.implicits._
    val emptyOrders = Seq.empty[(Long, java.sql.Date, Double)]
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    // ACF: under-2-day and zero-variance series return EMPTY, never NaN
    assert(graft.operators.Analytics.ordersAutocorrelation(emptyOrders).count() === 0)
    val flat = (0 until 30).map(d =>
      (d.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)), 5.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    assert(graft.operators.Analytics.ordersAutocorrelation(flat).count() === 0)
    // overlap / length distribution on an empty assignment
    val emptyAsg = Seq.empty[(Long, Long, Long, String, Long, Long, Double)]
      .toDF("session_id", "user_id", "ts_us", "channel_name", "conv_id", "conv_ts_us", "revenue")
    assert(graft.operators.Journeys.channelOverlap(emptyAsg).count() === 0)
    assert(graft.operators.Journeys.lengthDistribution(emptyAsg).count() === 0)
    // stickiness / hour profile on empty events
    val emptyEv = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("event_date", expr("CAST(timestamp_micros(ts_us) AS DATE)"))
    assert(graft.operators.Analytics.userStickiness(emptyEv).count() === 0)
    assert(graft.operators.Analytics.eventsHourProfile(emptyEv).count() === 0)
    // purchase histogram on sessions-only events: a single zero bucket
    val noBuy = Seq((1L, 1000L, 7L, "click", 1.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val hb = graft.operators.Analytics.userPurchaseHistogram(noBuy).collect()
    assert(hb.length === 1 && hb.head.getAs[Long]("n_purchases") === 0L
      && hb.head.getAs[Long]("n_users") === 1L)
    // entropy / confusion on an empty corpus
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(graft.operators.Corpus.langConfusion(emptyDocs).count() === 0)
    assert(graft.operators.Corpus.textEntropy(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() === 0)
  }

  test("round-11 operators on degenerate inputs: empty/verbatim out, no NaN rows") {
    import spark.implicits._
    import graft.operators.{Corpus, Dedup}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val short = Seq((1L, "just five tokens in here")).toDF("doc_id", "text")

    // substring family: empty corpus and sub-k docs produce no spans/runs;
    // the scrub returns sub-k docs verbatim with zero removals
    assert(Dedup.exactSubstringSpans(emptyDocs).count() === 0)
    assert(Dedup.exactSubstringRuns(emptyDocs).count() === 0)
    assert(Dedup.exactSubstringScrub(emptyDocs).count() === 0)
    assert(Dedup.exactSubstringRuns(short).count() === 0)
    val sc = Dedup.exactSubstringScrub(short).head()
    assert(sc.getAs[String]("clean_text") === "just five tokens in here"
      && sc.getAs[Long]("n_removed") === 0L)

    // incremental admission: empty corpus admits everything with null
    // attribution; an empty batch yields no verdict rows
    val batch = Seq((10L, (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val inc = Dedup.minhashIncremental(batch, emptyDocs).collect()
    assert(inc.length === 1 && inc.head.getAs[Boolean]("admit")
      && inc.head.isNullAt(inc.head.fieldIndex("dup_of")))
    assert(Dedup.minhashIncremental(emptyDocs, batch).count() === 0)

    // split: empty corpus -> empty; singleton is its own rep with a
    // valid split value
    assert(Dedup.leakageFreeSplit(emptyDocs).count() === 0)
    val sp = Dedup.leakageFreeSplit(short).head()
    assert(sp.getAs[Long]("rep") === 1L
      && Set("train", "val").contains(sp.getAs[String]("split")))

    // shard checksums: empty corpus -> no shard rows (not zero rows)
    assert(Corpus.shardChecksums(emptyDocs).count() === 0)

    // drift: a corpus whose batch side (doc_id % 5 == 0) is empty has
    // nothing to compare -> EMPTY output, never NaN shares
    val refOnly = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    assert(Corpus.corpusDrift(refOnly).count() === 0)
    assert(Corpus.corpusDrift(emptyDocs).count() === 0)
    val ds = Corpus.corpusDriftSummary(refOnly).head()
    assert(ds.getAs[Long]("n_buckets") === 0L)
  }

  test("round-12 operators on degenerate inputs: empty/null out, no ANSI errors") {
    import spark.implicits._
    import graft.operators.{Analytics, Corpus, Search, Similarity, Sketches}
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val emptyEvents = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")

    // curation wave: empty corpus -> empty frames, never a division error
    assert(Corpus.mixtureTemperature(emptyDocs).count() === 0)
    assert(Corpus.domainCapSample(emptyDocs).count() === 0)
    assert(Corpus.qualityAblation(emptyDocs).count() === 0)
    assert(Corpus.qualityDupGrid(emptyDocs).count() === 0)
    assert(Corpus.sourceQualityProfile(emptyDocs).count() === 0)
    assert(Search.nbClassify(emptyDocs).count() === 0)
    assert(Search.lmPplBuckets(emptyDocs).count() === 0)
    assert(Search.lmHeldoutScore(emptyDocs).count() === 0)

    // a one-doc corpus: NB still predicts (its own class), ppl buckets
    // place the doc in tile 1 when it has bigrams
    val one = Seq((1L, "a b a b", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val nb = Search.nbClassify(one).head()
    assert(nb.getAs[String]("pred_lang") === "en" && nb.getAs[Boolean]("correct"))

    // filtered search: empty corpus and a predicate that filters
    // EVERYTHING both yield empty results, not errors
    assert(Similarity.filteredTopK(emptyEmb).count() === 0)
    val noLabel = Seq((0L, Array.fill(64)(1.0f), 7))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.filteredTopK(noLabel).count() === 0)
    assert(Similarity.filteredIvfTopK(noLabel, nCentroids = 1).count() === 0)

    // join-size sketch: empty sides -> the d-row spine yields the exact
    // answer 0 (an empty join HAS size zero), null rel_error, one row,
    // no ANSI element_at/divide errors
    val emptyOrders = Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
    val emptyLines = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    val js = Sketches.amsJoinSize(emptyOrders, emptyLines).head()
    assert(js.getAs[Long]("est_join_size") === 0L)
    assert(js.getAs[Long]("true_join_size") === 0L)
    assert(js.isNullAt(js.fieldIndex("rel_error")))

    // gap sweep: an empty stream reports 0 sessions and NULL
    // events/session for every threshold
    val gs = Analytics.sessionizeGapSweep(emptyEvents).collect()
    assert(gs.length === 4)
    gs.foreach { r =>
      assert(r.getAs[Long]("n_sessions") === 0L
        && r.isNullAt(r.fieldIndex("events_per_session")))
    }
  }
}
