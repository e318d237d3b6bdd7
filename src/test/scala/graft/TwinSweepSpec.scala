package graft

import graft.streaming._
import org.apache.spark.sql.{DataFrame, Encoder, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** STRUCTURAL streaming-equivalence sweep (r11 verdict task 7) — the
  * registry-driven counterpart of `QuerySweepSpec`:
  *
  *   1. TOTALITY — every `SparkEntry.queries` key is classified in
  *      [[Twins]] (twin or declared no-twin), in both directions, so a
  *      new batch operator without a streaming decision fails here.
  *   2. REGISTRATION — every public method on [[Streaming]] is a
  *      registered twin, a declared variant, or declared auxiliary
  *      API, so a new streaming operator outside the sweep fails here.
  *   3. EQUIVALENCE — every registered twin replays the SHARED
  *      fixture (scrambled where the twin's arrival contract allows,
  *      event-time-ordered micro-batches with in-batch scramble where
  *      it requires order) and must reproduce its batch operator's
  *      result exactly. One runner per twin, coverage asserted.
  *
  * The deep per-twin edge-case specs stay in `StreamingSpec`; this
  * sweep is the completeness gate that keeps the twin surface total. */
class TwinSweepSpec extends SparkSpec {
  import spark.implicits._

  private implicit lazy val sqlCtx: SQLContext = spark.sqlContext

  private val H = 3600000000L
  private val D = 24 * H

  // ---- registry structure ----

  test("twin registry: every gated query key is classified, exactly once") {
    val keys = SparkEntry.queries.keySet
    val overlap = Twins.twinned.keySet intersect Twins.noTwin.keySet
    assert(overlap.isEmpty, s"keys classified twice: $overlap")
    val classified = Twins.twinned.keySet ++ Twins.noTwin.keySet
    assert(classified === keys,
      s"unclassified=${(keys -- classified).toSeq.sorted} " +
        s"stale=${(classified -- keys).toSeq.sorted}")
    assert(Twins.twinned.size >= 20, s"only ${Twins.twinned.size} twinned pairs")
  }

  test("twin registry: every public streaming operator is registered") {
    val methods = Streaming.getClass.getDeclaredMethods
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filterNot(m => m.isSynthetic || m.isBridge)
      // zero-parameter members are constants (val accessors), not operators
      .filter(_.getParameterCount > 0)
      .map(_.getName).filterNot(_.contains("$")).toSet
    val registered =
      Twins.twinned.values.toSet ++ Twins.variants.keySet ++ Twins.auxiliary.keySet
    assert(methods === registered,
      s"unregistered=${(methods -- registered).toSeq.sorted} " +
        s"phantom=${(registered -- methods).toSeq.sorted}")
    // variants must shadow a registered twin
    assert(Twins.variants.values.toSet.subsetOf(Twins.twinned.values.toSet))
  }

  test("twin registry: every registered twin has an equivalence runner") {
    assert(runners.keySet === Twins.twinned.values.toSet,
      s"missing=${(Twins.twinned.values.toSet -- runners.keySet).toSeq.sorted} " +
        s"orphan=${(runners.keySet -- Twins.twinned.values.toSet).toSeq.sorted}")
  }

  // ---- shared EVENTS fixture: 20 users, 4 channels + purchases,
  // 8 days, values exact binary quarters ----

  private lazy val fixEvents: IndexedSeq[Event] = {
    val types = Vector("click", "view", "signup", "error")
    val buf = scala.collection.mutable.ArrayBuffer[Event]()
    var id = 1L
    for (u <- 0L until 20L) {
      val nSess = 3 + (u % 5).toInt
      val base = D + (u % 7) * D + (u % 3) * H // base D: stay above the epoch watermark
      for (i <- 0 until nSess) {
        val t = types(((u * 7 + i * 3) % 4).toInt)
        val ts = base + (i / 2) * 5 * H + (i % 2) * 600000000L
        buf += Event(id, ts, u, t, 0.25 * ((id % 16) + 1)); id += 1
      }
      if (u % 3 != 2) {
        buf += Event(id, base + nSess * 5 * H + H, u, "purchase", 5.0 + (u % 4) * 2.5)
        id += 1
      }
      if (u % 6 == 1) {
        buf += Event(id, base + nSess * 5 * H + 9 * H, u, "purchase", 12.5); id += 1
      }
    }
    buf.toIndexedSeq
  }

  private lazy val fixEventsDF: DataFrame = fixEvents.toDF()
    .withColumn("event_date", timestamp_micros(col("ts_us")).cast("date"))

  private def scrambleKey(id: Long): Long = (id * 2654435761L) % 1000003L

  /** Globally scrambled thirds — arrival order unrelated to event time. */
  private lazy val partsShuffled: Seq[Seq[Event]] = {
    val sh = fixEvents.sortBy(e => scrambleKey(e.event_id))
    sh.grouped((sh.length + 2) / 3).map(_.toSeq).toSeq
  }

  /** Event-time-ordered thirds, scrambled WITHIN each micro-batch. */
  private lazy val partsOrdered: Seq[Seq[Event]] =
    fixEvents.sortBy(e => (e.ts_us, e.event_id))
      .grouped((fixEvents.length + 2) / 3)
      .map(_.sortBy(e => scrambleKey(e.event_id)).toSeq).toSeq

  private lazy val maxTs = fixEvents.map(_.ts_us).max

  /** Watermark advancers for the `Ordered` twins: a never-converting
    * sentinel user far past every real event, twice (advance + fire). */
  private lazy val sentinelEvents: Seq[Seq[Event]] = Seq(
    Seq(Event(900001L, maxTs + 40 * D, 999999L, "click", 0.0)),
    Seq(Event(900002L, maxTs + 41 * D, 999999L, "click", 0.0)))

  private lazy val fixSessions = graft.sources.Tables.deriveSessions(fixEventsDF)
  private lazy val fixConversions = graft.sources.Tables.deriveConversions(fixEventsDF)
  private lazy val fixCosts = graft.sources.Tables.deriveSessionCosts(fixEventsDF)
  private lazy val fixAssigned =
    graft.operators.Journeys.assign(fixSessions, fixConversions)
  private lazy val fixAttributed = graft.operators.IhcAttribution.attribute(
    graft.operators.Journeys.flagConversion(fixAssigned))

  // ---- shared DOCS fixture: exact dups, a simhash near-dup, a
  // low-quality doc, an n-gram half-overlap; doc_id order == ts order ----

  private def words(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
  private def longText(seed: Int) =
    (0 until 60).map(i => s"w${(seed * 61 + i * 7) % 1000}").mkString(" ")
  private lazy val goodText =
    "the quick brown fox jumps over a lazy dog while many other curious " +
      "animals watch from the forest edge with great interest " + words("tok", 80)

  private lazy val fixDocs: Seq[Doc] = Seq(
    Doc(1L, longText(1), "en", "t", H + 1 * H / 100),
    Doc(2L, longText(2), "en", "t", H + 2 * H / 100),
    Doc(3L, longText(1), "en", "t", H + 3 * H / 100), // exact dup of 1
    Doc(4L, longText(1) + " extra", "en", "t", H + 4 * H / 100), // near-dup of 1/3
    Doc(5L, goodText, "en", "t", H + 5 * H / 100),
    Doc(6L, "a a a a a a a a", "en", "t", H + 6 * H / 100), // low quality
    Doc(7L, longText(2), "en", "t", H + 7 * H / 100), // exact dup of 2
    Doc(8L, words("c", 40), "en", "t", H + 8 * H / 100),
    Doc(9L, words("a", 10) + " " + words("b", 10), "en", "t", H + 9 * H / 100))

  private lazy val fixDocsDF: DataFrame = fixDocs
    .map(d => (d.doc_id, d.text, d.lang, d.source, d.text.length.toLong))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Worst-case arrival for the doc twins: exact reverse of event time. */
  private lazy val docsReversed: Seq[Seq[Doc]] = fixDocs.reverse.map(Seq(_))

  private lazy val docSentinels: Seq[Seq[Doc]] = Seq(
    Seq(Doc(900001L, words("z", 8), "en", "t", 100 * H)),
    Seq(Doc(900002L, words("y", 8), "en", "t", 101 * H)))

  // ---- uniform replay harness ----

  private def runStream[T: Encoder](data: Seq[Seq[T]], mode: String, name: String)(
      mk: MemoryStream[T] => DataFrame): DataFrame = {
    val mem = MemoryStream[T]
    val q = mk(mem).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try data.foreach { p => mem.addData(p); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  // ---- one equivalence runner per registered twin ----

  private lazy val runners: Map[String, () => Unit] = Map(
    "windowedCounts" -> { () =>
      val got = runStream(partsShuffled, "complete", "tw_wc")(m =>
        Streaming.windowedCounts(m.toDF()))
        .select("window_start", "event_type", "n", "total_value").collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = fixEventsDF
        .withColumn("event_ts", timestamp_micros(col("ts_us")))
        .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
        .select(col("w.start"), col("event_type"), col("n"), col("total_value"))
        .collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got.nonEmpty && got === want)
    },

    "viewClickJoin" -> { () =>
      val views = fixEvents.filter(_.event_type == "view")
      val clicks = fixEvents.filter(_.event_type == "click")
      val vMem = MemoryStream[Event]
      val cMem = MemoryStream[Event]
      val q = Streaming.viewClickJoin(vMem.toDF(), cMem.toDF())
        .writeStream.format("memory").queryName("tw_vc").outputMode("append").start()
      try {
        // Stream-stream interval join: the arrival contract is bounded
        // disorder (2 h watermark on BOTH sides), so the two feeds must
        // advance together in event time — split the GLOBAL event-time
        // order into thirds, scramble within each third. A matched pair
        // is ≤1 h apart, so with aligned feeds the watermark
        // (min-of-sides − 2 h) can never evict a row before its partner
        // arrives.
        (views ++ clicks).sortBy(e => (e.ts_us, e.event_id))
          .grouped((views.length + clicks.length + 2) / 3)
          .foreach { part =>
            val sh = part.sortBy(e => scrambleKey(e.event_id))
            val v = sh.filter(_.event_type == "view")
            val c = sh.filter(_.event_type == "click")
            if (v.nonEmpty) vMem.addData(v)
            if (c.nonEmpty) cMem.addData(c)
            q.processAllAvailable()
          }
      } finally q.stop()
      val got = spark.table("tw_vc")
        .select("user_id", "view_id", "click_id", "lag_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        v <- views; c <- clicks
        if v.user_id == c.user_id
        lag = c.ts_us - v.ts_us
        if lag >= 0 && lag <= H
      } yield (v.user_id, v.event_id, c.event_id, lag)).toSet
      assert(want.nonEmpty && got === want)
    },

    "attributeIhcOrdered" -> { () =>
      val got = runStream(partsShuffled ++ sentinelEvents, "append", "tw_ihc")(m =>
        Streaming.attributeIhcOrdered(m.toDS(), delay = "30 days",
          pendingTtlUs = 365L * D).toDF())
        .as[IhcRow].collect().map(r => (r.conv_id, r.session_id, r.ihc)).toSet
      val want = fixAttributed.select("conv_id", "session_id", "ihc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(want.nonEmpty && got === want)
    },

    "channelReporting" -> { () =>
      val got = runStream(Seq(fixEvents), "complete", "tw_cr")(m =>
        Streaming.channelReporting(m.toDS(), fixSessions, fixCosts, fixConversions))
        .collect()
        .map(r => (r.getAs[String]("channel_name"),
          r.getAs[java.sql.Date]("date").toString, r.getAs[Double]("cost"),
          r.getAs[Double]("ihc"), r.getAs[Double]("ihc_revenue"))).toSet
      val want = graft.operators.Reporting
        .channelReporting(fixAttributed, fixSessions, fixCosts, fixConversions)
        .collect()
        .map(r => (r.getAs[String]("channel_name"),
          r.getAs[java.sql.Date]("date").toString, r.getAs[Double]("cost"),
          r.getAs[Double]("ihc"), r.getAs[Double]("ihc_revenue"))).toSet
      assert(want.nonEmpty && got === want)
    },

    "transitionCounts" -> { () =>
      val touches = fixSessions
        .selectExpr("user_id", "session_id", "ts_us", "channel_name")
        .as[SessionTouch].collect().sortBy(t => (t.ts_us, t.session_id))
      val parts = touches.grouped((touches.length + 2) / 3)
        .map(_.sortBy(t => scrambleKey(t.session_id)).toSeq).toSeq
      val got = runStream(parts, "append", "tw_tc")(m =>
        Streaming.transitionCounts(m.toDS()).toDF())
        .as[TransitionInc].collect()
        .groupBy(t => (t.from_channel, t.to_channel))
        .view.mapValues(_.map(_.n).sum).toMap
      val wu = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "session_id")
      val batchDf = touches.toSeq.toDF()
        .withColumn("nxt", lead("channel_name", 1).over(wu))
        .withColumn("rn", row_number().over(wu))
      val want = (
        batchDf.filter(col("nxt").isNotNull)
          .select(col("channel_name").as("f"), col("nxt").as("t"))
        unionByName
        batchDf.filter(col("rn") === 1)
          .select(lit(graft.operators.Markov.Start).as("f"),
            col("channel_name").as("t")))
        .groupBy("f", "t").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === want && got.values.sum === touches.length)
    },

    "transitionCounts2" -> { () =>
      val touches = fixSessions
        .selectExpr("user_id", "session_id", "ts_us", "channel_name")
        .as[SessionTouch].collect().sortBy(t => (t.ts_us, t.session_id))
      val parts = touches.grouped((touches.length + 2) / 3)
        .map(_.sortBy(t => scrambleKey(t.session_id)).toSeq).toSeq
      val got = runStream(parts, "append", "tw_tc2")(m =>
        Streaming.transitionCounts2(m.toDS()).toDF())
        .as[TransitionInc].collect()
        .groupBy(t => (t.from_channel, t.to_channel))
        .view.mapValues(_.map(_.n).sum).toMap
      val sep = graft.operators.Markov.StateSep
      val start = graft.operators.Markov.Start
      val wu = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "session_id")
      val batchDf = touches.toSeq.toDF()
        .withColumn("st", concat_ws(sep,
          coalesce(lag("channel_name", 1).over(wu), lit(start)),
          col("channel_name")))
        .withColumn("nxt", lead("st", 1).over(wu))
        .withColumn("rn", row_number().over(wu))
      val want = (
        batchDf.filter(col("nxt").isNotNull).select(col("st").as("f"), col("nxt").as("t"))
        unionByName
        batchDf.filter(col("rn") === 1).select(lit(start).as("f"), col("st").as("t")))
        .groupBy("f", "t").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === want && got.values.sum === touches.length)
    },

    "timeToConvertOrdered" -> { () =>
      val got = runStream(partsShuffled ++ sentinelEvents, "append", "tw_ttc")(m =>
        Streaming.timeToConvertOrdered(m.toDS(), delay = "30 days").toDF())
        .as[TtcOut].collect().filter(_.user_id != 999999L)
        .map(t => t.conv_id -> (t.journey_start_us, t.lag_us)).toMap
      val want = fixAssigned.groupBy("conv_id")
        .agg((min(col("conv_ts_us")) - min(col("ts_us"))).as("lag"),
          min(col("ts_us")).as("start"))
        .collect()
        .map(r => r.getAs[Long]("conv_id") ->
          (r.getAs[Long]("start"), r.getAs[Long]("lag"))).toMap
      assert(want.nonEmpty && got === want)
    },

    "channelOverlapIncsOrdered" -> { () =>
      val got = runStream(partsShuffled ++ sentinelEvents, "append", "tw_ov")(m =>
        Streaming.channelOverlapIncsOrdered(m.toDS(), delay = "30 days").toDF())
        .as[OverlapInc].collect()
        .groupBy(o => (o.ch_a, o.ch_b)).view.mapValues(_.map(_.n).sum).toMap
      val want = graft.operators.Journeys.channelOverlap(fixAssigned).collect()
        .map(r => (r.getAs[String]("ch_a"), r.getAs[String]("ch_b")) ->
          r.getAs[Long]("n_ab")).toMap
      assert(want.nonEmpty && got === want)
    },

    "journeyLengthsOrdered" -> { () =>
      val got = runStream(partsShuffled ++ sentinelEvents, "append", "tw_jl")(m =>
        Streaming.journeyLengthsOrdered(m.toDS(), delay = "30 days").toDF())
        .as[JourneyLen].collect()
        .groupBy(_.n_touches).view.mapValues(_.length.toLong).toMap
      val want = graft.operators.Journeys.lengthDistribution(fixAssigned).collect()
        .map(r => r.getAs[Long]("n_touches") -> r.getAs[Long]("n_journeys")).toMap
      assert(want.nonEmpty && got === want)
    },

    "scd2StateOrdered" -> { () =>
      val got = runStream(partsShuffled ++ sentinelEvents, "append", "tw_scd2")(m =>
        Streaming.scd2StateOrdered(m.toDS(), delay = "30 days").toDF())
        .as[Scd2Closed].collect().filter(_.user_id != 999999L)
        .map(c => (c.user_id, c.version) ->
          (c.state, c.valid_from_us, c.valid_to_us, c.n_events)).toMap
      val batch = graft.operators.Analytics.scd2UserState(fixEvents.toDF()).collect()
      val want = batch.filter(!_.getAs[Boolean]("is_current"))
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version")) ->
          ((r.getAs[String]("state"), r.getAs[Long]("valid_from_us"),
            r.getAs[Long]("valid_to_us"), r.getAs[Long]("n_events")))).toMap
      assert(want.nonEmpty && got === want)
    },

    "anomalyZ" -> { () =>
      val got = runStream(partsOrdered, "append", "tw_anom")(m =>
        Streaming.anomalyZ(m.toDS()).toDF())
        .as[AnomalyOut].collect().map(a => (a.event_type, a.epoch_day) -> a).toMap
      val openDay = fixEvents.groupBy(_.event_type).view
        .mapValues(_.map(e => Math.floorDiv(e.ts_us, D)).max).toMap
      val closed = graft.operators.Analytics.eventsAnomaly(fixEventsDF).collect()
        .filter(r => r.getAs[java.sql.Date]("event_date").toLocalDate.toEpochDay !=
          openDay(r.getAs[String]("event_type")))
      assert(closed.nonEmpty && got.size === closed.length)
      closed.foreach { r =>
        val a = got((r.getAs[String]("event_type"),
          r.getAs[java.sql.Date]("event_date").toLocalDate.toEpochDay))
        assert(a.n === r.getAs[Long]("n") && a.mean7 === r.getAs[Double]("mean7") &&
          a.std7 === r.getAs[Double]("std7") && a.zscore === r.getAs[Double]("zscore") &&
          a.is_anomaly === r.getAs[Boolean]("is_anomaly"))
      }
    },

    "sessionize" -> { () =>
      val closers = fixEvents.map(_.user_id).distinct.sorted.zipWithIndex.map {
        case (u, i) => Event(910000L + i, maxTs + 50 * D, u, "click", 0.0)
      }
      val got = runStream(Seq(fixEvents, closers), "append", "tw_sess")(m =>
        Streaming.sessionize(m.toDS()).toDF())
        .as[SessionOut].collect()
        .filter(_.session_start_us < maxTs + 49 * D)
        .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
        .toSet
      val want = graft.operators.Analytics.sessionize(fixEvents.toDF()).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
      assert(want.nonEmpty && got === want)
    },

    "funnelProgress" -> { () =>
      val table = runStream(partsOrdered, "update", "tw_funnel")(m =>
        Streaming.funnelProgress(m.toDF().as[Event]).toDF())
      val streamed = table.collect()
        .map(r => r.getAs[Long]("user_id") ->
          (Option(r.get(r.fieldIndex("t1"))), Option(r.get(r.fieldIndex("t2"))),
            Option(r.get(r.fieldIndex("t3"))), Option(r.get(r.fieldIndex("t4"))),
            r.getAs[Long]("funnel_depth")))
        .groupBy(_._1).map { case (u, v) => u -> v.last._2 }
      val want = graft.operators.Analytics.windowFunnel(fixEventsDF).collect()
        .map { r =>
          def o(n: String) = Option(r.get(r.fieldIndex(n)))
          r.getAs[Long]("user_id") ->
            ((o("t1"), o("t2"), o("t3"), o("t4"), r.getAs[Long]("funnel_depth")))
        }.toMap
      val entrants = streamed.filter(_._2._1.isDefined)
      assert(want.nonEmpty && entrants.keySet === want.keySet)
      entrants.foreach { case (u, v) => assert(v === want(u), s"user $u") }
    },

    "kmvCounts" -> { () =>
      val got = runStream(partsShuffled, "update", "tw_kmv")(m =>
        Streaming.kmvCounts(m.toDF()).toDF())
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (c, v) => c -> v.last }
      val want = graft.operators.Sketches.kmvDistinct(fixEventsDF).collect()
        .map(r => r.getString(0) -> ((r.getString(0), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got.keySet === want.keySet && want.nonEmpty)
      got.foreach { case (c, v) => assert(v === want(c), s"channel $c") }
    },

    "hllCounts" -> { () =>
      val got = runStream(partsShuffled, "update", "tw_hll")(m =>
        Streaming.hllCounts(m.toDF()).toDF())
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (c, v) => c -> v.last }
      val want = graft.operators.Sketches.hllDistinct(fixEventsDF).collect()
        .map(r => r.getString(0) -> ((r.getString(0), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got.keySet === want.keySet && want.nonEmpty)
      got.foreach { case (c, v) => assert(v === want(c), s"channel $c") }
    },

    "histQuantiles" -> { () =>
      val got = runStream(partsShuffled, "update", "tw_histq")(m =>
        Streaming.histQuantiles(m.toDF()).toDF())
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .groupBy(_._1).map { case (c, v) => c -> v.last }
      val want = graft.operators.Sketches.histQuantiles(fixEventsDF).collect()
        .map(r => r.getString(0) ->
          ((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(got.keySet === want.keySet && want.nonEmpty)
      got.foreach { case (c, v) => assert(v === want(c), s"channel $c") }
    },

    "topHitters" -> { () =>
      // m = 64 > 20 users: the exact regime, where the sketch MUST equal
      // the batch groupBy counts ranked (count desc, item asc)
      val obs = fixEvents.map(e => HitterObs(e.event_type, s"u${e.user_id}"))
      val parts = obs.grouped((obs.length + 2) / 3).map(_.toSeq).toSeq
      val rows = runStream(parts, "update", "tw_hit")(m =>
        Streaming.topHitters(m.toDS(), m = 64, k = 5).toDF())
        .as[HitterTop].collect()
      def lastRun(c: String): Seq[(String, Long, Int)] = {
        val rs = rows.filter(_.channel == c)
        rs.drop(rs.zipWithIndex.filter(_._1.rank == 1).last._2)
          .map(t => (t.item, t.est_count, t.rank)).toSeq
      }
      val counts = obs.groupBy(o => (o.channel, o.item)).view
        .mapValues(_.size.toLong).toMap
      val channels = obs.map(_.channel).distinct
      assert(channels.nonEmpty)
      channels.foreach { c =>
        val want = counts.collect { case ((`c`, i), n) => (i, n) }.toSeq
          .sortBy { case (i, n) => (-n, i) }.take(5)
          .zipWithIndex.map { case ((i, n), r) => (i, n, r + 1) }
        assert(lastRun(c) === want, s"channel $c")
      }
    },

    "ewmaSmooth" -> { () =>
      val rows = runStream(partsOrdered, "append", "tw_ewma")(m =>
        Streaming.ewmaSmooth(m.toDS()).toDF())
        .as[EwmaOut].collect()
      val keys = fixEvents.map(_.event_type).distinct.sorted
      assert(keys.nonEmpty)
      keys.foreach { key =>
        val evs = fixEvents.filter(_.event_type == key)
        val open = evs.map(e => Math.floorDiv(e.ts_us, D)).max
        val want = graft.operators.Analytics.ordersEwma(
            evs.toDF().select(timestamp_micros(col("ts_us")).as("o_orderdate"),
              col("value").as("o_totalprice")))
          .collect()
          .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1), r.getDouble(2)))
          .filter(_._1 != open).toSeq
        val got = rows.filter(_.key == key).sortBy(_.epoch_day)
          .map(r => (r.epoch_day, r.revenue, r.ewma)).toSeq
        assert(got === want, s"key $key")
      }
    },

    "lmFilteredIngest" -> { () =>
      val model = graft.operators.Search.lmModel(fixDocsDF).cache()
      try {
        val inDist = fixDocs.filter(d => Set(1L, 2L, 5L)(d.doc_id))
        val ood = Doc(900001L,
          "zzq qxv wvk zzq qxv totally unseen bigram soup", "xx", "t", H)
        val out = java.nio.file.Files.createTempDirectory("tw_lm").toString
        val mem = MemoryStream[Doc]
        val q = Streaming.lmFilteredIngest(
          mem.toDF(), model, minAvgLik = 0.05, s"$out/data", s"$out/ckpt")
        try {
          mem.addData(inDist :+ ood); q.processAllAvailable()
        } finally q.stop()
        val got = spark.read.parquet(s"$out/data").collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("avg_lik"))).toMap
        val want = graft.operators.Search.lmScoreAgainst(
            (inDist :+ ood).map(d => (d.doc_id, d.text)).toDF("doc_id", "text"), model)
          .collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("avg_lik"))).toMap
          .filter(_._2 >= 0.05)
        assert(want.nonEmpty && got === want)
      } finally model.unpersist()
    },

    "semanticNearMarks" -> { () =>
      import graft.operators.{Dedup, Similarity}
      import org.apache.spark.sql.functions.{col, element_at}
      // the C113 fixture: index = one-hot e_id at vec_id % 10 != 0;
      // batch = {0: near-dup of 7, 10: novel, 20: exact twin of 5}
      def onehot(d: Int, extra: (Int, Float)*) = Array.tabulate(64)(i =>
        extra.toMap.getOrElse(i, if (i == d) 1f else 0f)).toSeq
      val idxRows = ((1L to 9L) ++ (11L to 19L)).map(id => (id, onehot(id.toInt)))
      val batchRows = Seq(
        (0L, onehot(7, 50 -> 0.1f)), (10L, onehot(40)), (20L, onehot(5)))
      val all = (idxRows ++ batchRows).toDF("vec_id", "embedding")
      val want = Dedup.embeddingIncremental(all).collect()
        .map(r => r.getAs[Long]("new_vec") ->
          (Option(r.get(r.fieldIndex("dup_of"))), r.getAs[Boolean]("admit"))).toMap
      // the index at rest: same quantizer training side the batch probe uses
      val idxDF = all.filter(col("vec_id") % 10 =!= 0)
      val cents = Similarity.trainCentroids(
        idxDF, Similarity.autoCellCount(idxDF.count()), 2)
      val feat = idxDF.select(col("vec_id").as("doc_id"), col("embedding"),
        graft.functions.VectorFunctions.normExact(col("embedding")).as("nrm"))
      val index = feat.withColumn("cell",
        element_at(Similarity.cellRank(cents, col("embedding"), col("nrm")), 1)
          .getField("cid"))
      // worst-case reversed arrival + a late sentinel to pass the watermark
      val stream = batchRows.reverse.zipWithIndex.map { case ((id, e), i) =>
        Seq(Vec(id, H + i * H / 100, e))
      } :+ Seq(Vec(900000L, 100 * H, onehot(63)))
      val got = runStream(stream, "append", "tw_semnear")(m =>
        Streaming.semanticNearMarks(m.toDF(), cents, index))
        .collect().filter(_.getAs[Long]("new_vec") < 900000L)
        .map(r => r.getAs[Long]("new_vec") ->
          (Option(r.get(r.fieldIndex("dup_of"))), r.getAs[Boolean]("admit"))).toMap
      assert(want.nonEmpty && got === want,
        s"stream marks must equal the batch probe: got $got want $want")
    },

    "qualityScores" -> { () =>
      // weights train batch-side on the same corpus; the stream is pure
      // scoring, so worst-case (reversed) arrival must not move a bit
      val w = graft.operators.Corpus.classifierWeights(fixDocsDF)
      val got = runStream(docsReversed, "append", "tw_qscore")(m =>
        Streaming.qualityScores(m.toDF(), w))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      val want = graft.operators.Corpus.qualityClassifier(fixDocsDF).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      assert(want.nonEmpty && got === want,
        s"stream scores must be bit-equal to the batch scorer")
    },

    "dedupExactOrdered" -> { () =>
      val parts = fixDocs.sortBy(d => scrambleKey(d.doc_id))
        .grouped(3).map(_.toSeq).toSeq
      val got = runStream(parts ++ docSentinels, "append", "tw_dedup")(m =>
        Streaming.dedupExactOrdered(m.toDS(), delay = "1 hour").toDF())
        .as[DedupAdmit].collect().filter(_.doc_id < 900000L)
        .map(a => a.text_hash -> a.doc_id).toMap
      val want = graft.operators.Dedup.exact(
          fixDocsDF.select(col("doc_id"), col("text"))).collect()
        .map(r => r.getAs[String]("text_hash") -> r.getAs[Long]("keep_doc_id")).toMap
      assert(want.nonEmpty && got === want)
    },

    "noveltyMarksOrdered" -> { () =>
      val marks = runStream(docsReversed ++ docSentinels, "append", "tw_nov")(m =>
        Streaming.noveltyMarksOrdered(m.toDS(), delay = "1 hour").toDF())
        .as[NoveltyMark].filter(col("doc_id") < 900000L)
      val got = marks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), count(when(col("novel"), 1)).as("n_novel"))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_shingles").cast("double"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      val want = graft.operators.Dedup.ngramNovelty(fixDocsDF).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(want.nonEmpty && got === want)
    },

    "simhashNearMarksOrdered" -> { () =>
      val got = runStream(docsReversed ++ docSentinels, "append", "tw_simnear")(m =>
        Streaming.simhashNearMarksOrdered(m.toDS(), delay = "1 hour").toDF())
        .as[NearDupMark].collect().filter(_.doc_a < 900000L)
        .map(m => (m.doc_a, m.doc_b, m.hamming)).distinct.sorted.toSeq
      val want = graft.operators.Dedup.simhashNear(
          fixDocsDF.select(col("doc_id"), col("text"))).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Number]("hamming").intValue())).sorted.toSeq
      assert(got === want)
      assert(got.contains((1L, 3L, 0)), "the exact-dup pair must surface")
    },

    "amsGrid" -> { () =>
      val got = runStream(partsShuffled, "update", "tw_ams")(m =>
        Streaming.amsGrid(m.toDF()).toDF())
        .collect()
        .map(r => ((r.getString(0), r.getInt(1), r.getLong(2)), r.getLong(3))).toSet
      // prefix simulation with the same md5 form: the emitted set must be
      // exactly each touched cell's running sum after each batch
      def md5Hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def cellsOf(e: Event): Seq[((String, Int, Long), Long)] =
        (0 until 5).map { r =>
          val h = java.lang.Long.parseLong(md5Hex(s"$r:${e.user_id}").substring(0, 15), 16)
          ((e.event_type, r, h % 256), if ((h & 256) == 0L) 1L else -1L)
        }
      val sums = scala.collection.mutable.Map.empty[(String, Int, Long), Long]
      val want = scala.collection.mutable.Set.empty[((String, Int, Long), Long)]
      partsShuffled.foreach { batch =>
        val touched = batch.flatMap(cellsOf)
        touched.groupBy(_._1).foreach { case (cell, incs) =>
          sums(cell) = sums.getOrElse(cell, 0L) + incs.map(_._2).sum
        }
        touched.map(_._1).distinct.foreach(c => want += ((c, sums(c))))
      }
      assert(got === want.toSet)
      // ...and the JVM md5 path equals the SQL conv path the batch
      // estimator (B76) is built from
      val cellsExpr = (0 until 5).map(r =>
        s"named_struct('r', $r, 'h', CAST(conv(substring(md5(concat('$r:', " +
          s"CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT))")
        .mkString("array(", ",", ")")
      val batchWant = fixEventsDF
        .selectExpr("event_type AS channel", s"inline($cellsExpr)")
        .selectExpr("channel", "r", "h % 256 AS bucket",
          "CASE WHEN (h & 256) = 0 THEN 1L ELSE -1L END AS sign")
        .groupBy("channel", "r", "bucket")
        .agg(sum("sign").as("s")).collect()
        .map(r => ((r.getString(0), r.getInt(1), r.getLong(2)), r.getLong(3))).toMap
      assert(sums.toMap === batchWant)
    },

    "admitDocuments" -> { () =>
      val got = runStream(Seq(fixDocs.take(5), fixDocs.drop(5)), "append", "tw_admit")(
        m => Streaming.admitDocuments(m.toDF()))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // batch twin: exact-dedup reps + the same quality gate — curation's
      // admissible set (fixture doc_id order == arrival order, so the
      // batch min-id keeper IS the first arrival)
      val want = graft.operators.Corpus.curation(fixDocsDF)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(want.nonEmpty && got === want)
    })

  // one visible test per registered pair — a twin without a runner fails
  // the coverage test above; a failing runner names its pair here
  Twins.twinned.toSeq.sortBy(_._1).foreach { case (key, twin) =>
    test(s"twin sweep: $key ≡ Streaming.$twin on the shared fixture") {
      runners(twin)()
    }
  }
}
