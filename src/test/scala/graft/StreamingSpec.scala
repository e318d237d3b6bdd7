package graft

import graft.streaming.{Event, IhcRow, SessionOut, Streaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in µs

  test("watermarked windowed counts match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = (0 until 100).map(i =>
      Event(i.toLong, i.toLong * 600000000L, i % 3, if (i % 2 == 0) "click" else "view", i * 1.0))
    mem.addData(events)
    val q = Streaming.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wc")
        .select("window_start", "event_type", "n", "total_value")
        .orderBy("window_start", "event_type").collect()
      val want = events.toDF()
        .withColumn("event_ts", timestamp_micros(col("ts_us")))
        .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type").collect()
      assert(got.toSeq === want.toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    // synthetic two-stream workload: per user, views every 40 min and
    // clicks every 70 min — some clicks land inside a view's 1 h window,
    // some between windows, some match two views
    // base offset keeps the earliest event above the initial watermark
    // (epoch): stateful ops treat event_time <= watermark as late
    val base = 86400000000L
    val views = (0 until 60).map(i =>
      Event(1000L + i, base + (i / 3).toLong * 2400000000L, (i % 3).toLong, "view", 0.0))
    val clicks = (0 until 30).map(i =>
      Event(2000L + i, base + (i / 3).toLong * 4200000000L + 300000000L, (i % 3).toLong, "click", 1.0))
    val vMem = MemoryStream[Event]
    val cMem = MemoryStream[Event]
    val q = Streaming.viewClickJoin(vMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("vc_join").outputMode("append").start()
    try {
      // interleaved micro-batches: matches must assemble across them
      views.grouped(25).zipAll(clicks.grouped(13), Seq.empty, Seq.empty).foreach {
        case (v, c) =>
          if (v.nonEmpty) vMem.addData(v)
          if (c.nonEmpty) cMem.addData(c)
          q.processAllAvailable()
      }
      val got = spark.table("vc_join")
        .select("user_id", "view_id", "click_id", "lag_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = (for {
        v <- views; c <- clicks
        if v.user_id == c.user_id
        lag = c.ts_us - v.ts_us
        if lag >= 0 && lag <= H
      } yield (v.user_id, v.event_id, c.event_id, lag)).toSet
      assert(got === want)
      assert(want.nonEmpty && want.size < views.size * clicks.size / 3)
    } finally q.stop()
  }

  test("streaming dedup suppresses replayed events across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup_ev").outputMode("append").start()
    try {
      mem.addData(Seq(Event(1L, H, 1L, "click", 1.0), Event(2L, H + 1, 1L, "view", 2.0)))
      q.processAllAvailable()
      // a replay of event 1 (same id) plus one new event
      mem.addData(Seq(Event(1L, H, 1L, "click", 1.0), Event(3L, H + 2, 2L, "click", 3.0)))
      q.processAllAvailable()
      val ids = spark.table("dedup_ev").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("late_wc").outputMode("append").start()
    try {
      // batch 1: one event per hour 0..5 → watermark advances to 3h
      mem.addData((0 to 5).map(h => Event(h.toLong, h * H, 1L, "click", 1.0)))
      q.processAllAvailable()
      // batch 2: an event 2.5h behind the watermark (dropped) + a fresh one
      mem.addData(Seq(Event(100L, H / 2, 1L, "click", 1.0), Event(101L, 6 * H, 1L, "click", 1.0)))
      q.processAllAvailable()
      val w0 = spark.table("late_wc")
        .filter(col("window_start") === timestamp_micros(lit(0L))).collect()
      assert(w0.length === 1, s"window [0,1h) should have been finalized once: ${w0.toSeq}")
      assert(w0.head.getAs[Long]("n") === 1L,
        "the late event must not reach the finalized window")
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // user 1: events at 0h, 1h (same session), then 10h (gap -> closes first)
    mem.addData(Event(1, 0L, 1, "click", 1.0), Event(2, H, 1, "view", 1.0))
    val q = Streaming.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sess").count() === 0) // session still open
      mem.addData(Event(3, 10 * H, 1, "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("sess").as[SessionOut].collect()
      assert(closed.length === 1)
      assert(closed.head === SessionOut(1, 0, 2, 0L, H))
      // a second gap closes the next session with incremented index
      mem.addData(Event(4, 30 * H, 1, "click", 1.0))
      q.processAllAvailable()
      val two = spark.table("sess").as[SessionOut].collect().sortBy(_.session_idx)
      assert(two.length === 2)
      assert(two(1) === SessionOut(1, 1, 1, 10 * H, 10 * H))
    } finally q.stop()
  }

  test("streaming IHC attribution matches the batch pipeline bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts_us, e.event_id))
    val (first, second) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[Event]
    val q = Streaming.attributeIhc(mem.toDS())
      .writeStream.format("memory").queryName("ihc_stream").outputMode("append").start()
    try {
      mem.addData(first.toSeq)
      q.processAllAvailable()
      mem.addData(second.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("ihc_stream").as[IhcRow].collect()
        .map(r => (r.conv_id, r.session_id, r.ihc)).toSet
      val batch = SparkEntry.queries("ihc_attribution")(spark, sfDir)
        .select("conv_id", "session_id", "ihc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("hardened streaming IHC: shuffled out-of-order micro-batches match batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect()
    // deterministic shuffle: order by a multiplicative hash of event_id, so
    // arrival order across micro-batches bears no relation to event time
    val shuffled = evs.sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val parts = shuffled.grouped((shuffled.length + 2) / 3).toSeq
    val day = 24L * 3600 * 1000000L
    val mem = MemoryStream[Event]
    val q = Streaming.attributeIhcOrdered(
        mem.toDS(), delay = "30 days", pendingTtlUs = 365L * day)
      .writeStream.format("memory").queryName("ihc_ord").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val maxTs = evs.map(_.ts_us).max
      // two sentinel batches: the first advances the watermark past every
      // real event (+40 d − 30 d delay), the second runs a batch AT that
      // watermark so event-time timeouts fire and every buffer flushes
      mem.addData(Seq(Event(900001L, maxTs + 40 * day, 999999L, "click", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Event(900002L, maxTs + 41 * day, 999999L, "click", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("ihc_ord").as[IhcRow].collect()
        .map(r => (r.conv_id, r.session_id, r.ihc)).toSet
      val batch = SparkEntry.queries("ihc_attribution")(spark, sfDir)
        .select("conv_id", "session_id", "ihc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("journey TTL: sessions beyond the TTL are not claimed and leave state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.attributeIhcOrdered(mem.toDS(), delay = "1 hour", pendingTtlUs = H)
      .writeStream.format("memory").queryName("ihc_ttl").outputMode("append").start()
    try {
      // user 1: session at 0 h (abandoned), session at 9.5 h, purchase at 10 h
      mem.addData(Seq(
        Event(1L, 0L, 1L, "click", 1.0),
        Event(2L, 9 * H + H / 2, 1L, "view", 1.0),
        Event(3L, 10 * H, 1L, "purchase", 50.0)))
      q.processAllAvailable()
      // sentinels (other user) advance the watermark past the purchase
      mem.addData(Seq(Event(100L, 20 * H, 9L, "click", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Event(101L, 21 * H, 9L, "click", 0.0)))
      q.processAllAvailable()
      val rows = spark.table("ihc_ttl").as[IhcRow].collect()
      // the 0 h session aged out (evicted by the watermark sweep before the
      // purchase was even processed); the in-TTL session takes full credit
      assert(rows.map(r => (r.conv_id, r.session_id, r.ihc)).toSeq === Seq((3L, 2L, 1.0)))
    } finally q.stop()
  }

  test("streaming channel reporting converges to the batch report bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts_us, e.event_id))
    val mem = MemoryStream[Event]
    val q = Streaming.channelReporting(
      mem.toDS(),
      Tables.sessions(spark, sfDir),
      Tables.sessionCosts(spark, sfDir),
      Tables.conversions(spark, sfDir))
      .writeStream.format("memory").queryName("cr_stream").outputMode("complete").start()
    try {
      mem.addData(evs.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("cr_stream").collect()
        .map(r => (r.getAs[String]("channel_name"), r.getAs[java.sql.Date]("date").toString,
          r.getAs[Double]("cost"), r.getAs[Double]("ihc"), r.getAs[Double]("ihc_revenue"))).toSet
      val batch = SparkEntry.queries("channel_reporting")(spark, sfDir).collect()
        .map(r => (r.getAs[String]("channel_name"), r.getAs[java.sql.Date]("date").toString,
          r.getAs[Double]("cost"), r.getAs[Double]("ihc"), r.getAs[Double]("ihc_revenue"))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming transition counts converge to the batch lead-window counts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.{SessionTouch, TransitionInc}
    val touches = Tables.sessions(spark, sfDir)
      .selectExpr("user_id", "session_id", "ts_us", "channel_name")
      .as[SessionTouch].collect().sortBy(t => (t.ts_us, t.session_id))
    // three micro-batches (event-time order across batches, the operator's
    // stated arrival contract; order WITHIN a batch is scrambled to prove
    // the per-batch sort carries it)
    val parts = touches.grouped((touches.length + 2) / 3).toSeq
      .map(_.sortBy(t => (t.session_id * 2654435761L) % 1000003L))
    val mem = MemoryStream[SessionTouch]
    val q = Streaming.transitionCounts(mem.toDS())
      .writeStream.format("memory").queryName("trans_inc").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("trans_inc").as[TransitionInc].collect()
        .groupBy(t => (t.from_channel, t.to_channel))
        .view.mapValues(_.map(_.n).sum).toMap
      // batch twin: the same per-user lead-window logic over all touches
      val wu = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "session_id")
      val batchDf = touches.toSeq.toDF()
        .withColumn("nxt", lead("channel_name", 1).over(wu))
        .withColumn("rn", row_number().over(wu))
      val batch = (
        batchDf.filter(col("nxt").isNotNull)
          .select(col("channel_name").as("f"), col("nxt").as("t"))
        unionByName
        batchDf.filter(col("rn") === 1)
          .select(lit(graft.operators.Markov.Start).as("f"), col("channel_name").as("t")))
        .groupBy("f", "t").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(streamed.values.sum === touches.length) // one increment per touch
    } finally q.stop()
  }

  test("second-order streaming transition counts converge to the batch composite counts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.{SessionTouch, TransitionInc}
    val touches = Tables.sessions(spark, sfDir)
      .selectExpr("user_id", "session_id", "ts_us", "channel_name")
      .as[SessionTouch].collect().sortBy(t => (t.ts_us, t.session_id))
    val parts = touches.grouped((touches.length + 2) / 3).toSeq
      .map(_.sortBy(t => (t.session_id * 2654435761L) % 1000003L))
    val mem = MemoryStream[SessionTouch]
    val q = Streaming.transitionCounts2(mem.toDS())
      .writeStream.format("memory").queryName("trans2_inc").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("trans2_inc").as[TransitionInc].collect()
        .groupBy(t => (t.from_channel, t.to_channel))
        .view.mapValues(_.map(_.n).sum).toMap
      // batch twin: per-user composite lag + lead windows over all touches
      val sep = graft.operators.Markov.StateSep
      val start = graft.operators.Markov.Start
      val wu = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "session_id")
      val batchDf = touches.toSeq.toDF()
        .withColumn("st", concat_ws(sep,
          coalesce(lag("channel_name", 1).over(wu), lit(start)), col("channel_name")))
        .withColumn("nxt", lead("st", 1).over(wu))
        .withColumn("rn", row_number().over(wu))
      val batch = (
        batchDf.filter(col("nxt").isNotNull)
          .select(col("st").as("f"), col("nxt").as("t"))
        unionByName
        batchDf.filter(col("rn") === 1)
          .select(lit(start).as("f"), col("st").as("t")))
        .groupBy("f", "t").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(streamed.values.sum === touches.length)
    } finally q.stop()
  }

  test("streaming sessionizer agrees with the batch sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 50).map { i =>
      // user i%2; bursts of 3 events 10 min apart, bursts 5 h apart
      val burst = i / 6
      Event(i.toLong, burst * 5 * H + (i % 6) * 600000000L, i % 2, "click", 1.0)
    }
    val mem = MemoryStream[Event]
    mem.addData(events)
    // close everything with a far-future event per user, then drop those
    mem.addData(Event(9998, 10000 * H, 0, "click", 0.0), Event(9999, 10000 * H, 1, "click", 0.0))
    val q = Streaming.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess2").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events)).toSet
      val batch = graft.operators.Analytics
        .sessionize(events.toDF().withColumnRenamed("ts_us", "ts_us"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
      // sentinels close every real session but stay open themselves, and the
      // batch side never sees them — so the session sets agree exactly
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming corpus admission: quality gate + content dedup match the batch filter") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.streaming.Doc]
    val good = "the quick brown fox jumps over a lazy dog while many other " +
      "curious animals watch from the forest edge with great interest " +
      ((1 to 80).map(i => s"tok$i").mkString(" "))
    val bad = "a a a a a a a a" // repetitious + stopword-heavy -> low quality
    val q = Streaming.admitDocuments(mem.toDF())
      .writeStream.format("memory").queryName("admit").outputMode("append").start()
    try {
      mem.addData(Seq(
        graft.streaming.Doc(1L, good, "en", "s1", H),
        graft.streaming.Doc(2L, bad, "en", "s1", H + 1)))
      q.processAllAvailable()
      // batch 2: same content as doc 1 (different id) + a genuinely new doc
      mem.addData(Seq(
        graft.streaming.Doc(3L, good, "en", "s2", H + 2),
        graft.streaming.Doc(4L, good + " extra distinct tail", "en", "s2", H + 3)))
      q.processAllAvailable()
      val admitted = spark.table("admit").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      // 2 fails the gate; 3 is a content duplicate of 1; 1 and 4 admitted
      assert(admitted === Seq(1L, 4L))
      // scores match the batch expressions on the same rows
      val sc = spark.table("admit").filter(col("doc_id") === 1L).head
      val batch = Seq((1L, good)).toDF("doc_id", "text")
        .select(graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
          graft.functions.TextFunctions.fingerprint(col("text")).as("fp")).head
      assert(sc.getAs[Double]("quality_score") === batch.getAs[Double]("q"))
      assert(sc.getAs[String]("fingerprint") === batch.getAs[String]("fp"))
      // the dedup state store reports through the metrics surface
      val metrics = Streaming.stateMetrics(q)
      assert(metrics.nonEmpty)
      assert(metrics.exists(m => m.operator.nonEmpty && m.num_rows_total >= 2))
    } finally q.stop()
  }

  test("streaming funnel converges to the batch windowed funnel over in-order batches") {
    implicit val sqlCtx = spark.sqlContext
    val eventsTable = graft.sources.Tables.events(spark, sfDir)
    val rows = eventsTable
      .select("event_id", "ts_us", "user_id", "event_type", "value").collect()
      .map(r => graft.streaming.Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.ts_us, e.event_id)) // in-order delivery (stated assumption)
    val mem = MemoryStream[graft.streaming.Event]
    val q = Streaming.funnelProgress(mem.toDF().as[graft.streaming.Event])
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      rows.grouped((rows.length / 4) + 1).foreach { b =>
        mem.addData(b.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("funnel_stream").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (Option(r.get(r.fieldIndex("t1"))), Option(r.get(r.fieldIndex("t2"))),
            Option(r.get(r.fieldIndex("t3"))), Option(r.get(r.fieldIndex("t4"))),
            r.getAs[Long]("funnel_depth")))
        .groupBy(_._1).map { case (u, v) => u -> v.last._2 } // last update = final
      val batch = graft.operators.Analytics.windowFunnel(eventsTable).collect()
        .map { r =>
          def o(n: String) = Option(r.get(r.fieldIndex(n)))
          r.getAs[Long]("user_id") ->
            ((o("t1"), o("t2"), o("t3"), o("t4"), r.getAs[Long]("funnel_depth")))
        }.toMap
      // batch rows exist only for funnel entrants (t1 defined)
      val entrants = streamed.filter(_._2._1.isDefined)
      assert(entrants.keySet === batch.keySet)
      entrants.foreach { case (u, got) => assert(got === batch(u), s"user $u") }
    } finally q.stop()
  }

  test("streaming histogram quantiles converge bit-equal to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val eventsTable = graft.sources.Tables.events(spark, sfDir)
    val rows = eventsTable
      .select("event_id", "ts_us", "user_id", "event_type", "value").collect()
      .map(r => graft.streaming.Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    // deterministic scramble, split into 3 micro-batches — bin counts are
    // plain sums, so arrival order cannot change the converged state
    val scrambled = rows.sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val mem = MemoryStream[graft.streaming.Event]
    val q = Streaming.histQuantiles(mem.toDF())
      .writeStream.format("memory").queryName("histq_stream")
      .outputMode("update").start()
    try {
      scrambled.grouped((scrambled.length / 3) + 1).foreach { b =>
        mem.addData(b.toSeq); q.processAllAvailable()
      }
      // last emitted estimate per channel = the converged histogram
      val streamed = spark.table("histq_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .groupBy(_._1).map { case (c, v) => c -> v.last }
      val batch = graft.operators.Sketches.histQuantiles(eventsTable).collect()
        .map(r => r.getString(0) ->
          ((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (c, got) => assert(got === batch(c), s"channel $c") }
    } finally q.stop()
  }

  test("streaming HLL converges bit-equal to the batch sketch across scrambled batches") {
    implicit val sqlCtx = spark.sqlContext
    val eventsTable = graft.sources.Tables.events(spark, sfDir)
    val rows = eventsTable
      .select("event_id", "ts_us", "user_id", "event_type", "value").collect()
      .map(r => graft.streaming.Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    // deterministic scramble, split into 3 micro-batches
    val scrambled = rows.sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val mem = MemoryStream[graft.streaming.Event]
    val q = Streaming.hllCounts(mem.toDF())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    try {
      scrambled.grouped((scrambled.length / 3) + 1).foreach { b =>
        mem.addData(b.toSeq); q.processAllAvailable()
      }
      // last emitted estimate per channel = the converged registers
      val streamed = spark.table("hll_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (c, v) => c -> v.last }
      val batch = graft.operators.Sketches.hllDistinct(eventsTable).collect()
        .map(r => r.getString(0) -> ((r.getString(0), r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (c, got) => assert(got === batch(c), s"channel $c") }
    } finally q.stop()
  }

  test("streaming KMV converges bit-equal to the batch sketch across scrambled batches") {
    implicit val sqlCtx = spark.sqlContext
    val eventsTable = graft.sources.Tables.events(spark, sfDir)
    val rows = eventsTable
      .select("event_id", "ts_us", "user_id", "event_type", "value").collect()
      .map(r => graft.streaming.Event(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.event_id * 40503L) % 65537L)
    val mem = MemoryStream[graft.streaming.Event]
    val q = Streaming.kmvCounts(mem.toDF())
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      rows.grouped((rows.length / 3) + 1).foreach { b =>
        mem.addData(b.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("kmv_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (c, v) => c -> v.last }
      val batch = graft.operators.Sketches.kmvDistinct(eventsTable).collect()
        .map(r => r.getString(0) -> ((r.getString(0), r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (c, got) => assert(got === batch(c), s"channel $c") }
    } finally q.stop()
  }

  test("exactly-once manifest sink: kill + replayed micro-batch admits each doc once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def mkDoc(id: Long, text: String) =
      graft.streaming.Doc(id, text, "en", "s1", H + id)
    def corpusDf(docs: Seq[graft.streaming.Doc]) = docs
      .map(d => (d.doc_id, d.text, d.lang, d.source, d.text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val state = java.nio.file.Files.createTempDirectory("graft_stream_corpus").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val d1 = mkDoc(1L, "first streaming document with sufficiently distinct content")
    val d2 = mkDoc(2L, "second streaming document carrying different words entirely")
    val d3 = mkDoc(3L, "third document arriving only after the restart happened")
    val mem = MemoryStream[graft.streaming.Doc]
    def sink() = Streaming.corpusIngestSink(
      mem.toDF().select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars")),
      state, ckpt)
    // batch 0 commits, then the query is KILLED
    val q1 = sink()
    try { mem.addData(Seq(d1, d2)); q1.processAllAvailable() } finally q1.stop()
    assert(graft.operators.Corpus.documents(spark, state).count() === 2)
    // the crash window: the sink committed batch 0 but (say) the
    // checkpoint advance was lost — restart re-delivers the SAME batch id
    // with the SAME data. The committed watermark absorbs it outright.
    assert(Streaming.ingestMicroBatch(corpusDf(Seq(d1, d2)), state, batchId = 0L) === 0L)
    // restart from the SAME checkpoint: the stream continues exactly-once
    val q2 = sink()
    try { mem.addData(Seq(d3)); q2.processAllAvailable() } finally q2.stop()
    val docs = graft.operators.Corpus.documents(spark, state)
    assert(docs.count() === 3)
    assert(docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 3L))
    // the watermark is manifest METADATA, committed with the data
    assert(graft.sources.Manifest.meta(spark, state)
      .get("stream_batch_id").map(_.toLong).exists(_ >= 1L))
    // a replay from a FRESH checkpoint (new stream incarnation, batch ids
    // ahead of the old watermark, same content) is content-deduplicated
    assert(Streaming.ingestMicroBatch(corpusDf(Seq(d1, d2)), state, batchId = 9L) === 0L)
    assert(graft.operators.Corpus.documents(spark, state).count() === 3)
  }

  test("streaming LM filter: foreachBatch scores equal the batch model apply exactly") {
    implicit val sqlCtx = spark.sqlContext
    // frozen model trained on the committed sf0.001 corpus
    val corpus = graft.sources.Tables.documents(spark, sfDir)
    val model = graft.operators.Search.lmModel(corpus).cache()
    // stream: two in-distribution docs (drawn from the corpus itself),
    // one out-of-distribution doc whose bigrams the model never saw
    val inDist = corpus.orderBy("doc_id").limit(2)
      .select("doc_id", "text").collect()
      .map(r => graft.streaming.Doc(r.getLong(0), r.getString(1), "en", "s1", H))
    val ood = graft.streaming.Doc(900001L,
      "zzq qxv wvk zzq qxv totally unseen bigram soup", "xx", "s1", H + 1)
    val mem = MemoryStream[graft.streaming.Doc]
    val out = java.nio.file.Files.createTempDirectory("graft_lm_ingest").toString
    val q = Streaming.lmFilteredIngest(
      mem.toDF(), model, minAvgLik = 0.05, s"$out/data", s"$out/ckpt")
    try {
      mem.addData(Seq(inDist(0), ood))
      q.processAllAvailable()
      mem.addData(Seq(inDist(1)))
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$out/data")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("avg_lik"))).toMap
      // batch twin over the SAME three docs against the SAME frozen model
      val allDocs = (inDist :+ ood).toSeq
        .map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
      val batch = graft.operators.Search.lmScoreAgainst(allDocs, model)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("avg_lik"))).toMap
      val admitted = batch.filter(_._2 >= 0.05)
      assert(streamed.keySet === admitted.keySet)
      streamed.foreach { case (id, lik) => assert(lik === admitted(id)) }
      // the OOD doc scores strictly lower than either in-distribution doc
      assert(batch(900001L) < batch.removed(900001L).values.min)
    } finally q.stop()
  }

  test("streaming anomaly z-scores emit the batch twin's completed days bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.AnomalyOut
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts_us, e.event_id))
    // three event-time-ordered micro-batches, each scrambled in-batch
    val parts = evs.grouped((evs.length + 2) / 3).toSeq
      .map(_.sortBy(e => (e.event_id * 2654435761L) % 1000003L))
    val mem = MemoryStream[Event]
    val q = Streaming.anomalyZ(mem.toDS())
      .writeStream.format("memory").queryName("anomaly_z").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("anomaly_z").as[AnomalyOut].collect()
        .map(a => (a.event_type, a.epoch_day) -> a).toMap
      val batch = graft.operators.Analytics
        .eventsAnomaly(Tables.events(spark, sfDir)).collect()
      // each type's final observed day is still OPEN in the stream — the
      // batch twin minus those rows is exactly what must have been emitted
      val openDay = evs.groupBy(_.event_type).view
        .mapValues(_.map(e => Math.floorDiv(e.ts_us, 86400000000L)).max).toMap
      val closed = batch.filter { r =>
        r.getAs[java.sql.Date]("event_date").toLocalDate.toEpochDay !=
          openDay(r.getAs[String]("event_type"))
      }
      assert(closed.nonEmpty && streamed.size === closed.length)
      closed.foreach { r =>
        val a = streamed((r.getAs[String]("event_type"),
          r.getAs[java.sql.Date]("event_date").toLocalDate.toEpochDay))
        assert(a.n === r.getAs[Long]("n"))
        assert(a.mean7 === r.getAs[Double]("mean7")) // exact, not approx
        assert(a.std7 === r.getAs[Double]("std7"))
        assert(a.zscore === r.getAs[Double]("zscore"))
        assert(a.is_anomaly === r.getAs[Boolean]("is_anomaly"))
      }
    } finally q.stop()
  }

  test("streaming SCD2 emits exactly the batch twin's closed versions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.Scd2Closed
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts_us, e.event_id))
    // three event-time-ordered micro-batches, each scrambled in-batch
    val parts = evs.grouped((evs.length + 2) / 3).toSeq
      .map(_.sortBy(e => (e.event_id * 2654435761L) % 1000003L))
    val mem = MemoryStream[Event]
    val q = Streaming.scd2State(mem.toDS())
      .writeStream.format("memory").queryName("scd2_closed").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("scd2_closed").as[Scd2Closed].collect()
        .map(c => (c.user_id, c.version) -> c).toMap
      val batch = graft.operators.Analytics.scd2UserState(evs.toSeq.toDF())
        .collect()
      val closed = batch.filter(!_.getAs[Boolean]("is_current"))
      assert(streamed.size === closed.length)
      closed.foreach { r =>
        val c = streamed((r.getAs[Long]("user_id"), r.getAs[Long]("version")))
        assert(c.state === r.getAs[String]("state"))
        assert(c.valid_from_us === r.getAs[Long]("valid_from_us"))
        assert(c.valid_to_us === r.getAs[Long]("valid_to_us"))
        assert(c.n_events === r.getAs[Long]("n_events"))
      }
      // every user's OPEN version is absent from the stream output (it has
      // no valid_to yet) — exactly the batch twin's is_current rows
      val open = batch.filter(_.getAs[Boolean]("is_current"))
      open.foreach { r =>
        assert(!streamed.contains((r.getAs[Long]("user_id"), r.getAs[Long]("version"))))
      }
    } finally q.stop()
  }

  test("streaming heavy hitters: exact below capacity, one-sided and bounded above") {
    import graft.streaming.{HitterObs, HitterTop}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HitterObs]
    val q = Streaming.topHitters(mem.toDS(), m = 4, k = 3)
      .writeStream.format("memory").queryName("hitters").outputMode("update").start()
    try {
      // channel x stays ≤ m distinct (exact regime); channel y pushes 6
      // distinct items through the 4-counter table (eviction regime)
      val b1 = Seq("a", "a", "b", "c", "a").map(HitterObs("x", _)) ++
        Seq("p", "q", "p").map(HitterObs("y", _))
      val b2 = Seq("b", "a", "a", "b").map(HitterObs("x", _)) ++
        Seq("r", "s", "t", "u", "p").map(HitterObs("y", _))
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val rows = spark.table("hitters").as[HitterTop].collect()
      // final emission per channel = the last rank-1-led run in table order
      def lastRun(c: String): Seq[(String, Long, Int)] = {
        val rs = rows.filter(_.channel == c)
        rs.drop(rs.zipWithIndex.filter(_._1.rank == 1).last._2)
          .map(t => (t.item, t.est_count, t.rank)).toSeq
      }
      // exact regime ≡ the batch groupBy counts, ranked (count desc, item)
      assert(lastRun("x") === Seq(("a", 5L, 1), ("b", 3L, 2), ("c", 1L, 3)))
      // eviction regime: deterministic fold (min-count/min-item evictions),
      // estimates one-sided (≥ true counts), table never exceeds m
      assert(lastRun("y") === Seq(("p", 3L, 1), ("t", 2L, 2), ("u", 2L, 3)))
      val trueY = Map("p" -> 3L, "q" -> 1L, "r" -> 1L, "s" -> 1L, "t" -> 1L, "u" -> 1L)
      lastRun("y").foreach { case (i, est, _) => assert(est >= trueY(i)) }
    } finally q.stop()
  }

  test("streaming exact dedup admits each distinct text once and matches the batch keepers") {
    import graft.streaming.{DedupAdmit, Doc}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = Streaming.dedupExact(mem.toDS())
      .writeStream.format("memory").queryName("dedup_docs").outputMode("append").start()
    try {
      // batch 1 holds each text's minimum doc_id (the streaming prefix
      // invariant under which stream admissions equal batch keepers),
      // including an intra-batch duplicate pair (1,4)
      val b1 = Seq(
        Doc(1L, "alpha text", "en", "t", 0L), Doc(2L, "beta text", "en", "t", 1L),
        Doc(3L, "gamma text", "en", "t", 2L), Doc(4L, "alpha text", "en", "t", 3L))
      // batch 2: replays of alpha/beta under new ids + one novel text
      val b2 = Seq(
        Doc(10L, "alpha text", "en", "t", 4L), Doc(11L, "beta text", "en", "t", 5L),
        Doc(12L, "delta text", "en", "t", 6L))
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val got = spark.table("dedup_docs").as[DedupAdmit].collect()
        .map(a => a.text_hash -> a.doc_id).toMap
      // one admission per distinct text, none re-admitted on replay
      assert(spark.table("dedup_docs").count() === got.size)
      val batch = graft.operators.Dedup.exact(
        (b1 ++ b2).toDF().select(col("doc_id"), col("text"))).collect()
        .map(r => r.getAs[String]("text_hash") -> r.getAs[Long]("keep_doc_id")).toMap
      assert(got === batch) // same hashes, same min-doc_id keepers
      // the md5 keys are Spark's md5() values (joinable with batch frames)
      val sparkMd5 = Seq("alpha text").toDF("t").select(md5(col("t"))).head.getString(0)
      assert(got.contains(sparkMd5))
    } finally q.stop()
  }

  test("streaming novelty marks fold to the batch ngramNovelty ratios over ordered batches") {
    import graft.streaming.{Doc, NoveltyMark}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = Streaming.noveltyMarks(mem.toDS())
      .writeStream.format("memory").queryName("novelty_marks").outputMode("append").start()
    try {
      def words(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
      val a = words("a", 20)
      // doc 1 fresh; doc 2 duplicates doc 1; doc 3 half-overlaps doc 1;
      // doc 4 (later batch) fresh; doc 5 (later batch) duplicates doc 1
      val b1 = Seq(
        Doc(1L, a, "en", "t", 0L), Doc(2L, a, "en", "t", 1L),
        Doc(3L, words("a", 10) + " " + words("b", 10), "en", "t", 2L))
      val b2 = Seq(
        Doc(4L, words("c", 20), "en", "t", 3L), Doc(5L, a, "en", "t", 4L))
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val marks = spark.table("novelty_marks").as[NoveltyMark]
      val streamed = marks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("novel"), 1)).as("n_novel"))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_shingles").cast("double"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      val batch = graft.operators.Dedup.ngramNovelty(
        (b1 ++ b2).map(d => (d.doc_id, d.text, d.lang, d.source, 1L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(streamed === batch)
      assert(streamed.find(_._1 == 2L).exists(_._4 == 0.0)) // exact dup scores 0
      assert(streamed.find(_._1 == 4L).exists(_._4 == 1.0)) // fresh doc scores 1
    } finally q.stop()
  }

  test("streaming EWMA closes days bit-equal to the batch fold, per key") {
    import graft.streaming.EwmaOut
    implicit val sqlCtx = spark.sqlContext
    val D = 86400000000L
    val mem = MemoryStream[Event]
    val q = Streaming.ewmaSmooth(mem.toDS())
      .writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    try {
      // click: day0 = 4+6, day1 = 20, day2 = 30, day3 open; view interleaved
      mem.addData(Seq(
        Event(1L, 0L, 1L, "click", 4.0), Event(2L, 1000L, 1L, "click", 6.0),
        Event(10L, 500L, 2L, "view", 2.5)))
      q.processAllAvailable()
      mem.addData(Seq(
        Event(3L, D + 5L, 1L, "click", 20.0), Event(11L, D + 6L, 2L, "view", 7.5)))
      q.processAllAvailable()
      mem.addData(Seq(
        Event(4L, 2 * D, 1L, "click", 30.0), Event(5L, 3 * D, 1L, "click", 1.0)))
      q.processAllAvailable()
      val rows = spark.table("ewma_out").as[EwmaOut].collect()
      val click = rows.filter(_.key == "click").sortBy(_.epoch_day)
        .map(r => (r.epoch_day, r.revenue, r.ewma)).toSeq
      // batch twin over the SAME day totals
      val orders = Seq((0L, 4.0), (0L, 6.0), (1L, 20.0), (2L, 30.0), (3L, 1.0))
        .toDF("d", "o_totalprice")
        .withColumn("o_orderdate", timestamp_micros(col("d") * D))
      val batch = graft.operators.Analytics.ordersEwma(orders).collect()
        .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1), r.getDouble(2)))
      // the stream has closed every day except the open day 3
      assert(click === batch.take(3).toSeq)
      // second key isolated: view's day0 closed with its own total
      val view = rows.filter(_.key == "view").map(r => (r.epoch_day, r.revenue, r.ewma))
      assert(view.toSeq === Seq((0L, 2.5, 2.5)))
    } finally q.stop()
  }

  // ---- reorder-hardened twins (r8 verdict task 7): shuffled cross-batch
  // arrival must still be bit-equal to batch ----

  test("hardened SCD2: shuffled out-of-order micro-batches match the batch twin bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.Scd2Closed
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect()
    // GLOBAL deterministic shuffle — arrival order across micro-batches
    // bears no relation to event time (the D4b harness)
    val shuffled = evs.sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val parts = shuffled.grouped((shuffled.length + 2) / 3).toSeq
    val day = 24L * 3600 * 1000000L
    val maxTs = evs.map(_.ts_us).max
    val mem = MemoryStream[Event]
    val q = Streaming.scd2StateOrdered(mem.toDS(), delay = "30 days")
      .writeStream.format("memory").queryName("scd2_ord").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      // sentinels (same type → open version only, no closed rows) advance
      // the watermark past every real event, then fire the flush timeouts
      mem.addData(Seq(Event(900001L, maxTs + 40 * day, 999999L, "click", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Event(900002L, maxTs + 41 * day, 999999L, "click", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("scd2_ord").as[Scd2Closed].collect()
        .filter(_.user_id != 999999L)
        .map(c => (c.user_id, c.version) -> c).toMap
      val batch = graft.operators.Analytics.scd2UserState(evs.toSeq.toDF()).collect()
      val closed = batch.filter(!_.getAs[Boolean]("is_current"))
      assert(streamed.size === closed.length)
      closed.foreach { r =>
        val c = streamed((r.getAs[Long]("user_id"), r.getAs[Long]("version")))
        assert(c.state === r.getAs[String]("state"))
        assert(c.valid_from_us === r.getAs[Long]("valid_from_us"))
        assert(c.valid_to_us === r.getAs[Long]("valid_to_us"))
        assert(c.n_events === r.getAs[Long]("n_events"))
      }
    } finally q.stop()
  }

  test("hardened exact dedup: shuffled micro-batches still admit the batch min-doc keepers") {
    import graft.streaming.{DedupAdmit, Doc}
    implicit val sqlCtx = spark.sqlContext
    val H = 3600000000L
    // 60 docs over 20 distinct texts; doc ids ordered by event time, so
    // the batch min-doc_id keeper is the earliest arrival per text
    val docs = (1 to 60).map(i => Doc(i.toLong, s"text ${i % 20}", "en", "t", i * H / 100))
    val shuffled = docs.sortBy(d => (d.doc_id * 2654435761L) % 1000003L)
    val parts = shuffled.grouped(20).toSeq
    val mem = MemoryStream[Doc]
    val q = Streaming.dedupExactOrdered(mem.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_ord").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p); q.processAllAvailable() }
      mem.addData(Seq(Doc(900001L, "sentinel one", "en", "t", 100 * H)))
      q.processAllAvailable()
      mem.addData(Seq(Doc(900002L, "sentinel two", "en", "t", 101 * H)))
      q.processAllAvailable()
      val got = spark.table("dedup_ord").as[DedupAdmit].collect()
        .filter(_.doc_id < 900000L).map(a => a.text_hash -> a.doc_id).toMap
      val batch = graft.operators.Dedup.exact(
        docs.toDF().select(col("doc_id"), col("text"))).collect()
        .map(r => r.getAs[String]("text_hash") -> r.getAs[Long]("keep_doc_id")).toMap
      assert(got === batch)
      assert(spark.table("dedup_ord").as[DedupAdmit].collect()
        .count(_.doc_id < 900000L) === batch.size) // exactly one admission per text
    } finally q.stop()
  }

  test("hardened novelty marks: shuffled micro-batches fold to the batch ngramNovelty ratios") {
    import graft.streaming.{Doc, NoveltyMark}
    implicit val sqlCtx = spark.sqlContext
    val H = 3600000000L
    def words(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val a = words("a", 20)
    val docs = Seq(
      Doc(1L, a, "en", "t", 1 * H / 100),
      Doc(2L, a, "en", "t", 2 * H / 100),
      Doc(3L, words("a", 10) + " " + words("b", 10), "en", "t", 3 * H / 100),
      Doc(4L, words("c", 20), "en", "t", 4 * H / 100),
      Doc(5L, a, "en", "t", 5 * H / 100))
    // worst-case arrival: exact reverse of event time, one doc per batch
    val parts = docs.reverse.map(Seq(_))
    val mem = MemoryStream[Doc]
    val q = Streaming.noveltyMarksOrdered(mem.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("novelty_ord").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p); q.processAllAvailable() }
      mem.addData(Seq(Doc(900001L, words("z", 5), "en", "t", 100 * H)))
      q.processAllAvailable()
      mem.addData(Seq(Doc(900002L, words("y", 5), "en", "t", 101 * H)))
      q.processAllAvailable()
      val marks = spark.table("novelty_ord").as[NoveltyMark].filter(col("doc_id") < 900000L)
      val streamed = marks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("novel"), 1)).as("n_novel"))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_shingles").cast("double"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      val batch = graft.operators.Dedup.ngramNovelty(
        docs.map(d => (d.doc_id, d.text, d.lang, d.source, 1L))
          .toDF("doc_id", "text", "lang", "source", "n_chars")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(streamed === batch)
      assert(streamed.find(_._1 == 2L).exists(_._4 == 0.0)) // later dup scores 0
      assert(streamed.find(_._1 == 1L).exists(_._4 == 1.0)) // true first owner keeps 1
    } finally q.stop()
  }

  test("streaming time-to-convert emits the batch journey spans bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.TtcOut
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts_us, e.event_id))
    // in-order micro-batches, scrambled WITHIN each batch (the operator's
    // arrival contract; the per-batch sort must restore it)
    val parts = events.grouped((events.length + 2) / 3).toSeq
      .map(_.sortBy(e => (e.event_id * 2654435761L) % 1000003L))
    val mem = MemoryStream[Event]
    val q = Streaming.timeToConvert(mem.toDS())
      .writeStream.format("memory").queryName("ttc_out").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("ttc_out").as[TtcOut].collect()
        .map(t => t.conv_id -> (t.journey_start_us, t.lag_us)).toMap
      // batch twin: per-journey span from the greedy assignment
      val batch = graft.operators.Journeys.assign(
          Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
        .groupBy("conv_id")
        .agg((min(col("conv_ts_us")) - min(col("ts_us"))).as("lag"),
          min(col("ts_us")).as("start"))
        .collect()
        .map(r => r.getAs[Long]("conv_id") ->
          (r.getAs[Long]("start"), r.getAs[Long]("lag"))).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming channel-overlap increments sum to the batch pair counts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.OverlapInc
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts_us, e.event_id))
    val parts = events.grouped((events.length + 2) / 3).toSeq
      .map(_.sortBy(e => (e.event_id * 2654435761L) % 1000003L))
    val mem = MemoryStream[Event]
    val q = Streaming.channelOverlapIncs(mem.toDS())
      .writeStream.format("memory").queryName("overlap_inc").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("overlap_inc").as[OverlapInc].collect()
        .groupBy(o => (o.ch_a, o.ch_b))
        .view.mapValues(_.map(_.n).sum).toMap
      val batch = graft.operators.Journeys.channelOverlap(
          graft.operators.Journeys.assign(
            Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir)))
        .collect()
        .map(r => (r.getAs[String]("ch_a"), r.getAs[String]("ch_b")) -> r.getAs[Long]("n_ab"))
        .toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming journey lengths reproduce the batch length distribution") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.JourneyLen
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts_us, e.event_id))
    val parts = events.grouped((events.length + 2) / 3).toSeq
      .map(_.sortBy(e => (e.event_id * 2654435761L) % 1000003L))
    val mem = MemoryStream[Event]
    val q = Streaming.journeyLengths(mem.toDS())
      .writeStream.format("memory").queryName("jlen_out").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      val streamed = spark.table("jlen_out").as[JourneyLen].collect()
        .groupBy(_.n_touches).view.mapValues(_.length.toLong).toMap
      val batch = graft.operators.Journeys.lengthDistribution(
          graft.operators.Journeys.assign(
            Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir)))
        .collect()
        .map(r => r.getAs[Long]("n_touches") -> r.getAs[Long]("n_journeys")).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("hardened journey twins: globally shuffled micro-batches match batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Tables
    import graft.streaming.{TtcOut, OverlapInc, JourneyLen}
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts_us", "user_id", "event_type", "value")
      .as[Event].collect()
    // GLOBAL deterministic shuffle — arrival order across micro-batches
    // bears no relation to event time (the D4b harness)
    val shuffled = evs.sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val parts = shuffled.grouped((shuffled.length + 2) / 3).toSeq
    val day = 24L * 3600 * 1000000L
    val maxTs = evs.map(_.ts_us).max
    val assigned = graft.operators.Journeys.assign(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))

    def drive[T](q: org.apache.spark.sql.streaming.StreamingQuery,
                 mem: MemoryStream[Event]): Unit = {
      parts.foreach { p => mem.addData(p.toSeq); q.processAllAvailable() }
      // sentinel sessions (never purchases) advance the watermark past
      // every real event, firing the flush timeouts
      mem.addData(Seq(Event(900001L, maxTs + 40 * day, 999999L, "click", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Event(900002L, maxTs + 41 * day, 999999L, "click", 0.0)))
      q.processAllAvailable()
    }

    // 1. time-to-convert: per-journey starts and lags
    val ttcMem = MemoryStream[Event]
    val ttcQ = Streaming.timeToConvertOrdered(ttcMem.toDS(), delay = "30 days")
      .writeStream.format("memory").queryName("ttc_ord").outputMode("append").start()
    try {
      drive(ttcQ, ttcMem)
      val streamed = spark.table("ttc_ord").as[TtcOut].collect()
        .filter(_.user_id != 999999L)
        .map(t => t.conv_id -> (t.journey_start_us, t.lag_us)).toMap
      val batch = assigned.groupBy("conv_id")
        .agg((min(col("conv_ts_us")) - min(col("ts_us"))).as("lag"),
          min(col("ts_us")).as("start"))
        .collect()
        .map(r => r.getAs[Long]("conv_id") ->
          (r.getAs[Long]("start"), r.getAs[Long]("lag"))).toMap
      assert(streamed === batch)
    } finally ttcQ.stop()

    // 2. channel overlap: summed pair increments
    val ovMem = MemoryStream[Event]
    val ovQ = Streaming.channelOverlapIncsOrdered(ovMem.toDS(), delay = "30 days")
      .writeStream.format("memory").queryName("ov_ord").outputMode("append").start()
    try {
      drive(ovQ, ovMem)
      val streamed = spark.table("ov_ord").as[OverlapInc].collect()
        .groupBy(o => (o.ch_a, o.ch_b)).view.mapValues(_.map(_.n).sum).toMap
      val batch = graft.operators.Journeys.channelOverlap(assigned).collect()
        .map(r => (r.getAs[String]("ch_a"), r.getAs[String]("ch_b")) -> r.getAs[Long]("n_ab"))
        .toMap
      assert(streamed === batch)
    } finally ovQ.stop()

    // 3. journey lengths: the histogram
    val jlMem = MemoryStream[Event]
    val jlQ = Streaming.journeyLengthsOrdered(jlMem.toDS(), delay = "30 days")
      .writeStream.format("memory").queryName("jl_ord").outputMode("append").start()
    try {
      drive(jlQ, jlMem)
      val streamed = spark.table("jl_ord").as[JourneyLen].collect()
        .groupBy(_.n_touches).view.mapValues(_.length.toLong).toMap
      val batch = graft.operators.Journeys.lengthDistribution(assigned).collect()
        .map(r => r.getAs[Long]("n_touches") -> r.getAs[Long]("n_journeys")).toMap
      assert(streamed === batch)
    } finally jlQ.stop()
  }

  test("streaming simhash near-dup marks equal the batch simhashNear pair set over ordered batches") {
    import graft.streaming.{Doc, NearDupMark}
    implicit val sqlCtx = spark.sqlContext
    def text(seed: Int) =
      (0 until 60).map(i => s"w${(seed * 61 + i * 7) % 1000}").mkString(" ")
    val b1 = Seq(
      Doc(1L, text(1), "en", "t", 0L), Doc(2L, text(2), "en", "t", 1L),
      Doc(3L, text(1), "en", "t", 2L)) // 3 exact-dups 1 → hamming 0
    val b2 = Seq(
      Doc(10L, text(1) + " extra", "en", "t", 3L), // near-dup of 1 and 3
      Doc(11L, text(3), "en", "t", 4L),
      Doc(12L, text(2), "en", "t", 5L)) // cross-batch exact dup of 2
    val mem = MemoryStream[Doc]
    val q = Streaming.simhashNearMarks(mem.toDS())
      .writeStream.format("memory").queryName("simnear_marks").outputMode("append").start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = spark.table("simnear_marks").as[NearDupMark].collect()
        .map(m => (m.doc_a, m.doc_b, m.hamming)).distinct.sorted.toSeq
      val batch = graft.operators.Dedup.simhashNear(
        (b1 ++ b2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text")).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Number]("hamming").intValue())).sorted.toSeq
      assert(streamed === batch)
      assert(streamed.contains((1L, 3L, 0)), "exact dup pair must surface")
      assert(streamed.contains((2L, 12L, 0)), "cross-batch dup pair must surface")
    } finally q.stop()
  }

  test("hardened simhash near-dup marks: reverse-order replay equals the batch pair set") {
    import graft.streaming.{Doc, NearDupMark}
    implicit val sqlCtx = spark.sqlContext
    def text(seed: Int) =
      (0 until 60).map(i => s"w${(seed * 61 + i * 7) % 1000}").mkString(" ")
    val docs = Seq(
      Doc(1L, text(1), "en", "t", 1 * H / 100),
      Doc(2L, text(2), "en", "t", 2 * H / 100),
      Doc(3L, text(1), "en", "t", 3 * H / 100),
      Doc(4L, text(1) + " extra", "en", "t", 4 * H / 100),
      Doc(5L, text(2), "en", "t", 5 * H / 100))
    // worst-case arrival: exact reverse of event time, one doc per batch
    val parts = docs.reverse.map(Seq(_))
    val mem = MemoryStream[Doc]
    val q = Streaming.simhashNearMarksOrdered(mem.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("simnear_ord").outputMode("append").start()
    try {
      parts.foreach { p => mem.addData(p); q.processAllAvailable() }
      // fresh-text watermark advancers flush the buffers
      mem.addData(Seq(Doc(900001L, text(7), "en", "t", 100 * H)))
      q.processAllAvailable()
      mem.addData(Seq(Doc(900002L, text(8), "en", "t", 101 * H)))
      q.processAllAvailable()
      val streamed = spark.table("simnear_ord").as[NearDupMark].collect()
        .filter(_.doc_a < 900000L)
        .map(m => (m.doc_a, m.doc_b, m.hamming)).distinct.sorted.toSeq
      val batch = graft.operators.Dedup.simhashNear(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Number]("hamming").intValue())).sorted.toSeq
      assert(streamed === batch)
      assert(streamed.contains((1L, 3L, 0)))
    } finally q.stop()
  }

  test("disorder beyond delay is dropped VISIBLY: droppedLateRows counts the straggler") {
    import graft.streaming.{Doc, NearDupMark}
    implicit val sqlCtx = spark.sqlContext
    def text(seed: Int) =
      (0 until 60).map(i => s"w${(seed * 61 + i * 7) % 1000}").mkString(" ")
    val mem = MemoryStream[Doc]
    // the listener attaches BEFORE the first micro-batch, so its total is
    // exact however many progress entries the ring buffer later evicts
    val counter = Streaming.dropCounter(spark)
    val q = Streaming.simhashNearMarksOrdered(mem.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("simnear_late").outputMode("append").start()
    try {
      // advance the watermark far past hour 2...
      mem.addData(Seq(Doc(1L, text(1), "en", "t", 100 * H)))
      q.processAllAvailable()
      mem.addData(Seq(Doc(2L, text(7), "en", "t", 101 * H)))
      q.processAllAvailable()
      assert(Streaming.droppedLateRows(q) === 0L)
      // ...then deliver an exact dup of doc 1 whose event time (hour 2)
      // is ~98 h behind the watermark: out of contract, dropped by the
      // exec before the stateful function runs
      mem.addData(Seq(Doc(3L, text(1), "en", "t", 2 * H)))
      q.processAllAvailable()
      mem.addData(Seq(Doc(900001L, text(8), "en", "t", 200 * H)))
      q.processAllAvailable()
      val marks = spark.table("simnear_late").as[NearDupMark].collect()
      // the suppression is real (no (1,3) mark despite identical text)...
      assert(!marks.exists(m => m.doc_a == 1L && m.doc_b == 3L))
      // ...and it is NOT silent: every banded row of doc 3 is counted
      val dropped = Streaming.droppedLateRows(q)
      assert(dropped > 0L, "late straggler must surface in the drop metric")
      val last = Streaming.stateMetrics(q)
      assert(last.forall(_.num_rows_dropped_by_watermark >= 0L))
      // the DropCounter listener must converge on the SAME exact total —
      // it counts per progress EVENT, not from the bounded recentProgress
      // ring, so on a long-running query it is the one that stays right.
      // Events ride the async listener bus: poll until delivery.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (counter.dropped(q) < dropped && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(counter.dropped(q) === dropped,
        s"listener total ${counter.dropped(q)} != ring-buffer total $dropped")
    } finally { q.stop(); counter.detach(spark) }
  }

  test("semanticNearMarksFromState: marks over a stateDir equal the frame-fed " +
    "twin on the same snapshot, including across a generation swap") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Corpus
    import graft.streaming.Vec
    val state = java.nio.file.Files.createTempDirectory("graft-semstate").toString
    def onehot(d: Int, extra: (Int, Float)*) = Array.tabulate(64)(i =>
      extra.toMap.getOrElse(i, if (i == d) 1f else 0f)).toSeq
    def doc(id: Long, vec: Seq[Float]) = (id, s"unique text $id", "en", "t", 14L, vec)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars", "embedding")
    val idx = ((1L to 9L) ++ (11L to 19L)).map(id => doc(id, onehot(id.toInt)))
    assert(Corpus.ingestSemanticNearDup(spark, idx.toDF(cols: _*), state) === idx.size.toLong)

    def run(name: String, batch: Seq[Vec])(
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Map[Long, (Option[Any], Boolean)] = {
      val mem = MemoryStream[Vec]
      val q = mk(mem.toDF()).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // the late sentinel arrives in its own micro-batch so the watermark
      // passes the fixture events and the append-mode aggregate emits
      try Seq(batch, Seq(Vec(900000L, 100 * H, onehot(63)))).foreach { p =>
        mem.addData(p); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect()
        .filter(_.getAs[Long]("new_vec") < 900000L)
        .map(r => r.getAs[Long]("new_vec") ->
          (Option(r.get(r.fieldIndex("dup_of"))), r.getAs[Boolean]("admit"))).toMap
    }

    // the C113 fixture batch: 0 near-dups index doc 7, 10 is novel, 20
    // exactly twins index doc 5 — the state-fed gate must mark like the
    // frame-fed twin reading the SAME committed snapshot
    val batch1 = Seq(
      Vec(0L, H, onehot(7, 50 -> 0.1f)), Vec(10L, H, onehot(40)), Vec(20L, H, onehot(5)))
    val got1 = run("semstate1", batch1)(
      Streaming.semanticNearMarksFromState(_, state))
    val (cents1, index1) = Corpus.embeddingIndexAtRest(spark, state)
    val want1 = run("semstate1f", batch1)(
      Streaming.semanticNearMarks(_, cents1, index1))
    assert(got1 === want1, s"state-fed marks $got1 != frame-fed twin $want1")
    assert(!got1(0L)._2 && got1(10L)._2 && !got1(20L)._2, s"fixture sanity: $got1")
    val q1 = graft.sources.Manifest.live(spark, state)
      .find(_.startsWith("quantizer/")).get

    // generation swap: doubling the corpus trips the retrain trigger; a
    // stream started AFTER the swap must consult the new generation's
    // quantizer + cells (docs the old snapshot had no cells for)
    val more = (30L to 55L).map(id => doc(id, onehot(id.toInt)))
    assert(Corpus.ingestSemanticNearDup(spark, more.toDF(cols: _*), state) ===
      more.size.toLong)
    val q2 = graft.sources.Manifest.live(spark, state)
      .find(_.startsWith("quantizer/")).get
    assert(q2 !== q1, "corpus doubled: the quantizer must have swapped generations")
    val batch2 = Seq(Vec(100L, H, onehot(42)), Vec(101L, H, onehot(60)))
    val got2 = run("semstate2", batch2)(
      Streaming.semanticNearMarksFromState(_, state))
    val (cents2, index2) = Corpus.embeddingIndexAtRest(spark, state)
    val want2 = run("semstate2f", batch2)(
      Streaming.semanticNearMarks(_, cents2, index2))
    assert(got2 === want2, s"post-swap marks $got2 != frame-fed twin $want2")
    assert(!got2(100L)._2, "onehot(42) exactly twins new-generation doc 42")
    assert(got2(101L)._2, "onehot(60) is novel in the new generation")
  }
}
