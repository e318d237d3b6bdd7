package graft

import graft.operators.{Analytics, Corpus, Temporal}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TemporalCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def sess(rows: (Long, Long, Long, String)*) =
    rows.toDF("session_id", "user_id", "ts_us", "channel_name")
      .withColumn("event_date", lit("2024-01-01").cast("date"))
      .withColumn("holder_engagement", lit(1))
      .withColumn("closer_engagement", lit(0))
      .withColumn("impression_interaction", lit(0))

  private def conv(rows: (Long, Long, Long)*) =
    rows.toDF("conv_id", "user_id", "conv_ts_us")
      .withColumn("conv_date", lit("2024-01-01").cast("date"))
      .withColumn("revenue", lit(10.0))

  test("as-of join is strict: an equal-timestamp session is not eligible") {
    val s = sess((1L, 7L, 100L, "click"), (2L, 7L, 200L, "view"))
    val c = conv((50L, 7L, 200L)) // conversion exactly at session 2's ts
    val out = Temporal.asofLastSession(s, c).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("last_session_id") === 1L)
    assert(out.head.getAs[Long]("gap_us") === 100L)
  }

  test("as-of join keeps conversions with no prior session (left semantics)") {
    val s = sess((1L, 7L, 500L, "click"))
    val c = conv((50L, 7L, 100L), (51L, 8L, 100L))
    val out = Temporal.asofLastSession(s, c).collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("last_session_id"))))
  }

  test("as-of ties in session ts resolve to the largest session_id") {
    val s = sess((3L, 7L, 100L, "a"), (9L, 7L, 100L, "b"), (5L, 7L, 100L, "c"))
    val c = conv((50L, 7L, 101L))
    val out = Temporal.asofLastSession(s, c).collect()
    assert(out.head.getAs[Long]("last_session_id") === 9L)
  }

  test("forward as-of is strict and picks the earliest later session, min id on ties") {
    val s = sess((1L, 7L, 200L, "click"), (9L, 7L, 300L, "a"),
      (3L, 7L, 300L, "b"), (4L, 7L, 400L, "view"))
    val c = conv((50L, 7L, 200L), (51L, 7L, 999L))
    val out = Temporal.asofNextSession(s, c).collect()
      .map(r => r.getAs[Long]("conv_id") -> r).toMap
    // session 1 at the SAME ts is not eligible (strict >); ties at 300
    // resolve to the smallest session_id
    assert(out(50L).getAs[Long]("next_session_id") === 3L)
    assert(out(50L).getAs[Long]("gap_us") === 100L)
    // no later session -> left semantics, null columns
    assert(out(51L).isNullAt(out(51L).fieldIndex("next_session_id")))
  }

  test("one output row per conversion on real data; gaps strictly positive") {
    val out = Temporal.asofLastSession(
      Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
    val nConv = Tables.conversions(spark, sfDir).count()
    assert(out.count() === nConv)
    assert(out.filter(col("gap_us") <= 0).count() === 0)
  }

  test("range join counts only sessions inside [conv_ts − 6h, conv_ts)") {
    val w = 21600000000L
    val s = sess(
      (1L, 7L, 100L, "in"), (2L, 7L, 50L, "in"),
      (3L, 7L, 1000L, "at-conv-ts"), // == conv ts → excluded
      (4L, 7L, 1000L - w - 1, "too-old"))
    val c = conv((50L, 7L, 1000L))
    val out = Temporal.sessionCountWindow(s, c).collect()
    assert(out.head.getAs[Long]("n_recent") === 2L)
    assert(out.head.getAs[Long]("n_holder") === 2L)
  }

  test("winnowing: a shared token run yields at least one common fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"unique one two three $shared tail tokens here"),
      (2L, s"$shared completely different suffix material now"),
      (3L, "nothing in common with the others at all ok")).toDF("doc_id", "text")
    val fp = Corpus.winnowFingerprints(docs)
    val f1 = fp.filter(col("doc_id") === 1).select("fingerprint").as[Long].collect().toSet
    val f2 = fp.filter(col("doc_id") === 2).select("fingerprint").as[Long].collect().toSet
    val f3 = fp.filter(col("doc_id") === 3).select("fingerprint").as[Long].collect().toSet
    assert(f1.intersect(f2).nonEmpty)
    assert(f1.intersect(f3).isEmpty)
  }

  test("winnowing: identical docs have identical fingerprint sets; short docs get one") {
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "x y z"), // 1 shingle < window → global min
      (4L, "xy")) // no shingle → no rows
    .toDF("doc_id", "text")
    val fp = Corpus.winnowFingerprints(docs).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.map(_.getAs[Long]("fingerprint")).toSet).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(3L).size === 1)
    assert(!fp.contains(4L))
  }

  test("contamination check flags exactly the docs overlapping the holdout") {
    val benchText = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (97L, benchText), // holdout stratum (doc_id % 97 == 0)
      (1L, s"leading filler words then $benchText plus trailing content here"), // contaminated
      (2L, "entirely fresh material sharing no token runs with anything else"),
      (3L, benchText)) // verbatim copy — contaminated
      .toDF("doc_id", "text")
    val out = Corpus.contaminationCheck(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === Set(1L, 3L)) // doc 2 clean; doc 97 is the holdout itself
    assert(out(1L)._1 >= 1 && out(1L)._2 === 1)
    // the verbatim copy shares doc 97's whole fingerprint set
    val benchFps = Corpus.winnowFingerprints(docs.filter(col("doc_id") === 97))
      .count()
    assert(out(3L)._1 === benchFps)
  }

  test("PII scrub counts and redacts emails, IPv4s and digit runs") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob@test.org at 10.0.0.1 tel 12345678 now"),
      (2L, "no personal data in this sentence at all"),
      (3L, "+4915112345678 and 192.168.1.100 and carol@mail.co")) // plus-prefixed run
      .toDF("doc_id", "text")
    val out = Corpus.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) === ((2, 1, 1)))
    assert(out(2L) === ((0, 0, 0)))
    assert(out(3L) === ((1, 1, 1)))
    // redaction removes every matched span: scrubbing the scrubbed text
    // is a fixpoint (same md5)
    val scrubbedOnce = Corpus.piiScrub(docs).select("doc_id", "scrubbed_md5")
    val redacted = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.regexp_replace(col("text"),
            Corpus.Pii.Email, "<EMAIL>"),
          Corpus.Pii.Ipv4, "<IP>"),
        Corpus.Pii.DigitRun, "<NUM>").as("text"))
    val twice = Corpus.piiScrub(redacted).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(twice.forall(t => t._2 == 0 && t._3 == 0 && t._4 == 0))
  }

  test("stratified sample is deterministic and respects per-stratum rates") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Corpus.stratifiedSample(docs).collect().map(_.getAs[Long]("doc_id")).toSeq
    val s2 = Corpus.stratifiedSample(docs).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(s1 === s2)
    val byLang = Corpus.stratifiedSample(docs).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    // en sampled at 10%, others at 30% — allow generous hash-noise margins
    byLang.get("en").foreach(n => assert(n < totals("en") * 0.25))
    assert(s1.nonEmpty)
  }

  test("salted two-phase aggregate equals the direct aggregate exactly") {
    val ev = Tables.events(spark, sfDir)
    val salted = Analytics.saltedChannelAgg(ev)
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.dsum(col("value")).as("total_value"))
      .orderBy("event_type")
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("q13 keeps customers with zero orders (c_count = 0 bucket present)") {
    val cust = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val ords = Seq((10L, 1L, "3-MEDIUM")).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Analytics.q13CustDist(cust, ords).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    assert(out === Map(1L -> 1L, 0L -> 1L))
  }

  test("triangleCount golden: square + diagonal, hub star, reverse/self edges collapse") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"),
      ("b", "a"), // reverse duplicate — must collapse
      ("c", "c")) // self loop — must drop
      .toDF("src", "dst")
    val out = graft.operators.Markov.triangleCount(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // triangles: (a,b,c) and (a,c,d)
    assert(out("a") === ((3L, 2L, (2.0 * 2.0) / (3.0 * 2.0))))
    assert(out("b") === ((2L, 1L, 1.0)))
    assert(out("c") === ((3L, 2L, (2.0 * 2.0) / (3.0 * 2.0))))
    assert(out("d") === ((2L, 1L, 1.0)))
    // star: hub with 5 spokes — no triangles anywhere, hub clustering 0
    val star = (1 to 5).map(i => ("hub", s"x$i")).toDF("src", "dst")
    val s = graft.operators.Markov.triangleCount(star).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(s.values.forall(_ === 0L))
  }

  test("intervalJoin: facts pick their covering SCD2 version; zero-width versions lose") {
    val ev = Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 20L, "A"), (3L, 1L, 30L, "B"), (4L, 1L, 40L, "A"),
      // user 2: same-timestamp state flip → v1 is zero-width at ts 10
      (5L, 2L, 10L, "X"), (6L, 2L, 10L, "Y"), (7L, 2L, 20L, "Y"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val out = Temporal.intervalJoin(
      ev, Analytics.scd2UserState(ev),
      keyCol = "user_id", tsCol = "ts_us", dimTieBreak = Seq("version"))
      .select("event_id", "version", "state").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) === ((1L, "A")) && out(2L) === ((1L, "A")))
    assert(out(3L) === ((2L, "B")))
    assert(out(4L) === ((3L, "A")))
    // both ts-10 events land in the COVERING version 2, not the empty v1
    assert(out(5L) === ((2L, "Y")) && out(6L) === ((2L, "Y")))
    assert(out(7L) === ((2L, "Y")))
    // a fact key with no dimension rows → null payload
    val lone = Seq((9L, 99L, 5L, "Z")).toDF("event_id", "user_id", "ts_us", "event_type")
    val l = Temporal.intervalJoin(
      lone, Analytics.scd2UserState(ev),
      keyCol = "user_id", tsCol = "ts_us", dimTieBreak = Seq("version"))
      .select("event_id", "version").collect().head
    assert(l.isNullAt(1))
  }
}
