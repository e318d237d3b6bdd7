package graft

import graft.operators.{IhcAttribution, Journeys}

/** Pins the SURVEY §4 IHC spec with hand-computed values. */
class IhcGoldenSpec extends SparkSpec {
  import spark.implicits._

  // user 1: sessions at t=10 (view), t=20 (click), t=30 (signup);
  // conversion at t=40.
  // I: session 10 → 1. H: holder = view,click → 1/2 each, signup 0.
  // C: closer = click,signup → 1/2 each, view 0.
  // ihc: s10 = (1 + 1/2 + 0)/3 = 1/2
  //      s20 = (0 + 1/2 + 1/2)/3 = 1/3
  //      s30 = (0 + 0 + 1/2)/3 = 1/6
  private val sessions = Seq(
    (10L, 1L, 10L, java.sql.Date.valueOf("2024-01-01"), "view", 1, 0, 1),
    (20L, 1L, 20L, java.sql.Date.valueOf("2024-01-01"), "click", 1, 1, 0),
    (30L, 1L, 30L, java.sql.Date.valueOf("2024-01-01"), "signup", 0, 1, 0)
  ).toDF("session_id", "user_id", "ts_us", "event_date", "channel_name",
    "holder_engagement", "closer_engagement", "impression_interaction")

  private val conversions = Seq(
    (100L, 1L, 40L, java.sql.Date.valueOf("2024-01-01"), 50.0)
  ).toDF("conv_id", "user_id", "conv_ts_us", "conv_date", "revenue")

  test("golden journey: I/H/C credit matches hand computation") {
    val out = IhcAttribution
      .attribute(Journeys.flagConversion(Journeys.assign(sessions, conversions)))
      .select("session_id", "ihc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(10L) === (1.0 + 0.5 + 0.0) / 3.0)
    assert(out(20L) === (0.0 + 0.5 + 0.5) / 3.0)
    assert(out(30L) === (0.0 + 0.0 + 0.5) / 3.0)
  }

  test("no-holder journey falls back to uniform H; no-closer falls to conversion flag") {
    val errOnly = Seq(
      (10L, 1L, 10L, java.sql.Date.valueOf("2024-01-01"), "error", 0, 0, 0),
      (20L, 1L, 20L, java.sql.Date.valueOf("2024-01-01"), "error", 0, 0, 0)
    ).toDF(sessions.columns: _*)
    val out = IhcAttribution
      .attribute(Journeys.flagConversion(Journeys.assign(errOnly, conversions)))
      .select("session_id", "ihc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // I: s10=1; H uniform: 1/2 each; C: conversion flag on s20 (latest)
    assert(out(10L) === (1.0 + 0.5 + 0.0) / 3.0)
    assert(out(20L) === (0.0 + 0.5 + 1.0) / 3.0)
  }

  test("session at the exact conversion timestamp is excluded (strict <)") {
    val withEqual = Seq(
      (10L, 1L, 10L, java.sql.Date.valueOf("2024-01-01"), "click", 1, 1, 0),
      (40L, 1L, 40L, java.sql.Date.valueOf("2024-01-01"), "click", 1, 1, 0)
    ).toDF(sessions.columns: _*)
    val assigned = Journeys.assign(withEqual, conversions)
    assert(assigned.select("session_id").collect().map(_.getLong(0)).toSet === Set(10L))
  }

  // ---- redistribution parameter (api_utils.py:304-340) ----

  test("redistribution: holder credit moves from direct touches to tracked ones; Σihc stays 1") {
    // no holder engagement anywhere → uniform H fallback gives the two
    // 'error' (direct) touches holder credit, which must move to signup
    val errJourney = Seq(
      (10L, 1L, 10L, java.sql.Date.valueOf("2024-01-01"), "error", 0, 0, 0),
      (20L, 1L, 20L, java.sql.Date.valueOf("2024-01-01"), "signup", 0, 1, 0),
      (30L, 1L, 30L, java.sql.Date.valueOf("2024-01-01"), "error", 0, 0, 0)
    ).toDF(sessions.columns: _*)
    val out = IhcAttribution.attributeRedistributed(
      Journeys.flagConversion(Journeys.assign(errJourney, conversions)),
      directChannels = Seq("error"))
      .select("session_id", "ihc_redist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // s10: keeps initializer (earlier-only, nothing earlier), donates its
    // uniform holder third: (1 + 1/3)/3 - (1/3)/3 = 1/3
    assert(math.abs(out(10L) - 1.0 / 3.0) < 1e-12)
    // s20: base 4/9 + 1/9 from each error holder donation = 2/3
    assert(math.abs(out(20L) - 2.0 / 3.0) < 1e-12)
    // s30: donates its whole holder third → 0
    assert(math.abs(out(30L)) < 1e-12)
    assert(math.abs(out.values.sum - 1.0) < 1e-12)
  }

  test("redistribution: closer credit moves later-only; receive_threshold gates receivers") {
    val mixed = Seq(
      (10L, 1L, 10L, java.sql.Date.valueOf("2024-01-01"), "click", 1, 1, 0),
      (20L, 1L, 20L, java.sql.Date.valueOf("2024-01-01"), "Direct", 0, 1, 0),
      (30L, 1L, 30L, java.sql.Date.valueOf("2024-01-01"), "view", 1, 0, 1)
    ).toDF(sessions.columns: _*)
    val flagged = Journeys.flagConversion(Journeys.assign(mixed, conversions))
    // base: s10 = 2/3, s20 = 1/6, s30 = 1/6. Direct's closer half may only
    // move LATER: s30 (ihc 1/6 ≥ 0.1) receives it all.
    val out = IhcAttribution.attributeRedistributed(flagged)
      .select("session_id", "ihc_redist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(10L) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(out(20L)) < 1e-12)
    assert(math.abs(out(30L) - 1.0 / 3.0) < 1e-12)
    // raising the threshold above s30's base ihc blocks the move entirely
    val kept = IhcAttribution.attributeRedistributed(flagged, closerThreshold = 0.2)
      .select("session_id", "ihc", "ihc_redist").collect()
    kept.foreach(r => assert(r.getDouble(1) === r.getDouble(2)))
  }

  test("redistribution preserves Σihc=1 per conversion on real data (A6-style sum check)") {
    val dir = "/root/testdata/sf0.001"
    val flagged = Journeys.flagConversion(Journeys.assign(
      graft.sources.Tables.sessions(spark, dir),
      graft.sources.Tables.conversions(spark, dir)))
    val redist = IhcAttribution.attributeRedistributed(flagged, directChannels = Seq("error"))
    val check = IhcAttribution.sumCheck(
      redist.drop("ihc").withColumnRenamed("ihc_redist", "ihc"))
    assert(check.filter(!org.apache.spark.sql.functions.col("within_tolerance")).count() === 0)
    assert(check.count() > 0)
  }

  test("sessions go to the EARLIEST later conversion (greedy, each at most once)") {
    val twoConvs = Seq(
      (100L, 1L, 25L, java.sql.Date.valueOf("2024-01-01"), 10.0),
      (200L, 1L, 40L, java.sql.Date.valueOf("2024-01-01"), 20.0)
    ).toDF(conversions.columns: _*)
    val assigned = Journeys.assign(sessions, twoConvs)
      .select("session_id", "conv_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned === Map(10L -> 100L, 20L -> 100L, 30L -> 200L))
  }
}
