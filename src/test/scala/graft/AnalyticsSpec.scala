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
}
