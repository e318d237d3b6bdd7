package graft

import graft.operators.{IhcAttribution, Journeys, Reporting}
import graft.sources.{Jdbc, Tables}
import org.apache.spark.sql.DataFrame

/** JDBC source/sink against embedded Derby — the executable analog of the
  * reference's SQLite storage (`db_utils.py:8-66`): round trip, partitioned
  * parallel read, predicate pushdown, and the full attribution pipeline
  * running FROM DB-backed tables with the report written back. */
class JdbcSpec extends SparkSpec {

  private val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def sortedRows(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("conversions round-trip Derby bit-for-bit") {
    val conv = Tables.conversions(spark, sfDir)
    Jdbc.write(conv, url, "conversions", driver = driver)
    val back = Jdbc.read(spark, url, "conversions", driver)
    assert(back.count() === conv.count())
    assert(sortedRows(back, "conv_id", "user_id", "conv_ts_us", "revenue") ===
      sortedRows(conv, "conv_id", "user_id", "conv_ts_us", "revenue"))
  }

  test("partitioned parallel read splits into range queries and loses nothing") {
    val conv = Tables.conversions(spark, sfDir)
    Jdbc.write(conv, url, "conversions_p", driver = driver)
    val ids = conv.agg(
      org.apache.spark.sql.functions.min("conv_id"),
      org.apache.spark.sql.functions.max("conv_id")).head()
    val back = Jdbc.readPartitioned(
      spark, url, "conversions_p", "conv_id",
      ids.getLong(0), ids.getLong(1), numPartitions = 4, driver = driver)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === conv.count())
    assert(back.select("conv_id").collect().map(_.getLong(0)).sorted.toSeq ===
      conv.select("conv_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("filters push down into the remote WHERE clause") {
    val cutoff = 9000000L
    val scan = Jdbc.read(spark, url, "conversions", driver)
      .filter(org.apache.spark.sql.functions.col("conv_id") >= cutoff)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(CONV_ID") || plan.contains("GreaterThanOrEqual(conv_id"),
      s"conv_id bound should reach the JDBC scan:\n$plan")
    // and the pushed read agrees with the in-memory filter
    val expected = Tables.conversions(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("conv_id") >= cutoff).count()
    assert(scan.count() === expected)
  }

  test("attribution pipeline runs from DB-backed tables; report writes back") {
    // load the reference-shaped tables into Derby, read them back, run the
    // full journey -> IHC -> report chain, and compare to the parquet-fed
    // result — the pipeline is source-agnostic
    Jdbc.write(Tables.sessions(spark, sfDir), url, "session_sources", driver = driver)
    Jdbc.write(Tables.sessionCosts(spark, sfDir), url, "session_costs", driver = driver)
    val dbSessions = Jdbc.read(spark, url, "session_sources", driver)
    val dbCosts = Jdbc.read(spark, url, "session_costs", driver)
    val dbConv = Jdbc.read(spark, url, "conversions", driver)

    val fromDb = Reporting.channelReporting(
      IhcAttribution.attribute(Journeys.flagConversion(Journeys.assign(dbSessions, dbConv))),
      dbSessions, dbCosts, dbConv)
    val fromParquet = SparkEntry.queries("channel_reporting")(spark, sfDir)
    assert(sortedRows(fromDb, "channel_name", "date", "cost", "ihc", "ihc_revenue") ===
      sortedRows(fromParquet, "channel_name", "date", "cost", "ihc", "ihc_revenue"))

    // write-back: the reference's channel_reporting table (db_utils.py:260+)
    Jdbc.write(fromDb, url, "channel_reporting", driver = driver)
    val report = Jdbc.read(spark, url, "channel_reporting", driver)
    assert(report.count() === fromParquet.count())
  }
}
