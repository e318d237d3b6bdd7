package graft.operators

import graft.functions.Exact.dsum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Channel reporting — reference `reporting.py:15-189`.
  *
  * `channel_reporting(channel_name, date, cost, ihc, ihc_revenue)` =
  * `session_sources ⟕ session_costs ⨝ attribution ⨝ conversions`
  * grouped by (channel, event_date), then CPO/ROAS metrics with
  * divide-by-zero → NULL (the reference maps ±inf → NaN,
  * `reporting.py:154-161`; NULL is the relational equivalent).
  *
  * Scale: the only wide side is the attribution table; conversions is
  * conversions-sized (broadcastable at moderate SF), and the aggregate
  * output is |channels| × |dates| — tiny. Partial (map-side) aggregation
  * does the reduction before the final shuffle.
  */
object Reporting {

  /** @param attributed output of [[IhcAttribution.attribute]] (only
    *                   conv_id/session_id/ihc are used)
    */
  def channelReporting(
      attributed: DataFrame,
      sessions: DataFrame,
      sessionCosts: DataFrame,
      conversions: DataFrame): DataFrame =
    sessions
      .join(attributed.select("conv_id", "session_id", "ihc"), "session_id")
      .join(sessionCosts, Seq("session_id"), "left")
      .join(conversions.select("conv_id", "revenue"), "conv_id")
      .groupBy(col("channel_name"), col("event_date"))
      .agg(
        dsum(coalesce(col("cost"), lit(0.0))).as("cost"),
        dsum(col("ihc")).as("ihc"),
        dsum(col("ihc") * col("revenue")).as("ihc_revenue"))
      .withColumnRenamed("event_date", "date")

  /** CPO = cost/ihc, ROAS = ihc_revenue/cost — `reporting.py:154-158`. */
  def withMetrics(report: DataFrame): DataFrame =
    report
      .withColumn("CPO", when(col("ihc") > 0.0, col("cost") / col("ihc")))
      .withColumn("ROAS", when(col("cost") > 0.0, col("ihc_revenue") / col("cost")))

  /** Incremental re-run support — reference `db_utils.py:260-302` /
    * `main.py:332-353`: only conversions NOT already attributed are
    * (re)processed. A left-anti join replaces the driver-side
    * set-difference; at scale this is the difference between an
    * append-only daily run and recomputing history. */
  def missingConversions(conversions: DataFrame, existingAttribution: DataFrame): DataFrame =
    conversions.join(
      existingAttribution.select("conv_id").distinct(),
      Seq("conv_id"), "left_anti")

  /** First-touch attribution: full credit to the journey's opening
    * session — the classic baseline the IHC model refines. One window
    * pick per journey, then a channel rollup. */
  def firstTouch(assigned: DataFrame): DataFrame = {
    val first = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("ts_us").asc, col("session_id").asc)
    assigned
      .withColumn("rn", row_number().over(first))
      .filter(col("rn") === 1)
      .groupBy("channel_name")
      .agg(count(lit(1)).as("n_conversions"), dsum(col("revenue")).as("revenue"))
      .orderBy("channel_name")
  }

  /** Last-touch attribution: full credit to the conversion-flagged
    * session (A4's flag IS the last touch). */
  def lastTouch(flagged: DataFrame): DataFrame =
    flagged
      .filter(col("conversion") === 1)
      .groupBy("channel_name")
      .agg(count(lit(1)).as("n_conversions"), dsum(col("revenue")).as("revenue"))
      .orderBy("channel_name")

  /** Export the reporting table as a single CSV with header — reference
    * `reporting.py:105-168` (`channel_reporting.csv`). Coalesced to one
    * file to match the reference's single-artifact contract; the parquet
    * path is the scale-appropriate sink. */
  def exportCsv(report: DataFrame, path: String): Unit =
    report.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
