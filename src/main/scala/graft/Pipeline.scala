package graft

import graft.operators.{IhcAttribution, Journeys, Reporting}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline runner with persisted, idempotent write-back — the
  * Spark analog of the reference's orchestration (`main.py:299-378`) and
  * incremental re-run contract (`db_utils.py:260-302`): each run attributes
  * ONLY conversions not yet present in the persisted attribution table,
  * appends the delta, and rebuilds the channel report from everything on
  * disk. A re-run with no new data is a no-op; a run after new days of
  * events attributes exactly the delta, bit-identical to a from-scratch
  * run (spec-tested in PipelineSpec).
  *
  * Why the delta is consistent with from-scratch: journey assignment is
  * computed over the FULL conversion set each run and restricted to the
  * missing conversions afterwards. Greedy assignment gives each session to
  * the EARLIEST later conversion, so conversions arriving later can never
  * steal sessions from already-attributed journeys — the restriction
  * commutes with assignment. (The reference gets the same property from
  * its chronological processing order, `journey_builder.py:45-105`.)
  *
  * State layout under `stateDir`:
  *   - `attribution/` — parquet (conv_id, session_id, channel_name, ihc),
  *     appended per run; the analog of the reference's
  *     `attribution_customer_journey` table (`challenge_db_create.sql`).
  *   - `report/` — parquet channel report with CPO/ROAS, rewritten per run.
  *   - `channel_reporting_csv/` — single-file CSV artifact, the
  *     reference's `channel_reporting.csv` (`reporting.py:105-168`).
  *
  * Scale notes: the append is conversion-atomic only at the level of the
  * left-anti re-run check (a crashed half-append of one run would need a
  * transactional table format in production — the conv_id-level
  * idempotence here mirrors the reference's DB contract, not a commit
  * protocol). The report rebuild reads only the persisted attribution
  * columns it needs; everything else is the same shuffle-minimal plans as
  * the query surface.
  */
object Pipeline {

  final case class RunSummary(
      candidateConversions: Long,
      newConversions: Long,
      newRows: Long,
      totalRows: Long)

  def attributionDir(stateDir: String): String = s"$stateDir/attribution"
  def processedDir(stateDir: String): String = s"$stateDir/processed_conversions"
  def reportDir(stateDir: String): String = s"$stateDir/report"
  def reportCsvDir(stateDir: String): String = s"$stateDir/channel_reporting_csv"

  private def readOrEmpty(spark: SparkSession, dir: String, ddl: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.parquet(path.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
  }

  /** The persisted attribution table, or an empty frame with the right
    * schema on the very first run. */
  def persistedAttribution(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, attributionDir(stateDir),
      "conv_id BIGINT, session_id BIGINT, channel_name STRING, ihc DOUBLE")

  /** The processed-conversions manifest. The reference re-derives "already
    * attributed" from the attribution table itself (`db_utils.py:260-302`),
    * which re-submits journeyless conversions on every run — harmless there,
    * but at warehouse scale "processed" must be tracked for ALL conversions,
    * including those that produced zero journey rows, or the daily delta
    * never shrinks to zero. */
  def processedConversions(spark: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(spark, processedDir(stateDir), "conv_id BIGINT")

  /** One incremental run: extract (optionally bounded by `endDate`, the
    * reference's date-range re-run), attribute the not-yet-persisted
    * conversions, append, rebuild the report artifacts. */
  def run(
      spark: SparkSession,
      sfDir: String,
      stateDir: String,
      endDate: Option[String] = None): RunSummary = {
    val allConversions = Tables.conversions(spark, sfDir)
    val conversions = endDate
      .map(d => allConversions.filter(col("conv_date") <= lit(d).cast("date")))
      .getOrElse(allConversions)
    val sessions = Tables.sessions(spark, sfDir)

    val previousTotal = persistedAttribution(spark, stateDir).count()
    val missing = Reporting
      .missingConversions(conversions, processedConversions(spark, stateDir))
      .select("conv_id")

    val delta = IhcAttribution
      .attribute(Journeys.flagConversion(Journeys.assign(sessions, conversions)))
      .join(missing, Seq("conv_id"), "left_semi")
      .select("conv_id", "session_id", "channel_name", "ihc")

    delta.write.mode("append").parquet(attributionDir(stateDir))
    missing.write.mode("append").parquet(processedDir(stateDir))

    // counts from what actually landed — no double evaluation of the delta DAG
    val persisted = spark.read.parquet(attributionDir(stateDir))
    val totalRows = persisted.count()
    val newConversions = missing.count()

    val report = Reporting.withMetrics(
      Reporting.channelReporting(
        persisted, sessions, Tables.sessionCosts(spark, sfDir), allConversions))
      .orderBy("channel_name", "date")
    report.write.mode("overwrite").parquet(reportDir(stateDir))
    Reporting.exportCsv(report, reportCsvDir(stateDir))

    RunSummary(conversions.count(), newConversions, totalRows - previousTotal, totalRows)
  }

  /** CLI: `Pipeline <sfDir> <stateDir> [endDate]`. */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val stateDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline_state"
    val endDate = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, sfDir, stateDir, endDate)
    println(
      s"candidate_conversions=${s.candidateConversions} new_conversions=${s.newConversions} " +
        s"new_rows=${s.newRows} total_rows=${s.totalRows}")
    spark.stop()
  }
}
