package graft

import graft.operators.{IhcAttribution, Journeys, Reporting}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: the full attribution pipeline (journeys → IHC → channel
  * reporting) over N synthetic events across 100k users, generated
  * distributed via `spark.range` — no testdata involved. Usage:
  * `runMain graft.ScaleSmoke [nEvents]` (default 10M ≈ 100× the sf0.1
  * events table). Prints one timing line per stage. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = spark.range(n).selectExpr(
      "id AS event_id",
      "CAST(pmod(hash(id + 3), 100000) AS BIGINT) AS user_id",
      "CAST(pmod(hash(id), 2592000) AS BIGINT) * 1000000 AS ts_us",
      """CASE pmod(hash(id + 7), 5) WHEN 0 THEN 'purchase' WHEN 1 THEN 'click'
         WHEN 2 THEN 'view' WHEN 3 THEN 'signup' ELSE 'error' END AS event_type""",
      "CAST(pmod(hash(id + 13), 10000) AS DOUBLE) / 100.0 AS value")
      .withColumn("event_date", expr("CAST(timestamp_micros(ts_us) AS DATE)"))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val sessions = Tables.deriveSessions(events)
    val conversions = Tables.deriveConversions(events)
    val costs = Tables.deriveSessionCosts(events)

    val assigned = Journeys.assign(sessions, conversions)
    time(s"journey_assign n=$n")(println(s"[scale] assigned rows = ${assigned.count()}"))
    val attributed = IhcAttribution.attribute(Journeys.flagConversion(assigned))
    time("ihc_attribution")(println(s"[scale] credit rows = ${attributed.count()}"))
    val report = Reporting.channelReporting(attributed, sessions, costs, conversions)
    time("channel_reporting")(println(s"[scale] report rows = ${report.count()}"))
    spark.stop()
  }
}
