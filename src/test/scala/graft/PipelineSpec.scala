package graft

import java.nio.file.Files

import graft.operators.{IhcAttribution, Journeys}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** End-to-end pipeline runner: persisted write-back, idempotent re-runs,
  * incremental delta bit-identical to from-scratch (reference
  * `main.py:299-378`, `db_utils.py:260-302`). */
class PipelineSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[(Long, Long, String, Double)] =
    df.select("conv_id", "session_id", "channel_name", "ihc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
      .toSeq

  test("pipeline: first run persists, re-run is a no-op, delta run matches from-scratch") {
    val stateDir = Files.createTempDirectory("graft-pipeline").toString

    // run 1: only conversions up to Jan 15
    val s1 = Pipeline.run(spark, sfDir, stateDir, endDate = Some("2024-01-15"))
    assert(s1.newConversions > 0)
    assert(s1.newRows > 0)
    assert(s1.totalRows === s1.newRows)

    // run 2, same window: idempotent no-op — nothing new attributed
    val s2 = Pipeline.run(spark, sfDir, stateDir, endDate = Some("2024-01-15"))
    assert(s2.newConversions === 0)
    assert(s2.newRows === 0)
    assert(s2.totalRows === s1.totalRows)

    // run 3, full window: attributes ONLY the delta…
    val s3 = Pipeline.run(spark, sfDir, stateDir, endDate = None)
    assert(s3.newConversions > 0)
    assert(s3.candidateConversions === s1.candidateConversions + s3.newConversions)

    // …and the persisted table is bit-identical to a from-scratch run
    val scratch = IhcAttribution.attribute(
      Journeys.flagConversion(
        Journeys.assign(Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))))
    assert(rows(Pipeline.persistedAttribution(spark, stateDir)) === rows(scratch))

    // report artifacts exist and cover the full attribution
    val report = spark.read.parquet(Pipeline.reportDir(stateDir))
    assert(report.columns.toSet ===
      Set("channel_name", "date", "cost", "ihc", "ihc_revenue", "CPO", "ROAS"))
    assert(report.count() > 0)
    val csv = spark.read.option("header", "true").csv(Pipeline.reportCsvDir(stateDir))
    assert(csv.count() === report.count())
  }
}
