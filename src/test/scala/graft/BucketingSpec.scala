package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Evidence for SURVEY §5: bucketed tables make the journey join
  * shuffle-free — the 100 TB deployment path for the sessions ⨝
  * conversions co-location. */
class BucketingSpec extends SparkSpec {

  test("bucket-aligned union: journey assignment over bucketed tables has zero exchanges") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    try {
      Tables.sessions(spark, sfDir).write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$warehouse/sess_b").saveAsTable("sess_b")
      Tables.conversions(spark, sfDir).write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$warehouse/conv_b").saveAsTable("conv_b")
      val out = operators.Journeys.assignBucketed(
        spark.table("sess_b"), spark.table("conv_b"))
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-aligned as-of join should be exchange-free:\n$plan")
      // bit-for-bit parity with the standard (shuffling) path
      val want = operators.Journeys.assign(
        Tables.sessions(spark, sfDir), Tables.conversions(spark, sfDir))
      assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
      assert(out.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS sess_b")
      spark.sql("DROP TABLE IF EXISTS conv_b")
    }
  }

  test("join of tables bucketed on the key plans without a shuffle exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts_us", "event_type")
      ev.write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$warehouse/ev_a").saveAsTable("ev_a")
      ev.write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$warehouse/ev_b").saveAsTable("ev_b")
      val joined = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ev_a")
      spark.sql("DROP TABLE IF EXISTS ev_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
