package graft

import graft.operators.Sketches
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Invariants of the sketch operators (SURVEY §2.B37-B39): the guarantees
  * each estimator carries by construction, checked on real data — the
  * exact values are pinned by the DuckDB oracle gate. */
class SketchesSpec extends SparkSpec {

  test("KMV: kept size is min(k, distinct); exact below k, unbiased-form above") {
    val out = Sketches.kmvDistinct(Tables.events(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, kept, est) =
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_kept"), r.getAs[Double]("est_distinct"))
      assert(kept === math.min(64L, exact))
      if (kept < 64) assert(est === exact.toDouble)
      else assert(est > 0 && math.abs(est - exact) / exact < 0.5,
        s"KMV estimate $est too far from exact $exact")
    }
  }

  test("CMS: the min-of-counters estimate never undercounts") {
    val out = Sketches.cmsFrequency(Tables.events(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_cms") >= r.getAs[Long]("n_exact"),
        s"CMS undercount for ${r.getAs[String]("channel")}/${r.getAs[Long]("user_id")}")
    }
  }

  test("HLL: at most m registers hit; raw estimate lands in the sketch error band") {
    val out = Sketches.hllDistinct(Tables.events(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, hit, est) = (r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_registers_hit"), r.getAs[Double]("est_hll"))
      assert(hit <= 64)
      // raw HLL at m=64 has ~13% std error; allow a generous 3σ-ish band
      assert(est > 0 && math.abs(est - exact) / exact < 0.6,
        s"HLL estimate $est too far from exact $exact")
    }
  }

  test("sketch merges are lossless: merged slice states equal the full-data sketch") {
    val events = Tables.events(spark, sfDir)
    val fullKmv = Sketches.kmvDistinct(events).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val mergedKmv = Sketches.kmvMerged(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(mergedKmv === fullKmv.view.mapValues(identity).toMap)
    val fullHll = Sketches.hllDistinct(events).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val mergedHll = Sketches.hllMerged(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(mergedHll === fullHll.view.mapValues(identity).toMap)
    val fullCms = Sketches.cmsFrequency(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val mergedCms = Sketches.cmsMerged(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(mergedCms === fullCms)
    // overlap robustness: a degenerate split where one slice is empty and
    // the other is everything must also reproduce the full sketch
    val skewed = Sketches.kmvMerged(events, splitDay = "1900-01-01").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(skewed === mergedKmv)
  }

  test("distinct sketches are duplication-invariant: replaying every event changes nothing") {
    val events = Tables.events(spark, sfDir)
    val doubled = events.unionAll(events)
    assert(Sketches.kmvDistinct(doubled).collect().toSeq ===
      Sketches.kmvDistinct(events).collect().toSeq)
    assert(Sketches.hllDistinct(doubled).collect().toSeq ===
      Sketches.hllDistinct(events).collect().toSeq)
  }

  test("KMV bottom-k rank is WindowGroupLimit-pruned (map partitions forward only k rows)") {
    val plan = Sketches.kmvDistinct(Tables.events(spark, sfDir))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("CMS is linear: doubling the input doubles every counter, hence every estimate") {
    val events = Tables.events(spark, sfDir)
    val once = Sketches.cmsFrequency(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val twice = Sketches.cmsFrequency(events.unionAll(events)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(once.keySet === twice.keySet)
    once.foreach { case (k, (exact, est)) =>
      assert(twice(k) === ((2 * exact, 2 * est)), s"not linear at $k")
    }
  }
}
