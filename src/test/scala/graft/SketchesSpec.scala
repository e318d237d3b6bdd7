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

  test("histogram quantiles: estimate brackets the exact value within one bin width") {
    val out = Sketches.histQuantiles(Tables.events(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq(("p50_cents_est", "p50_exact"), ("p90_cents_est", "p90_exact"),
        ("p99_cents_est", "p99_exact")).foreach { case (estCol, exCol) =>
        val estCents = r.getAs[Long](estCol)
        val exact = r.getAs[Double](exCol)
        // the exact quantile lies inside the reported bin [est-16, est]
        // (1e-9 slack: exact·100 re-rounds near 16-cent boundaries)
        assert(exact * 100.0 <= estCents.toDouble + 1e-9,
          s"$exCol=$exact above its bin boundary $estCol=$estCents")
        assert(exact * 100.0 >= (estCents - 16).toDouble - 1e-9,
          s"$exCol=$exact below its bin $estCol=$estCents")
      }
      // quantiles are monotone in q
      assert(r.getAs[Long]("p50_cents_est") <= r.getAs[Long]("p90_cents_est"))
      assert(r.getAs[Long]("p90_cents_est") <= r.getAs[Long]("p99_cents_est"))
    }
    // merged slice grids reproduce the full-data estimates exactly
    // (cell-wise-sum linearity), degenerate split included
    val events = Tables.events(spark, sfDir)
    val full = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def merged(split: String) = Sketches.histMerged(events, splitDay = split).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged("2024-01-16") === full)
    assert(merged("1900-01-01") === full)
  }

  test("KMV bottom-k rank is WindowGroupLimit-pruned (map partitions forward only k rows)") {
    val plan = Sketches.kmvDistinct(Tables.events(spark, sfDir))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("bloom prune: no false negatives; m trades false positives as designed") {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val r = Sketches.bloomSemiPrune(li, ord).collect().head
    // every exact match survives the filter (no false negatives — the
    // Bloom guarantee), overshoot is non-negative and bounded by the fact
    assert(r.getAs[Long]("n_bloom_pass") >= r.getAs[Long]("n_exact"))
    assert(r.getAs[Long]("n_false_pos") ===
      r.getAs[Long]("n_bloom_pass") - r.getAs[Long]("n_exact"))
    assert(r.getAs[Long]("n_fact") >= r.getAs[Long]("n_bloom_pass"))
    // a generously-sized filter prunes exactly (zero false positives at
    // this key cardinality); a saturated one lets false positives through
    val big = Sketches.bloomSemiPrune(li, ord, m = 1 << 20).collect().head
    assert(big.getAs[Long]("n_false_pos") === 0L)
    assert(big.getAs[Long]("n_bloom_pass") === big.getAs[Long]("n_exact"))
    val tiny = Sketches.bloomSemiPrune(li, ord, m = 256).collect().head
    assert(tiny.getAs[Long]("n_false_pos") > 0L)
    // slice position sets OR-merge losslessly: same survivors AND same
    // false positives as the full-data filter, degenerate split included
    val full = r.toSeq
    assert(Sketches.bloomSemiPruneMerged(li, ord).collect().head.toSeq === full)
    assert(Sketches.bloomSemiPruneMerged(li, ord, splitDay = "1900-01-01")
      .collect().head.toSeq === full)
  }

  test("KMV theta-intersection: all channel pairs present, estimates track exact overlap") {
    val events = Tables.events(spark, sfDir)
    val out = Sketches.kmvIntersection(events, includeExact = true).collect()
    val channels = events.select("event_type").distinct().count()
    assert(out.length == channels * (channels - 1) / 2, "one row per unordered pair")
    out.foreach { r =>
      val (exact, common, est) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(common >= 0 && est >= 0.0)
      // unsaturated sketches (theta = full space) are EXACT on the overlap
      // they see; saturated ones estimate — either way, a zero estimate
      // must mean genuinely small overlap and a big overlap must register
      if (exact == 0) assert(common == 0)
      if (exact > 50) assert(est > 0.0, s"large overlap missed entirely: $r")
    }
    // theta-sketch property: identical inputs → self-overlap estimate is
    // within 3x of exact for every pair at this k/corpus (loose sanity
    // band; the oracle hash-compare is the exactness gate)
    out.filter(_.getLong(2) > 100).foreach { r =>
      val ratio = r.getDouble(4) / r.getLong(2).toDouble
      assert(ratio > 0.25 && ratio < 4.0, s"estimate off by >4x: $r")
    }
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

  test("amsJoinSize: unbiased sign-sketch estimate lands near the true join size") {
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val lineitem = graft.sources.Tables.lineitem(spark, sfDir)
    val row = graft.operators.Sketches.amsJoinSize(orders, lineitem).head()
    val est = row.getAs[Long]("est_join_size")
    val truth = row.getAs[Long]("true_join_size")
    assert(truth === lineitem.count(), "FK join: every lineitem matches exactly once")
    // AMS error ~ sqrt(F2a*F2b/w): ±15% is ~3 sigma headroom at this SF
    assert(math.abs(row.getAs[Double]("rel_error")) < 0.15,
      s"est $est vs true $truth")
    // sign cancellation is the whole point: a known disjoint-key join
    // must estimate near ZERO relative to the table mass, not at nA*nB/w
    val shifted = orders.select((col("o_orderkey") + 100000000L).as("o_orderkey"))
    val zero = graft.operators.Sketches.amsJoinSize(shifted, lineitem).head()
    assert(zero.getAs[Long]("true_join_size") === 0L)
    assert(math.abs(zero.getAs[Long]("est_join_size")) < lineitem.count() / 10,
      "disjoint keys must cancel, not accumulate collision mass")
  }

  test("amsJoinSize: median survives sketch rows with zero shared buckets") {
    import spark.implicits._
    // Single-key sides on different keys: most of the d sketch rows land
    // the two keys in DIFFERENT buckets, so the (r,bucket) inner join
    // drops those rows entirely. Without the d-row spine the "median"
    // index (d+1)/2 then reads past the middle of the surviving rows (or
    // an empty list); with it, missing inner products are exact 0s and
    // the median of a disjoint single-key join is pinned to |est| <= 1.
    val a = Seq((1L, 0L)).toDF("o_orderkey", "o_custkey")
    val b = Seq((2L, 0L)).toDF("l_orderkey", "l_partkey")
    val r = Sketches.amsJoinSize(a, b).head()
    assert(!r.isNullAt(r.fieldIndex("est_join_size")), "all d rows must exist")
    assert(math.abs(r.getAs[Long]("est_join_size")) <= 1L)
    assert(r.getAs[Long]("true_join_size") === 0L)
  }
}
