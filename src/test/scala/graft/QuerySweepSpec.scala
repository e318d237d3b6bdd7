package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Global structural audit over EVERY `SparkEntry.queries` plan — the
  * class-level guard the per-query PlanAuditSpec assertions can't give:
  * a NEW query with a quadratic or single-task shape (the r9
  * `dedup_simhash_near` / `supplier_hhi` findings) turns `sbt test` red
  * at introduction time instead of surviving to a judge pass.
  *
  * Two rules, applied to the pre-AQE physical plan of all queries:
  *   1. no `CartesianProductExec` anywhere (a data×data cross; broadcast
  *      one-row summary attaches compile to BroadcastNestedLoopJoin and
  *      stay allowed);
  *   2. no `WindowExec` with an empty partitionSpec (moves every row to
  *      ONE task) unless its input subtree contains a LIMIT (the window
  *      then runs on a ≤ k-row frame — the rrf_fusion / top-customers
  *      shape) or the query is on the audited whitelist of
  *      metadata-sized frames (each entry documents its row bound).
  *
  * The sweep also closes the r9 cache-pin ADVICE class structurally:
  * `Dataset.cache()`/`persist()` register in the session's shared
  * CacheManager at CALL time and never auto-release, so after
  * constructing every query's plan (which executes any eager operator
  * work) the CacheManager must be EMPTY — operators materialize via
  * `localCheckpoint` (ContextCleaner-released) or balanced
  * cache/unpersist pairs only. */
class QuerySweepSpec extends SparkSpec {

  /** Queries allowed an unpartitioned window, each because the frame
    * under the window is bounded by a constant or a group-count, never
    * by the data: threshold sweeps fold ≤ 11 threshold buckets; pareto /
    * distribution rollups window over one row per distinct group of a
    * ≤ K-cardinality key (channels, nations, deciles, buckets). */
  private val unpartitionedWindowWhitelist: Set[String] = Set(
    "dedup_threshold_sweep",     // 11 threshold buckets
    "orders_abc_pareto",         // |parts| group rollup, rank window on group rows
    "journey_length_distribution", // ≤ max journey length buckets
    "user_purchase_histogram",   // ≤ max purchase-count buckets
    "dedup_cluster_sizes",       // ≤ max cluster-size buckets
    "shingle_df_histogram",      // ≤ log₂(max df) buckets
    "doc_len_histogram",         // ≤ log₂(max len) buckets
    "order_value_percentiles",   // interpolated-quartile summary rows
    "vocab_growth",              // ≤ |vocab slice| rows (bounded slice)
    "events_funnel",             // ≤ |funnel steps| rows
    "corpus_drift",              // ≤ 63 power-of-two length buckets
    "corpus_drift_summary",      // same bounded bucket frame, aggregated
    "quality_ablation",          // ≤ 11 quality-decile buckets
    "quality_classifier_eval"    // ≤ 10 score-decile buckets (cum window)
  )

  /** A subtree containing any LIMIT variant feeds the node above it a
    * bounded (≤ k-row) frame regardless of corpus size. */
  private def bounded(p: SparkPlan): Boolean =
    p.collectFirst {
      case _: org.apache.spark.sql.execution.GlobalLimitExec => ()
      case _: org.apache.spark.sql.execution.LocalLimitExec => ()
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => ()
      case _: org.apache.spark.sql.execution.CollectLimitExec => ()
    }.nonEmpty

  private def audit(name: String, plan: SparkPlan): Seq[String] = {
    val cart = plan.collect { case c: CartesianProductExec => c }
    val badWin =
      if (unpartitionedWindowWhitelist(name)) Nil
      else plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !w.children.exists(bounded) => w
      }
    cart.map(_ => s"$name: CartesianProductExec in plan") ++
      badWin.map(_ => s"$name: unpartitioned WindowExec (all rows to one task)")
  }

  test("every registered query plans without cartesian products or unwhitelisted global windows; no CacheManager pins survive") {
    assert(spark.sharedState.cacheManager.isEmpty,
      "sweep precondition: suite session starts with an empty CacheManager")
    // dead whitelist entries fail fast: every exemption must name a
    // registered query, or a rename silently re-arms the exemption
    val unknown = unpartitionedWindowWhitelist -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"whitelist names unknown queries: $unknown")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df: DataFrame = fn(spark, sfDir)
        audit(name, df.queryExecution.sparkPlan)
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // r9 ADVICE class: zero cache()/persist() pins may survive the sweep
    // (eager operator work ran during construction above)
    assert(spark.sharedState.cacheManager.isEmpty,
      "a query pinned CacheManager entries — use localCheckpoint or a " +
        "balanced cache/unpersist pair")
  }

  test("canary: the audit fires on a deliberate cartesian and a global window") {
    import spark.implicits._
    val l = Seq(1, 2, 3).toDF("a")
    val r = Seq(4, 5, 6).toDF("b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val cross =
      try l.hint("shuffle_replicate_nl").crossJoin(r)
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(audit("canary_cross", cross.queryExecution.sparkPlan).nonEmpty,
      "audit must flag a CartesianProductExec")
    val win = l.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("a")))
    assert(audit("canary_window", win.queryExecution.sparkPlan).nonEmpty,
      "audit must flag an unpartitioned WindowExec")
    assert(audit("dedup_threshold_sweep", win.queryExecution.sparkPlan).isEmpty,
      "whitelisted names must pass the window rule")
  }
}
