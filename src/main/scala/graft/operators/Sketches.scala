package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality / frequency sketches (SURVEY §2.B37-B39) — the estimation
  * primitives a 100 TB pipeline reaches for when exact distinct counts or
  * per-key frequencies stop fitting anywhere: KMV (K-minimum-values)
  * distinct estimation, a count-min frequency sketch, and HyperLogLog
  * registers. All three are built from the same deterministic md5 hash the
  * rest of the repo uses for sampling/bucketing (no RNG, no
  * `approx_count_distinct` — Spark's HLL++ binary state has no DuckDB
  * analog), so every estimate is bit-reproducible and hash-checked against
  * the oracle, and the ESTIMATE-vs-EXACT gap is part of the checked
  * output, not a hidden property.
  *
  * Scale shape, per sketch:
  *   - KMV: one distinct-hash partial agg, then a per-group k-smallest
  *     rank filter that Spark rewrites to WindowGroupLimit — each map
  *     partition forwards only its k smallest hashes, so the shuffle
  *     carries O(partitions·k) rows, not the distinct set.
  *   - CMS: the sketch IS a groupBy of d·w cells per channel — constant
  *     size however large the input; one partial-agg pass builds it.
  *   - HLL: registers are a (channel, idx) max-agg — m rows per channel;
  *     the estimate is one arithmetic pass over the m-row spine.
  */
object Sketches {

  /** 60-bit deterministic hash: the md5-prefix integer used across the
    * repo (same form as the sampling buckets in
    * [[graft.operators.Similarity.trainCentroids]]). Uniform on
    * [0, 2^60). */
  private def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  private val HashSpace: Double = 1152921504606846976.0 // 2^60, exact

  /** (channel, h) 60-bit hashes of each event's (user_id, day) pair —
    * shared with the streaming HLL ([[graft.streaming.Streaming
    * .hllCounts]]) so both sketch the identical hash stream. */
  private[graft] def hashedUserDay(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("channel"),
      h60(concat(col("user_id").cast("string"), lit("|"),
        col("event_date").cast("string"))).as("h"))

  /** Bottom-k distinct hashes per channel — the KMV sketch STATE. The
    * rank filter plans as WindowGroupLimit, so map partitions forward
    * only k rows each. */
  private def kmvState(hashed: DataFrame, k: Int): DataFrame = {
    val rk = Window.partitionBy("channel").orderBy("h")
    hashed.distinct()
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") <= k)
      .select("channel", "h")
  }

  /** (channel, n_kept, est_distinct) from a bottom-k state: exact below
    * k, else `(k-1) · 2^60 / h_k` (Bar-Yossef et al.'s unbiased form).
    * The division happens FIRST (`2^60 / h_k`, one rounding) and the
    * `k-1` scaling second — the same two-op IEEE tree as the oracle, so
    * the estimate is bit-identical cross-engine. */
  private def kmvEstimate(state: DataFrame, k: Int): DataFrame =
    state
      .groupBy("channel")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * (lit(HashSpace) / col("h_k").cast("double"))))

  /** KMV (K-minimum-values / bottom-k) distinct-count estimate of
    * (user_id, day) pairs per channel, alongside the exact count so the
    * result quantifies its own error. */
  def kmvDistinct(events: DataFrame, k: Int = 64): DataFrame = {
    val hashed = hashedUserDay(events)
    kmvEstimate(kmvState(hashed, k), k)
      .join(hashed.distinct().groupBy("channel").agg(count(lit(1)).as("n_exact")),
        Seq("channel"))
      .select("channel", "n_exact", "n_kept", "est_distinct")
      .orderBy("channel")
  }

  /** KMV MERGE — the property sketches exist for at warehouse scale:
    * bottom-k states built independently on slices of the data (here the
    * two halves of the date range; in production, per partition / per
    * day / per cluster) combine by re-taking the bottom k of the union,
    * and `bottomK(bottomK(A) ∪ bottomK(B)) = bottomK(A ∪ B)` makes the
    * merged sketch EXACTLY the full-data sketch — no accuracy is lost to
    * distribution. The oracle for this query IS the full-data KMV
    * computation, so the hash match is the merge-correctness proof. */
  def kmvMerged(
      events: DataFrame, k: Int = 64, splitDay: String = "2024-01-16"): DataFrame = {
    val d = lit(splitDay).cast("date")
    val s1 = kmvState(hashedUserDay(events.filter(col("event_date") < d)), k)
    val s2 = kmvState(hashedUserDay(events.filter(col("event_date") >= d)), k)
    // distinct before re-ranking: merged slices may share hashes when the
    // slicing is not disjoint (here it is; the operator must not care)
    kmvEstimate(kmvState(s1.unionAll(s2), k), k)
      .select("channel", "n_kept", "est_distinct")
      .orderBy("channel")
  }

  /** KMV set-INTERSECTION estimate between every channel pair — the
    * theta-sketch trick (Dasgupta et al.): with θ = min of the two
    * sketches' k-th hashes, the bottom-k entries BELOW θ present in both
    * sketches are a uniform sample of the intersection at sampling rate
    * θ/2^60, so `|common<θ| · 2^60/θ` estimates |A ∩ B| — audience
    * overlap from two constant-size states, NEVER touching the raw sets
    * together.
    *
    * `includeExact` (default OFF — the scale path) additionally joins
    * the full distinct (channel, hash) frame against itself to emit the
    * exact intersection alongside the estimate. That is a corpus-sized
    * pairwise pass that exists only to let small-scale runs quantify the
    * sketch's error; never enable it at 100 TB.
    *
    * Scale shape (default): sketch states are k rows per channel
    * (bounded); the pair frame is |channels|² metadata (broadcast-hinted
    * on both sides so it can never degrade to a shuffled product); the
    * only data-sized pass is the shared hash scan. Determinism: θ and
    * the estimate are the same two-op IEEE tree as [[kmvEstimate]]
    * (divide first, scale second). */
  def kmvIntersection(
      events: DataFrame, k: Int = 64, includeExact: Boolean = false): DataFrame = {
    val dh = hashedUserDay(events).distinct()
    val state = kmvState(dh, k)
    val thetas = state.groupBy("channel")
      .agg(count(lit(1)).as("n_kept"), max("h").as("h_k"))
      .withColumn("theta",
        when(col("n_kept") < k, lit(HashSpace)).otherwise(col("h_k").cast("double")))
      .select("channel", "theta")
    val pairs = broadcast(thetas.select(col("channel").as("ch_a"), col("theta").as("theta_a")))
      .crossJoin(broadcast(thetas.select(col("channel").as("ch_b"), col("theta").as("theta_b"))))
      .filter(col("ch_a") < col("ch_b"))
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
      .select("ch_a", "ch_b", "theta")
    val common = state.select(col("channel").as("ch_a"), col("h"))
      .join(state.select(col("channel").as("ch_b"), col("h")), "h")
      .filter(col("ch_a") < col("ch_b"))
      .join(broadcast(pairs), Seq("ch_a", "ch_b"))
      .filter(col("h").cast("double") < col("theta"))
      .groupBy("ch_a", "ch_b").agg(count(lit(1)).as("n_common"))
    val estimated = pairs
      .join(common, Seq("ch_a", "ch_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("est_intersection",
        col("n_common").cast("double") * (lit(HashSpace) / col("theta")))
    val out =
      if (!includeExact) estimated.select("ch_a", "ch_b", "n_common", "est_intersection")
      else {
        val exact = dh.select(col("channel").as("ch_a"), col("h"))
          .join(dh.select(col("channel").as("ch_b"), col("h")), "h")
          .filter(col("ch_a") < col("ch_b"))
          .groupBy("ch_a", "ch_b").agg(count(lit(1)).as("n_exact"))
        estimated
          .join(exact, Seq("ch_a", "ch_b"), "left")
          .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
          .select("ch_a", "ch_b", "n_exact", "n_common", "est_intersection")
      }
    out.orderBy("ch_a", "ch_b")
  }

  /** Count-min sketch over per-(channel, user) event frequencies: d
    * independent hash rows of w buckets each; a key's estimate is the MIN
    * of its d bucket counters — never below the true count (every
    * overcount comes from collisions adding in). The output pairs the
    * estimate with the exact count for the probed users, so the
    * collision inflation is visible and checked.
    *
    * The sketch build explodes each event into its d (row, bucket) cells
    * map-side and partial-aggregates — the sketch is |channels|·d·w
    * counters regardless of input size. Probe keys are a broadcast-scale
    * frame. */
  def cmsFrequency(
      events: DataFrame, d: Int = 4, w: Int = 64, nProbeUsers: Int = 10): DataFrame =
    probeSketch(events, cmsSketch(events, d, w), d, w, nProbeUsers)

  /** HyperLogLog distinct-count estimate of (user_id, day) pairs per
    * channel, m = 64 registers (p = 6): register index is the hash's low
    * 6 bits, the register holds the max "rank" (leading-zero count + 1)
    * of the remaining 54-bit field. The raw HLL estimate
    * `α·m²/Σ2^(−M_j)` is computed over INTEGER-scaled register terms
    * (`2^(55−M_j)` — exact BIGINTs, order-independent sum) so the only
    * floating-point steps are the final literal products and one
    * division, identical trees in both engines.
    *
    * Deliberately the RAW estimator: the small-range linear-counting
    * correction needs ln(), which is not correctly rounded across
    * engines — the raw form is the bit-reproducible one, and the checked
    * output carries the exact count next to it. */
  /** The CMS counter grid (channel, r, bucket, cnt) — the sketch STATE
    * for [[cmsFrequency]] and [[cmsMerged]]. */
  private def cmsSketch(events: DataFrame, d: Int, w: Int): DataFrame = {
    val cells = array((0 until d).map { r =>
      struct(
        lit(r).as("r"),
        (h60(concat(lit(s"$r:"), col("user_id").cast("string"))) % w).as("bucket"))
    }: _*)
    events.select(col("event_type").as("channel"), explode(cells).as("c"))
      .groupBy(col("channel").as("s_channel"), col("c.r").as("s_r"),
        col("c.bucket").as("s_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Probe a counter grid for users < `nProbeUsers`: exact count next
    * to the min-of-counters estimate. */
  private def probeSketch(
      events: DataFrame, sketch: DataFrame, d: Int, w: Int, nProbeUsers: Int): DataFrame = {
    val cells = array((0 until d).map { r =>
      struct(
        lit(r).as("r"),
        (h60(concat(lit(s"$r:"), col("user_id").cast("string"))) % w).as("bucket"))
    }: _*)
    val exact = events.select(col("event_type").as("channel"), col("user_id"))
      .filter(col("user_id") < nProbeUsers)
      .groupBy("channel", "user_id")
      .agg(count(lit(1)).as("n_exact"))
    val probes = exact.select(col("channel"), col("user_id"), col("n_exact"),
      explode(cells).as("c"))
    broadcast(probes)
      .join(sketch,
        col("channel") === col("s_channel") &&
          col("c.r") === col("s_r") && col("c.bucket") === col("s_bucket"))
      .groupBy(col("channel"), col("user_id"), col("n_exact"))
      .agg(min(col("cnt")).as("n_cms"))
      .select(col("channel"), col("user_id"), col("n_exact"), col("n_cms"))
      .orderBy("channel", "user_id")
  }

  /** CMS MERGE: counter grids built on slices combine by CELL-WISE SUM —
    * count-min counters are plain sums, so the merged grid is exactly
    * the full-data grid (linearity, also spec-pinned on the probe
    * estimates). Output = the same probe frame as [[cmsFrequency]],
    * served from the merged grid; the oracle is the full-data CMS, so
    * the hash match is the merge proof. */
  def cmsMerged(
      events: DataFrame, d: Int = 4, w: Int = 64, nProbeUsers: Int = 10,
      splitDay: String = "2024-01-16"): DataFrame = {
    val dt = lit(splitDay).cast("date")
    val merged = cmsSketch(events.filter(col("event_date") < dt), d, w)
      .unionAll(cmsSketch(events.filter(col("event_date") >= dt), d, w))
      .groupBy("s_channel", "s_r", "s_bucket")
      .agg(sum("cnt").as("cnt"))
    probeSketch(events, merged, d, w, nProbeUsers)
  }

  /** Per-channel HLL registers (channel, idx, rank) — the sketch STATE:
    * register index is the hash's low 6 bits, the register holds the max
    * rank (leading-zero count + 1) of the remaining 54-bit field. */
  private def hllRegisters(hashed: DataFrame): DataFrame =
    hashed
      .select(col("channel"), (col("h") % 64).as("idx"), shiftright(col("h"), 6).as("w"))
      .groupBy("channel", "idx")
      .agg(max(when(col("w") > 0, lit(55) - length(bin(col("w")))).otherwise(lit(55)))
        .as("rank"))

  /** (channel, n_registers_hit, est_hll) from a register state: the raw
    * HLL estimate `α·m²/Σ2^(−M_j)` over INTEGER-scaled register terms
    * (`2^(55−M_j)` — exact BIGINTs, order-independent sum) so the only
    * floating-point steps are the final literal products and one
    * division, identical trees in both engines. */
  private def hllEstimate(regs: DataFrame): DataFrame = {
    val m = 64
    val spine = regs.select("channel").distinct()
      .select(col("channel"), explode(sequence(lit(0), lit(m - 1))).as("idx"))
    spine.join(regs, Seq("channel", "idx"), "left")
      .select(col("channel"), coalesce(col("rank"), lit(0)).as("rank"))
      .groupBy("channel")
      .agg(
        sum(expr("shiftleft(cast(1 as bigint), cast(55 - rank as int))")).as("s_scaled"),
        sum(when(col("rank") > 0, 1L).otherwise(0L)).as("n_registers_hit"))
      // α_64 · m² · 2^55 / Σ2^(55−M_j), left-to-right IEEE products
      .withColumn("est_hll",
        lit(0.709) * lit(4096.0) * lit(36028797018963968.0) / col("s_scaled").cast("double"))
  }

  /** HyperLogLog distinct-count estimate of (user_id, day) pairs per
    * channel, m = 64 registers (p = 6), with the exact count beside it.
    *
    * Deliberately the RAW estimator: the small-range linear-counting
    * correction needs ln(), which is not correctly rounded across
    * engines — the raw form is the bit-reproducible one. */
  def hllDistinct(events: DataFrame): DataFrame = {
    val hashed = hashedUserDay(events)
    val exact = hashed.distinct().groupBy("channel").agg(count(lit(1)).as("n_exact"))
    hllEstimate(hllRegisters(hashed))
      .join(exact, Seq("channel"))
      .select("channel", "n_exact", "n_registers_hit", "est_hll")
      .orderBy("channel")
  }

  /** Histogram bin width in cents and the multiplier that maps a dollar
    * value to its bin: `floor(value · 6.25) = floor(value·100/16)` — 16
    * cents a bin, and 6.25 (= 2⁻⁴·100) is EXACT in binary, so the bin id
    * is one IEEE multiply + floor, identical cross-engine. */
  private val HistBins = 4096
  private val HistWidthCents = 16L

  /** (channel, b) bin observations for each event's value — shared with
    * the streaming twin ([[graft.streaming.Streaming.histQuantiles]]) so
    * both sketch the identical bin stream. */
  private[graft] def binnedValues(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("channel"),
      least(lit(HistBins - 1), floor(col("value") * lit(6.25))).cast("int").as("b"))

  /** The histogram sketch STATE (channel, b, cnt): equi-width bins over
    * [0, $655.36), top bin clamped — |channels|·4096 counters however
    * large the input, built by one partial-agg pass. */
  private def histState(events: DataFrame): DataFrame =
    binnedValues(events)
      .groupBy("channel", "b")
      .agg(count(lit(1)).as("cnt"))

  /** (channel, n, p50/p90/p99_cents_est) from a histogram state: the
    * q-quantile estimate is the UPPER boundary (in integer cents) of the
    * first bin whose cumulative count reaches `ceil(q·n)` — pure integer
    * arithmetic once the bin is found, so the estimate is bit-identical
    * cross-engine and errs above the exact quantile by less than one bin
    * width. The cumulative window partitions by channel over the SKETCH
    * (≤ 4096 rows per channel — sketch-sized, not data-sized). */
  private def histEstimate(hist: DataFrame): DataFrame = {
    val cum = hist
      .withColumn("cum",
        sum("cnt").over(Window.partitionBy("channel").orderBy("b")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("channel")))
    def est(q: Double) = min(when(
      col("cum") >= ceil(lit(q) * col("n")).cast("long"),
      ((col("b") + 1) * lit(HistWidthCents)).cast("long")))
    cum.groupBy("channel").agg(
      max("n").as("n"),
      est(0.5).as("p50_cents_est"),
      est(0.9).as("p90_cents_est"),
      est(0.99).as("p99_cents_est"))
  }

  /** Streaming-mergeable QUANTILE sketch: per-channel p50/p90/p99 value
    * thresholds from a fixed equi-width histogram, with the EXACT
    * discrete quantiles beside them so the (sub-bin-width) error is part
    * of the checked output — the quantile member of the sketch family,
    * B37-B39's answer for "percentiles over 100 TB without sorting
    * anything": the sketch is |channels|·4096 counters built in one
    * partial-agg pass, and bin counts are plain sums, so states merge by
    * cell-wise addition ([[histMerged]]) and hold as bounded streaming
    * state ([[graft.streaming.Streaming.histQuantiles]]).
    *
    * The exact columns are the discrete (no-interpolation) quantiles —
    * the value at rank `ceil(q·n)` per channel — computed via the
    * distributed [[Quantiles.withExactRank]] (range buckets + broadcast
    * offsets; no single-task sort). */
  def histQuantiles(events: DataFrame): DataFrame = {
    val ranked = Quantiles.withExactRank(
      events.select(col("event_type").as("channel"), col("value"), col("event_id")),
      group = Seq("channel"),
      order = Seq(("value", true), ("event_id", true)),
      rankCol = "rnk", nCol = "nr",
      materialize = false) // bare pruned scan: re-reading beats checkpointing
    def exact(q: Double) = max(when(
      col("rnk") === ceil(lit(q) * col("nr")).cast("long"), col("value")))
    val ex = ranked.groupBy("channel").agg(
      exact(0.5).as("p50_exact"),
      exact(0.9).as("p90_exact"),
      exact(0.99).as("p99_exact"))
    histEstimate(histState(events))
      .join(ex, Seq("channel"))
      .select("channel", "n", "p50_cents_est", "p90_cents_est", "p99_cents_est",
        "p50_exact", "p90_exact", "p99_exact")
      .orderBy("channel")
  }

  /** Histogram MERGE: bin grids built on slices combine by CELL-WISE SUM
    * (count linearity, the same property as [[cmsMerged]]), so the
    * merged sketch is EXACTLY the full-data sketch and the quantile
    * thresholds read from it are bit-identical. The oracle is the
    * full-data histogram computation — the hash match is the merge
    * proof. */
  def histMerged(events: DataFrame, splitDay: String = "2024-01-16"): DataFrame = {
    val d = lit(splitDay).cast("date")
    val merged = histState(events.filter(col("event_date") < d))
      .unionAll(histState(events.filter(col("event_date") >= d)))
      .groupBy("channel", "b")
      .agg(sum("cnt").as("cnt"))
    histEstimate(merged)
      .select("channel", "n", "p50_cents_est", "p90_cents_est", "p99_cents_est")
      .orderBy("channel")
  }

  /** HLL MERGE: register states built independently on slices combine by
    * register-wise max, and `max` being idempotent/commutative makes the
    * merged registers EXACTLY the full-data registers — the lossless
    * union that lets a 1000-executor rollup keep one m-register state
    * per group instead of re-scanning history. As with [[kmvMerged]],
    * the oracle IS the full-data HLL computation: the hash match is the
    * merge-correctness proof. */
  def hllMerged(events: DataFrame, splitDay: String = "2024-01-16"): DataFrame = {
    val d = lit(splitDay).cast("date")
    val r1 = hllRegisters(hashedUserDay(events.filter(col("event_date") < d)))
    val r2 = hllRegisters(hashedUserDay(events.filter(col("event_date") >= d)))
    val merged = r1.unionAll(r2)
      .groupBy("channel", "idx").agg(max("rank").as("rank"))
    hllEstimate(merged)
      .select("channel", "n_registers_hit", "est_hll")
      .orderBy("channel")
  }

  /** Bloom-filter SEMI-JOIN PRUNING — the standard 100 TB join-reduction
    * move: instead of shuffling the whole fact table to discover which
    * rows match a filtered dim, build a k-hash Bloom filter over the dim
    * keys (here: 1-URGENT orders) and drop fact rows map-side before any
    * fact shuffle exists. The filter is PARTITIONED (one m-slot position
    * set per hash function, distinct (j, pos) pairs ≤ k·m rows — sketch
    * metadata, not data) and rides a broadcast; the probe is k broadcast
    * hit-flag joins in ONE pass over the fact, i.e. a pure map-side
    * filter with zero fact-side exchanges (plan-audited). False
    * positives are the
    * documented price: the output reports fact rows, Bloom survivors,
    * exact matches, and the false-positive overshoot side by side, so
    * the m/k operating point is part of the checked result — the same
    * honesty contract as the KMV/CMS/HLL estimate-vs-exact columns.
    *
    * Deterministic by construction (md5 positions, counts only), so the
    * DuckDB oracle replays the identical filter bit-for-bit. */
  def bloomSemiPrune(
      lineitem: DataFrame, orders: DataFrame,
      m: Int = 16384, k: Int = 3): DataFrame = {
    val urgent = urgentKeys(orders)
    bloomProbe(lineitem, urgent,
      j => urgent.select(bloomPos(j, col("o_orderkey"), m).as(s"__slot$j")).distinct(),
      m, k)
  }

  /** Bloom MERGE: position sets built on slices of the dim combine by
    * plain set UNION (bitwise OR on the bitmap view — idempotent and
    * commutative, the HLL-register property), so the merged filter is
    * EXACTLY the full-data filter: same survivors, same false
    * positives. The oracle is the full-data Bloom computation — the
    * hash match is the merge proof, completing the KMV/CMS/HLL/
    * histogram lossless-merge family for the join-pruning sketch. */
  def bloomSemiPruneMerged(
      lineitem: DataFrame, orders: DataFrame,
      m: Int = 16384, k: Int = 3, splitDay: String = "1998-01-01"): DataFrame = {
    val d = lit(splitDay).cast("timestamp")
    val u1 = urgentKeys(orders.filter(col("o_orderdate") < d))
    val u2 = urgentKeys(orders.filter(col("o_orderdate") >= d))
    bloomProbe(lineitem, urgentKeys(orders),
      j => u1.select(bloomPos(j, col("o_orderkey"), m).as(s"__slot$j")).distinct()
        .unionAll(
          u2.select(bloomPos(j, col("o_orderkey"), m).as(s"__slot$j")).distinct())
        .distinct(),
      m, k)
  }

  private def urgentKeys(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")

  private def bloomPos(j: Int, key: Column, m: Int): Column =
    h60(concat(lit(s"bf$j:"), key.cast("string"))) % m

  /** The probe half of [[bloomSemiPrune]]: ONE pass over the fact — k
    * broadcast left joins flag each row's per-hash-function slot hits
    * (slot sets are distinct, so a left join matches at most once), the
    * dim key rides a fourth broadcast for the exact flag, and a single
    * partial-agg rolls up the honesty row (fact / survivors / exact /
    * overshoot). In a pipeline the same broadcast slot sets filter
    * map-side as `WHERE` flags — the fact is never exchanged. */
  private def bloomProbe(
      lineitem: DataFrame, urgent: DataFrame, slots: Int => DataFrame,
      m: Int, k: Int): DataFrame = {
    val flagged = (0 until k).foldLeft(lineitem.select("l_orderkey")) { (df, j) =>
      df.join(broadcast(slots(j)),
        bloomPos(j, col("l_orderkey"), m) === col(s"__slot$j"), "left")
    }.join(broadcast(urgent.withColumn("__exact", lit(1))),
      col("l_orderkey") === col("o_orderkey"), "left")
    val pass = (0 until k).map(j => col(s"__slot$j").isNotNull).reduce(_ && _)
    flagged.agg(
      count(lit(1)).as("n_fact"),
      sum(when(pass, 1L).otherwise(0L)).as("n_bloom_pass"),
      sum(when(col("__exact").isNotNull, 1L).otherwise(0L)).as("n_exact"))
      .select(col("n_fact"), col("n_bloom_pass"), col("n_exact"),
        (col("n_bloom_pass") - col("n_exact")).as("n_false_pos"))
  }

  /** AMS/count-sketch join-SIZE estimation: |A ⋈ B| on a key equals the
    * inner product of the two key-frequency vectors, estimated UNBIASED
    * from two tiny sign-sketch grids over shared hashes —
    * `sX[r][b] = Σ_rows sign_r(key)` (each key's ±1 sign from a hash
    * bit), `est_r = Σ_b sA[r][b]·sB[r][b]`, median over the d rows.
    * Collisions cancel in expectation (signs are independent), so the
    * error is ~√(F₂(A)·F₂(B)/w) — unlike a counter-CMS inner product,
    * whose +nA·nB/w collision BIAS swamps any FK join at this
    * cardinality (measured 2343× here before the sign trick; the reason
    * AMS exists). This is what a distributed planner sizes a join with
    * (broadcast vs shuffle, partition count) from two O(d·w) sketches
    * without touching either table again; the grids are mergeable
    * across shards like the rest of the sketch family.
    *
    * Scale shape: one pass per side to a d·w-cell grid (map-side
    * combine), a d·w-row join + d-row agg — metadata from there. Sign
    * sums accumulate in DECIMAL(38,0) (the C88 overflow discipline —
    * at 10^12-row sides the products exceed int64); the median over d
    * exact integers is a deterministic sort of a 5-element array. The
    * sign bit is taken bitwise (`h & w`), never via an h/w double
    * division — h is 60 bits, beyond double's exact-integer range. */
  def amsJoinSize(
      orders: DataFrame, lineitem: DataFrame, d: Int = 5, w: Int = 256): DataFrame = {
    require((w & (w - 1)) == 0, "w must be a power of two (bucket/sign bit masks)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // Each grid cell needs Σ_keys f(key)·sign(key), so reduce to the
    // per-KEY frequency table first and hash each distinct key once —
    // d·|keys| md5s instead of d·|rows| (4× fewer on the FK side here;
    // the win grows with the fan-out). |Σ sign·f| ≤ n_rows, so the
    // weighted sign sums stay in int64 at any gate scale.
    def grid(df: DataFrame, key: String): DataFrame = {
      val keyed = df.groupBy(col(key).as("__k")).agg(count(lit(1)).as("__f"))
      val cells = array((0 until d).map { r =>
        val h = h60(concat(lit(s"$r:"), col("__k").cast("string")))
        struct(lit(r).as("r"), (h % w).as("bucket"),
          when(h.bitwiseAND(lit(w.toLong)) === 0L, col("__f"))
            .otherwise(-col("__f")).as("sf"))
      }: _*)
      keyed.select(explode(cells).as("c"))
        .groupBy(col("c.r").as("r"), col("c.bucket").as("bucket"))
        .agg(sum(col("c.sf")).as("s"))
    }
    val a = grid(orders, "o_orderkey")
    val b = grid(lineitem, "l_orderkey").withColumnRenamed("s", "s_b")
    val inner = a.join(b, Seq("r", "bucket"))
      .groupBy("r")
      .agg(sum(col("s").cast(dec) * col("s_b").cast(dec)).as("__est0"))
    // All d estimator rows must exist before the middle element is taken:
    // the (r,bucket) inner join drops an entire sketch ROW when that row
    // shares no occupied bucket with the other side (tiny/disjoint
    // inputs), and element (d+1)/2 of <d rows is not their median. A
    // row with zero shared buckets has inner product exactly 0, so the
    // d-row spine left-joins the inner products and coalesces to 0.
    val spine = orders.sparkSession.range(d).select(col("id").cast("int").as("r"))
    val per = spine.join(inner, Seq("r"), "left")
      .select(coalesce(col("__est0"), lit(0).cast(dec)).as("__est"))
    val est = per.agg(
      // try_element_at: an EMPTY side produces no grid rows, and the
      // median of nothing is null, not an ANSI index error
      try_element_at(sort_array(collect_list(col("__est"))), lit((d + 1) / 2))
        .cast("long").as("est_join_size"))
    val truth = orders.select(col("o_orderkey").as("k"))
      .join(lineitem.select(col("l_orderkey").as("k")), "k")
      .agg(count(lit(1)).as("true_join_size"))
    est.crossJoin(broadcast(truth))
      .select(col("est_join_size"), col("true_join_size"),
        // a zero-size join has no relative error (ANSI divide-by-zero)
        when(col("true_join_size") === 0L, lit(null).cast("double"))
          .otherwise((col("est_join_size") - col("true_join_size")).cast("double") /
            col("true_join_size").cast("double")).as("rel_error"))
  }
}
