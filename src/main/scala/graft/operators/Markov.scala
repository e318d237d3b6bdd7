package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain (removal-effect) attribution — the data-driven model the
  * first-order transition matrix (SURVEY §2.A15) feeds.
  *
  * Model: user paths are walks on a chain with states
  * {START, channels…, CONV, NULL}. Converting journeys contribute
  * START→c₁→…→cₖ→CONV; each user's unassigned residual sessions
  * contribute a non-converting START→c₁→…→cₖ→NULL path. The removal
  * effect of channel c is the relative drop in START→CONV absorption
  * probability when every transition into c is redirected to NULL;
  * channel credit is the normalized removal effect, and revenue is split
  * by that weight.
  *
  * Scale split: transition COUNTING is the data-sized part and runs as
  * windowed lead() passes + one groupBy — fully distributed. The chain
  * itself is |channels|² ≈ bytes of INDEX METADATA, so the absorption
  * solve (fixed 16 Jacobi iterations per removal) runs driver-side on the
  * collected matrix, exactly like collecting K centroid vectors for IVF.
  *
  * Exactness: each iteration step mirrors the DuckDB oracle bit-for-bit —
  * every per-state accumulation is an ORDERED DOUBLE FOLD over
  * to-state-sorted terms (driver `foldLeft` ≡ oracle
  * `list_reduce(list(… ORDER BY m.t))`), each term ONE correctly-rounded
  * IEEE multiply. No double→decimal cast exists anywhere in the solve:
  * the oracle engine's cast tie-rounding is engine-internal and
  * path-dependent (the sf0.1 channel_hits divergence, SURVEY §3
  * discipline 3), so the fold is the only bridge-free formulation — and
  * 16 iterations later the two engines still agree on every bit.
  */
object Markov {

  val Start = "START"
  val Conv = "CONV"
  val Absorb = "NULL"
  /** Marker for the unmodified chain in the removal dimension. */
  val NoRemoval = "<none>"

  /** Separator inside second-order composite states: the ASCII unit
    * separator (0x1F), a control character no real channel label carries —
    * a printable separator like '>' would make a channel named `a>b`
    * ambiguous with the composite `a`→`b`, and removal matching via the
    * state suffix would then misattribute. The DuckDB oracle builds and
    * splits states with the same `chr(31)`. */
  val StateSep = "\u001f"

  /** Distributed transition counts over converting journeys + residual
    * non-converting paths: (from_state, to_state, n). */
  def transitionCounts(sessions: DataFrame, assigned: DataFrame): DataFrame = {
    val wj = Window.partitionBy("conv_id").orderBy(col("ts_us"), col("session_id"))
    val j = assigned
      .select(col("conv_id"), col("ts_us"), col("session_id"), col("channel_name"))
      .withColumn("nxt", lead("channel_name", 1).over(wj))
      .withColumn("rn", row_number().over(wj))
    val resid = sessions.join(assigned.select("session_id"), Seq("session_id"), "left_anti")
    val wu = Window.partitionBy("user_id").orderBy(col("ts_us"), col("session_id"))
    val r = resid
      .select(col("user_id"), col("ts_us"), col("session_id"), col("channel_name"))
      .withColumn("nxt", lead("channel_name", 1).over(wu))
      .withColumn("rn", row_number().over(wu))
    // Each row emits its transitions in ONE pass — (state, next-or-
    // absorber) always, plus the START edge on the path opener — instead
    // of six filtered union branches that each re-evaluated the window
    // subtree (the union multiset is identical: branch "nxt IS NOT NULL"
    // + branch "nxt IS NULL → absorber" ≡ coalesce(nxt, absorber)).
    emitTransitions(j, col("channel_name"), Conv)
      .unionByName(emitTransitions(r, col("channel_name"), Absorb))
      .groupBy(col("f").as("from_state"), col("t").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** One-pass transition emission over a windowed path frame carrying
    * (state column, `nxt`, `rn`): every row yields (state, coalesce(nxt,
    * absorber)); the opener (rn = 1) additionally yields (START, state). */
  private def emitTransitions(
      paths: DataFrame, state: org.apache.spark.sql.Column, absorber: String): DataFrame = {
    val step = struct(state.as("f"), coalesce(col("nxt"), lit(absorber)).as("t"))
    val open = struct(lit(Start).as("f"), state.as("t"))
    paths
      .select(explode(when(col("rn") === 1, array(open, step))
        .otherwise(array(step))).as("e"))
      .select(col("e.f").as("f"), col("e.t").as("t"))
  }


  /** START→CONV absorption probability after `iters` Jacobi steps, with
    * transitions into `removed` redirected to NULL and `removed`'s own
    * outgoing rows dropped (probabilities keep the ORIGINAL denominators —
    * the walk follows the original chain and is lost on entering the
    * removed channel). */
  private[graft] def absorption(
      trans: Seq[(String, String, Long)],
      removed: Option[String],
      iters: Int = 16): Double =
    absorptionBy(trans, st => removed.contains(st), iters)

  /** [[absorption]] generalized to a removal PREDICATE over state labels —
    * higher-order chains remove every composite state whose current
    * channel matches, not a single label. */
  private[graft] def absorptionBy(
      trans: Seq[(String, String, Long)],
      isRemoved: String => Boolean,
      iters: Int = 16): Double = {
    val totals = trans.groupBy(_._1).map { case (fr, xs) => fr -> xs.map(_._3).sum }
    val probs = trans
      .filterNot { case (fr, _, _) => isRemoved(fr) }
      .map { case (fr, to0, n) =>
        val to = if (isRemoved(to0)) Absorb else to0
        (fr, to, n.toDouble / totals(fr).toDouble)
      }
    val states = trans.map(_._1).distinct.filterNot(isRemoved)
    val cp = probs.filter(_._2 == Conv).map { case (fr, _, p) => fr -> p }.toMap
    // per-source terms pre-sorted by TO-state: each accumulation is an
    // ordered double fold, the identical left-to-right sequence the
    // oracle's `list_reduce(list(prob*p ORDER BY m.t))` computes — no
    // double→decimal bridge anywhere (the channelHits lesson)
    val chanBySrc: Map[String, Seq[(String, Double)]] = probs
      .filter { case (_, to, _) => to != Conv && to != Absorb }
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.sortBy(_._2).map(x => (x._2, x._3)) }
    var p: Map[String, Double] = states.map(_ -> 0.0).toMap
    (1 to iters).foreach { _ =>
      p = states.map { s =>
        val acc = chanBySrc.getOrElse(s, Nil)
          .foldLeft(0.0) { case (a, (to, pr)) => a + pr * p(to) }
        s -> (cp.getOrElse(s, 0.0) + acc)
      }.toMap
    }
    p.getOrElse(Start, 0.0)
  }

  /** Full removal-effect attribution:
    * (channel_name, removal_effect, weight, revenue). */
  def attribution(
      spark: SparkSession, sessions: DataFrame, assigned: DataFrame): DataFrame = {
    // The journey-assignment DAG under `assigned` is consumed three times
    // (transition window, residual anti-join probe, revenue total) and
    // only its exchanges would be reused — cache the narrow projection for
    // the operator's duration so the upstream windows run once. Both
    // consumers are eager (collect / head), so the unpersist is safe.
    val a = assigned
      .select("conv_id", "session_id", "ts_us", "channel_name", "revenue").cache()
    try {
      val trans = transitionCounts(sessions, a)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val channels = trans.map(_._1).distinct.filter(_ != Start).sorted
      effectsFrame(spark, a, trans, channels, c => st => st == c)
    } finally a.unpersist()
  }

  /** SECOND-ORDER transition counts: states are (previous, current)
    * channel pairs encoded `prev․cur` with the [[StateSep]] control-char
    * separator (`START․c₁` opens each path), so the
    * chain conditions on the last TWO touches — paths where the same
    * channel behaves differently depending on what preceded it (retargeting
    * after display vs after search) get distinct dynamics that a
    * first-order chain averages away. Same distributed shape as
    * [[transitionCounts]]: one window pass computing lag-composite +
    * lead + row_number per partition key, one groupBy. */
  def transitionCounts2(sessions: DataFrame, assigned: DataFrame): DataFrame = {
    val wj = Window.partitionBy("conv_id").orderBy(col("ts_us"), col("session_id"))
    val j = assigned
      .select(col("conv_id"), col("ts_us"), col("session_id"), col("channel_name"))
      .withColumn("st", concat_ws(StateSep,
        coalesce(lag("channel_name", 1).over(wj), lit(Start)), col("channel_name")))
      .withColumn("nxt", lead("st", 1).over(wj))
      .withColumn("rn", row_number().over(wj))
    val resid = sessions.join(assigned.select("session_id"), Seq("session_id"), "left_anti")
    val wu = Window.partitionBy("user_id").orderBy(col("ts_us"), col("session_id"))
    val r = resid
      .select(col("user_id"), col("ts_us"), col("session_id"), col("channel_name"))
      .withColumn("st", concat_ws(StateSep,
        coalesce(lag("channel_name", 1).over(wu), lit(Start)), col("channel_name")))
      .withColumn("nxt", lead("st", 1).over(wu))
      .withColumn("rn", row_number().over(wu))
    // same one-pass emission as [[transitionCounts]], over composite states
    emitTransitions(j, col("st"), Conv)
      .unionByName(emitTransitions(r, col("st"), Absorb))
      .groupBy(col("f").as("from_state"), col("t").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** Second-order Markov removal-effect attribution — the higher-order
    * extension of [[attribution]]: same absorbing-chain solve over the
    * `prev>cur` composite states, with channel c's removal redirecting
    * every transition into ANY state currently at c (label suffix `>c`)
    * to NULL. Credit is still per CHANNEL. Chain size is ≤ |channels|²+2
    * states — still index metadata for the driver-side solve; counting
    * stays fully distributed. */
  def attribution2(
      spark: SparkSession, sessions: DataFrame, assigned: DataFrame): DataFrame = {
    // same shared-pass cache as [[attribution]]
    val a = assigned
      .select("conv_id", "session_id", "ts_us", "channel_name", "revenue").cache()
    try {
      val trans = transitionCounts2(sessions, a)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val channels = trans.map(_._1)
        .filter(_ != Start).map(st => st.substring(st.indexOf(StateSep) + StateSep.length))
        .distinct.sorted
      effectsFrame(spark, a, trans, channels, c => st => st.endsWith(StateSep + c))
    } finally a.unpersist()
  }

  /** Shared removal-effect → (weight, revenue) post-processing with the
    * degenerate-chain guards: no converting journeys (pFull = 0) or
    * all-zero removal effects (wsum = 0) return an EMPTY frame instead of
    * silently emitting NaN rows. */
  private def effectsFrame(
      spark: SparkSession,
      assigned: DataFrame,
      trans: Seq[(String, String, Long)],
      channels: Seq[String],
      removes: String => String => Boolean): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "channel_name STRING, removal_effect DOUBLE, weight DOUBLE, revenue DOUBLE")
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val pFull = absorptionBy(trans, _ => false)
    if (pFull == 0.0 || channels.isEmpty) return empty
    val effects = channels.map { c =>
      c -> math.max(1.0 - absorptionBy(trans, removes(c)) / pFull, 0.0)
    }
    // Σ removal effects: ordered double fold in channel order (channels
    // is sorted), ≡ the oracle's list_reduce(… ORDER BY channel_name)
    val wsum = effects.foldLeft(0.0) { case (a, (_, e)) => a + e }
    if (wsum == 0.0) return empty
    // total journey revenue — distributed decimal-exact sum
    val total = assigned.select(col("conv_id"), col("revenue")).distinct()
      .agg(graft.functions.Exact.dsum(col("revenue"))).head().getDouble(0)
    val rows = effects.map { case (c, e) =>
      Row(c, e, e / wsum, e / wsum * total)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .orderBy("channel_name")
  }

  /** Fully distributed removal-effect attribution — the high-cardinality
    * path [[attribution]]'s driver-side solve does not scale to. The
    * driver solve collects the K×K transition matrix (bytes at channel
    * cardinality, the audited design); when states number millions
    * (page-level or product-level chains), BOTH the matrix and the
    * (K+1)-fold removal sweep must stay distributed. Here every removal
    * variant solves simultaneously in ONE frame keyed (removal, state):
    * the edge grid is |edges|×(K+1) rows, each Jacobi iteration is one
    * join + one partial-agg groupBy on that key, and the removal effects,
    * weights, and revenue split come out of one-row broadcast aggregates —
    * no driver-side math at any cardinality. 16 iterations ≡ the driver
    * solve's fixed point (spec: agrees with [[attribution]] to 1e-9 per
    * channel; the decimal-lockstep driver variant remains the
    * oracle-checked path at channel cardinality).
    *
    * First-order only: second-order removal predicates match state
    * SUFFIXES, which would make the redirect a per-row string test here —
    * composite states can adopt the same grid with a precomputed
    * `removed_channel` column when needed. */
  def attributionDistributed(
      spark: SparkSession, sessions: DataFrame, assigned: DataFrame,
      iters: Int = 16): DataFrame =
    attributionDistributedImpl(
      spark, transitionCounts(sessions, assigned), assigned,
      secondOrder = false, iters)

  /** The SECOND-ORDER twin of [[attributionDistributed]] — removal of
    * channel c removes every composite state whose CURRENT channel is c
    * (label suffix `<sep>c`), exactly [[attribution2]]'s predicate, as a
    * row-parallel suffix test in the grid instead of a driver closure.
    * Spec-pinned to the driver solve like the first-order form. */
  def attributionDistributed2(
      spark: SparkSession, sessions: DataFrame, assigned: DataFrame,
      iters: Int = 16): DataFrame =
    attributionDistributedImpl(
      spark, transitionCounts2(sessions, assigned), assigned,
      secondOrder = true, iters)

  private def attributionDistributedImpl(
      spark: SparkSession, trans0: DataFrame, assigned: DataFrame,
      secondOrder: Boolean, iters: Int): DataFrame = {
    val trans = trans0.localCheckpoint()
    // channel of a state label; second-order composite states carry the
    // current channel after the control-char separator (exactly one per
    // composite state — labels cannot contain 0x1F)
    def channelOf(st: org.apache.spark.sql.Column) =
      if (secondOrder) substring_index(st, StateSep, -1) else st
    def isRemoved(st: org.apache.spark.sql.Column, rm: org.apache.spark.sql.Column) =
      if (secondOrder) st.endsWith(concat(lit(StateSep), rm)) else st === rm
    val totals = trans.groupBy("from_state").agg(sum("n").as("tot"))
    val removals = trans
      .filter(col("from_state") =!= Start)
      .select(channelOf(col("from_state")).as("removal"))
      .distinct()
      .union(spark.range(1).select(lit(NoRemoval).as("removal")))
      .localCheckpoint()
    // edge grid: original denominators; rows out of the removed state
    // drop, edges INTO it redirect to NULL (merging with any existing
    // →NULL edge), matching the driver solve's walk semantics
    val edges = trans.join(totals, "from_state")
      .crossJoin(broadcast(removals))
      .filter(!isRemoved(col("from_state"), col("removal")))
      .select(col("removal"), col("from_state"),
        when(isRemoved(col("to_state"), col("removal")), lit(Absorb))
          .otherwise(col("to_state")).as("to_state"),
        (col("n").cast("double") / col("tot").cast("double")).as("pr"))
      .groupBy("removal", "from_state", "to_state")
      .agg(sum("pr").as("pr"))
      .localCheckpoint()
    val cp = edges.filter(col("to_state") === Conv)
      .select(col("removal"), col("from_state"), col("pr").as("cp"))
    val chan = edges
      .filter(col("to_state") =!= Conv && col("to_state") =!= Absorb)
      .localCheckpoint()
    val states = edges.select("removal", "from_state").distinct().localCheckpoint()
    var p = states.select(col("removal"), col("from_state").as("state"), lit(0.0).as("p"))
    for (_ <- 1 to iters) {
      val inflow = chan
        .join(p.withColumnRenamed("state", "to_state"), Seq("removal", "to_state"))
        .groupBy("removal", "from_state")
        .agg(sum(col("pr") * col("p")).as("acc"))
      p = states
        .join(inflow, Seq("removal", "from_state"), "left")
        .join(cp, Seq("removal", "from_state"), "left")
        .select(col("removal"), col("from_state").as("state"),
          (coalesce(col("cp"), lit(0.0)) + coalesce(col("acc"), lit(0.0))).as("p"))
        .localCheckpoint()
    }
    val atStart = p.filter(col("state") === Start)
    val base = atStart.filter(col("removal") === NoRemoval)
      .select(col("p").as("p_base"))
    val eff = atStart.filter(col("removal") =!= NoRemoval)
      .crossJoin(broadcast(base))
      .filter(col("p_base") > 0.0)
      .select(col("removal").as("channel_name"),
        greatest(lit(1.0) - col("p") / col("p_base"), lit(0.0)).as("removal_effect"))
    val wsum = eff.agg(sum(
      col("removal_effect").cast(org.apache.spark.sql.types.DecimalType(27, 9)))
      .cast("double").as("wsum"))
    val total = assigned.select(col("conv_id"), col("revenue")).distinct()
      .agg(graft.functions.Exact.dsum(col("revenue")).as("total"))
    eff.crossJoin(broadcast(wsum)).crossJoin(broadcast(total))
      .filter(col("wsum") > 0.0)
      .select(col("channel_name"), col("removal_effect"),
        (col("removal_effect") / col("wsum")).as("weight"),
        (col("removal_effect") / col("wsum") * col("total")).as("revenue"))
      .orderBy("channel_name")
  }

  /** PageRank over the channel-transition graph — channel influence as a
    * stationary-visit measure rather than removal effect (the graph twin
    * of [[attribute]]). Fixed `iters` damped power iterations with
    * dangling-mass redistribution, every arithmetic node the identical
    * IEEE/decimal tree as the unrolled-CTE oracle.
    *
    * Scale shape: ONE distributed pass builds the K×K transition matrix
    * (the whole event stream reduces to it — same partial-agg pipeline as
    * [[Journeys.channelTransitions]]); the power iteration then runs on
    * that matrix in the driver. K = |channels| is event-type cardinality
    * (single digits at any corpus size), so the collected matrix is
    * graph-cardinality METADATA — the same legitimate-collect class as
    * the Markov K×K matrix ([[attribute]]) — and iterating K-row frames
    * as distributed jobs would be pure scheduler overhead (measured 5 s
    * of it at bench scale). Graphs whose node count actually scales
    * (users, pages) take [[pagerank]], the shuffle-join engine.
    *
    * Determinism: per-term sums are ORDERED DOUBLE FOLDS over
    * channel-sorted terms — the same left-to-right fold the oracle's
    * `list_reduce(list(x ORDER BY channel))` computes, so there is NO
    * float→decimal rounding bridge to get wrong. (The earlier
    * decimal-cast bridge relied on mirroring DuckDB's double→decimal
    * tie rounding, which is engine-internal and path-dependent — the
    * sf0.1 channel_hits divergence; SURVEY §3 discipline (3).) */
  def channelPagerank(
      assigned: DataFrame, damping: Double = 0.85, iters: Int = 8): DataFrame = {
    val spark = assigned.sparkSession
    val trans = Journeys.channelTransitions(assigned).collect()
      .map(r => (r.getAs[String]("from_channel"), r.getAs[String]("to_channel"),
        r.getAs[Number]("n").longValue()))
    val nodes = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    if (nodes.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("channel",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pr",
            org.apache.spark.sql.types.DoubleType))))
    val nD = nodes.length.toDouble
    val outSum = trans.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val edges = trans.map { case (s, d, w) => (s, d, w.toDouble / outSum(s).toDouble) }
    val dangling = nodes.filterNot(outSum.contains)
    def foldSum(xs: Iterable[Double]): Double = xs.foldLeft(0.0)(_ + _)
    var pr: Map[String, Double] = nodes.map(_ -> 1.0 / nD).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> foldSum(es.sortBy(_._1).map { case (s, _, p) => pr(s) * p })
      }
      val d = foldSum(dangling.map(n => pr(n)))
      pr = nodes.map(n => n ->
        ((1.0 - damping) / nD +
          damping * (inflow.getOrElse(n, 0.0) + d / nD))).toMap
    }
    import spark.implicits._
    nodes.map(n => (n, pr(n))).toSeq.toDF("channel", "pr")
      .orderBy(col("pr").desc, col("channel"))
  }

  /** HITS hubs & authorities over the channel-transition graph — the
    * bipartite-influence companion of [[channelPagerank]]: a channel is a
    * strong HUB when it routes traffic into strong authorities (the
    * prospecting channels that open journeys) and a strong AUTHORITY when
    * strong hubs route into it (the closing channels journeys converge
    * on). Classic Kleinberg mutual recursion, `iters` rounds of
    * a ← Lᵀh, h ← La with L1 normalization each half-step.
    *
    * Scale shape: identical to [[channelPagerank]] — ONE distributed pass
    * reduces the event stream to the K×K transition matrix
    * (graph-cardinality metadata, K = |channels|), the iteration runs
    * driver-side. Determinism: per-term sums are ORDERED DOUBLE FOLDS
    * over channel-sorted terms (≡ the oracle's
    * `list_reduce(list(x ORDER BY channel))`), and each normalization is
    * ONE double division — no float→decimal bridge anywhere (the
    * decimal-cast version diverged at sf0.1 when 4 terms hit DuckDB's
    * cast-rounding ambiguity band; SURVEY §3 discipline (3)). */
  def channelHits(assigned: DataFrame, iters: Int = 8): DataFrame = {
    val spark = assigned.sparkSession
    val trans = Journeys.channelTransitions(assigned).collect()
      .map(r => (r.getAs[String]("from_channel"), r.getAs[String]("to_channel"),
        r.getAs[Number]("n").longValue()))
    val nodes = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    if (nodes.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("channel",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("hub",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("authority",
            org.apache.spark.sql.types.DoubleType))))
    def foldSum(xs: Iterable[Double]): Double = xs.foldLeft(0.0)(_ + _)
    val w = trans.map { case (s, d, n) => (s, d, n.toDouble) }
    var hub: Map[String, Double] = nodes.map(_ -> 1.0).toMap
    var auth: Map[String, Double] = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val aRaw: Map[String, Double] = nodes.map(n =>
        n -> foldSum(w.filter(_._2 == n).sortBy(_._1)
          .map { case (s, _, ww) => hub(s) * ww })).toMap
      val aNorm = foldSum(nodes.map(aRaw))
      auth = nodes.map(n => n -> (if (aNorm > 0.0) aRaw(n) / aNorm else 0.0)).toMap
      val hRaw: Map[String, Double] = nodes.map(n =>
        n -> foldSum(w.filter(_._1 == n).sortBy(_._2)
          .map { case (_, d, ww) => auth(d) * ww })).toMap
      val hNorm = foldSum(nodes.map(hRaw))
      hub = nodes.map(n => n -> (if (hNorm > 0.0) hRaw(n) / hNorm else 0.0)).toMap
    }
    import spark.implicits._
    nodes.map(n => (n, hub(n), auth(n))).toSeq.toDF("channel", "hub", "authority")
      .orderBy(col("channel"))
  }

  /** PageRank over an ARBITRARY weighted edge frame `(src, dst, weight)`
    * — the general engine behind [[channelPagerank]], usable on any graph
    * (user-follows, citation, page-link) at any node type/cardinality.
    * Fixed `iters` damped power iterations with dangling-mass
    * redistribution; returns one `(node, pr)` row per node, unordered
    * (callers sort — a billion-node result should not pay a total sort it
    * may not want). Multi-edges are fine: out-probabilities normalize by
    * the summed weight.
    *
    * Scale shape: the standard distributed plan — edges shuffle-join
    * ranks on `src`, inflow is one partial-agg groupBy per iteration, and
    * the dangling mass is a ONE-ROW broadcast cross join (never a driver
    * collect). Node count is the only driver scalar (graph-cardinality
    * metadata). Each iteration's lineage is cut periodically
    * (`localCheckpoint`) so Catalyst re-analysis stays flat in the
    * iteration count; every arithmetic node keeps the identical
    * IEEE/decimal tree as the unrolled-CTE oracle on the channel
    * instance. */
  def pagerank(
      edgesIn: DataFrame, damping: Double = 0.85, iters: Int = 8,
      checkpointEvery: Int = 2): DataFrame = {
    val trans = edgesIn.select("src", "dst", "weight").localCheckpoint()
    val nodes = trans.select(col("src").as("node"))
      .union(trans.select(col("dst")))
      .distinct()
      .localCheckpoint()
    val nD = nodes.count().toDouble // |V| — graph metadata, not row data
    val outSum = trans.groupBy("src").agg(sum("weight").as("out_n"))
      .localCheckpoint()
    val edges = trans.join(outSum, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("out_n").cast("double")).as("p"))
      .localCheckpoint()
    // the dangling NODE SET is fixed across iterations (nodes with no
    // out-edges) — only its rank mass changes. Precompute it once; when
    // it is empty (every node links onward — the common case for channel
    // graphs) the per-iteration dangling aggregate is a constant 0 and
    // its join+agg+broadcast subplan can be elided entirely, leaving
    // `+ 0.0` (bit-identical: inflow is never -0.0).
    val danglingNodes = nodes
      .join(outSum.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint()
    val hasDangling = danglingNodes.count() > 0
    // scale 12, NOT deeper: Spark's double→decimal cast rounds the
    // SHORTEST-STRING representation while DuckDB rounds the exact binary
    // expansion — they agree only within double's ~17 significant digits,
    // so accumulation scale must stay comfortably inside that budget
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    var ranks = nodes.select(col("node"), (lit(1.0) / lit(nD)).as("pr"))
    for (i <- 1 to iters) {
      val inflow = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum((col("pr") * col("p")).cast(dec)).cast("double").as("inflow"))
      val base = nodes.join(inflow, Seq("node"), "left")
      val withD =
        if (hasDangling) {
          val dangling = ranks
            .join(danglingNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("pr").cast(dec)).cast("double"), lit(0.0)).as("d"))
          base.crossJoin(broadcast(dangling))
        } else base.withColumn("d", lit(0.0))
      ranks = withD
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / lit(nD) +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) + col("d") / lit(nD)))
            .as("pr"))
      // checkpoint PERIODICALLY, not per-iteration: lineage (and Catalyst
      // re-analysis) must stay bounded, but each materialization is a full
      // job — on small graphs per-iteration checkpointing is pure job
      // overhead, and on big ones a 4-deep join lineage is still cheap
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** SYNCHRONOUS label-propagation community detection (Raghavan et al.
    * 2007, deterministic variant) over a weighted directed edge frame
    * `(src, dst, weight)`, treated as undirected by symmetrizing the
    * edges. Every node starts in its own community (label = node key);
    * each of `iters` synchronous rounds relabels every node to the label
    * carrying the MAXIMUM total incident edge weight among its
    * neighbors, ties → lexicographically smallest label — a pure
    * function of the graph, no randomness, so the result is identical on
    * any cluster layout and to the oracle's unrolled-round CTE chain.
    * Isolated nodes keep their own label.
    *
    * Scale shape: the same distributed discipline as [[pagerank]] — per
    * round, labels join edges on `src` (one shuffle), label mass is one
    * partial-agg groupBy, and the argmax is a window partitioned BY NODE
    * (never global). Weights stay integral (long sums — exact), so no
    * decimal/float bridge exists anywhere. Lineage is cut periodically
    * so Catalyst re-analysis stays flat in `iters`. */
  def labelPropagation(
      edgesIn: DataFrame, iters: Int = 4, checkpointEvery: Int = 2,
      driverSolveMaxEdges: Long = 10000L): DataFrame = {
    val dirEdges = edgesIn.select("src", "dst", "weight")
    // Schema-cardinality graphs (channel/category alphabets) solve
    // driver-side — the channelPagerank/channelHits discipline: the
    // whole edge list is bounded metadata, and 4 rounds of tiny
    // distributed joins are pure scheduler overhead. Same sync rounds,
    // same (wsum DESC, label ASC) tie-break, bit-identical labels.
    // String keys only (ASCII label ordering matches Spark's UTF8
    // binary order) AND integral weights only: the driver fold sums
    // longs, while the distributed path sums the native weight type — a
    // double-weighted edge frame would yield different communities
    // depending only on whether the edge count crosses
    // driverSolveMaxEdges (r9 ADVICE). Non-integral weights always take
    // the distributed path.
    val stringKeys =
      dirEdges.schema("src").dataType == org.apache.spark.sql.types.StringType
    val integralWeights = dirEdges.schema("weight").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (stringKeys && integralWeights && dirEdges.count() <= driverSolveMaxEdges) {
      val spark = edgesIn.sparkSession
      import spark.implicits._
      val es = dirEdges.collect().map(r =>
        (r.getString(0), r.getString(1), r.getAs[Number](2).longValue()))
      val sym = es ++ es.map { case (a, b, w) => (b, a, w) }
      val nodes = sym.map(_._1).distinct.sorted
      var labels: Map[String, String] = nodes.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        val mass = new scala.collection.mutable.HashMap[(String, String), Long]()
        sym.foreach { case (s, d, w) =>
          val k = (d, labels(s)); mass(k) = mass.getOrElse(k, 0L) + w
        }
        labels = nodes.map { n =>
          val cand = mass.collect { case ((`n`, l), w) => (l, w) }
          if (cand.isEmpty) n -> labels(n)
          else n -> cand.minBy { case (l, w) => (-w, l) }._1
        }.toMap
      }
      return nodes.map(n => (n, labels(n))).toSeq.toDF("node", "community")
    }
    val edges = dirEdges
      .union(dirEdges.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("label"))
    val w = Window.partitionBy("node").orderBy(col("wsum").desc, col("label").asc)
    for (i <- 1 to iters) {
      val mass = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum("weight").as("wsum"))
      val best = mass
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("node", "label")
      labels = nodes
        .join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      if (i % checkpointEvery == 0 && i < iters) labels = labels.localCheckpoint()
    }
    labels.withColumnRenamed("label", "community")
  }

  /** Per-node TRIANGLE COUNT + local clustering coefficient over an
    * arbitrary edge frame, treated as an undirected simple graph
    * (self-loops and duplicate/reverse edges collapse first).
    *
    * Algorithm: the degree-ordered orientation (Cohen 2009 / Suri &
    * Vassilvitskii '11 MR-style): each undirected edge points from its
    * LOWER-(degree, id) endpoint to the higher one, so every wedge is
    * enumerated at its lowest-degree apex — Σ out-deg² is O(m^1.5) on
    * any graph, where the naive a<b orientation degenerates to hub²
    * on skewed graphs (the 100 TB killer: one celebrity node =
    * quadratic wedges). Wedges close with one hash join back against
    * the oriented edge list; each closed triangle explodes to its three
    * members for the per-node rollup.
    *
    * Determinism: counts are exact longs; the clustering coefficient
    * `2T / (deg·(deg−1))` is one IEEE division of exact integers. */
  def triangleCount(edgesIn: DataFrame): DataFrame = {
    val und = edgesIn
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // orient every edge lower-(deg, node) → higher-(deg, node)
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
      .localCheckpoint()
    // wedges at the low-degree apex: (apex → x, apex → y), x < y;
    // the triangle closes iff {x, y} is an edge (in either orientation)
    val wedges = oriented.select(col("lo").as("apex"), col("hi").as("x"))
      .join(oriented.select(col("lo").as("apex"), col("hi").as("y")), "apex")
      .filter(col("x") < col("y"))
    val closed = wedges.join(
      oriented.select(
        least(col("lo"), col("hi")).as("x"), greatest(col("lo"), col("hi")).as("y")),
      Seq("x", "y"))
    val perNode = closed
      .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg
      .join(perNode, Seq("node"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .withColumn("clustering",
        when(col("deg") >= 2,
          (lit(2.0) * col("triangles").cast("double")) /
            (col("deg").cast("double") * (col("deg") - 1).cast("double")))
          .otherwise(lit(0.0)))
      .select("node", "deg", "triangles", "clustering")
  }
}
