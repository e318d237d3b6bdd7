package graft

import graft.operators.{IhcAttribution, Journeys, Reporting}
import graft.sources.{Layout, Manifest, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline runner with persisted, idempotent, CRASH-CONSISTENT
  * write-back — the Spark analog of the reference's orchestration
  * (`main.py:299-378`), incremental re-run contract (`db_utils.py:260-302`)
  * and transactional storage (`db_utils.py:185-225`: SQLite runs the
  * multi-row insert under one transaction; a crashed run publishes
  * nothing). Each run attributes ONLY conversions not yet present in the
  * persisted attribution state, stages the delta, and publishes
  * atomically; a re-run with no new data is a no-op, and a run after new
  * days of events attributes exactly the delta, bit-identical to a
  * from-scratch run (spec-tested in PipelineSpec, including an
  * aborted-between-writes crash run).
  *
  * Why the delta is consistent with from-scratch: a user's journeys
  * depend on nothing outside the user, and greedy assignment gives each
  * session to the EARLIEST later conversion, so conversions arriving
  * later can never steal sessions from already-attributed journeys — the
  * restriction to missing conversions commutes with assignment. (The
  * reference gets the same property from its chronological processing
  * order, `journey_builder.py:45-105`.)
  *
  * EVERY per-run cost is O(extract + delta), never O(history):
  *   - assignment input is semi-joined down to the users owning a missing
  *     conversion BEFORE the journey window runs (exact, by per-user
  *     independence) — a daily run attributes the day's users, not every
  *     user ever seen;
  *   - the channel report is maintained incrementally: the run aggregates
  *     only its delta and outer-merges the exact-decimal partial sums into
  *     the committed `report_base` state by (channel, date) — bit-identical
  *     to re-aggregating all history, at O(|channels|·|dates|) merge cost;
  *   - the committed row total rides in manifest METADATA, so no run ever
  *     re-scans prior attribution dirs (spec-proven: PipelineSpec hides
  *     run 1's attribution data and run 2 still succeeds).
  *
  * Crash consistency (write–audit–publish): run N stages FRESH uniquely
  * tagged directories
  *   - `attribution/<tag>/` — the delta rows (conv_id, session_id,
  *     channel_name, ihc); the analog of the reference's
  *     `attribution_customer_journey` table (`challenge_db_create.sql`).
  *   - `processed_conversions/<tag>/` — the manifest of conv_ids this run
  *     attributed (tracked for ALL conversions incl. journeyless ones).
  *   - `report_base/<tag>/` — the merged exact-decimal report state.
  *   - `report/<tag>/` + `channel_reporting_csv/<tag>/` — the published
  *     channel report artifacts (`reporting.py:105-168`).
  * and then publishes all five in ONE atomic [[graft.sources.Manifest]]
  * version (attribution/processed accumulate across runs; the report
  * entries replace the previous run's). Readers resolve the live set from
  * the manifest, so a crash at ANY point before the publish leaves the
  * observable state bit-identical to "run never happened"; the next run
  * deletes the orphan staged dirs and recomputes the same delta. This is
  * the same run-level atomicity SQLite gives the reference, on top of
  * plain parquet directories. A run with NOTHING to attribute publishes
  * nothing at all, so idempotent re-runs do not grow the live-dir list.
  *
  * Concurrency: the publish is a manifest CAS — two racing runs cannot
  * corrupt state; the loser fails cleanly with its competitor's commit
  * intact (re-running attributes whatever remains). Each run holds a
  * [[graft.sources.Manifest.Lease]] across staging+publish, so one run's
  * recovery vacuum never deletes a concurrent run's in-flight staging
  * with the DEFAULT configuration (no grace-period tuning required).
  *
  * Scale notes: the manifest is driver-side metadata (bytes per run, never
  * row data). Everything else is the same shuffle-minimal plans as the
  * query surface.
  */
object Pipeline {

  final case class RunSummary(
      candidateConversions: Long,
      newConversions: Long,
      newRows: Long,
      totalRows: Long)

  private val StateTables =
    Seq("attribution", "processed_conversions", "report_base", "report",
      "channel_reporting_csv")

  /** Manifest metadata key: committed attribution row count. Carried in
    * the manifest so re-runs learn the persisted total without scanning
    * any attribution data. */
  private val RowsKey = "attribution_rows"

  /** Test-only failpoints: throw at a specific point inside [[run]] to
    * simulate a crash between state writes (PipelineSpec proves reads see
    * only complete runs and the re-run converges). */
  private[graft] final case class InjectedCrash(point: String)
    extends RuntimeException(s"injected crash at $point")

  private def liveDirs(spark: SparkSession, stateDir: String, table: String): Seq[String] =
    dirsOf(Manifest.live(spark, stateDir), stateDir, table)

  private def dirsOf(live: Seq[String], stateDir: String, table: String): Seq[String] =
    live.filter(_.startsWith(table + "/")).map(rel => s"$stateDir/$rel")

  private def readDirsOrEmpty(
      spark: SparkSession, dirs: Seq[String], ddl: String): DataFrame =
    if (dirs.nonEmpty) spark.read.parquet(dirs: _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  private def readLiveOrEmpty(
      spark: SparkSession, stateDir: String, table: String, ddl: String): DataFrame =
    readDirsOrEmpty(spark, liveDirs(spark, stateDir, table), ddl)

  private val ReportBaseDdl =
    "channel_name STRING, date DATE, cost DECIMAL(38,6), ihc DECIMAL(38,6), " +
      "ihc_revenue DECIMAL(38,6)"

  /** The persisted attribution table (union of all committed run deltas),
    * or an empty frame with the right schema before the first publish. */
  def persistedAttribution(spark: SparkSession, stateDir: String): DataFrame =
    readLiveOrEmpty(spark, stateDir, "attribution",
      "conv_id BIGINT, session_id BIGINT, channel_name STRING, ihc DOUBLE")

  /** The processed-conversions manifest. The reference re-derives "already
    * attributed" from the attribution table itself (`db_utils.py:260-302`),
    * which re-submits journeyless conversions on every run — harmless there,
    * but at warehouse scale "processed" must be tracked for ALL conversions,
    * including those that produced zero journey rows, or the daily delta
    * never shrinks to zero. */
  def processedConversions(spark: SparkSession, stateDir: String): DataFrame =
    readLiveOrEmpty(spark, stateDir, "processed_conversions", "conv_id BIGINT")

  /** The committed channel report (CPO/ROAS) of the latest successful run. */
  def report(spark: SparkSession, stateDir: String): DataFrame =
    readLiveOrEmpty(spark, stateDir, "report",
      "channel_name STRING, date DATE, cost DOUBLE, ihc DOUBLE, " +
        "ihc_revenue DOUBLE, CPO DOUBLE, ROAS DOUBLE")

  /** Directory of the committed single-file CSV artifact (the reference's
    * `channel_reporting.csv`), if a run has published one. */
  def reportCsvDir(spark: SparkSession, stateDir: String): Option[String] =
    liveDirs(spark, stateDir, "channel_reporting_csv").headOption

  // ---- bucketed extract: the 100 TB deployment layout ----
  // Journey assignment is the pipeline's one big shuffle (every session +
  // every conversion re-hashed by user_id per run). Persisting both
  // extracts bucketed by user_id once makes that shuffle disappear from
  // EVERY subsequent run: the bucket-aligned union (BucketUnion) preserves
  // the scan partitioning so the per-user window needs only a sort — the
  // production runner plans the assign subtree with zero exchanges
  // (asserted in PipelineSpec). Bucket metadata needs a catalog entry, so
  // the tables get session-scoped names derived from the state dir.

  // full-width md5 of the path, not String.hashCode: a 32-bit collision
  // between two state dirs would silently serve the other pipeline's
  // extracts from the catalog
  private[graft] def bucketedName(stateDir: String, table: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(stateDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"graft_pipe_${table}_$digest"
  }

  /** Persist the sessions/conversions extracts PARTITIONED BY DATE and
    * bucketed by user_id under `stateDir/bucketed/` (one-time layout cost;
    * re-run to refresh after new raw data lands).
    *
    * The two dimensions serve the two access patterns: date partitioning
    * means a date-windowed run (`endDate`, reporting windows) PRUNES
    * FILES — a 1-day window reads one day's directories, not all of
    * history (asserted by scanned-file count in PipelineSpec) — while
    * user bucketing keeps journey assignment shuffle-free (the bucketed
    * scan merges each bucket's files across date partitions, so the scan
    * still reports user_id hash partitioning). At 100 TB this is the
    * difference between a daily run scanning a day and scanning years. */
  def prepareBucketed(
      spark: SparkSession, sfDir: String, stateDir: String, nBuckets: Int = 8): Unit = {
    Tables.sessions(spark, sfDir).write.mode("overwrite")
      .partitionBy("event_date")
      .bucketBy(nBuckets, "user_id").sortBy("user_id")
      .option("path", s"$stateDir/bucketed/sessions")
      .saveAsTable(bucketedName(stateDir, "sessions"))
    Tables.conversions(spark, sfDir).write.mode("overwrite")
      .partitionBy("conv_date")
      .bucketBy(nBuckets, "user_id").sortBy("user_id")
      .option("path", s"$stateDir/bucketed/conversions")
      .saveAsTable(bucketedName(stateDir, "conversions"))
  }

  private def hasBucketed(spark: SparkSession, stateDir: String): Boolean =
    spark.catalog.tableExists(bucketedName(stateDir, "sessions")) &&
      spark.catalog.tableExists(bucketedName(stateDir, "conversions"))

  /** The flagged journey assignment exactly as [[run]] computes it —
    * bucketed (exchange-free assign) when [[prepareBucketed]] has run,
    * standard otherwise. Exposed so callers/specs can audit the plan. */
  def assignedJourneys(
      spark: SparkSession, sfDir: String, stateDir: String,
      endDate: Option[String],
      startDate: Option[String] = None): DataFrame = {
    val bucketed = hasBucketed(spark, stateDir)
    val allConversions =
      if (bucketed) spark.table(bucketedName(stateDir, "conversions"))
      else Tables.conversions(spark, sfDir)
    val conversions = Seq( // the filters keep the scan's bucketing AND, on
      // the partitioned layout, prune date partitions at the file level
      startDate.map(d => col("conv_date") >= lit(d).cast("date")),
      endDate.map(d => col("conv_date") <= lit(d).cast("date"))
    ).flatten.foldLeft(allConversions)(_ filter _)
    val sessions =
      if (bucketed) spark.table(bucketedName(stateDir, "sessions"))
      else Tables.sessions(spark, sfDir)
    val assigned =
      if (bucketed) Journeys.assignBucketed(sessions, conversions)
      else Journeys.assign(sessions, conversions)
    Journeys.flagConversion(assigned)
  }

  /** One incremental run: extract (optionally bounded by `endDate`, the
    * reference's date-range re-run; from the bucketed layout when
    * [[prepareBucketed]] has built it), attribute the not-yet-persisted
    * conversions, stage, publish atomically, and report.
    *
    * @param staleGraceMs extra orphan-retention window for the recovery
    *                     sweep. Concurrent runs need NO tuning — every run
    *                     holds a vacuum [[graft.sources.Manifest.Lease]]
    *                     shielding its in-flight staging; a positive grace
    *                     additionally protects dirs staged outside this
    *                     API (defense-in-depth) */
  def run(
      spark: SparkSession,
      sfDir: String,
      stateDir: String,
      endDate: Option[String] = None,
      staleGraceMs: Long = 0L,
      startDate: Option[String] = None): RunSummary =
    runImpl(spark, sfDir, stateDir, endDate, crashPoint = None,
      staleGraceMs = staleGraceMs, startDate = startDate)

  private[graft] def runImpl(
      spark: SparkSession,
      sfDir: String,
      stateDir: String,
      endDate: Option[String],
      crashPoint: Option[String],
      staleGraceMs: Long = 0L,
      beforePublish: () => Unit = () => (),
      startDate: Option[String] = None): RunSummary = {
    // Vacuum lease held for the whole run: acquired BEFORE any staging, so
    // a concurrent run's recovery sweep skips every dir this run stages
    // (no grace-period tuning); released however the run exits. A hard
    // kill leaves the lease to expire on its TTL, after which the
    // leftovers become vacuumable.
    val lease = Manifest.acquireLease(spark, stateDir,
      s"run_${java.util.UUID.randomUUID().toString.take(12)}")
    try runLeased(spark, sfDir, stateDir, endDate, crashPoint, staleGraceMs,
      beforePublish, startDate)
    finally Manifest.releaseLease(spark, stateDir, lease)
  }

  private def runLeased(
      spark: SparkSession,
      sfDir: String,
      stateDir: String,
      endDate: Option[String],
      crashPoint: Option[String],
      staleGraceMs: Long,
      beforePublish: () => Unit,
      startDate: Option[String] = None): RunSummary = {
    def failpoint(p: String): Unit =
      if (crashPoint.contains(p)) throw InjectedCrash(p)

    // the SAME extract feeds candidate selection, assignment, and the
    // report — if the bucketed layout exists, all three use it (mixing a
    // stale bucketed extract with a fresh raw one could mark conversions
    // processed without attributing them)
    val bucketed = hasBucketed(spark, stateDir)
    val allConversions =
      if (bucketed) spark.table(bucketedName(stateDir, "conversions"))
      else Tables.conversions(spark, sfDir)
    // [startDate, endDate] mirrors the reference's conversion extract
    // window (db_utils.py:67-103). Sessions intentionally stay UNwindowed:
    // journeys need the full pre-conversion touch history, and the
    // reference's session-window truncation silently drops pre-window
    // touches from journeys — a shape A3's semantics reject.
    val conversions = Seq(
      startDate.map(d => col("conv_date") >= lit(d).cast("date")),
      endDate.map(d => col("conv_date") <= lit(d).cast("date"))
    ).flatten.foldLeft(allConversions)(_ filter _)
    val sessions =
      if (bucketed) spark.table(bucketedName(stateDir, "sessions"))
      else Tables.sessions(spark, sfDir)

    // crash recovery: staged dirs no manifest references are leftovers of
    // an aborted run — readers never saw them; delete and re-stage.
    Manifest.cleanStale(spark, stateDir, StateTables, staleGraceMs)
    val snap = Manifest.snapshot(spark, stateDir)
    // committed total from manifest METADATA — not a scan of history
    val previousTotal = snap.meta.get(RowsKey).map(_.toLong).getOrElse(0L)

    val candidateConversions = conversions.count()
    val missing = Reporting
      .missingConversions(conversions,
        readDirsOrEmpty(spark,
          dirsOf(snap.live, stateDir, "processed_conversions"), "conv_id BIGINT"))
      .select("conv_id", "user_id")
      .localCheckpoint() // one evaluation feeds the count, the semi-joins,
                         // and the staged write
    val newConversions = missing.count()
    if (newConversions == 0L)
      // idempotent no-op: publish NOTHING — re-runs must not grow the
      // live-dir list (and the committed report already covers this state)
      return RunSummary(candidateConversions, 0L, 0L, previousTotal)

    // ---- O(delta) assignment ----
    // Only users owning a missing conversion can contribute delta rows, and
    // a user's assignment depends on nothing outside the user — so restrict
    // BOTH inputs to those users (keeping ALL their conversions: earlier,
    // already-attributed ones must still claim their sessions) and compute
    // journeys for delta users only. The broadcast semi-join preserves the
    // bucketed layout's shuffle-free plan (asserted in PipelineSpec).
    val missingUsers = missing.select("user_id").distinct()
    val assignedDelta = Journeys.flagConversion(
      if (bucketed) Journeys.assignBucketed(sessions, conversions, Some(missingUsers))
      else Journeys.assign(sessions, conversions, Some(missingUsers)))

    def freshTag(v: Long) = s"r${v}_${java.util.UUID.randomUUID().toString.take(8)}"
    var tag = freshTag(snap.alloc + 1)
    val delta = IhcAttribution
      .attribute(assignedDelta)
      .join(missing.select("conv_id"), Seq("conv_id"), "left_semi")
      .select("conv_id", "session_id", "channel_name", "ihc")

    // ---- stage (fresh uniquely-tagged dirs; nothing live is touched) ----
    delta.write.parquet(s"$stateDir/attribution/$tag")
    failpoint("after_attribution_stage")
    missing.select("conv_id").write.parquet(s"$stateDir/processed_conversions/$tag")

    // counts + report from what was actually staged — no double evaluation
    // of the delta DAG, and NO read of any prior run's attribution data
    var stagedDelta = spark.read.parquet(s"$stateDir/attribution/$tag")
    var stagedMissing = spark.read.parquet(s"$stateDir/processed_conversions/$tag")
    var newRows = stagedDelta.count()
    var attributedConvs = newConversions

    // ---- O(delta) report ----
    // aggregate ONLY the delta, then fold it into the committed decimal
    // report state by (channel, date): an O(|channels|·|dates|) merge,
    // bit-identical to re-aggregating all history (exact decimal sums).
    // The report artifacts get their own tag so an OCC retry can re-merge
    // against a race winner's base without re-staging the delta.
    val costs = Tables.sessionCosts(spark, sfDir)
    var reportTag: String = null
    def stageReport(v: Long, committedBase: DataFrame): Unit = {
      reportTag = freshTag(v)
      val deltaBase =
        Reporting.channelReportingBase(stagedDelta, sessions, costs, allConversions)
      Reporting.mergeReportBase(committedBase, deltaBase)
        .write.parquet(s"$stateDir/report_base/$reportTag")
      val rep = Reporting.withMetrics(
        Reporting.fromReportBase(
          spark.read.parquet(s"$stateDir/report_base/$reportTag")))
        .orderBy("channel_name", "date")
      rep.write.parquet(s"$stateDir/report/$reportTag")
      Reporting.exportCsv(rep, s"$stateDir/channel_reporting_csv/$reportTag")
    }
    stageReport(snap.alloc + 1,
      readDirsOrEmpty(spark, dirsOf(snap.live, stateDir, "report_base"), ReportBaseDdl))
    failpoint("before_publish")
    beforePublish()

    // ---- publish: one atomic manifest CAS makes all five dirs live ----
    // (attribution/processed accumulate; report_base/report/csv replace).
    // Racing runs SERIALIZE: the loser re-reads the winner's snapshot,
    // drops any conversions the winner already attributed from its staged
    // delta, re-merges the report on the winner's base, and retries — so
    // both commits land and no conversion is attributed twice, matching
    // SQLite's serialized-writers contract in the reference.
    var snapNow = snap
    var attempts = 0
    var committedTotal = -1L
    while (committedTotal < 0) {
      val total = snapNow.meta.get(RowsKey).map(_.toLong).getOrElse(0L) + newRows
      val accumulated = snapNow.live.filter(e =>
        e.startsWith("attribution/") || e.startsWith("processed_conversions/"))
      Manifest.tryPublish(spark, stateDir, snapNow,
        accumulated ++ Seq(
          s"attribution/$tag", s"processed_conversions/$tag",
          s"report_base/$reportTag", s"report/$reportTag",
          s"channel_reporting_csv/$reportTag"),
        snapNow.meta + (RowsKey -> total.toString)) match {
        case Some(_) => committedTotal = total
        case None =>
          attempts += 1
          if (attempts >= 8)
            throw new java.io.IOException(
              s"pipeline run lost $attempts consecutive publish races at $stateDir")
          val next = Manifest.snapshot(spark, stateDir)
          val winnersProcessed = dirsOf(next.live, stateDir, "processed_conversions")
            .diff(dirsOf(snapNow.live, stateDir, "processed_conversions"))
          if (winnersProcessed.nonEmpty) {
            val winners = spark.read.parquet(winnersProcessed: _*)
            val still = stagedMissing
              .join(winners, Seq("conv_id"), "left_anti").localCheckpoint()
            val stillN = still.count()
            if (stillN == 0L)
              // the winner attributed our whole delta: this run is a no-op
              return RunSummary(candidateConversions, 0L, 0L,
                next.meta.get(RowsKey).map(_.toLong).getOrElse(0L))
            if (stillN != attributedConvs) {
              // drop the overlap; the remaining rows are exact (assignment
              // was computed per-user over the full conversion set)
              tag = freshTag(next.alloc + 1)
              stagedDelta.join(still, Seq("conv_id"), "left_semi")
                .write.parquet(s"$stateDir/attribution/$tag")
              still.write.parquet(s"$stateDir/processed_conversions/$tag")
              stagedDelta = spark.read.parquet(s"$stateDir/attribution/$tag")
              stagedMissing = spark.read.parquet(s"$stateDir/processed_conversions/$tag")
              newRows = stagedDelta.count()
              attributedConvs = stillN
            }
          }
          // the winner replaced report_base: re-merge our delta onto it
          stageReport(next.alloc + 1,
            readDirsOrEmpty(spark, dirsOf(next.live, stateDir, "report_base"), ReportBaseDdl))
          snapNow = next
      }
    }
    // post-publish vacuum: the previous run's report/csv dirs (and any
    // superseded retry staging) just became unreferenced — delete them now
    // rather than leaving garbage for the next run's recovery sweep.
    Manifest.cleanStale(spark, stateDir, StateTables, staleGraceMs)

    // self-compaction: attribution/processed dirs accumulate one per run;
    // past the bound, fold them into one clustered batch each so the read
    // fan-out (and manifest size) stays flat across unlimited daily runs
    if (Manifest.live(spark, stateDir).count(_.startsWith("attribution/")) > MaxLiveRuns)
      compactState(spark, stateDir)

    RunSummary(candidateConversions, attributedConvs, newRows, committedTotal)
  }

  /** Live accumulated-dir bound before [[runImpl]] self-compacts. */
  private val MaxLiveRuns = 16

  /** Compact the accumulated per-run `attribution/` and
    * `processed_conversions/` dirs into ONE clustered batch each —
    * the pipeline twin of [[graft.operators.Corpus.compactCorpus]].
    * Readers only ever see manifest-committed state: the compacted dirs
    * are staged first, then one OCC merge swaps them for the inputs, so
    * a racing run's concurrently published delta survives (the merge
    * keeps any live entry that was not a compaction input). Clustering by
    * conv_id keeps the processed-conversion anti-join and incremental
    * reads key-local after compaction. */
  def compactState(spark: SparkSession, stateDir: String, nFiles: Int = 4): Unit = {
    val snap = Manifest.snapshot(spark, stateDir)
    val attDirs = snap.live.filter(_.startsWith("attribution/"))
    val prcDirs = snap.live.filter(_.startsWith("processed_conversions/"))
    if (attDirs.length <= 1 && prcDirs.length <= 1) return
    val tag = s"c${snap.alloc + 1}_${java.util.UUID.randomUUID().toString.take(8)}"
    if (attDirs.nonEmpty)
      Layout.writeClustered(
        spark.read.parquet(attDirs.map(d => s"$stateDir/$d"): _*),
        s"$stateDir/attribution/$tag", Seq("conv_id"), nFiles)
    if (prcDirs.nonEmpty)
      Layout.writeClustered(
        spark.read.parquet(prcDirs.map(d => s"$stateDir/$d"): _*),
        s"$stateDir/processed_conversions/$tag", Seq("conv_id"), nFiles)
    val inputs = (attDirs ++ prcDirs).toSet
    Manifest.publishMerge(spark, stateDir) { cur =>
      (cur.live.filterNot(inputs) ++
        (if (attDirs.nonEmpty) Seq(s"attribution/$tag") else Nil) ++
        (if (prcDirs.nonEmpty) Seq(s"processed_conversions/$tag") else Nil),
        cur.meta)
    }
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
