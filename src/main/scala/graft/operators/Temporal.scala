package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — as-of join and bounded range join — as
  * first-class library operations (the journey builder in [[Journeys]] is
  * a composed special case of the same machinery).
  *
  * Scale doctrine: an as-of join is NOT a fan-out join. The union +
  * running-`last(ignoreNulls)` window form does one shuffle + one sort per
  * side, O(n log n) per user — never the Σ sessions×conversions
  * intermediate a naive `ON user AND s.ts < c.ts` join materializes. The
  * bounded range join keeps the fan-out explicitly windowed (a 6-hour
  * interval), so its intermediate is linear in events per interval; both
  * become shuffle-free when the tables are bucketed by `user_id`.
  */
object Temporal {

  /** Backward as-of join: for each conversion, the user's most recent
    * session STRICTLY before the conversion timestamp (ties in session
    * timestamp → largest session_id); conversions with no prior session
    * keep null columns (left semantics).
    *
    * Union both sides sorted per user by (ts, kind, session_id) —
    * conversions sort BEFORE equal-timestamp sessions, enforcing the
    * strict `<` — and carry the latest session with a running
    * `last(marker, ignoreNulls)` window. */
  def asofLastSession(sessions: DataFrame, conversions: DataFrame): DataFrame = {
    val smark = struct(col("ts_us"), col("session_id"), col("channel_name"))
    val sessSide = sessions.select(
      col("user_id"), col("ts_us"), lit(1).as("kind"), smark.as("smark"),
      lit(null).cast("long").as("conv_id"),
      lit(null).cast("long").as("conv_ts_us"))
    val convSide = conversions.select(
      col("user_id"), col("conv_ts_us").as("ts_us"), lit(0).as("kind"),
      lit(null).cast(sessSide.schema("smark").dataType).as("smark"),
      col("conv_id"), col("conv_ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("kind").asc,
        coalesce(col("smark.session_id"), lit(-1L)).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessSide.unionByName(convSide)
      .withColumn("m", last(col("smark"), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(
        col("conv_id"), col("user_id"), col("conv_ts_us"),
        col("m.session_id").as("last_session_id"),
        col("m.channel_name").as("last_channel"),
        (col("conv_ts_us") - col("m.ts_us")).as("gap_us"))
      .orderBy("conv_id")
  }

  /** Forward as-of join — the time-mirror of [[asofLastSession]]: for
    * each conversion, the user's EARLIEST session strictly after the
    * conversion timestamp (ties → smallest session_id) — the
    * re-engagement question ("what was the next touch after
    * purchase?"). Same union + running-window machinery, with the frame
    * reversed to `currentRow → unboundedFollowing` and a
    * `first(ignoreNulls)`; sessions sort BEFORE conversions at equal
    * timestamps so the strict `>` holds. One shuffle + one sort,
    * zero fan-out, exactly like the backward form. */
  def asofNextSession(sessions: DataFrame, conversions: DataFrame): DataFrame = {
    val smark = struct(col("ts_us"), col("session_id"), col("channel_name"))
    val sessSide = sessions.select(
      col("user_id"), col("ts_us"), lit(0).as("kind"), smark.as("smark"),
      lit(null).cast("long").as("conv_id"),
      lit(null).cast("long").as("conv_ts_us"))
    val convSide = conversions.select(
      col("user_id"), col("conv_ts_us").as("ts_us"), lit(1).as("kind"),
      lit(null).cast(sessSide.schema("smark").dataType).as("smark"),
      col("conv_id"), col("conv_ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("kind").asc,
        coalesce(col("smark.session_id"), lit(-1L)).asc,
        coalesce(col("conv_id"), lit(-1L)).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    sessSide.unionByName(convSide)
      .withColumn("m", first(col("smark"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(
        col("conv_id"), col("user_id"), col("conv_ts_us"),
        col("m.session_id").as("next_session_id"),
        col("m.channel_name").as("next_channel"),
        (col("m.ts_us") - col("conv_ts_us")).as("gap_us"))
      .orderBy("conv_id")
  }

  /** Bounded range join: per conversion, count (and holder-engagement-sum)
    * of the user's sessions inside `[conv_ts − windowUs, conv_ts)`.
    * Equi-join on user_id (sort-merge) with the range predicate applied in
    * the join condition — the fan-out is bounded by per-user activity
    * inside the window, not total activity. */
  def sessionCountWindow(
      sessions: DataFrame, conversions: DataFrame,
      windowUs: Long = 21600000000L): DataFrame = {
    val s = sessions.select(
      col("user_id").as("s_user_id"), col("ts_us"),
      col("session_id"), col("holder_engagement"))
    conversions
      .join(s,
        col("s_user_id") === col("user_id") &&
          col("ts_us") < col("conv_ts_us") &&
          col("ts_us") >= col("conv_ts_us") - lit(windowUs),
        "left")
      .groupBy("conv_id")
      .agg(
        count(col("session_id")).as("n_recent"),
        coalesce(sum("holder_engagement"), lit(0)).cast("long").as("n_holder"))
      .orderBy("conv_id")
  }

  /** POINT-IN-INTERVAL enrichment against a versioned dimension with
    * NON-OVERLAPPING validity intervals per key (the SCD2 shape): every
    * fact row picks up the dimension payload whose
    * `[fromCol, toCol)` interval contains its timestamp (`toCol` NULL =
    * open interval), or NULLs when no interval covers it — the
    * "state as of the event" join every warehouse enrichment runs.
    *
    * Scale shape: the [[asofLastSession]] union+window discipline — a
    * naive `ts >= from AND ts < to` range join fans every fact out
    * against all of its key's versions before filtering; here dimension
    * starts and facts interleave in ONE per-key window sort, each fact
    * reads the running `last` dimension struct, and validity is a
    * post-filter on the picked interval's end. One shuffle, zero
    * fan-out, per-key cost n·log n.
    *
    * `dimTieBreak` orders dimension rows that share (key, from) —
    * e.g. SCD2 `version` — so a zero-width version (closed at its own
    * start by a same-timestamp state flip) loses to the version that
    * actually covers the instant, exactly like the range-join semantics.
    */
  def intervalJoin(
      facts: DataFrame,
      dims: DataFrame,
      keyCol: String,
      tsCol: String,
      fromCol: String = "valid_from_us",
      toCol: String = "valid_to_us",
      dimTieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = dims.columns.filterNot(_ == keyCol).toSeq
    val dmark = struct(payloadCols.map(col): _*)
    val fmark = struct(facts.columns.map(col).toSeq: _*)
    val dimSide = dims.select(
      col(keyCol), col(fromCol).as("__ts"), lit(0).as("__kind"), dmark.as("__d"))
    val factSide = facts.select(
      col(keyCol), col(tsCol).as("__ts"), lit(1).as("__kind"),
      lit(null).cast(dimSide.schema("__d").dataType).as("__d"),
      fmark.as("__f"))
    val both = dimSide
      .withColumn("__f", lit(null).cast(factSide.schema("__f").dataType))
      .unionByName(factSide)
    val tieCols = dimTieBreak.map(c => coalesce(col(s"__d.$c"), lit(-1L)).asc)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts").asc +: col("__kind").asc +: tieCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val valid = col("__m").isNotNull &&
      (col(s"__m.$toCol").isNull || col("__ts") < col(s"__m.$toCol"))
    val outPayload = payloadCols.filterNot(c => c == fromCol || c == toCol)
    both
      .withColumn("__m", last(col("__d"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(
        facts.columns.toSeq.map(c => col(s"__f.$c").as(c)) ++
          outPayload.map(c => when(valid, col(s"__m.$c")).as(c)): _*)
  }
}
