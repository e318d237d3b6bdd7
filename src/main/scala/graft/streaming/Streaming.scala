package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row for the streaming surface (matches the events table after
  * [[graft.sources.Tables.events]] derivation). */
final case class Event(
    event_id: Long,
    ts_us: Long,
    user_id: Long,
    event_type: String,
    value: Double)

/** Per-user open-session accumulator carried in GroupState. */
final case class SessionState(
    sessionIdx: Long,
    startUs: Long,
    lastTsUs: Long,
    nEvents: Long)

/** A closed session emitted downstream. */
final case class SessionOut(
    user_id: Long,
    session_idx: Long,
    n_events: Long,
    session_start_us: Long,
    session_end_us: Long)

/** Structured Streaming surface (SURVEY §2.D).
  *
  * The same logical operators as the batch twins (`stream_windowed_counts`,
  * `events_sessionize`) expressed over unbounded input: watermarked window
  * aggregation, and custom session state via `flatMapGroupsWithState`.
  * State is keyed by `user_id` — at cluster scale the state store shards
  * across executors with the shuffle partitioning, and the watermark bounds
  * state size for the window aggregate.
  */
object Streaming {

  /** Watermarked tumbling-window counts — the streaming twin of the D1
    * batch query (same output schema). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "2 hours")
      .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Stateful gap sessionization (2 h default): emits a session when the
    * user's inactivity gap exceeds `gapUs`. The open session stays in
    * state until a later event closes it. */
  def sessionize(events: Dataset[Event], gapUs: Long = 7200000000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // Micro-batch arrival order is not guaranteed — order within the
          // batch explicitly, exactly like the batch twin's window sort.
          val evs = it.toVector.sortBy(e => (e.ts_us, e.event_id))
          val closed = Vector.newBuilder[SessionOut]
          var st = state.getOption
          evs.foreach { e =>
            st match {
              case Some(s) if e.ts_us - s.lastTsUs > gapUs =>
                closed += SessionOut(userId, s.sessionIdx, s.nEvents, s.startUs, s.lastTsUs)
                st = Some(SessionState(s.sessionIdx + 1, e.ts_us, e.ts_us, 1))
              case Some(s) =>
                st = Some(s.copy(lastTsUs = e.ts_us, nEvents = s.nEvents + 1))
              case None =>
                st = Some(SessionState(0, e.ts_us, e.ts_us, 1))
            }
          }
          st.foreach(state.update)
          closed.result().iterator
      }
  }
}
