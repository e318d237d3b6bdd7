package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-journey construction.
  *
  * Re-expresses the reference's driver-side greedy loop
  * (`journey_builder.py:26-115`: conversions processed chronologically,
  * each claiming the user's still-unassigned earlier sessions) as a
  * declarative equivalent: a session belongs to the EARLIEST conversion of
  * the same user that happens strictly after it. That is a join plus a
  * min-per-session window — no mutable `assigned_session_ids` set, no
  * iteration, fully distributed.
  *
  * Scale: the join shuffles both sides on `user_id` (sort-merge); at
  * warehouse scale both tables would be bucketed by user_id making this
  * shuffle-free. Fan-out is bounded per user, and AQE skew-join splits
  * heavy users. The window partitions by `session_id` — Spark reuses the
  * sort within the merge-join partitioning where possible.
  */
object Journeys {

  /** Assign each session to its journey.
    *
    * @param sessions    [[graft.sources.Tables.sessions]] shape
    * @param conversions [[graft.sources.Tables.conversions]] shape
    * @return sessions columns + (conv_id, conv_ts_us, revenue)
    */
  def assign(sessions: DataFrame, conversions: DataFrame): DataFrame = {
    val conv = conversions.select(
      col("conv_id"),
      col("user_id").as("conv_user_id"),
      col("conv_ts_us"),
      col("revenue"))
    val perSession =
      Window.partitionBy("session_id").orderBy(col("conv_ts_us"), col("conv_id"))
    sessions
      .join(conv,
        sessions("user_id") === conv("conv_user_id") &&
          sessions("ts_us") < conv("conv_ts_us"))
      .drop("conv_user_id")
      .withColumn("rn", row_number().over(perSession))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Mark the conversion session: the journey's latest session (it is
    * already strictly before the conversion), ties broken by smallest
    * session_id — reference `journey_builder.py:139-156`. */
  def flagConversion(assigned: DataFrame): DataFrame = {
    val latest =
      Window.partitionBy("conv_id").orderBy(col("ts_us").desc, col("session_id").asc)
    assigned.withColumn(
      "conversion",
      when(row_number().over(latest) === 1, 1).otherwise(0))
  }

  /** Journey statistics — reference `journey_builder.py:298-337`. */
  def statistics(assigned: DataFrame): DataFrame = {
    val per = assigned.groupBy("conv_id").agg(count(lit(1)).as("n"))
    per.agg(
      count(lit(1)).as("total_journeys"),
      sum("n").as("total_sessions"),
      (sum("n").cast("double") / count(lit(1)).cast("double"))
        .as("avg_sessions_per_journey"),
      min("n").as("min_sessions"),
      max("n").as("max_sessions"))
  }

  /** Journey shape validation — reference `journey_builder.py:241-296`:
    * every journey must contain exactly one conversion-flagged session and
    * only 0/1 engagement flags. */
  def validate(flagged: DataFrame): DataFrame = {
    val flagOk =
      col("holder_engagement").isin(0, 1) &&
        col("closer_engagement").isin(0, 1) &&
        col("impression_interaction").isin(0, 1) &&
        col("conversion").isin(0, 1)
    flagged
      .groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        (sum("conversion") === 1).as("has_one_conversion"),
        (min(when(flagOk, 1).otherwise(0)) === 1).as("flags_valid"))
  }
}
