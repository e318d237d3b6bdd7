package graft.operators

import graft.functions.Exact.dsum9
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native IHC (Initializer / Holder / Closer) attribution.
  *
  * The reference outsources this to a remote API (`api_utils.py:68-167`);
  * this is a deterministic, window-function re-implementation preserving
  * the API's contract (`api_utils.py:246-280`): `ihc ∈ [0,1]` per
  * (conversion, session) and Σ ihc = 1 per conversion. Spec in SURVEY.md §4:
  *
  *  - I: 1.0 on the journey's first session (by ts, tie → session_id)
  *  - H: holder_engagement share; uniform 1/n if the journey has none
  *  - C: closer_engagement share; conversion-flagged session if none
  *  - ihc = (I + H + C) / 3
  *
  * Pure window computation over `conv_id` partitions — linear in sessions,
  * no state, no iteration; scales with the number of journeys.
  */
object IhcAttribution {

  /** @param flagged output of [[Journeys.flagConversion]]
    * @return input columns + `ihc`
    */
  def attribute(flagged: DataFrame): DataFrame = {
    val byConv  = Window.partitionBy("conv_id")
    val ordered = Window.partitionBy("conv_id").orderBy(col("ts_us").asc, col("session_id").asc)

    val initializer: Column =
      when(row_number().over(ordered) === 1, 1.0).otherwise(0.0)

    val holderSum = sum("holder_engagement").over(byConv)
    val holder: Column =
      when(holderSum > 0,
        col("holder_engagement").cast("double") / holderSum.cast("double"))
        .otherwise(lit(1.0) / count(lit(1)).over(byConv).cast("double"))

    val closerSum = sum("closer_engagement").over(byConv)
    val closer: Column =
      when(closerSum > 0,
        col("closer_engagement").cast("double") / closerSum.cast("double"))
        .otherwise(col("conversion").cast("double"))

    flagged.withColumn("ihc", (initializer + holder + closer) / 3.0)
  }

  /** Σ ihc = 1 validation — reference `db_utils.py:227-258` (0.001
    * tolerance). Exact decimal summation makes the check independent of
    * partitioning/order. */
  def sumCheck(attributed: DataFrame): DataFrame =
    attributed
      .groupBy("conv_id")
      .agg(dsum9(col("ihc")).as("total_ihc"))
      .withColumn("within_tolerance", abs(col("total_ihc") - 1.0) <= 0.001)
}
