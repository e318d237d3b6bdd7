package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway this library needs: constructing a
  * DataFrame from a custom [[LogicalPlan]] ([[graft.plans.BucketUnion]]).
  * Spark exposes extension points for custom plans (strategies via
  * `spark.experimental` / `SparkSessionExtensions`) but no public
  * constructor for wrapping one into a Dataset — the conventional
  * library-side bridge is this package-placed forwarder. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
