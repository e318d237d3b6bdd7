package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Bucket-aligned union — a custom operator for the one case the built-in
  * `UNION` throws away at scale.
  *
  * `UnionExec` concatenates its children's partitions and reports
  * `UnknownPartitioning`, so a window/aggregate over the union must
  * re-shuffle even when BOTH children are bucketed identically on the
  * partition key. The as-of journey join (SURVEY §5) is exactly that
  * shape: sessions ∪ conversions, windowed per user. This operator zips
  * the children partition-by-partition (bucket i with bucket i) and
  * reports the LEFT child's partitioning, so the downstream window needs
  * only a per-partition sort — zero exchanges end-to-end over bucketed
  * tables (asserted in BucketingSpec).
  *
  * Correctness contract (checked at runtime where Spark can't): children
  * have union-compatible schemas and identical bucketing — same key
  * values, same bucket count — so bucket i of each side holds the same
  * key space. Row order within the merged partition is unspecified, as
  * with any union; downstream sorts own ordering.
  */
final case class BucketUnion(
    keys: Seq[String], left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output
  // the union consumes every column of BOTH children positionally — declare
  // so, or ColumnPruning removes the right side's (apparently unused) columns
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BucketUnion =
    copy(left = newLeft, right = newRight)
}

final case class BucketUnionExec(
    keys: Seq[String], left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output

  private def keyAttrs(p: SparkPlan): Seq[Attribute] =
    keys.map(n => p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"BucketUnion key '$n' missing from ${p.output}")))

  // demand key-clustering from BOTH children: identically-bucketed scans
  // satisfy it as-is (and the requirement stops DisableUnnecessaryBucketedScan
  // from dropping the bucketed read); unbucketed children get co-partitioned
  // by EnsureRequirements — the operator degrades to a co-partitioned union
  override def requiredChildDistribution: Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    Seq(
      org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(keyAttrs(left)),
      org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(keyAttrs(right)))

  // the whole point: expose the left side's (bucketed) distribution so
  // EnsureRequirements plans no exchange for a downstream clustered
  // requirement on these attributes
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val l = left.execute()
    val r = right.execute()
    require(l.getNumPartitions == r.getNumPartitions,
      s"BucketUnion requires aligned bucketing: left has ${l.getNumPartitions} " +
        s"partitions, right has ${r.getNumPartitions}")
    l.zipPartitions(r, preservesPartitioning = true)((a, b) => a ++ b)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BucketUnionExec =
    copy(left = newLeft, right = newRight)
}

object BucketUnionStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BucketUnion(k, l, r) => BucketUnionExec(k, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object BucketUnionApi {
  /** Ensure the planner strategy is installed (idempotent, public
    * `experimental` hook — no extensions config needed). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.exists(_ eq BucketUnionStrategy))
      exp.extraStrategies = exp.extraStrategies :+ BucketUnionStrategy
  }

  /** Bucket-aligned union of two union-compatible DataFrames. Schemas
    * must match positionally (as with `UNION ALL`); both sides must scan
    * tables bucketed identically on the downstream partition key. */
  def union(a: DataFrame, b: DataFrame, keys: Seq[String] = Seq("user_id")): DataFrame = {
    val spark = a.sparkSession
    install(spark)
    require(a.schema.map(f => (f.name, f.dataType)) == b.schema.map(f => (f.name, f.dataType)),
      "BucketUnion requires positionally identical schemas " +
        s"(${a.schema.simpleString} vs ${b.schema.simpleString})")
    org.apache.spark.sql.graft.Bridge.ofRows(
      spark, BucketUnion(keys, a.queryExecution.analyzed, b.queryExecution.analyzed))
  }
}
