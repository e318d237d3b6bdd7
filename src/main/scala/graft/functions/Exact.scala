package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent floating-point aggregation.
  *
  * Summing doubles is order-sensitive, and Spark's shuffle/partial-agg
  * order is nondeterministic — so double sums can differ run-to-run and
  * engine-to-engine. Casting each term to a fixed-scale DECIMAL makes the
  * sum exact (decimal addition is associative + commutative), then one
  * final cast back to double. The DuckDB oracles use the identical
  * `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)` shape, so results are
  * bit-equal across engines regardless of parallelism. Per-row arithmetic
  * stays in IEEE double with identical expression trees on both sides.
  */
object Exact {

  /** Exact sum of doubles at 6-decimal term precision (money-ish). */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(27, 6))).cast("double")

  /** Exact sum at 9-decimal term precision (attribution fractions). */
  def dsum9(c: Column): Column =
    sum(c.cast(DecimalType(27, 9))).cast("double")
}
