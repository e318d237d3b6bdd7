package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §5).
  *
  * AQE's skew-join split handles most hot keys at runtime; explicit
  * salting remains the tool when one join key dwarfs everything else
  * (a single user with millions of sessions). `saltedJoin` splits each
  * left key's rows across `nSalts` sub-partitions (deterministic salt from
  * a tiebreaker column) and replicates the matching right rows per salt —
  * semantically identical to the plain equi-join, but the hot key's work
  * spreads over `nSalts` tasks. */
object Skew {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tiebreak: String,
      nSalts: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(col(tiebreak)), lit(nSalts)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
