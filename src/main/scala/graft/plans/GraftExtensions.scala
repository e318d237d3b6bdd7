package graft.plans

import graft.functions.SimHash32
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point for the graft library.
  *
  * Deploy with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` to expose the
  * library's native expressions as SQL functions cluster-wide (the
  * DataFrame API paths register them per-session on first use as well).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head)))
  }
}
