package graft.plans

import graft.functions.{DotDecimal, DotFold, LnInt, MinHashSig, ShingleSet, SimHash32, SimHash64, Winnow}
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
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotDecimal].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotDecimal(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_dotf"),
      new ExpressionInfo(classOf[DotFold].getName, "graft_dotf"),
      (exprs: Seq[Expression]) => DotFold(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => ShingleSet(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (exprs: Seq[Expression]) => Winnow(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_lni"),
      new ExpressionInfo(classOf[LnInt].getName, "graft_lni"),
      (exprs: Seq[Expression]) => LnInt(exprs.head)))
    e.injectPlannerStrategy(_ => BucketUnionStrategy)
  }
}
