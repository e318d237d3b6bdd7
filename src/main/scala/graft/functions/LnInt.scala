package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Runtime for [[LnInt]] — the DETERMINISTIC cross-engine natural log of a
  * positive integer.
  *
  * No platform ln is engine-stable: Spark's `log()` is `StrictMath.log`
  * (fdlibm), `Math.log` is the HotSpot intrinsic, DuckDB's `ln` is glibc
  * libm — and all three disagree pairwise in the last ulp on real inputs
  * (measured here: Math.log vs libm diverges on 54 of the first 2M
  * integers, e.g. ln(9170); StrictMath vs libm on ln(3)). Any distributed
  * oracle-gated surface that evaluates a library ln therefore fails
  * hash-compare data-dependently — the reason [[graft.operators.Corpus
  * .tokenZipf]] folds on the driver and dsir/lm scores are rational.
  *
  * This expression instead computes ln from a FIXED IEEE expression tree
  * that the DuckDB oracles replicate operation-for-operation
  * ([[graft.Oracles.lniSql]]), so both engines produce the identical
  * double on every input, always:
  *
  *   e  = floor(log2 k)            (exact: bit length − 1)
  *   m  = k / 2^e ∈ [1, 2)         (exact: power-of-two division)
  *   if m > √2 then m /= 2, e += 1 (range-reduce to (√2/2, √2])
  *   t  = (m−1)/(m+1), |t| ≤ 0.1716
  *   ln k = e·LN2 + 2t·(1 + t²·(1/3 + t²·(1/5 + … + t²·(1/17))))
  *
  * Every step is one correctly-rounded IEEE double op, so determinism is
  * by construction, not by libm coincidence. Truncating the atanh series
  * at t¹⁷ leaves < 3·10⁻¹⁶ absolute error — measured max 2.3·10⁻¹⁶
  * relative vs true ln over the first 2M integers (faithfully rounded;
  * within 1 ulp of libm everywhere). Domain: 1 ≤ k ≤ 2^53 (counts —
  * (double) k must be exact); k ≤ 0 or null → null.
  */
object LnIntImpl {
  final val Ln2 = 0.6931471805599453
  private final val Sqrt2 = 1.4142135623730951

  def ln(k: Long): Double = {
    var e = 63 - java.lang.Long.numberOfLeadingZeros(k)
    var m = k.toDouble / (1L << e).toDouble
    if (m > Sqrt2) { m = m / 2.0; e += 1 }
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    val h = 0.3333333333333333 + t2 * (0.2 + t2 * (0.14285714285714285 +
      t2 * (0.1111111111111111 + t2 * (0.09090909090909091 +
      t2 * (0.07692307692307693 + t2 * (0.06666666666666667 +
      t2 * 0.058823529411764705))))))
    e.toDouble * Ln2 + 2.0 * (t * (1.0 + t2 * h))
  }
}

/** Native Catalyst expression: deterministic `ln(BIGINT) → DOUBLE` — see
  * [[LnIntImpl]]. Registered as SQL function `graft_lni`. */
case class LnInt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lni requires a BIGINT input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(x: Any): Any = {
    val k = x.asInstanceOf[Long]
    if (k <= 0L) null else LnIntImpl.ln(k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |if ($x <= 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.LnIntImpl.ln($x); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LnInt =
    copy(child = newChild)
}
