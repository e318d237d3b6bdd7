package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Runtime for [[DotDecimal]] — must stay bit-identical to the
  * compositional decimal formulation (and the DuckDB oracles):
  *
  * {{{
  * CAST(aggregate(
  *   zip_with(a, b, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
  *                                 AS DECIMAL(20,12))),
  *   CAST(0 AS DECIMAL(20,12)),
  *   (acc, v) -> CAST(acc + v AS DECIMAL(20,12))) AS DOUBLE)
  * }}}
  *
  * Semantics replicated exactly:
  *   - element product in IEEE double (float→double is exact, one rounding);
  *   - double→DECIMAL(20,12): Spark routes the double through
  *     `Double.toString` (shortest round-trip decimal), then rounds
  *     HALF_UP to scale 12 — `java.math.BigDecimal.valueOf` is that exact
  *     conversion; NaN/Infinity → null;
  *   - DECIMAL(20,12) overflow (|value| ≥ 1e8) → null — the non-ANSI cast
  *     semantics regardless of `spark.sql.ansi.enabled` (the HOF form
  *     under ANSI throws instead; embeddings at any realistic scale sit
  *     orders of magnitude inside DECIMAL(20,12), so the regimes never
  *     diverge on real data — spec-pinned in DotDecimalSpec);
  *     null is sticky through the fold (null + v = null);
  *   - zip_with length mismatch pads with null → null product → null sum;
  *   - a null element → null product → null sum;
  *   - final decimal→double: the scaled-long sum is exact in double for
  *     |unscaled| < 2^53 and 1e12 is exactly representable, so
  *     `(double) sum / 1e12` is the correctly-rounded value — identical to
  *     `BigDecimal.doubleValue()` (asserted by the slow-path fallback).
  *
  * Fast path: scale-12 unscaled longs accumulated with `Math.addExact`;
  * any overflow falls back to exact `BigDecimal` folding (same per-step
  * cast-and-check), so behavior is identical in every region.
  */
object DotDecimalImpl {
  /** 10^12 as double — exactly representable. */
  private final val Scale = 1e12
  /** DECIMAL(20,12) bound: unscaled |v| < 10^20 (checked in slow path);
    * long fast path overflows (and falls back) before this bound. */
  private final val MaxUnscaled = new java.math.BigInteger("100000000000000000000")
  private final val TwoPow53 = 9007199254740992L // 2^53

  /** Scale-12 HALF_UP rounding of a term magnitude, matching
    * `BigDecimal.valueOf(t).setScale(12, HALF_UP)` bit-for-bit WITHOUT the
    * `Double.toString` walk valueOf performs (~1.5 µs/element — it
    * dominated every ANN query). `y = |t|·1e12` carries ≤ ~1.5·ulp(y)
    * error vs the true scaled shortest-repr value (one multiply rounding +
    * the repr gap), so when the fractional part of y is more than
    * 4·ulp(y) away from exactly 0.5 the integer answer is provably the
    * same as BigDecimal's; only the ambiguous band (≈0.002% of random
    * inputs) pays the exact slow conversion. */
  private def scaledAbs(abs: Double, y: Double): Long = {
    val fl = Math.floor(y)
    val f = y - fl
    val eps = Math.ulp(y) * 4 + java.lang.Double.MIN_VALUE
    if (f > 0.5 + eps) fl.toLong + 1L
    else if (f < 0.5 - eps) fl.toLong
    else JBigDecimal.valueOf(abs).setScale(12, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** Null result is represented by the boxed null. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads → null term → null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val t = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t)) return null
      val abs = Math.abs(t)
      val y = abs * Scale
      // floor/long exactness needs y < 2^53; larger terms (|t| ≳ 9e3) take
      // the exact fold, which also owns the decimal-overflow-→-null rule
      if (y >= 9.0e15) return slow(a, b)
      var scaled = scaledAbs(abs, y)
      if (t < 0) scaled = -scaled
      try sum = Math.addExact(sum, scaled)
      catch { case _: ArithmeticException => return slow(a, b) }
      i += 1
    }
    if (sum > TwoPow53 || sum < -TwoPow53) return slow(a, b)
    java.lang.Double.valueOf(sum.toDouble / Scale)
  }

  /** Exact BigDecimal fold mirroring the per-step DECIMAL(20,12) cast with
    * null-on-overflow; reached only when the long fast path can't prove
    * exactness. */
  private def slow(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = JBigDecimal.ZERO.setScale(12)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val t = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t)) return null
      val term = JBigDecimal.valueOf(t).setScale(12, RoundingMode.HALF_UP)
      if (term.unscaledValue().abs().compareTo(MaxUnscaled) >= 0) return null
      acc = acc.add(term) // same-scale add is exact
      if (acc.unscaledValue().abs().compareTo(MaxUnscaled) >= 0) return null
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }
}

/** Native Catalyst expression: exact decimal-accumulated dot product of two
  * `ARRAY<FLOAT>` columns, returned as `DOUBLE`.
  *
  * Replaces the higher-order `aggregate`/`zip_with` formulation — HOFs are
  * `CodegenFallback`, so the compositional form runs interpreted with a
  * `Decimal` allocation per element per row; this expression is one
  * codegen-resident loop over primitive longs (≈50× faster, measured on
  * the ANN brute-force query). Bit-identical to the compositional form —
  * spec-tested on the real embeddings tables and guarded by the
  * `ann_*`/`dedup_embedding` oracle gates.
  */
case class DotDecimal(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotDecimalImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]) match {
      case null => null
      case d => d.doubleValue()
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = graft.functions.DotDecimalImpl.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDecimal =
    copy(left = newLeft, right = newRight)
}
