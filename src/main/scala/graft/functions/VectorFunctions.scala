package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector (Array[Float] embedding) column functions.
  *
  * All reductions over vector elements go through exact DECIMAL(38,12)
  * accumulation (see [[Exact]]): element products are computed in IEEE
  * double (identical trees in the DuckDB oracles), each term is cast to
  * decimal, and decimal addition is exact — so dot products and norms are
  * bit-equal across engines and across any evaluation order.
  *
  * These are higher-order-function expressions (`zip_with`/`aggregate`),
  * fully codegen-friendly, no UDFs, no explode — a 64-dim dot product is
  * one row-local loop inside WholeStageCodegen.
  */
object VectorFunctions {

  // Precision 20, not 38: Spark's decimal Add widens precision by one per
  // step and, once it would exceed 38, REDUCES SCALE (rounding every
  // accumulation at 1e-11 — observed as ~1e-11 cosine drift vs DuckDB).
  // At (20,12) the Add result is (21,12) — still exact, no overflow for
  // |terms| < 1e8, and the final cast back to (20,12) is lossless.
  private val dec = DecimalType(20, 12)

  private def decSum(terms: Column): Column =
    aggregate(terms, lit(0).cast(dec), (acc, v) => (acc + v).cast(dec)).cast("double")

  /** Ordered-double-fold dot product: element products in double, summed
    * left-to-right (Spark `aggregate` ≡ DuckDB `list_reduce` with a
    * prepended 0 accumulator → bit-identical). Unlike [[dotExact]] this
    * never touches the double→decimal cast, whose half-up rounding
    * differs from DuckDB's in a ~0.1%-of-rows ambiguity band when the
    * products carry full-mantissa noise — use it for operators whose
    * pair volume makes hitting that band a statistical certainty (the
    * kNN graph), at the cost of order-DEPENDENT summation (fine here:
    * the element order of a vector is fixed). Dispatches to the native
    * codegen [[DotFold]] expression; [[dotFoldCompositional]] is the
    * spec-pinned semantic reference. */
  def dotFold(a: Column, b: Column): Column = call_function("graft_dotf", a, b)

  private[graft] def dotFoldCompositional(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Exact dot product of two float-array columns — the native
    * codegen'd [[DotDecimal]] expression (resolves via the `graft_dot`
    * registration in [[GraftFunctions]], done by every table loader). */
  def dotExact(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Exact L2 norm of a float-array column (graft_dot(a,a) under sqrt). */
  def normExact(a: Column): Column = sqrt(call_function("graft_dot", a, a))

  /** The higher-order-function formulation [[DotDecimal]] replaces —
    * CodegenFallback (interpreted, a Decimal allocation per element), kept
    * as the spec-tested semantic reference and the oracle's SQL shape. */
  private[graft] def dotExactCompositional(a: Column, b: Column): Column =
    decSum(zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(dec)))

  private[graft] def normExactCompositional(a: Column): Column =
    sqrt(decSum(transform(a, x => (x.cast("double") * x.cast("double")).cast(dec))))

  /** Sign-LSH bucket from the first `nBits` dimensions: bit b set iff
    * element b > 0. Deterministic, portable (plain CASE arithmetic in the
    * oracle), and a genuine LSH for cosine distance on centered data. */
  def signBucket(a: Column, nBits: Int = 16): Column = signBand(a, 0, nBits)

  /** Sign bucket over dimensions [offset·nBits, (offset+1)·nBits) — one
    * band of a banded sign-LSH scheme. Banding trades precision for
    * recall: two vectors are candidates if ANY band matches, so the miss
    * probability multiplies across bands instead of the hit probability
    * across bits. */
  def signBand(a: Column, band: Int, nBits: Int = 8): Column =
    (0 until nBits)
      .map(b => when(a(band * nBits + b) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Cosine via precomputed norms: dot / (na * nb) — caller supplies the
    * same expression shape as the oracle. */
  def cosine(dot: Column, na: Column, nb: Column): Column = dot / (na * nb)
}
