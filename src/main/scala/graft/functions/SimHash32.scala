package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[SimHash32]] — must stay bit-identical to the SQL/oracle
  * formulation in [[graft.Oracles.dedupSimhash]]:
  * tokens = split on every single space (keeping empties, like Spark
  * `split(text, ' ')` / DuckDB `string_split`), per-token md5, bit b of a
  * token's vote = parity of hex digit b (low bit of nibble b), simhash
  * bit b = [vote sum >= 0].
  */
object SimHashImpl {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def simhash32(text: UTF8String): Long = {
    val votes = new Array[Int](32)
    val md = digest.get()
    val bytes = text.getBytes
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val h = md.digest() // 16 bytes = 32 hex digits
        var b = 0
        while (b < 32) {
          // nibble b: high nibble of byte b/2 for even b, low for odd
          val nib = if ((b & 1) == 0) (h(b >> 1) >> 4) & 0xf else h(b >> 1) & 0xf
          votes(b) += (if ((nib & 1) == 1) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** 64-bit variant for the banded near-dup join: bit b of a token's vote
    * is bit (b & 1) of hex NIBBLE (b >> 1) of md5(token) — two vote bits
    * per hex digit, so 32 digits yield 64 independent hash bits. Sign bit
    * 63 is set like any other bit (the value is read as an opaque 64-bit
    * pattern; Spark BIGINT carries it as a negative long). Oracle twin:
    * [[graft.Oracles.dedupSimhashNear]]'s even/odd digit-set CASEs. */
  def simhash64(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val md = digest.get()
    val bytes = text.getBytes
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val h = md.digest()
        var b = 0
        while (b < 64) {
          val nibIdx = b >> 1
          val nib = if ((nibIdx & 1) == 0) (h(nibIdx >> 1) >> 4) & 0xf else h(nibIdx >> 1) & 0xf
          votes(b) += (if (((nib >> (b & 1)) & 1) == 1) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Native Catalyst expression: whole-document 32-bit SimHash in ONE pass.
  *
  * Replaces the compositional plan (posexplode tokens → ×32 bit explode →
  * two aggregations: ~10M shuffled rows at sf0.1) with a pure,
  * WholeStageCodegen-resident map — no shuffle at all. Semantics are
  * bit-identical to the compositional/oracle form (verified by the
  * `dedup_simhash` oracle gate).
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  // reject non-string inputs at analysis time, not with an executor-side
  // ClassCastException from inside codegen
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** 64-bit SimHash sibling of [[SimHash32]] — the hash width the banded
  * near-dup join needs: 4 bands × 16 bits = 65,536 buckets PER BAND, so
  * candidate volume stays near-linear where 4 byte-bands (1,024 buckets
  * total) would go quadratic (the r9 verdict's C64 finding). Same one-pass
  * codegen-resident shape as the 32-bit form. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash64 requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
