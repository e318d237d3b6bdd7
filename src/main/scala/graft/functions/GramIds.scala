package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[GramIdPairs]] — the ExactSubstr family's 120-bit k-gram
  * ids ([[graft.operators.Dedup.gramIds]]) computed in ONE codegen-resident
  * pass per document, bit-identical to the compositional SQL form:
  *
  * {{{
  * transform(sequence(1, size(ts) - k + 1),
  *           i -> array_join(slice(ts, i, k), ' '))
  * // per gram: (conv(substring(md5(g), 1, 15), 16, 10),
  * //            conv(substring(md5(g), 16, 15), 16, 10))
  * }}}
  *
  * Key observations making the native pass cheap:
  *   - `split(text, ' ')` tokens re-joined with ' ' reproduce the EXACT
  *     byte range of the original text between the two token boundaries
  *     (single-space split, single-space join — nothing is ever inserted
  *     or dropped), so each gram's md5 runs over a slice of the original
  *     UTF-8 buffer: no per-gram string materialization at all. The
  *     compositional form allocated a ~k·token_len string, a 32-char hex
  *     string, and two substring/conv parses per position — that chain
  *     dominated every ExactSubstr query (measured; see
  *     OPTIMIZATION_r16.md).
  *   - 0x20 never occurs inside a multi-byte UTF-8 sequence, so token
  *     boundaries are byte positions of the space byte — the same token
  *     set `split(text, ' ')` (Java `String.split(" ", -1)`, trailing
  *     empties kept) produces, empties included.
  *   - the two 60-bit segments are hex chars [1,15] / [16,30] of the md5
  *     digest: bytes 0..6 plus the HIGH nibble of byte 7, and the LOW
  *     nibble of byte 7 plus bytes 8..14 — packed straight from the
  *     digest bytes (the [[ShingleImpl.hashW]] layout, without the mod).
  */
object GramIdsImpl {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val StructFields: Array[StructField] =
    Array(StructField("gid_hi", LongType, nullable = false),
      StructField("gid_lo", LongType, nullable = false))
  val ElementType: StructType = StructType(StructFields)

  def gramIdPairs(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    // token start offsets: position 0 plus every byte after a 0x20
    var nToks = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nToks += 1; i += 1 }
    val starts = new Array[Int](nToks)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    // the degenerate "" text still splits to one empty token (like split)
    val n = nToks - k + 1
    if (n <= 0) return new GenericArrayData(new Array[Any](0))
    def tokEnd(j: Int): Int = if (j + 1 < nToks) starts(j + 1) - 1 else bytes.length
    val md = digest.get()
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val from = starts(i)
      val until = tokEnd(i + k - 1)
      md.reset()
      md.update(bytes, from, until - from)
      val h = md.digest()
      var hi = 0L
      var j = 0
      while (j < 7) { hi = (hi << 8) | (h(j) & 0xffL); j += 1 }
      hi = (hi << 4) | ((h(7) >> 4) & 0xfL)
      var lo = (h(7) & 0xfL)
      j = 8
      while (j < 15) { lo = (lo << 8) | (h(j) & 0xffL); j += 1 }
      out(i) = InternalRow(hi, lo)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native positioned dual-60-bit k-gram ids
  * (→ `ARRAY<STRUCT<gid_hi: BIGINT, gid_lo: BIGINT>>`, one element per
  * token position 1..n_tokens−k+1, empty array when the document has
  * fewer than k tokens). `k` must be a foldable INT. See
  * [[GramIdsImpl]] for the exact layout contract. */
case class GramIdPairs(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(GramIdsImpl.ElementType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram_ids requires (STRING, foldable INT), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(text: Any, k: Any): Any =
    GramIdsImpl.gramIdPairs(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.GramIdsImpl.gramIdPairs($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramIdPairs =
    copy(left = newLeft, right = newRight)
}
