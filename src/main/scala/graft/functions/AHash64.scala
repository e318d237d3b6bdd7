package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Runtime for [[AHash64]] — the 64-bit AVERAGE perceptual hash (aHash)
  * over a media payload's BODY bytes. Must stay bit-identical to the SQL
  * oracle formulation in [[graft.Oracles.multimodalAhash]].
  *
  * Definition (all-integer, no float anywhere, so there is no rounding
  * bridge between engines):
  *  - body = payload from a format-specific data offset (see
  *    [[bodyOffset]]); payloads with fewer than 64 body bytes are not
  *    images in any meaningful sense and hash to NULL.
  *  - body byte i falls in cell `i*64/n` (integer division) — 64
  *    contiguous equal-share cells, the 1-D analogue of the classic 8×8
  *    aHash grid (the payloads here are opaque byte streams; a real
  *    decoder would feed row-major pixels through the same cells).
  *  - bit c = [mean(cell c) >= mean(body)], evaluated as the integer
  *    cross-multiplication `sum_c * n >= total * cnt_c` — exact, and
  *    INVARIANT under a uniform brightness shift (adding d to every
  *    byte adds d*cnt_c*n to both sides), which is precisely the
  *    perceptual property that makes aHash a near-dup signal.
  *
  * Overflow bound: `total * cnt_c` <= 255n · n/32 — safe in a signed
  * long for payloads up to ~34 MB, far above any document-table payload;
  * a real video pipeline hashes per FRAME (bounded) not per file.
  */
object AHashImpl {
  /** PPM (P6) header — keep in lockstep with
    * [[graft.operators.Multimodal]]'s decode and the oracle regex. */
  private val PpmHeader =
    """^P6[ \t-\r]+[0-9]{1,9}[ \t-\r]+[0-9]{1,9}[ \t-\r]""".r

  /** Byte offset where the hashable body starts: WAV (canonical PCM
    * layout) → 44; BMP → the pixel-array offset field (le32 at 10,
    * clamped into the payload); PPM → end of the matched header; raw →
    * 0. Mirrors [[graft.operators.Multimodal.decode]]'s format tests. */
  private[graft] def bodyOffset(p: Array[Byte]): Int = {
    def tag(off: Int, s: String): Boolean =
      s.indices.forall(k => p(off + k) == s.charAt(k).toByte)
    def le32(off: Int): Int =
      (p(off) & 0xff) | (p(off + 1) & 0xff) << 8 |
        (p(off + 2) & 0xff) << 16 | (p(off + 3) & 0xff) << 24
    if (p.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && tag(36, "data")) 44
    else if (p.length >= 26 && p(0) == 'B'.toByte && p(1) == 'M'.toByte)
      math.max(0, math.min(p.length, le32(10)))
    else {
      // header region is ASCII, so char offsets == byte offsets there
      val s = new String(p, java.nio.charset.StandardCharsets.UTF_8)
      PpmHeader.findFirstMatchIn(s).map(_.end).getOrElse(0)
    }
  }

  def ahash64(p: Array[Byte]): java.lang.Long = {
    val off = bodyOffset(p)
    val n = p.length - off
    if (n < 64) return null
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val c = ((i.toLong * 64L) / n).toInt
      val v = (p(off + i) & 0xff).toLong
      sums(c) += v
      cnts(c) += 1
      total += v
      i += 1
    }
    var out = 0L
    var c = 0
    while (c < 64) {
      if (sums(c) * n >= total * cnts(c)) out |= (1L << c)
      c += 1
    }
    out
  }
}

/** Native Catalyst expression: one-pass 64-bit perceptual average-hash
  * over a binary payload — a codegen-resident map with zero shuffles,
  * feeding the same Manku banded-Hamming join the text simhash uses
  * ([[graft.operators.Dedup.hammingNearPairs]]). NULL (not a sentinel
  * hash) for payloads whose body is under 64 bytes. */
case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ahash64 requires BINARY input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    AHashImpl.ahash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.AHashImpl.ahash64($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

/** Runtime for [[DHash64]] — the 64-bit DIFFERENCE (gradient) perceptual
  * hash over the same decoded body bytes as [[AHashImpl.ahash64]]. Must
  * stay bit-identical to the SQL oracle in
  * [[graft.Oracles.multimodalDhash]].
  *
  * Definition (all-integer — no rounding bridge between engines):
  *  - same format-aware body offset as aHash ([[AHashImpl.bodyOffset]]);
  *    bodies under 65 bytes hash to NULL (65 cells need 65 bytes).
  *  - body byte i falls in cell `i*65/n` — 65 contiguous equal-share
  *    cells, the 1-D analogue of dHash's 9-wide pixel rows.
  *  - bit c (0..63) = [mean(cell c+1) > mean(cell c)], evaluated as the
  *    exact integer cross-multiplication `s(c+1)·cnt(c) > s(c)·cnt(c+1)`.
  *
  * The ADJACENT-cell compare is the point: aHash compares each cell to
  * the GLOBAL mean, so a clamped contrast scale (v' = min(255, a·v + b))
  * moves the global mean relative to mid-tone cells and flips every cell
  * whose mean sits near it, while the LOCAL gradient direction between
  * neighbouring cells survives — the standard aHash/dHash complement.
  * Overflow bound: s·cnt <= 255n·(n/65+1), safe in a signed long for any
  * document-table payload. */
object DHashImpl {
  def dhash64(p: Array[Byte]): java.lang.Long = {
    val off = AHashImpl.bodyOffset(p)
    val n = p.length - off
    if (n < 65) return null
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var i = 0
    while (i < n) {
      val c = ((i.toLong * 65L) / n).toInt
      sums(c) += (p(off + i) & 0xff).toLong
      cnts(c) += 1
      i += 1
    }
    var out = 0L
    var c = 0
    while (c < 64) {
      if (sums(c + 1) * cnts(c) > sums(c) * cnts(c + 1)) out |= (1L << c)
      c += 1
    }
    out
  }
}

/** Native Catalyst expression: one-pass 64-bit perceptual gradient-hash
  * (dHash) over a binary payload — codegen-resident, zero shuffles,
  * feeding the same Manku banded-Hamming join as [[AHash64]]. NULL for
  * payloads whose body is under 65 bytes. */
case class DHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dhash64 requires BINARY input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    DHashImpl.dhash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.DHashImpl.dhash64($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}
