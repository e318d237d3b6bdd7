package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[ShingleSet]] / [[MinHashSig]] — must stay bit-identical
  * to the compositional Column formulation (and the DuckDB oracles):
  *
  *   - tokens: split on every single space, KEEPING empties (Spark
  *     `split(text, ' ')` ≡ `String.split(" ", -1)`);
  *   - shingle i (0 ≤ i ≤ n−3): `tok(i) ⧺ ' ' ⧺ tok(i+1) ⧺ ' ' ⧺ tok(i+2)`;
  *   - distinct per document (the exploded form's `(doc_id, shingle)`
  *     DISTINCT), first-occurrence order (`array_distinct`);
  *   - minhash lane j: `min((a_j·w + b_j) mod p)` over the document's
  *     distinct shingles, `w = conv(substring(md5(shingle),1,15),16,10)
  *     mod p`, `p = 2^31−1` — the 60-bit md5 prefix, exactly
  *     [[graft.operators.Dedup]]'s hash family.
  */
object ShingleImpl {
  final val P = 2147483647L // 2^31 − 1
  final val K = 16
  def seedA(j: Int): Long = 1299721L + 104729L * j
  def seedB(j: Int): Long = 15485863L * j + 32452843L

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Positioned (non-distinct) 3-gram shingles, document order. */
  private def rawShingles(text: UTF8String): Array[String] = {
    val toks = text.toString.split(" ", -1)
    val n = math.max(0, toks.length - 2)
    val out = new Array[String](n)
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      out(i) = sb.toString
      i += 1
    }
    out
  }

  private def distinctShingles(text: UTF8String): java.util.LinkedHashSet[String] = {
    val out = new java.util.LinkedHashSet[String]()
    val raw = rawShingles(text)
    var i = 0
    while (i < raw.length) { out.add(raw(i)); i += 1 }
    out
  }

  /** Distinct 3-gram shingles, first-occurrence order. */
  def shingles(text: UTF8String): ArrayData = {
    val set = distinctShingles(text)
    val arr = new Array[AnyRef](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  /** `w = (60-bit md5 prefix) mod p` — the first 15 hex digits of the
    * digest are bytes 0..6 plus the high nibble of byte 7. */
  private def hashW(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val h = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var w = 0L
    var i = 0
    while (i < 7) { w = (w << 8) | (h(i) & 0xffL); i += 1 }
    w = (w << 4) | ((h(7) >> 4) & 0xfL)
    w % P
  }

  /** 16-lane minhash signature; null (empty) signal via zero-length array
    * is NOT used — documents with no shingle return null, mirroring the
    * exploded form where they contribute no rows. */
  def minhashSig(text: UTF8String): ArrayData = {
    val set = distinctShingles(text)
    if (set.isEmpty) return null
    val md = digest.get()
    val mins = Array.fill(K)(Long.MaxValue)
    val it = set.iterator()
    while (it.hasNext) {
      val w = hashW(md, it.next())
      var j = 0
      while (j < K) {
        val v = (seedA(j) * w + seedB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Distinct-shingle 60-bit md5-prefix ids, first-occurrence order —
    * one id per DISTINCT shingle STRING (a 2^-60 prefix collision
    * between two distinct shingles yields a duplicate id, exactly as
    * the compositional `shingles → conv(substring(md5(shingle),1,15))`
    * chain emits one row per distinct string). NO `mod p` — this is the
    * raw 60-bit prefix the sid-keyed dedup operators group and join on,
    * not the minhash lane input. */
  def shingleSids(text: UTF8String): ArrayData = {
    val set = distinctShingles(text)
    val md = digest.get()
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) {
      val h = md.digest(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      var w = 0L
      var j = 0
      while (j < 7) { w = (w << 8) | (h(j) & 0xffL); j += 1 }
      out(i) = (w << 4) | ((h(7) >> 4) & 0xfL)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing (MOSS-style) fingerprint set: positioned 3-gram shingle
    * hashes `w = (60-bit md5 prefix) mod p`, sliding windows of
    * `WinnowW` consecutive positions, fingerprint = min hash per window,
    * result = the DISTINCT mins, ascending. Documents with fewer shingles
    * than one window contribute their global min; documents with no
    * shingle return null. Window-position ties collapse in the set, so the
    * rightmost-tie refinement of the original scheme is irrelevant here. */
  final val WinnowW = 4
  def winnow(text: UTF8String): ArrayData = {
    val raw = rawShingles(text)
    val n = raw.length
    if (n == 0) return null
    val md = digest.get()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hashW(md, raw(i)); i += 1 }
    val set = new java.util.TreeSet[java.lang.Long]()
    if (n <= WinnowW) {
      var m = Long.MaxValue
      i = 0
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      set.add(m)
    } else {
      var p = 0
      while (p <= n - WinnowW) {
        var m = Long.MaxValue
        var j = p
        while (j < p + WinnowW) { if (hs(j) < m) m = hs(j); j += 1 }
        set.add(m)
        p += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native one-pass distinct-3-gram-shingle expression (→ `ARRAY<STRING>`).
  *
  * Replaces both earlier formulations — posexplode + lead()-window +
  * DISTINCT (a full sort plus a shuffle of the token set) and
  * `array_distinct(transform(sequence(...)))` (interpreted CodegenFallback
  * HOFs, measured ~7× slower than this on sf0.1 documents). Pure map
  * stage, codegen-resident. */
case class ShingleSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleImpl.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Native distinct-3-gram-shingle 60-bit md5-prefix ids
  * (→ `ARRAY<BIGINT>`, first-occurrence order) — the id projection the
  * sid-keyed dedup operators shuffle on, computed without materializing
  * shingle strings into rows or running the interpreted
  * conv(substring(md5(...))) chain per row. See [[ShingleImpl.shingleSids]]
  * for the exact multiset contract. */
case class ShingleSids(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_sids requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.shingleSids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleImpl.shingleSids($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSids =
    copy(child = newChild)
}

/** Native whole-document 16-lane MinHash signature (→ `ARRAY<BIGINT>`,
  * null when the document has no 3-gram shingle).
  *
  * One md5 per distinct shingle + 16 affine reseedings, running minima in
  * registers — the signature never materializes shingle rows, hash rows,
  * or intermediate arrays. At 100 TB this turns MinHash+LSH candidate
  * generation into scan → (this map) → band explode → bucket join. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.minhashSig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.ShingleImpl.minhashSig($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native whole-document winnowing fingerprints (→ `ARRAY<BIGINT>`
  * ascending-distinct, null when the document has no 3-gram shingle).
  *
  * The SQL equivalent needs positioned shingle rows, a per-document
  * window sort, a frame min, and a DISTINCT — four shuffled stages; this
  * is one codegen-resident map over each document. See
  * [[ShingleImpl.winnow]] for the exact hash/window spec (the DuckDB
  * oracle implements the same spec relationally). */
case class Winnow(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("fps")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.ShingleImpl.winnow($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
