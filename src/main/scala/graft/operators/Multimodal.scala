package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.C12-C13).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * decode step parses REAL pure-JVM byte formats — BMP and PPM headers
  * give actual width/height (see [[decode]]) — with a clearly-marked
  * deterministic stub as the fallback for formats this container has no
  * codec for. The Spark-side plumbing (binary schema, per-partition batch
  * shape, typed output schema, partition-preserving execution) is what
  * matters at 100 TB: decode happens inside `mapPartitions` so a
  * 1000-executor cluster decodes 1000 partitions concurrently with zero
  * shuffles.
  */
object Multimodal {

  /** Typed metadata over a binary payload column — pure expressions. */
  def metadata(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("payload_md5"),
        ceil(length(col("payload")) / 256.0).cast("long").as("n_chunks"))
      .orderBy("doc_id")

  /** Strided frame sampling over a media payload — the video analog of
    * "decode every Nth frame": frames of `frameLen` units at `stride`
    * offsets, up to `maxFrames`, each fingerprinted. Pure expressions
    * (sequence + explode + substring + md5), so sampling runs at scan
    * speed and never materializes the unsampled payload regions
    * downstream. Frames index the character stream here (the oracle
    * engine lacks byte substrings); the real codec path would swap in
    * [[features]]' binary `mapPartitions` plumbing. */
  def frameSample(
      documents: DataFrame,
      stride: Int = 128, frameLen: Int = 64, maxFrames: Int = 4): DataFrame =
    documents
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(maxFrames - 1))).as("frame_idx"), col("text"))
      .filter(col("frame_idx") * stride < length(col("text")))
      .select(
        col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(expr(s"substring(text, frame_idx * $stride + 1, $frameLen)")).as("frame_md5"),
        least(length(col("text")) - col("frame_idx") * stride, lit(frameLen))
          .cast("long").as("frame_len"))
      .orderBy("doc_id", "frame_idx")

  final case class MediaFeature(
      doc_id: Long,
      byte_len: Int,
      format: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      n_channels: Int,
      bit_depth: Int,
      pcm_peak: Int,
      features: Array[Float])

  /** PPM (P6) header: magic, whitespace, width, whitespace, height,
    * whitespace. Digit runs capped at 9 so parsed dims always fit an Int;
    * whitespace is the explicit 0x09–0x0D + space class (`[ \t-\r]`) —
    * spelled out because Java's `\s`/`\v` and RE2's differ at the edges,
    * and the DuckDB oracle runs the same pattern through RE2. */
  private val PpmHeader =
    """^P6[ \t-\r]+([0-9]{1,9})[ \t-\r]+([0-9]{1,9})[ \t-\r]""".r

  /** REAL byte-format decode with a stub fallback. Recognized pure-JVM
    * formats (no codec libraries needed — plain header parsing):
    *
    *  - **WAV (canonical PCM)**: `RIFF…WAVE` magic with the `fmt ` chunk
    *    at offset 12 and `data` at 36 (the canonical 44-byte layout —
    *    files with extra chunks fall through to `raw` rather than
    *    mis-parse) → channel count / sample rate / bit depth from the fmt
    *    chunk, plus `pcm_peak`, the peak absolute amplitude of the first
    *    64 16-bit little-endian PCM samples — a real signal-level stat.
    *  - **BMP**: leading `BM`, ≥ 26 bytes → width/height are the
    *    little-endian int32s at offsets 18/22 (BITMAPINFOHEADER), taken
    *    signed exactly as the format stores them (negative height = a
    *    top-down bitmap).
    *  - **PPM (P6)**: ASCII header → width/height from the two decimal
    *    fields.
    *  - anything else → `raw`: the original deterministic stub dims
    *    (length-derived) — the honest fallback for payloads this
    *    container cannot decode.
    *
    * All formats get the 16-bin L1-normalized byte histogram as the
    * feature vector — a real content signal, codec or not. Every branch
    * is deterministic and mirrored byte-for-byte in the DuckDB oracle
    * (hex-slice arithmetic for the BMP and WAV headers, the same regex
    * for PPM), so the operator stays hash-checked end-to-end. */
  private[graft] def decode(docId: Long, payload: Array[Byte]): MediaFeature = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % 16) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var b = 0
    while (b < 16) { hist(b) /= n; b += 1 }

    def le16(off: Int): Int =
      (payload(off) & 0xff) | (payload(off + 1) & 0xff) << 8
    def le32(off: Int): Int =
      (payload(off) & 0xff) | (payload(off + 1) & 0xff) << 8 |
        (payload(off + 2) & 0xff) << 16 | (payload(off + 3) & 0xff) << 24
    def tag(off: Int, s: String): Boolean =
      s.indices.forall(k => payload(off + k) == s.charAt(k).toByte)

    if (payload.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE") &&
        tag(12, "fmt ") && tag(36, "data")) {
      val bits = le16(34)
      var peak = 0
      if (bits == 16) {
        val nSamples = math.min(64, (payload.length - 44) / 2)
        var s = 0
        while (s < nSamples) {
          val u = le16(44 + 2 * s)
          peak = math.max(peak, if (u >= 32768) 65536 - u else u)
          s += 1
        }
      }
      MediaFeature(docId, payload.length, "wav", 0, 0,
        le32(24), le16(22), bits, peak, hist)
    } else if (payload.length >= 26 && payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
      MediaFeature(docId, payload.length, "bmp", le32(18), le32(22), 0, 0, 0, 0, hist)
    else {
      // header region is ASCII; UTF-8 decode is identity there, so the
      // regex sees the same prefix the oracle's text column carries
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      PpmHeader.findFirstMatchIn(s) match {
        case Some(m) =>
          MediaFeature(docId, payload.length, "ppm",
            m.group(1).toInt, m.group(2).toInt, 0, 0, 0, 0, hist)
        case None =>
          MediaFeature(docId, payload.length, "raw",
            payload.length % 640, payload.length % 480, 0, 0, 0, 0, hist)
      }
    }
  }

  /** Per-partition feature extraction over a (doc_id, payload binary)
    * frame — decode runs inside `mapPartitions`, so 1000 executors decode
    * 1000 partitions concurrently with zero shuffles. */
  def featuresBinary(spark: SparkSession, payloads: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decode(id, payload) })
  }

  /** [[featuresBinary]] over the documents table's text payloads. */
  def features(spark: SparkSession, documents: DataFrame): Dataset[MediaFeature] =
    featuresBinary(spark,
      documents.select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** Per-document 64-bit perceptual average-hash over the payload BODY —
    * the [[graft.functions.AHash64]] native expression (format-aware
    * body offset, integer cell-vs-global mean compare, invariant under a
    * uniform brightness shift). One codegen-resident map pass, zero
    * shuffles; payloads whose body is under 64 bytes hash to NULL and
    * are excluded (they are not images). */
  def aHashes(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        expr("graft_ahash64(CAST(text AS BINARY))").as("ahash"))
      .filter(col("ahash").isNotNull)
      .orderBy("doc_id")
  }

  /** Perceptual NEAR-dup image pairs: aHash within Hamming distance
    * `maxHamming`, found via the same Manku C(6,3) banded join the text
    * simhash family uses ([[Dedup.hammingNearPairs]]) — never all-pairs.
    * This is the near-dup the md5 frame fingerprints (C17) cannot see: a
    * brightness-shifted or lightly-requantized copy of an image keeps
    * its aHash (the cell-vs-global mean compare is shift-invariant) but
    * changes every cryptographic hash. */
  def imageNearDup(
      documents: DataFrame, maxHamming: Int = 3, maxBucket: Long = 1000L): DataFrame =
    Dedup.hammingNearPairs(
      aHashes(documents).select(col("doc_id"), col("ahash").as("simhash")),
      maxHamming, maxBucket)

  /** Per-document 64-bit perceptual DIFFERENCE-hash (dHash) over the
    * payload body — [[graft.functions.DHash64]]: 65 equal-share cells,
    * bit c = [mean(cell c+1) > mean(cell c)]. The gradient compare is
    * LOCAL where aHash's is global, so a clamped contrast scale
    * (v' = min(255, a·v + b)) that drags mid-tone cells across the
    * global mean — flipping aHash bits — leaves the neighbouring-cell
    * gradient directions (and so the dHash) intact. Same one-pass
    * codegen shape as [[aHashes]]; bodies under 65 bytes are excluded. */
  def dHashes(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        expr("graft_dhash64(CAST(text AS BINARY))").as("dhash"))
      .filter(col("dhash").isNotNull)
      .orderBy("doc_id")
  }

  /** dHash near-dup pairs via the same Manku banded-Hamming join as
    * [[imageNearDup]] — the contrast-robust complement to the aHash
    * path (run both; union the pair sets). */
  def dHashNearDup(
      documents: DataFrame, maxHamming: Int = 3, maxBucket: Long = 1000L): DataFrame =
    Dedup.hammingNearPairs(
      dHashes(documents).select(col("doc_id"), col("dhash").as("simhash")),
      maxHamming, maxBucket)
}
