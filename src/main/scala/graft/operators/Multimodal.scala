package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.C12-C13).
  *
  * Media payloads are opaque `binary` columns with typed metadata. This
  * container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub — but the Spark-side plumbing
  * (binary schema, per-partition batch shape, typed output schema,
  * partition-preserving execution) is real and is what matters at 100 TB:
  * decode happens inside `mapPartitions` so a 1000-executor cluster
  * decodes 1000 partitions concurrently with zero shuffles.
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
      width: Int,
      height: Int,
      features: Array[Float])

  /** STUB DECODER — stands in for an image/audio codec (none available in
    * this container). Deterministic: byte-value histogram over 16 bins,
    * L1-normalized, plus fake width/height from the payload length. The
    * real thing would swap `decodeStub` for an actual codec call; the
    * distributed shape (mapPartitions over binary batches) is unchanged. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaFeature = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % 16) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var b = 0
    while (b < 16) { hist(b) /= n; b += 1 }
    MediaFeature(docId, payload.length, payload.length % 640, payload.length % 480, hist)
  }

  /** Per-partition feature extraction over the payload column. */
  def features(spark: SparkSession, documents: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
  }
}
