package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite (SURVEY §2.C1-C5).
  *
  * Scale doctrine: NEVER all-pairs. Every near-dup operator generates
  * candidates through a linear-ish blocking stage (MinHash bands, shared
  * shingles with a support threshold, sign-LSH buckets) and only does
  * pairwise work inside blocks. Hashing is md5 (portable: identical in
  * the DuckDB oracles); all hash comparisons are on hex strings, whose
  * lexicographic order equals numeric order.
  */
object Dedup {

  /** Exact dedup: md5 groupBy, keep the smallest doc_id. One shuffle. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  /** Word tokens with positions (posexplode → (doc_id, pos, w)). */
  def tokens(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "w")

  /** Distinct 3-gram word shingles per document. lead() over the token
    * position window; concat null-propagates at the tail exactly like the
    * oracle's `||`. */
  def shingles(documents: DataFrame): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("pos")
    tokens(documents)
      .withColumn("shingle",
        concat(col("w"), lit(" "), lead("w", 1).over(win), lit(" "), lead("w", 2).over(win)))
      .filter(col("shingle").isNotNull)
      .select("doc_id", "shingle")
      .distinct()
  }

  /** MinHash signatures: K portable hash functions h_j(s) = md5(j||':'||s),
    * MIN per (doc, j). Linear in total shingles. */
  def minhash(shingleDf: DataFrame, k: Int = 16): DataFrame =
    shingleDf
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .groupBy("doc_id", "j")
      .agg(min(md5(concat(col("j").cast("string"), lit(":"), col("shingle")))).as("mh"))

  /** MinHash + LSH banding: docs sharing any band hash become candidate
    * pairs; output pairs with the signature-estimated Jaccard. Bands of 2
    * rows over K=16 hashes → sensitive to ~J≥0.5 near-dups. */
  def minhashLsh(documents: DataFrame): DataFrame = {
    val mh = minhash(shingles(documents)).cache()
    val bands = mh
      .groupBy(col("doc_id"), expr("CAST(j DIV 2 AS INT)").as("band"))
      .agg(md5(array_join(sort_array(collect_list(col("mh"))), "|")).as("band_hash"))
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val ma = mh.select(col("doc_id").as("doc_a"), col("j"), col("mh").as("mh_a"))
    val mb = mh.select(col("doc_id").as("doc_b"), col("j"), col("mh").as("mh_b"))
    cand
      .join(ma, "doc_a")
      .join(mb, Seq("doc_b", "j"))
      .groupBy("doc_a", "doc_b")
      .agg((sum(when(col("mh_a") === col("mh_b"), 1).otherwise(0)).cast("double") / 16.0)
        .as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit frequency-weighted SimHash from token md5s. Bit b of a token's
    * hash = parity of hex digit b (odd digit → 1); simhash bit = sign of
    * the ±1 vote sum. Bucket = top 16 bits, the blocking key for near-dup
    * candidate generation. Linear in tokens. */
  def simhash(documents: DataFrame): DataFrame =
    tokens(documents)
      .withColumn("b", explode(sequence(lit(0), lit(31))))
      .withColumn("vote",
        when(expr("substring(md5(w), b+1, 1)")
          .isin("1", "3", "5", "7", "9", "b", "d", "f"), 1).otherwise(-1))
      .groupBy("doc_id", "b")
      .agg(sum("vote").as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") >= 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L))
        .as("simhash"))
      .select(col("doc_id"), col("simhash"),
        expr("shiftright(simhash, 16)").as("bucket"))
      .orderBy("doc_id")

  /** True n-gram Jaccard for pairs sharing >= `minCommon` distinct
    * shingles (the support threshold IS the blocking — pair cardinality
    * stays near-linear on non-degenerate corpora). */
  def ngramJaccard(documents: DataFrame, minCommon: Long = 3L): DataFrame = {
    val sh = shingles(documents).cache()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding near-dup pairs: sign-LSH bucket blocking, then exact
    * decimal cosine within buckets; emit pairs with cosine >= threshold. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.3): DataFrame = {
    val feat = embeddings.select(
      col("vec_id"), col("embedding"),
      VectorFunctions.signBucket(col("embedding")).as("bucket"),
      VectorFunctions.normExact(col("embedding")).as("nrm"))
    val a = feat.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("bucket"), col("nrm").as("nrm_a"))
    val b = feat.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("bucket"), col("nrm").as("nrm_b"))
    a.join(b, "bucket")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("dot", VectorFunctions.dotExact(col("ea"), col("eb")))
      .withColumn("cosine", col("dot") / (col("nrm_a") * col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
      .orderBy("vec_a", "vec_b")
  }
}
