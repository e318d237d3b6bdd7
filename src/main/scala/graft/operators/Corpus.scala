package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: winnowing
  * fingerprints (MOSS-style robust near-dup/overlap detection) and
  * deterministic stratified sampling.
  *
  * Both are pure map stages — no shuffle before the output ordering — so
  * at 100 TB they run at scan speed across however many executors hold
  * the corpus. */
object Corpus {

  /** Winnowing fingerprint rows (doc_id, fingerprint): the distinct
    * sliding-window minima of positioned 3-gram shingle hashes (window
    * [[graft.functions.ShingleImpl.WinnowW]]). Guarantees of the scheme:
    * any shingle run of ≥ w+k−1 tokens shared by two documents yields at
    * least one common fingerprint. Runs the native
    * [[graft.functions.Winnow]] expression — one codegen-resident pass per
    * document vs the SQL form's four shuffled stages (positioned explode,
    * window sort, frame min, DISTINCT). */
  def winnowFingerprints(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        explode(call_function("graft_winnow", col("text"))).as("fingerprint"))
      .orderBy("doc_id", "fingerprint")
  }

  /** Incremental corpus ingestion with a persisted dedup state — the
    * LLM-pipeline twin of [[graft.Pipeline]]'s idempotent attribution
    * write-back: each batch admits only documents whose normalized text
    * fingerprint has never been seen (exact dedup ACROSS runs, not just
    * within one), appends the admitted docs and their fingerprints, and
    * re-running the same batch is a no-op. One left-anti join against the
    * fingerprint store (hash-joinable at any scale; at 100 TB the store
    * would be bucketed by fingerprint so the anti-join co-locates), plus
    * the usual within-batch min-doc_id representative pick.
    *
    * @return number of newly admitted documents */
  def ingestIncremental(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, stateDir: String): Long = {
    val fpDir = s"$stateDir/fingerprints"
    val docDir = s"$stateDir/documents"
    val fpPath = new org.apache.hadoop.fs.Path(fpDir)
    val fs = fpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seen =
      if (fs.exists(fpPath)) spark.read.parquet(fpDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("fingerprint STRING"))
    // within-batch representative (min doc_id per fingerprint), then
    // cross-run novelty via one anti-join against the persisted store
    val withFp = batch.withColumn(
      "fingerprint", graft.functions.TextFunctions.fingerprint(col("text")))
    val reps = withFp
      .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
      .join(withFp.drop("fingerprint"), "doc_id")
    val admitted = reps
      .join(seen, Seq("fingerprint"), "left_anti")
      .localCheckpoint() // both writes + the count read one materialization
    admitted.drop("fingerprint").write.mode("append").parquet(docDir)
    admitted.select("fingerprint").write.mode("append").parquet(fpDir)
    admitted.count()
  }

  /** Per-document repetition metrics — the Gopher-style quality signals
    * (Rae et al. 2021 §A1.1: repetitious documents are low-quality
    * training data and slip past stopword/length filters):
    *
    *  - `top_word_frac`: share of the most frequent token
    *  - `top_bigram_frac`: share of the most frequent bigram
    *  - `dup_trigram_frac`: fraction of trigram occurrences that are
    *    repeats (1 − distinct/total)
    *
    * All-relational: token counts and argmax-by-count are partial-agg
    * groupBys keyed by (doc_id[, gram]), the bigram forms with one lead()
    * window inside the doc partition, and the distinct-trigram count
    * reuses the native one-pass [[Dedup.shingleArrays]] expression — no
    * per-row HOFs, no UDFs, scan-speed at corpus scale. */
  def repetitionMetrics(documents: DataFrame): DataFrame = {
    val toks = Dedup.tokens(documents)
    val n = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val topWord = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_word_n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val bi = toks
      .withColumn("w2", lead("w", 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w2")).as("bg"))
    val nBi = bi.groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"))
    val topBi = bi.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bigram_n"))
    val triDistinct = Dedup.shingleArrays(documents)
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_tri_distinct"))
    n.join(topWord, "doc_id").join(nBi, "doc_id").join(topBi, "doc_id")
      .join(triDistinct, "doc_id")
      .select(
        col("doc_id"), col("n_tokens"),
        (col("top_word_n").cast("double") / col("n_tokens").cast("double"))
          .as("top_word_frac"),
        (col("top_bigram_n").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"),
        when(col("n_tokens") > 2,
          lit(1.0) - col("n_tri_distinct").cast("double") /
            (col("n_tokens") - 2).cast("double"))
          .as("dup_trigram_frac"))
      .orderBy("doc_id")
  }

  /** End-to-end curation filter — the query a training-data pipeline runs
    * last: keep a document iff it is its exact-dedup cluster's
    * representative (min doc_id per text md5) AND its composite quality
    * score clears the threshold. One semi-join against the tiny
    * representative set + a map-side quality expression; every heavy
    * component (dedup groupBy) aggregates before joining. */
  def curation(documents: DataFrame, minQuality: Double = 0.64): DataFrame = {
    val reps = Dedup.exact(documents).select(col("keep_doc_id").as("doc_id"))
    documents
      .join(reps, Seq("doc_id"), "left_semi")
      .select(
        col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality_score"))
      .filter(col("quality_score") >= minQuality)
      .orderBy("doc_id")
  }

  /** Deterministic stratified hash sampling: keep a document iff its
    * 60-bit md5 text-hash mod 1000 falls under the stratum's rate —
    * 10% for English, 30% for every other language (down-sample the
    * dominant stratum, keep the tail). Reproducible across runs/engines
    * (no RNG), filter-only (no shuffle), and consistent: a document's
    * fate never depends on partitioning. */
  def stratifiedSample(documents: DataFrame): DataFrame =
    documents
      .withColumn("bucket",
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long") % 1000)
      .filter(col("bucket") < when(col("lang") === "en", 100).otherwise(300))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
}
