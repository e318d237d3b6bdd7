package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents table (SURVEY §2.C8-C11).
  *
  * Everything is a pure `functions._` / Spark-SQL expression — codegen'd,
  * no UDFs — with an exactly-mirrored DuckDB formulation in the oracles.
  */
object TextFunctions {

  /** English stopword set used by the language-ID / quality heuristics. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Count of whitespace tokens that are stopwords (frequency-weighted). */
  def stopwordHits(text: Column): Column =
    size(filter(split(text, " "), w => w.isin(stopwords: _*)))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token estimate: runs of letters, runs of digits, or single
    * non-space symbols (a regex proxy for byte-pair segmentation). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  /** Subword estimate at ~4 chars/token (the usual LLM rule of thumb). */
  def subwordEstimate(text: Column): Column =
    ceil(length(text) / 4.0).cast("long")

  /** Distinct-token ratio (lexical diversity). */
  def uniqueRatio(text: Column): Column =
    size(array_distinct(split(text, " "))).cast("double") /
      size(split(text, " ")).cast("double")

  /** Stopword ratio. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text).cast("double") / tokenCount(text).cast("double")

  /** Language-ID heuristic: stopword-density vote. With >=2 English
    * stopword hits predict 'en', else 'unknown' — deterministic and
    * honest about what an n-gram heuristic can do on synthetic text. */
  def langId(text: Column): Column =
    when(stopwordHits(text) >= 2, lit("en")).otherwise(lit("unknown"))

  /** Composite quality score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·uniqueRatio + 0.3·(1 − stopwordRatio). */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.4 +
      uniqueRatio(text) * 0.3 +
      (lit(1.0) - stopwordRatio(text)) * 0.3

  /** Normalized-text fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text; plus a 32-bit-ish prefix bucket for joining/blocking. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))
}
