package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout management for the persisted corpus — the two mechanical
  * problems every 100 TB pipeline hits:
  *
  *  - **Small files**: incremental appends leave thousands of KB-sized
  *    parquet files; scans then pay one task + one open per file.
  *    [[compact]] rewrites a table into range-partitioned, internally
  *    sorted files with a bounded record count per file — the
  *    `repartitionByRange` keeps each output file a contiguous key range
  *    (min/max column statistics stay selective, so later range filters
  *    skip whole files), and the in-partition sort maximizes parquet
  *    run-length/dictionary compression on the clustered columns.
  *  - **Ingest-time clustering**: [[writeClustered]] is the same layout
  *    applied on first write, for producers that can afford to sort once
  *    at write time and save every downstream scan.
  *
  * Both are pure Spark write paths (no custom committers): at cluster
  * scale the same code shards across executors; the only knob that
  * changes is the partition count.
  */
object Layout {

  /** Rewrite `df` at `path` range-clustered by `keys`: `nFiles` output
    * files, each a contiguous sorted key range, at most
    * `maxRecordsPerFile` rows per file (Spark splits oversized ranges). */
  def writeClustered(
      df: DataFrame, path: String, keys: Seq[String],
      nFiles: Int, maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartitionByRange(nFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Compact an existing table in place (read → clustered rewrite via a
    * temp dir → crash-recoverable swap). Returns (filesBefore, filesAfter).
    *
    * Swap protocol — at every intermediate state the full data set exists
    * under exactly one of `path`, `path._compact_old`, `path._compact_tmp`,
    * so a crash at any step is recoverable (and [[compact]] self-recovers
    * from a predecessor's crash before starting):
    * {{{
    *   1. write rewrite  → tmp      (live untouched)
    *   2. rename live    → ._old    (brief reader gap begins)
    *   3. rename tmp     → live     (gap ends; both renames are atomic)
    *   4. delete ._old              (cleanup only)
    * }}}
    * This removes the delete-before-rename window the naive swap has (a
    * crash there left NO live table). Readers can still observe the gap
    * between steps 2 and 3 — fully gap-free swaps need a manifest
    * indirection, which the pipeline state uses ([[Manifest]]); for a
    * standalone table compaction, crash-recoverability is the contract.
    */
  def compact(
      spark: SparkSession, path: String, keys: Seq[String],
      nFiles: Int, maxRecordsPerFile: Long = 5000000L): (Long, Long) = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "._compact_tmp")
    val old = new Path(path + "._compact_old")

    // recover from a predecessor's crash, in protocol order:
    // live missing → complete its swap from tmp (post-step-2 crash) or
    // roll back from ._old; leftovers with live present are orphans.
    if (!fs.exists(hPath) && fs.exists(tmp)) fs.rename(tmp, hPath)
    else if (!fs.exists(hPath) && fs.exists(old)) fs.rename(old, hPath)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(tmp)) fs.delete(tmp, true)

    val before = dataFiles(spark, path)
    writeClustered(spark.read.parquet(path), tmp.toString, keys, nFiles, maxRecordsPerFile)
    // Both renames are CHECKED (rename reports failure via its boolean, not
    // an exception): proceeding past a failed step-3 rename would make the
    // final delete destroy the only remaining copy under `._old`. On a
    // failed step 3 the live slot is empty, so roll `._old` straight back
    // before surfacing the error — the table is never left gone.
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(s"compact: rename $hPath -> $old failed")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(old, hPath)
      throw new java.io.IOException(s"compact: rename $tmp -> $hPath failed (rolled back)")
    }
    fs.delete(old, true)
    (before, dataFiles(spark, path))
  }

  /** Morton (Z-order) interleave of two bucketized dimensions — bit i of
    * `a` lands at output bit 2i, bit i of `b` at 2i+1. Pure bitwise
    * column expression (codegen-resident, no UDF). Inputs must already
    * be in `[0, 2^bits)`. */
  def mortonCode(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Z-ORDER clustered write: range-cluster `df` on the MORTON CODE of
    * two columns so every output file covers a small rectangle in
    * (colA, colB) space — parquet min/max footer statistics then prune
    * files for predicates on EITHER column (or both), where a
    * single-column sort ([[writeClustered]]) only serves its leading
    * key. The multi-dimensional analog of the range layout, and the
    * standard lakehouse data-skipping trick at 100 TB.
    *
    * Each column is first bucketized into `2^bits` approximate-quantile
    * buckets — boundaries come from ONE `approxQuantile` sample
    * (driver-bounded metadata, the withExactPrefixSum sampling
    * discipline), and the per-row bucket is a codegen'd fold over the
    * literal boundary array: no window, no extra shuffle, skew-robust
    * (quantile buckets equalize file populations where uniform
    * `width_bucket`s would collapse under a hot key). Bucketization only
    * shapes LAYOUT — approximation adds no correctness constraint. */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int, bits: Int = 8, maxRecordsPerFile: Long = 5000000L): Unit = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    def boundaries(c: String): Array[Double] =
      df.select(col(c).cast("double").as("__x"))
        .stat.approxQuantile("__x", probs, 0.001)
    def bucketOf(c: String, bnds: Array[Double]) =
      aggregate(lit(bnds), lit(0L),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
    val withCode = df
      .withColumn("__z", mortonCode(
        bucketOf(colA, boundaries(colA)), bucketOf(colB, boundaries(colB)), bits))
    withCode
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Number of parquet data files under `path`, recursively (partitioned
    * layouts keep data in subdirectories). */
  def dataFiles(spark: SparkSession, path: String): Long = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    var n = 0L
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }
}
