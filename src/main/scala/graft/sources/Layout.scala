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
