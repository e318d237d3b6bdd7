package graft.sources

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
    * temp dir → atomic-ish swap). Returns (filesBefore, filesAfter). */
  def compact(
      spark: SparkSession, path: String, keys: Seq[String],
      nFiles: Int, maxRecordsPerFile: Long = 5000000L): (Long, Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).count(s => s.getPath.getName.endsWith(".parquet")).toLong
    val before = dataFiles(hPath)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compact_tmp")
    writeClustered(spark.read.parquet(path), tmp.toString, keys, nFiles, maxRecordsPerFile)
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
    (before, dataFiles(hPath))
  }
}
