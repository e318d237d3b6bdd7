package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** A minimal committed-files manifest — the transactional-publish protocol
  * the reference gets for free from SQLite (`db_utils.py:185-225` runs its
  * multi-row insert under one connection/transaction) and that parquet
  * directories lack: a multi-directory state change becomes visible to
  * readers in ONE atomic step, or not at all.
  *
  * Layout under a state dir:
  * {{{
  *   <base>/_manifest/v1.txt   one live data-dir path (relative) per line
  *   <base>/_manifest/v2.txt   each version fully lists the live set
  *   ...
  * }}}
  *
  * Writers stage data into fresh directories (never touching live ones),
  * then [[publish]] the next manifest version: the file is written to a
  * temp name and `rename`d into place — rename is atomic on HDFS and
  * effectively so on local/object-store-with-consistent-rename, so readers
  * either see the old version list or the new one, never a torn state.
  * A crash at ANY earlier point leaves orphan staged directories that no
  * manifest references; [[stale]] finds them for cleanup and readers never
  * see them. Readers resolve [[live]] = the highest version's list.
  *
  * Scale notes: the manifest is O(#live dirs) bytes of driver-side metadata
  * — never row data — and one `listStatus` per read; at warehouse scale
  * this is the same shape as a table-format snapshot file (log-structured
  * commits, latest-wins), deliberately without compaction of the version
  * history (old versions are an audit trail and cost bytes).
  */
object Manifest {

  private val DirName = "_manifest"
  private val Version = raw"v(\d+)\.txt".r

  private def fs(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(base: String): Path = new Path(base, DirName)

  /** Highest published manifest version at `base`, 0 if none. */
  def version(spark: SparkSession, base: String): Long = {
    val f = fs(spark, base)
    val dir = manifestDir(base)
    if (!f.exists(dir)) 0L
    else
      f.listStatus(dir)
        .iterator
        .map(_.getPath.getName)
        .collect { case Version(n) => n.toLong }
        .foldLeft(0L)(math.max)
  }

  /** The live data-dir list (paths relative to `base`) of the highest
    * published version; empty before the first publish. */
  def live(spark: SparkSession, base: String): Seq[String] = {
    val v = version(spark, base)
    if (v == 0L) Seq.empty
    else {
      val f = fs(spark, base)
      val in = f.open(new Path(manifestDir(base), s"v$v.txt"))
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        Iterator
          .continually(in.read(buf))
          .takeWhile(_ > 0)
          .foreach(n => bytes.write(buf, 0, n))
        new String(bytes.toByteArray, StandardCharsets.UTF_8).linesIterator
          .map(_.trim)
          .filter(_.nonEmpty)
          .toSeq
      } finally in.close()
    }
  }

  /** Atomically publish `liveDirs` as the next manifest version; returns
    * the new version number. This is the ONLY visibility point: everything
    * written before this call is invisible to [[live]]-based readers until
    * the rename lands, and a crash before it leaves state unchanged. */
  def publish(spark: SparkSession, base: String, liveDirs: Seq[String]): Long = {
    val f = fs(spark, base)
    val dir = manifestDir(base)
    if (!f.exists(dir)) f.mkdirs(dir)
    val next = version(spark, base) + 1
    val tmp = new Path(dir, s".v$next.txt.tmp")
    val out = f.create(tmp, true)
    try out.write(liveDirs.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, new Path(dir, s"v$next.txt")))
      throw new java.io.IOException(
        s"manifest publish lost the rename race at $base v$next")
    next
  }

  /** Staged-but-unpublished (orphan) directories: subdirectories of
    * `base/<table>` for the given tables that no live manifest entry
    * references — crash leftovers, safe to delete before re-staging. */
  def stale(spark: SparkSession, base: String, tables: Seq[String]): Seq[String] = {
    val f = fs(spark, base)
    val liveSet = live(spark, base).toSet
    tables.flatMap { t =>
      val tDir = new Path(base, t)
      if (!f.exists(tDir)) Seq.empty
      else
        f.listStatus(tDir)
          .iterator
          .filter(_.isDirectory)
          .map(s => s"$t/${s.getPath.getName}")
          .filterNot(liveSet.contains)
          .toSeq
    }
  }

  /** Delete all [[stale]] staged directories (crash recovery at the start
    * of a writer run). */
  def cleanStale(spark: SparkSession, base: String, tables: Seq[String]): Unit = {
    val f = fs(spark, base)
    stale(spark, base, tables).foreach(rel => f.delete(new Path(base, rel), true))
  }
}
