package graft

import java.nio.file.Files

import graft.sources.{Layout, Tables}
import org.apache.spark.sql.functions._

/** Data-layout + incremental-ingest pipeline plumbing. */
class LayoutSpec extends SparkSpec {

  test("clustered write produces contiguous sorted key ranges and bounded files") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/orders"
    val orders = Tables.orders(spark, sfDir)
    Layout.writeClustered(orders, dir, Seq("o_custkey"), nFiles = 4)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 4)
    // file key ranges must not overlap: collect (min,max) per file and sort
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_custkey"), max("o_custkey")).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping ranges: ${ranges.toSeq}")
      case _ =>
    }
    // nothing lost
    assert(spark.read.parquet(dir).count() === orders.count())
  }

  test("compact merges a fragmented table without changing its contents") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/orders"
    val orders = Tables.orders(spark, sfDir)
    orders.repartition(37).write.parquet(dir) // fragmented: 37 small files
    val before = orders.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val (nBefore, nAfter) = Layout.compact(spark, dir, Seq("o_orderdate"), nFiles = 3)
    assert(nBefore === 37)
    assert(nAfter === 3)
    val after = spark.read.parquet(dir).select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(after.toSeq === before.toSeq)
  }

  test("incremental ingest admits each distinct document exactly once across runs") {
    import graft.operators.Corpus
    val state = Files.createTempDirectory("graft-ingest").toString
    val docs = Tables.documents(spark, sfDir)
    val n1 = Corpus.ingestIncremental(spark, docs, state)
    val distinctTexts = docs
      .select(graft.functions.TextFunctions.fingerprint(col("text"))).distinct().count()
    assert(n1 === distinctTexts)
    // re-running the identical batch admits nothing
    val n2 = Corpus.ingestIncremental(spark, docs, state)
    assert(n2 === 0)
    assert(spark.read.parquet(s"$state/documents").count() === distinctTexts)
    // a genuinely new document is admitted; a rephrased duplicate is not
    import spark.implicits._
    val batch2 = Seq(
      (900001L, "a genuinely new document about spark layout", "en", "t", 40L),
      (900002L, docs.select("text").head().getString(0), "en", "t", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val n3 = Corpus.ingestIncremental(spark, batch2, state)
    assert(n3 === 1)
  }
}
