package graft

import graft.operators.{Corpus, Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Guards added by the r14 verdict (#4) and ADVICE: the two
  * data-dependent broadcasts are capped (past the cap the joins fall
  * back to shuffle — row-equal by construction, pinned here by forcing
  * cap 0), and the degenerate empty-index / empty-cells states fail
  * loudly or short-circuit instead of erroring opaquely. */
class BroadcastGuardSpec extends SparkSpec {

  test("filteredGraphSearch: forced-shuffle path (cap 0) is row-equal to the " +
    "broadcast path") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def rows(capped: Long) =
      Similarity.filteredGraphSearch(emb, broadcastCap = capped)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val bc = rows(graft.operators.Broadcasts.DefaultCap)
    val sh = rows(0L)
    assert(bc.nonEmpty && bc === sh,
      s"broadcast vs shuffle diverged: ${bc.diff(sh)} / ${sh.diff(bc)}")
  }

  test("embeddingIncremental: forced-shuffle path (cap 0) is row-equal to the " +
    "broadcast path") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def rows(capped: Long) =
      Dedup.embeddingIncremental(emb, broadcastCap = capped)
        .collect().map(r => (r.getAs[Long]("new_vec"),
          Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("max_cosine")).map(_.toDouble),
          r.getAs[Boolean]("admit"))).toSet
    val bc = rows(graft.operators.Broadcasts.DefaultCap)
    val sh = rows(0L)
    assert(bc.nonEmpty && bc === sh,
      s"broadcast vs shuffle diverged: ${bc.diff(sh)} / ${sh.diff(bc)}")
  }

  test("embeddingIncremental: empty index side short-circuits to all-admit " +
    "with null dup_of/max_cosine, and the eval twin keeps its batch rows") {
    import spark.implicits._
    // every vec_id % 10 == 0 → the whole frame is batch, the index empty
    val rows = Seq(0L, 10L, 20L).map(id =>
      (id, Array.tabulate(64)(i => if (i == (id / 10).toInt) 1f else 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.embeddingIncremental(df).collect()
    assert(out.map(_.getAs[Long]("new_vec")).toSet === Set(0L, 10L, 20L))
    assert(out.forall(_.getAs[Boolean]("admit")), "empty index must admit all")
    assert(out.forall(r => r.isNullAt(r.fieldIndex("dup_of")) &&
      r.isNullAt(r.fieldIndex("max_cosine"))))
    val ev = Dedup.embeddingIncrementalEval(df).collect()
    assert(ev.map(_.getAs[Long]("new_vec")).toSet === Set(0L, 10L, 20L),
      "batch rows must survive an empty exact side (left join)")
    assert(ev.forall(r => !r.getAs[Boolean]("probe_reject") &&
      !r.getAs[Boolean]("exact_reject") && !r.getAs[Boolean]("missed")))
  }

  test("semanticTopK: quantizer live with zero cell dirs fails with the " +
    "descriptive message, not an opaque schema-inference error") {
    import spark.implicits._
    val state = java.nio.file.Files.createTempDirectory("graft-semtopk-empty").toString
    def doc(id: Long) = (id, s"text $id", "en", "t", 7L,
      Array.tabulate(64)(i => if (i == id.toInt) 1f else 0f).toSeq)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars", "embedding")
    Corpus.ingestSemanticNearDup(spark, (1L to 5L).map(doc).toDF(cols: _*), state)
    // manufacture the degenerate state: drop every embcells dir from the
    // live set while the quantizer stays (the all-deleted-then-refreshed
    // corner the ADVICE names)
    graft.sources.Manifest.publishMerge(spark, state) { cur =>
      (cur.live.filterNot(_.startsWith("embcells/")), cur.meta)
    }
    val q = Seq((100L, Array.tabulate(64)(i => if (i == 1) 1f else 0f).toSeq))
      .toDF("query_id", "embedding")
    val ex = intercept[java.io.IOException] {
      Corpus.semanticTopK(spark, q, state).collect()
    }
    assert(ex.getMessage.contains("refreshEmbeddingIndex"),
      s"wanted the descriptive guard, got: ${ex.getMessage}")
  }
}
