package graft

import graft.operators.{Similarity, VectorStore}
import graft.sources.Tables
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Persisted IVF vector store: frozen quantizer, exactly-once incremental
  * ingest, probe queries, bounded compaction. */
class VectorStoreSpec extends SparkSpec {

  test("incremental ingest is exactly-once and order-independent; compaction is lossless") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore").toString

    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    val half = n / 2
    val a1 = VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < half))
    val a2 = VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= half))
    assert(a1 + a2 === n)
    // replayed batch: nothing admitted twice
    assert(VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < half)) === 0L)
    val stored = VectorStore.vectors(spark, stateDir)
    assert(stored.count() === n)
    assert(stored.select("vec_id").distinct().count() === n)

    // a second store ingesting everything in ONE batch holds the same
    // assignments (the frozen quantizer makes cells ingest-order-free)
    val oneShot = Files.createTempDirectory("graft-vstore1").toString
    VectorStore.init(spark, oneShot, Tables.embeddings(spark, sfDir))
    VectorStore.ingest(spark, oneShot, emb)
    def cells(dir: String) = VectorStore.vectors(spark, dir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toSet
    assert(cells(stateDir) === cells(oneShot))

    // queries over both stores agree, and rerank cosines are exact
    val queries = emb.filter(col("vec_id") < 4)
    def res(dir: String) = VectorStore.query(spark, dir, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    val r1 = res(stateDir)
    assert(r1.nonEmpty)
    assert(r1 === res(oneShot))
    val bf = Similarity.bruteForceTopK(Tables.embeddings(spark, sfDir), nQueries = 4, k = 50)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    r1.foreach { case ((qid, _), (nid, cos)) =>
      bf.get((qid, nid)).foreach(exact => assert(math.abs(exact - cos) < 1e-12))
    }

    // compaction folds the three batches into one dir, content unchanged
    val before = cells(stateDir)
    VectorStore.compact(spark, stateDir)
    assert(graft.sources.Manifest.live(spark, stateDir)
      .count(_.startsWith("vectors/")) === 1)
    assert(cells(stateDir) === before)
    assert(res(stateDir) === r1)
    // double-init refuses rather than silently replacing the quantizer
    intercept[IllegalArgumentException] {
      VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    }
  }

  test("PQ encode-at-rest: ADC from codes equals on-the-fly ADC; hot batches stay raw") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore-pq").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir))
    // two cold batches, encoded at rest; one hot batch ingested after
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < n / 3))
    VectorStore.ingest(spark, stateDir,
      emb.filter(col("vec_id") >= n / 3 && col("vec_id") < 2 * n / 3))
    VectorStore.encodeCompact(spark, stateDir)
    assert(graft.sources.Manifest.live(spark, stateDir)
      .count(_.startsWith("codes/")) === 1)
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= 2 * n / 3))
    assert(VectorStore.vectors(spark, stateDir).count() === n)

    val queries = emb.filter(col("vec_id") < 4)
    def adc(dir: String) = VectorStore.queryAdc(spark, dir, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_cosine"))).toMap
    val mixed = adc(stateDir)
    assert(mixed.nonEmpty)
    // reference store: identical content, NEVER encoded at rest — every
    // candidate scores through the on-the-fly encode path. The codes
    // table must be a pure representation change: results identical.
    val rawStore = Files.createTempDirectory("graft-vstore-raw").toString
    VectorStore.init(spark, rawStore, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, rawStore, Tables.embeddings(spark, sfDir))
    VectorStore.ingest(spark, rawStore, emb)
    assert(mixed === adc(rawStore))
    // ADC ranks are a reasonable approximation of the exact probe query:
    // the exact top-1 neighbor appears in the ADC top-k for most queries
    val exact = VectorStore.query(spark, stateDir, queries).collect()
      .filter(_.getAs[Int]("rank") === 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val adcByQ = mixed.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._1).toSet)
    val hits = exact.count { case (q, top1) => adcByQ.get(q).exists(_.contains(top1)) }
    assert(hits >= exact.size / 2, s"ADC lost too many exact top-1s: $hits/${exact.size}")
    // incremental encode pass: the one hot batch gets codes without any
    // refold; results unchanged, a second pass finds nothing to do
    assert(VectorStore.encodeFresh(spark, stateDir) === 1)
    assert(adc(stateDir) === mixed)
    assert(VectorStore.encodeFresh(spark, stateDir) === 0)
    // double-init of the codebooks is refused like the quantizer's
    intercept[IllegalArgumentException] {
      VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir))
    }
  }

  test("residual PQ store: mixed encoded/hot ≡ never-encoded ≡ the ephemeral " +
    "ivfPqResidualTopK operator; delete parity holds under the flag") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore-res").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir),
      byResidual = true)
    assert(graft.sources.Manifest.meta(spark, stateDir)("pq_residual") === "1")
    // cold batch encoded at rest, hot batch raw — the covered/fresh split
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < n / 2))
    VectorStore.encodeCompact(spark, stateDir)
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= n / 2))
    val queries = emb.filter(col("vec_id") < 8)
    def adc(dir: String) = VectorStore.queryAdc(spark, dir, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_cosine"))).toMap
    val mixed = adc(stateDir)
    assert(mixed.nonEmpty)
    // never-encoded residual store: codes must be a pure representation change
    val rawStore = Files.createTempDirectory("graft-vstore-res-raw").toString
    VectorStore.init(spark, rawStore, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, rawStore, Tables.embeddings(spark, sfDir),
      byResidual = true)
    VectorStore.ingest(spark, rawStore, emb)
    assert(mixed === adc(rawStore))
    // the at-rest serving path IS the C117/C118 operator: same quantizer
    // training (trainCentroids 16×2), same residual codebooks, same probe
    // and ADC arithmetic — so ann_recall_ivfpq_residual measures THIS
    // store's serving recall, not a lookalike
    val ephemeral = Similarity.ivfPqResidualTopK(
      Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_cosine"))).toMap
    assert(mixed === ephemeral)
    // incremental encode under the flag: results unchanged
    assert(VectorStore.encodeFresh(spark, stateDir) === 1)
    assert(adc(stateDir) === mixed)
    // delete parity: purge from both the covered and the fresh side,
    // neither serving path returns a deleted id, survivors served once
    val doomed = Seq(11L, n / 2 + 3)
    assert(VectorStore.deleteVectors(spark, stateDir, doomed) === doomed.length)
    val after = VectorStore.queryAdc(spark, stateDir, queries,
      nProbe = 16, k = n.toInt).collect()
    assert(!after.exists(r => doomed.contains(r.getAs[Long]("neighbor_id"))))
    after.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val ids = rows.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length === ids.length, "neighbor served twice")
      assert(ids.length === n - doomed.length - 1)
    }
  }

  test("incremental encode-compaction: one codes dir, no re-encode of history, refold-equal") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore-inc").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir))
    // the steady-state history an incremental pass must absorb: a folded
    // generation (encodeCompact), a fresh-encoded generation (encodeFresh),
    // and a still-raw hot batch — three codes sources, three raw layouts
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < n / 4))
    VectorStore.encodeCompact(spark, stateDir)
    VectorStore.ingest(spark, stateDir,
      emb.filter(col("vec_id") >= n / 4 && col("vec_id") < n / 2))
    assert(VectorStore.encodeFresh(spark, stateDir) === 1)
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= n / 2))
    assert(graft.sources.Manifest.live(spark, stateDir)
      .count(_.startsWith("codes/")) === 2)
    // the pass encodes exactly the one uncovered batch and folds all
    // codes into ONE dir; every live raw batch is covered afterwards
    assert(VectorStore.encodeCompactIncremental(spark, stateDir) === 1)
    val live = graft.sources.Manifest.live(spark, stateDir)
    assert(live.count(_.startsWith("codes/")) === 1)
    val meta = graft.sources.Manifest.meta(spark, stateDir)
    val covered = meta("pq_covered").split(",").toSet
    assert(covered === live.filter(_.startsWith("vectors/"))
      .map(_.stripPrefix("vectors/")).toSet)
    // bit-equal to a store that took the expensive full-refold path
    val queries = emb.filter(col("vec_id") < 4)
    def adc(dir: String) = VectorStore.queryAdc(spark, dir, queries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_cosine"))).toMap
    val refold = Files.createTempDirectory("graft-vstore-inc-ref").toString
    VectorStore.init(spark, refold, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, refold, Tables.embeddings(spark, sfDir))
    VectorStore.ingest(spark, refold, emb)
    VectorStore.encodeCompact(spark, refold)
    assert(adc(stateDir) === adc(refold))
    // nothing fresh + one codes dir → a second pass is a no-op
    assert(VectorStore.encodeCompactIncremental(spark, stateDir) === 0)
    assert(graft.sources.Manifest.live(spark, stateDir)
      .count(_.startsWith("codes/")) === 1)
  }

  test("incremental encode-compaction racing an ingest: retried, new batch stays uncovered") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore-inc-race").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < n / 2))
    VectorStore.encodeCompact(spark, stateDir)
    VectorStore.ingest(spark, stateDir,
      emb.filter(col("vec_id") >= n / 2 && col("vec_id") < 3 * n / 4))
    // a batch lands BETWEEN staging and publish: the CAS fails, but the
    // staged codes still account for the store's encoded state exactly,
    // so they are re-CASed (not re-derived) and the race batch simply
    // stays uncovered for the next pass
    var raced = false
    assert(VectorStore.encodeCompactIncremental(spark, stateDir, beforePublish = () => {
      if (!raced) {
        raced = true
        VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= 3 * n / 4))
      }
    }) === 1)
    assert(raced)
    val live = graft.sources.Manifest.live(spark, stateDir)
    assert(live.count(_.startsWith("codes/")) === 1)
    val covered = graft.sources.Manifest.meta(spark, stateDir)("pq_covered")
      .split(",").toSet
    val rawTags = live.filter(_.startsWith("vectors/"))
      .map(_.stripPrefix("vectors/")).toSet
    assert(covered.subsetOf(rawTags))
    assert((rawTags -- covered).size === 1) // the race batch, un-encoded
    // every vector served exactly once across the codes + on-the-fly split
    val queries = emb.filter(col("vec_id") < 4)
    val res = VectorStore.queryAdc(spark, stateDir, queries,
      nProbe = 16, k = n.toInt).collect()
    res.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val ids = rows.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length === ids.length, "duplicate neighbor served")
      assert(ids.length === n - 1) // all vectors present exactly once
    }
  }

  test("encodeFresh racing encodeCompact: no vector ever served twice") {
    // the OCC hazard: encodeFresh snapshots, encodes the fresh batch, and
    // a concurrent encodeCompact folds that SAME batch before the publish
    // lands — a blind merge would commit duplicate codes and queryAdc
    // would serve those vectors twice (wrong ranks). The CAS-pinned loop
    // must detect the fold, discard its staged codes, and report 0.
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore-race").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < n / 2))
    VectorStore.encodeCompact(spark, stateDir)
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= n / 2))
    var raced = false
    val encoded = VectorStore.encodeFresh(spark, stateDir, beforePublish = () => {
      if (!raced) { raced = true; VectorStore.encodeCompact(spark, stateDir) }
    })
    assert(raced)
    assert(encoded === 0) // the compaction covered everything first
    // exactly one live codes dir (the compaction's); encodeFresh removed
    // its own staged codes (f-tagged) — the superseded first compaction's
    // dir is ordinary unreferenced garbage awaiting vacuum, not ours
    val live = graft.sources.Manifest.live(spark, stateDir)
    assert(live.count(_.startsWith("codes/")) === 1)
    val staged = new java.io.File(s"$stateDir/codes").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("f"))
    assert(staged.isEmpty, s"orphan staged codes: ${staged.mkString(",")}")
    // every vector served exactly once, with codes-path cosines equal to
    // a never-compacted reference store
    val queries = emb.filter(col("vec_id") < 4)
    val res = VectorStore.queryAdc(spark, stateDir, queries).collect()
    val perQuery = res.groupBy(_.getAs[Long]("query_id"))
    perQuery.values.foreach { rows =>
      val ids = rows.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length === ids.length, "duplicate neighbor served")
    }
    val rawStore = Files.createTempDirectory("graft-vstore-race-raw").toString
    VectorStore.init(spark, rawStore, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, rawStore, Tables.embeddings(spark, sfDir))
    VectorStore.ingest(spark, rawStore, emb)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_cosine"))).toMap
    assert(key(res) === key(VectorStore.queryAdc(spark, rawStore, queries).collect()))
  }

  test("racing ingests serialize: the shared vector is admitted exactly once") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val stateDir = Files.createTempDirectory("graft-vstore-race").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    // A: ids 0..9 plus shared id 42; B: ids 20..29 plus the same 42
    val batchA = emb.filter(col("vec_id") < 10 || col("vec_id") === 42)
    val batchB = emb.filter(
      (col("vec_id") >= 20 && col("vec_id") < 30) || col("vec_id") === 42)
    var nB = -1L
    val nA = VectorStore.ingest(spark, stateDir, batchA, beforePublish = () => {
      // a full competing ingest commits between A's staging and publish:
      // A must lose the CAS, drop the overlap, and retry on top
      nB = VectorStore.ingest(spark, stateDir, batchB)
    })
    assert(nB === 11L)
    assert(nA === 10L)
    val stored = VectorStore.vectors(spark, stateDir)
    assert(stored.count() === 21L)
    assert(stored.filter(col("vec_id") === 42).count() === 1L)
    // both batches idempotent after the race
    assert(VectorStore.ingest(spark, stateDir, batchA) === 0L)
    assert(VectorStore.ingest(spark, stateDir, batchB) === 0L)
  }

  test("deleteVectors: takedown purges raw AND codes paths, covered survivors " +
    "stay covered, no double-serving") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore-del").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir))
    // batch 1 encoded (covered), batch 2 fresh (raw-only)
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < n / 2))
    VectorStore.encodeCompact(spark, stateDir)
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= n / 2))
    // delete ids from BOTH the covered batch and the fresh one
    val doomed = Seq(1L, 2L, n / 2, n / 2 + 1)
    assert(VectorStore.deleteVectors(spark, stateDir, doomed) === doomed.length)
    // raw layout: deleted gone, survivors complete
    val stored = VectorStore.vectors(spark, stateDir)
    assert(stored.count() === n - doomed.length)
    assert(stored.filter(col("vec_id").isInCollection(doomed)).count() === 0)
    // neither query path ever returns a deleted id; ADC serves each
    // survivor at most once (covered bookkeeping: no codes+on-the-fly
    // double-serve, no dropped covered survivors)
    val queries = emb.filter(col("vec_id") === 4 || col("vec_id") === 5)
    val raw = VectorStore.query(spark, stateDir, queries, nProbe = 16, k = 64).collect()
    assert(!raw.exists(r => doomed.contains(r.getAs[Long]("neighbor_id"))))
    val adc = VectorStore.queryAdc(spark, stateDir, queries, nProbe = 16, k = 1000).collect()
    assert(!adc.exists(r => doomed.contains(r.getAs[Long]("neighbor_id"))))
    adc.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val ids = rows.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length === ids.length, "neighbor served twice after delete")
      assert(ids.length === n - doomed.length - 1, // minus the query itself
        "ADC must still serve every survivor exactly once")
    }
    // an already-deleted id is a no-op; deleting nothing publishes nothing
    assert(VectorStore.deleteVectors(spark, stateDir, Seq(1L)) === 0L)
    // a follow-up incremental encode pass stays consistent (covered
    // survivors were NOT reclassified as fresh)
    assert(VectorStore.encodeCompactIncremental(spark, stateDir) === 1)
    val adc2 = VectorStore.queryAdc(spark, stateDir, queries, nProbe = 16, k = 1000).collect()
    adc2.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val ids = rows.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length === ids.length)
      assert(ids.length === n - doomed.length - 1)
    }
  }

  test("deleteVectors racing encodeCompactIncremental: delete re-derives and wins") {
    // the C20d self-heal interleaving: delete stages its rewrites, then an
    // incremental encode pass commits first (folding codes + covering the
    // fresh batch). The delete must lose the CAS, drop its staged dirs,
    // re-derive against the NEW snapshot (where the formerly-fresh batch
    // is now covered), and still purge every target from every path.
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val stateDir = Files.createTempDirectory("graft-vstore-delrace").toString
    VectorStore.init(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.initPq(spark, stateDir, Tables.embeddings(spark, sfDir))
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") < n / 2))
    VectorStore.encodeCompact(spark, stateDir)
    VectorStore.ingest(spark, stateDir, emb.filter(col("vec_id") >= n / 2))
    val doomed = Seq(3L, n / 2 + 2)
    var raced = false
    val deleted = VectorStore.deleteVectors(spark, stateDir, doomed,
      beforePublish = () => {
        if (!raced) { raced = true; VectorStore.encodeCompactIncremental(spark, stateDir) }
      })
    assert(raced)
    assert(deleted === doomed.length)
    val stored = VectorStore.vectors(spark, stateDir)
    assert(stored.count() === n - doomed.length)
    val queries = emb.filter(col("vec_id") === 4)
    val adc = VectorStore.queryAdc(spark, stateDir, queries, nProbe = 16, k = 1000).collect()
    assert(!adc.exists(r => doomed.contains(r.getAs[Long]("neighbor_id"))))
    val ids = adc.map(_.getAs[Long]("neighbor_id"))
    assert(ids.distinct.length === ids.length)
    assert(ids.length === n - doomed.length - 1,
      "every survivor served exactly once after the raced delete")
    // no orphan staged dirs from the losing first attempt
    val orphans = new java.io.File(s"$stateDir/vectors").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("d") &&
        !graft.sources.Manifest.live(spark, stateDir).contains(s"vectors/${d.getName}"))
    assert(orphans.isEmpty, s"orphan staged delete dirs: ${orphans.mkString(",")}")
  }
}
