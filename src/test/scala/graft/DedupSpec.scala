package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("native gram ids equal the compositional md5 chain on real documents " +
    "(values, positions, and edge shapes: empty tokens, multi-byte UTF-8)") {
    // the corpus the gated queries actually run over
    val real = graft.sources.Tables.documents(spark, sfDir).limit(200)
    val edge = docs(
      100001L -> "a  b c   d e f g h i j k l m n o p q r s t u v", // empty tokens
      100002L -> ("é世界 tok " * 12).trim,            // multi-byte UTF-8
      100003L -> (1 to 19).map(i => s"w$i").mkString(" "),         // < k tokens: no gram
      100004L -> "")                                               // degenerate empty text
      .withColumn("lang", lit("en"))
    for (d <- Seq(real, edge.select("doc_id", "text")); k <- Seq(3, 20)) {
      val native = Dedup.gramRows(d, k)
        .select("doc_id", "pos", "gid_hi", "gid_lo").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      val comp = Dedup.gramRowsCompositional(d, k, hexLen = 15)
        .select("doc_id", "pos", "gid_hi", "gid_lo").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      assert(native.length === comp.length, s"k=$k row counts")
      assert(native.toSeq === comp.toSeq, s"k=$k gram ids diverge")
    }
  }

  test("native shingle sids equal the compositional md5-prefix chain " +
    "on real documents (multiset per doc)") {
    val real = graft.sources.Tables.documents(spark, sfDir).limit(300)
    val native = Dedup.shingleSidRows(real).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val comp = Dedup.shingles(real)
      .select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("sid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(native.length === comp.length)
    assert(native.toSeq === comp.toSeq)
  }

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = Dedup.exact(d).collect()
    assert(out.length === 2)
    val dupRow = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupRow.getAs[Long]("keep_doc_id") === 1L)
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "zz" else s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val out = Dedup.minhashLsh(docs(1L -> base, 2L -> nearDup, 3L -> other)).collect()
    assert(out.exists(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L
      && r.getAs[Double]("est_jaccard") > 0.5))
    assert(!out.exists(r => r.getAs[Long]("doc_b") == 3L))
  }

  test("minhashIncremental: batch verdicts are against the corpus only") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "zz" else s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val corpus = docs(1L -> base, 2L -> (200 to 240).map(i => s"u$i").mkString(" "))
    // 10 ≈ corpus doc 1 (reject); 11 unrelated (admit); 12 ≈ 13 are
    // near-dups WITHIN the batch — both admitted: the operator's contract
    // is corpus admission, not within-batch dedup
    val batch = docs(10L -> nearDup, 11L -> other,
      12L -> (300 to 340).map(i => s"p$i").mkString(" "),
      13L -> (300 to 340).map(i => if (i == 340) "qq" else s"p$i").mkString(" "))
    val out = Dedup.minhashIncremental(batch, corpus).collect()
      .map(r => r.getAs[Long]("new_doc") ->
        ((Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
          r.getAs[Boolean]("admit")))).toMap
    assert(out.keySet === Set(10L, 11L, 12L, 13L))
    assert(out(10L)._1 === Some(1L) && !out(10L)._2,
      s"batch doc 10 must be rejected against corpus doc 1, got ${out(10L)}")
    assert(out(11L) === ((None, true)))
    assert(out(12L) === ((None, true)) && out(13L) === ((None, true)),
      "within-batch near-dups must both be admitted")
  }

  test("leakageFreeSplit keeps near-dup families in one split") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "zz" else s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val out = Dedup.leakageFreeSplit(docs(1L -> base, 2L -> nearDup, 3L -> other))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rep"), r.getAs[String]("split")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L), "every doc gets a split row")
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L,
      "near-dup family hashes through the shared min-id rep")
    assert(out(1L)._2 === out(2L)._2, "family must land in ONE split")
    assert(out(3L)._1 === 3L, "singleton is its own rep")
    assert(Set("train", "val").contains(out(3L)._2))
  }

  test("simhash is identical for identical docs, differs for unrelated docs") {
    val out = Dedup.simhash(docs(1L -> "a b c d e f", 2L -> "a b c d e f", 3L -> "q r s t u v"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
  }

  test("hybrid clusters: an embedding pair bridges two text-dup clusters") {
    import spark.implicits._
    // docs 1≈2 and 3≈4 are text near-dups; embedding pair (2,3) bridges them
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " x"),
      (3L, base.replace("tok1", "zzz")), (4L, base.replace("tok1", "zzz") + " y"))
      .toDF("doc_id", "text")
    val vec = Array.tabulate(64)(i => (i + 1).toFloat)
    val emb = Seq((2L, vec), (3L, vec)).toDF("vec_id", "embedding")
    val out = operators.Dedup.hybridClusters(docs, emb).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out.values.toSet === Set(1L), s"expected one cluster rooted at 1, got $out")
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("clusters: chained pairs merge into one component labeled by the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("native SimHash32 expression equals the compositional formulation") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val native = Dedup.simhash(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val comp = Dedup.simhashCompositional(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native === comp)
  }

  test("ngram jaccard is 1.0 for identical docs") {
    val t = "a b c d e f g h"
    val out = Dedup.ngramJaccard(docs(1L -> t, 2L -> t), minCommon = 1L).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("jaccard") === 1.0)
  }

  test("embedding near-dup finds identical vectors in the same bucket") {
    val v = Array.tabulate(64)(i => (i + 1).toFloat / 64f)
    val w = Array.tabulate(64)(i => -((i % 7) + 1).toFloat / 8f)
    val emb = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(emb, threshold = 0.99).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("vec_a") === 1L)
    assert(out.head.getAs[Long]("vec_b") === 2L)
    assert(math.abs(out.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("semantic dedup: planted duplicate one-hots group together, exactly one kept") {
    // 40 one-hot vectors on distinct dims (pairwise cosine 0) with vec 30
    // duplicated as vec 31 — the only qualifying pair anywhere
    val rows = (0L until 40L).map { id =>
      val dim = if (id == 31L) 30 else id.toInt
      (id, Array.tabulate(64)(i => if (i == dim) 1f else 0f))
    }
    val out = Dedup.semanticDedup(rows.toDF("vec_id", "embedding")).collect()
    assert(out.map(_.getAs[Long]("vec_id")).sorted.toSeq === Seq(30L, 31L))
    assert(out.map(_.getAs[Long]("cluster_id")).distinct.length === 1)
    assert(out.count(_.getAs[Boolean]("kept")) === 1)
    // identical vectors → identical centroid cosine → min vec_id wins
    assert(out.find(_.getAs[Boolean]("kept")).get.getAs[Long]("vec_id") === 30L)
  }

  test("semanticContamination: planted near-paraphrase crossing the split is " +
    "flagged; orthogonal train docs are not") {
    // ids stay under 97, so the benchmark stratum (vec_id % 97 == 0) is
    // exactly {0}. Vec 5 is a PARAPHRASE of the benchmark item — the same
    // direction with a small perturbation, sharing no surface form a
    // winnowing fingerprint could catch — every other train vector is a
    // one-hot orthogonal to it.
    val benchVec = Array.tabulate(64)(i => if (i == 60) 1f else if (i == 61) 0.1f else 0f)
    val paraVec = Array.tabulate(64)(i => if (i == 60) 1f else if (i == 61) 0.12f else 0f)
    val rows = Seq((0L, benchVec), (5L, paraVec)) ++
      (1L until 40L).filter(_ != 5L).map(id => (id, Array.tabulate(64)(i => if (i == id.toInt) 1f else 0f)))
    val out = Dedup.semanticContamination(rows.toDF("vec_id", "embedding")).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(5L),
      s"exactly the planted paraphrase must be flagged, got ${out.mkString(",")}")
    val hit = out.head
    assert(hit.getAs[Long]("n_bench_near") === 1L)
    assert(hit.getAs[Long]("nearest_bench") === 0L)
    assert(hit.getAs[Double]("max_cosine") > 0.95)
  }

  test("embeddingIncremental: planted batch near-dups of the index are rejected, " +
    "novel batch vectors admit") {
    // index side (vec_id % 10 != 0): one-hot directions e_id. Batch side:
    // 0 = near-paraphrase of index 7 (perturbed in an unused dim), 20 =
    // exact duplicate of index 5, 10 = novel direction no index vector
    // occupies.
    val idx = ((1L to 9L) ++ (11L to 19L)).map(id =>
      (id, Array.tabulate(64)(i => if (i == id.toInt) 1f else 0f)))
    val nearOf7 = Array.tabulate(64)(i => if (i == 7) 1f else if (i == 50) 0.1f else 0f)
    val exactOf5 = Array.tabulate(64)(i => if (i == 5) 1f else 0f)
    val novel = Array.tabulate(64)(i => if (i == 40) 1f else 0f)
    val rows = idx ++ Seq((0L, nearOf7), (10L, novel), (20L, exactOf5))
    val out = Dedup.embeddingIncremental(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[Long]("new_vec") -> r).toMap
    assert(out.keySet === Set(0L, 10L, 20L))
    assert(!out(0L).getAs[Boolean]("admit"))
    assert(out(0L).getAs[Long]("dup_of") === 7L)
    assert(out(0L).getAs[Double]("max_cosine") > 0.95)
    assert(!out(20L).getAs[Boolean]("admit"))
    assert(out(20L).getAs[Long]("dup_of") === 5L)
    assert(out(20L).getAs[Double]("max_cosine") > 0.999)
    assert(out(10L).getAs[Boolean]("admit"),
      s"novel vector must admit, got ${out(10L)}")

    // the eval twin agrees with exact on this fixture (probe budget
    // covers the planted dups' cells) and flags no misses
    val ev = Dedup.embeddingIncrementalEval(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[Long]("new_vec") -> r).toMap
    assert(ev.keySet === Set(0L, 10L, 20L))
    Seq(0L, 20L).foreach { v =>
      assert(ev(v).getAs[Boolean]("probe_reject") &&
        ev(v).getAs[Boolean]("exact_reject") && !ev(v).getAs[Boolean]("missed"))
      assert(ev(v).getAs[Double]("probe_max") === ev(v).getAs[Double]("exact_max"),
        s"probe found $v's true nearest — the maxima must agree bit-for-bit")
    }
    assert(!ev(10L).getAs[Boolean]("probe_reject") &&
      !ev(10L).getAs[Boolean]("exact_reject") && !ev(10L).getAs[Boolean]("missed"))
  }

  test("embeddingGateProbeSweep: gate recall is monotone in the probe budget " +
    "and the nprobe=2 row aggregates the eval table") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val sweep = Dedup.embeddingGateProbeSweep(emb).collect()
      .map(r => r.getAs[Int]("nprobe") -> r).toMap
    assert(sweep.keySet === Set(1, 2, 4))
    // a wider probe can only ADD candidates per batch vector, so caught
    // counts are monotone (unlike beam search, no path dependence)
    def caught(np: Int) = sweep(np).getAs[Long]("n_caught")
    assert(caught(1) <= caught(2) && caught(2) <= caught(4),
      s"gate recall must not drop as nprobe grows: ${sweep.values.toSeq}")
    val ev = Dedup.embeddingIncrementalEval(emb).collect()
    assert(sweep(2).getAs[Long]("n_batch") === ev.length.toLong)
    assert(sweep(2).getAs[Long]("n_exact_dups") ===
      ev.count(_.getAs[Boolean]("exact_reject")).toLong)
    assert(sweep(2).getAs[Long]("n_caught") ===
      ev.count(r => r.getAs[Boolean]("exact_reject") &&
        r.getAs[Boolean]("probe_reject")).toLong)
  }

  test("semantic dedup invariants on real embeddings: per-cluster keep rule, cells agree") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val out = Dedup.semanticDedup(emb).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.length >= 2, s"singleton duplicate group $cid")
      assert(members.count(_.getAs[Boolean]("kept")) === 1, s"kept != 1 in group $cid")
      // every edge is within one cell and each vector has one cell, so a
      // connected component can never span cells
      assert(members.map(_.getAs[Long]("cell")).distinct.length === 1)
      val expectKeep = members.map(r =>
        (r.getAs[Double]("cos_centroid"), r.getAs[Long]("vec_id"))).min._2
      assert(members.find(_.getAs[Boolean]("kept")).get.getAs[Long]("vec_id")
        === expectKeep, s"keep rule violated in group $cid")
    }
  }

  test("hot-bucket guard: oversize band bucket dropped, output unchanged under the cap") {
    // planted hot bucket: 30 identical boilerplate docs (≈94% of the
    // corpus) share EVERY band value — 30-wide buckets, 435 pair rows in
    // one task — plus one genuine near-dup pair of distinct text
    val boiler = (0L until 30L).map(i =>
      i -> "shared boilerplate footer text exactly the same in every single page of this corpus")
    val near = Seq(
      31L -> "a unique document describing distributed exact ranking over range buckets",
      32L -> "a unique document describing distributed exact ranking over range buckets")
    val d = docs((boiler ++ near): _*)
    // default cap (1000): the guard is inert — pair output unchanged
    val uncapped = Dedup.minhashLsh(d).collect()
    assert(uncapped.length === 30 * 29 / 2 + 1)
    // cap 10: the 30-wide boilerplate buckets drop; the planted pair
    // (bucket width 2) is untouched — bounded task skew, kept recall
    val capped = Dedup.minhashLsh(d, maxBucket = 10L).collect()
    assert(capped.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
      === Seq((31L, 32L)))
    // capBuckets invariant on a raw bucket frame: no surviving bucket
    // exceeds the cap, and under-cap buckets survive untouched
    val rows = (0L until 100L).map(i => (i, if (i < 50) "hot" else s"cold${i % 25}"))
      .toDF("id", "bucket")
    val kept = Dedup.capBuckets(rows, Seq("bucket"), 10L)
    val widths = kept.groupBy("bucket").count().collect()
    assert(widths.forall(_.getAs[Long]("count") <= 10L))
    assert(kept.count() === 50L) // the 50-wide hot bucket gone, cold kept
  }

  test("semantic dedup self-scaling cells: auto k tracks corpus size, fixed-k-identical below the knee") {
    // the clamp formula, point-by-point (mirrored in Oracles.autoKExpr)
    assert(Similarity.autoCellCount(1L) === 16)
    assert(Similarity.autoCellCount(16 * 1024L) === 16)
    assert(Similarity.autoCellCount(16 * 1024L + 1) === 17)
    assert(Similarity.autoCellCount(100 * 1024L) === 100)
    assert(Similarity.autoCellCount(1000000L) === 256)
    // below the knee the auto default is bit-identical to the fixed form
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val auto = Dedup.semanticDedup(emb).collect().toSeq
    val fixed = Dedup.semanticDedup(emb, nCentroids = 16).collect().toSeq
    assert(auto === fixed)
  }

  test("adaptive CC: driver union-find and distributed star rounds label identically") {
    import spark.implicits._
    // chain ∪ clique ∪ singleton-pair: mixed shapes, min labels non-trivial
    val pairs = ((1L until 60L).map(i => (i, i + 1)) ++
      (for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)) ++
      Seq((500L, 400L))).toDF("doc_a", "doc_b")
    val driver = Dedup.clustersStar(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val distributed = Dedup.clustersStar(pairs, driverSolveMaxEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(driver === distributed)
    val m = driver.toMap
    assert((1L to 60L).forall(m(_) == 1L))
    assert((100L to 104L).forall(m(_) == 100L))
    assert(m(400L) === 400L && m(500L) === 400L)
    // the driver path releases its edge checkpoint — no NEW cached RDD
    // survives the call (set difference, not size: the async
    // ContextCleaner may concurrently drop OLDER entries)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.clustersStar(pairs).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"driver-path clustersStar leaked checkpoint RDDs: $leaked")
  }

  test("star CC equals propagation CC on a planted 1000-deep chain") {
    // chain n -> n+1 descending by id so min-label has to travel the whole
    // diameter — the worst case for propagation, the design case for
    // large/small-star; ids shuffled (×7919 mod) so the chain order is not
    // the id order
    val ids = (0 until 1000).map(i => (i.toLong * 7919L) % 1000003L)
    val chain = ids.zip(ids.tail).map { case (x, y) =>
      (math.min(x, y), math.max(x, y))
    }.toDF("doc_a", "doc_b")
    val star = operators.Dedup.clustersStar(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val prop = operators.Dedup.clusters(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(star.toSeq === prop.toSeq)
    // one component labeled with the global min id
    assert(star.map(_._2).distinct.toSeq === Seq(ids.min))
  }

  test("star CC equals propagation CC on a deterministic random multigraph") {
    // hash-derived edges over 300 nodes: multiple components, duplicate
    // and reversed pairs, self-pair noise filtered by the operators
    val edges = (0 until 600).map { i =>
      val a = (i * 131 + 17) % 300
      val b = (i * 31 + a * 7 + 5) % 300
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }.toDF("doc_a", "doc_b")
    val star = operators.Dedup.clustersStar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val prop = operators.Dedup.clusters(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(star.toSeq === prop.toSeq)
  }

  test("simhashNear's capBuckets guard stays dormant at oracle scale (gate and engine compute the same set)") {
    // the DuckDB oracle computes the EXACT all-pairs Hamming<=3 set with
    // no cap; banding is lossless at Hamming<=3 (pigeonhole over the 6
    // blocks), so equality holds iff no (band, band_key) bucket exceeds
    // maxBucket=1000 at the gate's scale factors — pin that here
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = graft.sources.Tables.documents(spark, s"/root/testdata/$sf")
      val maxBucket = Dedup.mankuBanded(docs)
        .groupBy("band", "band_key").count()
        .agg(max("count")).collect().head.getLong(0)
      assert(maxBucket <= 1000L,
        s"$sf: a Manku bucket holds $maxBucket docs — capBuckets would drop " +
          "it while the exact oracle keeps its pairs; mirror the cap in the " +
          "oracle SQL before shipping this corpus")
    }
  }

  test("cell-blocked embedding near-dup: non-seed near-dups co-locate and pair; cross-cell pairs never considered") {
    // two k-means seeds (vec 0 → dim-0 region, vec 1 → dim-1 region);
    // vecs 4 and 5 are near-dups of each other living in seed 0's region
    // (NEITHER is a seed — they must be found through shared-cell
    // blocking), vec 6 lives in seed 1's region
    def oneHotish(mainDim: Int, mainW: Float, sideDim: Int, sideW: Float) =
      Array.tabulate(64) {
        case d if d == mainDim => mainW
        case d if d == sideDim => sideW
        case _                 => 0f
      }
    val emb = Seq(
      (0L, oneHotish(0, 1f, 0, 1f)),       // seed, cell 0
      (1L, oneHotish(1, 1f, 1, 1f)),       // seed, cell 1
      (4L, oneHotish(0, 0.9f, 2, 0.1f)),   // near-dup A, cell 0
      (5L, oneHotish(0, 0.92f, 3, 0.08f)), // near-dup B, cell 0
      (6L, oneHotish(1, 0.9f, 4, 0.1f))    // cell 1
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(emb, threshold = 0.3, nCentroids = 2).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) -> r.getAs[Double]("cosine"))
      .toMap
    // within-cell pairs all clear the 0.3 threshold
    assert(out.keySet === Set((0L, 4L), (0L, 5L), (4L, 5L), (1L, 6L)))
    assert(out((4L, 5L)) > 0.98, "the non-seed near-dup pair must be found")
    // orthogonal cross-cell pairs (cosine 0) were never candidates — and
    // would have failed the threshold anyway; the assertion above pins
    // both exclusions at once
  }

  test("hot-span removal strips the shared boilerplate and keeps unique text in order") {
    import spark.implicits._
    // "legal header text here" is a 4-gram shared by docs 1..3 (df=3 = minDf);
    // each doc keeps its unique tail in original order. Doc 4 shares no span.
    val d = Seq(
      (1L, "en", "legal header text here alpha beta"),
      (2L, "en", "legal header text here gamma"),
      (3L, "de", "intro legal header text here delta"),
      (4L, "en", "totally unrelated words only"))
      .toDF("doc_id", "lang", "text")
    val out = Dedup.hotSpanRemoval(d, n = 4, minDf = 3L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") === "alpha beta")
    assert(out(1L).getAs[Long]("n_removed") === 4L)
    assert(out(2L).getAs[String]("clean_text") === "gamma")
    // doc 3: the hot gram starts at position 1; "intro" and "delta" survive
    assert(out(3L).getAs[String]("clean_text") === "intro delta")
    assert(out(4L).getAs[String]("clean_text") === "totally unrelated words only")
    assert(out(4L).getAs[Long]("n_removed") === 0L)
  }

  test("edit-verified dedup confirms true near-dups and rejects shingle-set accidents") {
    // 40 short tokens ≈ 151 chars — the whole doc sits inside the 200-char
    // verifier prefix, so the planted edits are visible to it
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // one-token substitution: LSH candidate AND tiny edit distance
    val near = (1 to 40).map(i => if (i == 40) "zz" else s"w$i").mkString(" ")
    // same shingle SET minus the seam, halves swapped: MinHash sees high
    // overlap but the verifier must reject it (edit distance blows the cap)
    val reordered = ((21 to 40) ++ (1 to 20)).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> near, 3L -> reordered, 4L -> other)
    // non-vacuity: the reordered doc IS an LSH candidate (the blocking
    // stage alone would pair it) — only the verifier tells them apart
    val cand = Dedup.minhashLsh(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(cand.contains((1L, 3L)), s"fixture drift: (1,3) not a candidate: $cand")
    val out = Dedup.editVerified(d).collect()
    val pairs = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)), s"true near-dup not confirmed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"reordered doc must fail edit verification: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val ed = out.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
      .get.getAs[Long]("edit_dist")
    // "w40" -> "zz" inside the prefix: at most 3 unit edits
    assert(ed > 0 && ed <= 3, s"edit_dist $ed")
  }

  test("cluster representatives: highest-quality copy kept, not the min id; singletons self-keep") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // docs 1 and 2 are near-dups; doc 1 (min id) ends in a stopword, doc 2
    // in a fresh token → doc 2 scores higher and must be the keeper
    val d = docs(
      1L -> s"$base the",
      2L -> s"$base zz",
      3L -> (100 to 140).map(i => s"v$i").mkString(" "))
    val out = Dedup.clusterRepresentatives(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Boolean]("kept")))).toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L, "near-dups share the min-id cluster label")
    assert(!out(1L)._2, "min-id doc must NOT be kept when a better copy exists")
    assert(out(2L)._2, "highest-quality copy is the representative")
    assert(out(3L) === ((3L, true)), "singleton keeps itself")
  }

  test("hot-span removal: overlapping hot grams cover shared positions once; full coverage empties the doc") {
    import spark.implicits._
    // Five-word doc repeated 3x: two overlapping hot 4-grams (starts 0 and 1)
    // cover ALL five positions -> n_kept = 0 and empty clean_text.
    val t = "a b c d e"
    val d = Seq((1L, "en", t), (2L, "en", t), (3L, "en", t))
      .toDF("doc_id", "lang", "text")
    val out = Dedup.hotSpanRemoval(d, n = 4, minDf = 3L).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") === 0L)
      assert(r.getAs[Long]("n_removed") === 5L)
      assert(r.getAs[String]("clean_text") === "")
    }
  }

  test("simhashNear banding is lossless vs the all-pairs Hamming scan") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val banded = Dedup.simhashNear(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming"))).toSet
    // brute force: every pair, no blocking — the block-combination join
    // must find the identical set (pigeonhole: d<=3 over 6 blocks => the
    // pair agrees exactly on some 3-block subset, one of the 20 tables)
    val sim = Dedup.simhash64(d)
    val a = sim.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = sim.select(col("doc_id").as("doc_b"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), expr("bit_count(sa ^ sb)").as("h"))
      .filter(col("h") <= 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("h"))).toSet
    assert(banded === brute)
    assert(banded.nonEmpty, "sf0.001 must contain at least one near-dup pair")
  }

  test("simhashNear 64-bit: planted pair within Hamming 3 is found, far pair is not") {
    import spark.implicits._
    // base doc vs one-token-changed near-dup: one token's 64 vote bits
    // flip at most; at 60 shared tokens the vote sums move by +-2 so only
    // bits whose margin was 0 or 1 can flip — empirically <= 3 here.
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = ((1 to 59).map(i => s"w$i") :+ "CHANGED").mkString(" ")
    val far = (1 to 60).map(i => s"zz$i").mkString(" ")
    val d = Seq((1L, "en", base), (2L, "en", near), (3L, "en", far))
      .toDF("doc_id", "lang", "text")
    val h12 = Dedup.simhash64(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ham = java.lang.Long.bitCount(h12(1L) ^ h12(2L))
    assert(ham <= 3, s"planted near-dup drifted to hamming $ham — adjust the plant")
    val pairs = Dedup.simhashNear(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)), "banded join must surface the planted near pair")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), "unrelated doc must not pair")
    // 64-bit sign bit must be exercised somewhere in a small corpus scan:
    // at least one of the three hashes should be negative (bit 63 set)
    // with overwhelming probability; if not, the plant still verified the
    // band math so only log it.
    assert(h12.values.toSet.size === 3, "three distinct docs -> three distinct hashes")
  }

  test("exactSubstringSpans: offset-shifted verbatim run found exactly; chunkDedup provably misses it") {
    import spark.implicits._
    val as = (1 to 100).map(i => s"a$i")
    val base = as.mkString(" ")                                   // doc 1: a1..a100
    val shifted = ((1 to 7).map(i => s"junk$i") ++ as.take(50)).mkString(" ") // doc 2: 7 junk + a1..a50
    val other = (1 to 60).map(i => s"z$i").mkString(" ")          // doc 3: unrelated
    val d = Seq((1L, "en", base), (2L, "en", shifted), (3L, "en", other))
      .toDF("doc_id", "lang", "text")
    val spans = Dedup.exactSubstringSpans(d, k = 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_tokens")))
    // the copied a1..a50 run sits at doc-2 positions 8..57: flagged gram
    // starts are 8..38, one island, span [8, 38+19] = [8, 57], 50 tokens
    assert(spans.toSeq === Seq((2L, 8L, 57L, 50L)),
      s"expected exactly the shifted span, got ${spans.mkString(",")}")
    // doc 1 (the first occurrence) keeps everything; doc 3 is untouched
    assert(!spans.exists(s => s._1 == 1L || s._1 == 3L))
    // C49 fixed 64-word chunks MISS this: doc 2's junk prefix shifts
    // every chunk boundary, so no chunk hash repeats
    val chunkKept = Dedup.chunkDedup(d, chunkSize = 64).collect()
    assert(chunkKept.forall(_.getAs[Boolean]("kept")),
      "fixed-boundary chunk dedup must fail to flag the offset duplicate " +
        "(that's the gap exactSubstringSpans closes)")
    // two disjoint copied runs stitch into TWO islands, not one: doc 4
    // copies a1..a25 and a60..a85 with a 10-token original gap between
    val twoRuns = (as.take(25) ++ (1 to 10).map(i => s"own$i") ++
      as.slice(59, 85)).mkString(" ")
    val d2 = Seq((1L, "en", base), (4L, "en", twoRuns)).toDF("doc_id", "lang", "text")
    val spans2 = Dedup.exactSubstringSpans(d2, k = 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end")))
    assert(spans2.toSeq === Seq((4L, 1L, 25L), (4L, 36L, 61L)),
      s"expected two disjoint islands, got ${spans2.mkString(",")}")
  }

  test("exactSubstring gram ids: the 120-bit dual key separates distinct grams " +
    "a single-prefix key conflates into a false verbatim span") {
    import spark.implicits._
    // Two DISTINCT 20-token grams whose md5 collides on the first hex
    // char but differs on the second, mined by brute force at 4-bit
    // width. A genuine 60-bit-prefix collision can't be mined, but the
    // key STRUCTURE under test is identical: gid_hi alone (the pre-r12
    // scheme, scaled down) vs the (gid_hi, gid_lo) production pair —
    // whatever the width, the single-prefix key merges colliding grams
    // and the dual key separates them.
    def gram(tag: String): String = (1 to 19).map(i => s"w$i").mkString(" ") + s" $tag"
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val g1 = gram("x0")
    val h1 = md5hex(g1)
    val g2 = (1 to 10000).iterator.map(n => gram(s"y$n"))
      .find { g => val h = md5hex(g); h(0) == h1(0) && h(1) != h1(1) }.get
    val d = Seq((1L, "en", g1), (2L, "en", g2)).toDF("doc_id", "lang", "text")
    // Narrow single-prefix key: the two distinct grams share an id, so
    // doc 2 is reported as containing a verbatim span it does NOT
    // contain — the false positive scrub would then CUT from clean text.
    val narrow = Dedup.exactSubstringSpansAt(d, 20, hexLen = 1, dualKey = false).collect()
    assert(narrow.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L),
      "fixture must reproduce the narrow-key false positive")
    // The dual key at the SAME tiny width separates them: no spans.
    assert(Dedup.exactSubstringSpansAt(d, 20, hexLen = 1, dualKey = true).collect().isEmpty,
      "dual key must separate the colliding grams")
    // And the production path still catches a genuine verbatim copy.
    val d2 = Seq((1L, "en", g1), (2L, "en", g2), (3L, "en", g1))
      .toDF("doc_id", "lang", "text")
    val spans = Dedup.exactSubstringSpans(d2, 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens")))
    assert(spans.toSeq === Seq((3L, 20L)))
  }

  test("exactSubstringRuns: per-source verbatim runs with exact alignment; " +
    "spans over-merge a two-source seam that runs keep attributed") {
    import spark.implicits._
    val as = (1 to 100).map(i => s"a$i")
    val base = as.mkString(" ")                                   // doc 1: a1..a100
    val shifted = ((1 to 7).map(i => s"junk$i") ++ as.take(50)).mkString(" ")
    val d = Seq((1L, "en", base), (2L, "en", shifted)).toDF("doc_id", "lang", "text")
    val runs = Dedup.exactSubstringRuns(d, k = 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("src_doc"), r.getAs[Long]("src_start")))
    // a1..a50 sits at doc-2 positions 8..57 and at doc-1 positions 1..50:
    // one run, exact boundaries AND exact source alignment
    assert(runs.toSeq === Seq((2L, 8L, 57L, 50L, 1L, 1L)),
      s"expected the attributed run, got ${runs.mkString(",")}")

    // Two-source seam: doc 3 = x11..x30 (from doc 1') ++ y1..y20 (from doc 2').
    // Window starts 1 and 21 are each duplicated — from DIFFERENT sources.
    // C82 spans stitch them into ONE [1,40] span (q=21 <= p+k=21) though the
    // 40-token interval appears verbatim nowhere; runs keep two attributed
    // 20-token rows, each a true verbatim match.
    val xs = (1 to 30).map(i => s"x$i")
    val ys = (1 to 30).map(i => s"y$i")
    val seam = (xs.drop(10) ++ ys.take(20)).mkString(" ")
    val d2 = Seq((1L, "en", xs.mkString(" ")), (2L, "en", ys.mkString(" ")),
      (3L, "en", seam)).toDF("doc_id", "lang", "text")
    val spans = Dedup.exactSubstringSpans(d2, k = 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))
    assert(spans.toSeq === Seq((3L, 1L, 40L)),
      s"C82 is expected to over-merge the seam into one span, got ${spans.mkString(",")}")
    val runs2 = Dedup.exactSubstringRuns(d2, k = 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("src_doc"), r.getAs[Long]("src_start")))
    assert(runs2.toSeq === Seq((3L, 1L, 20L, 20L, 1L, 11L), (3L, 21L, 40L, 20L, 2L, 1L)),
      s"expected two attributed verbatim runs, got ${runs2.mkString(",")}")
  }

  test("exactSubstringScrub cuts spans out, keeps clean docs verbatim, " +
    "and empties a fully-duplicated doc") {
    import spark.implicits._
    val as = (1 to 100).map(i => s"a$i")
    val base = as.mkString(" ")
    val junk = (1 to 7).map(i => s"junk$i")
    val shifted = (junk ++ as.take(50)).mkString(" ")
    val sub = as.take(30).mkString(" ") // fully inside doc 1
    val d = Seq((1L, "en", base), (2L, "en", shifted), (3L, "en", sub))
      .toDF("doc_id", "lang", "text")
    val out = Dedup.exactSubstringScrub(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens_before"),
          r.getAs[Long]("n_removed")))).toMap
    assert(out(1L) === ((base, 100L, 0L)), "first occurrence is untouched")
    assert(out(2L) === ((junk.mkString(" "), 57L, 50L)),
      s"span [8,57] must be cut, got ${out(2L)}")
    assert(out(3L) === (("", 30L, 30L)), "fully-duplicated doc scrubs to empty")
  }

  test("substring runs and spans cover identical positions on real data " +
    "(finer attribution, same flagged set)") {
    // Both operators flag the same gram starts (first occurrence is the
    // lexicographic-min doc either way) and both report intervals equal
    // to the union of their flagged k-windows — runs just group the
    // windows per (source, diagonal). So per doc, covered positions must
    // match EXACTLY; runs may only split intervals, never shrink or grow
    // coverage.
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def covered(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getAs[Long]("doc_id")).map { case (d, rs) =>
        d -> rs.flatMap(r =>
          r.getAs[Long]("span_start") to r.getAs[Long]("span_end")).toSet
      }
    val spanCov = covered(Dedup.exactSubstringSpans(docs).collect())
    val runRows = Dedup.exactSubstringRuns(docs).collect()
    val runCov = covered(runRows)
    assert(spanCov.nonEmpty, "fixture must contain cross-doc duplication")
    assert(runCov === spanCov)
    // and every run is genuinely attributed: a positive-length source
    // window inside the claimed source doc
    val lens = docs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").length.toLong).toMap
    runRows.foreach { r =>
      val src = r.getAs[Long]("src_doc")
      val s0 = r.getAs[Long]("src_start")
      val n = r.getAs[Long]("n_tokens")
      assert(s0 >= 1L && s0 + n - 1 <= lens(src),
        s"run claims source window [$s0, ${s0 + n - 1}] outside doc $src of ${lens(src)} tokens")
    }
  }

  test("ngramContainment flags a doc fully quoted inside a longer one") {
    val short = (1 to 30).map(i => s"tok$i").mkString(" ")
    val long = short + " " + (100 to 200).map(i => s"pad$i").mkString(" ")
    val other = (300 to 400).map(i => s"q$i").mkString(" ")
    val out = Dedup.ngramContainment(docs(1L -> short, 2L -> long, 3L -> other)).collect()
    val r = out.find(x => x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L)
    assert(r.isDefined, s"containment pair (1,2) missing: ${out.mkString(",")}")
    assert(r.get.getAs[Double]("containment_a") >= 0.99)
    assert(r.get.getAs[Double]("containment_b") < 0.5)
    assert(!out.exists(x => x.getAs[Long]("doc_b") == 3L))
  }

  test("chunkDupStats: planted verbatim chunks drive the dup rate") {
    import spark.implicits._
    // two docs sharing the identical single 64-word chunk + one unique
    def words(tag: String) = (1 to 64).map(i => s"$tag$i").mkString(" ")
    val d = Seq((1L, "en", words("a")), (2L, "en", words("a")), (3L, "en", words("z")))
      .toDF("doc_id", "lang", "text")
    val r = Dedup.chunkDupStats(d).head()
    assert(r.getAs[Long]("total_chunks") === 3L)
    assert(r.getAs[Long]("distinct_chunks") === 2L)
    assert(math.abs(r.getAs[Double]("dup_chunk_rate") - 1.0 / 3.0) < 1e-12)
  }

  test("shingleDfHistogram: buckets partition shingles, occurrences reconcile") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val out = Dedup.shingleDfHistogram(d).collect()
    val totalShingles = Dedup.shingles(d)
      .select(col("shingle")).distinct().count()
    assert(out.map(_.getAs[Long]("n_shingles")).sum === totalShingles)
    val totalOcc = Dedup.shingles(d).count()
    assert(out.map(_.getAs[Long]("total_occurrences")).sum === totalOcc)
  }

  test("clusterSizeHistogram: cluster docs reconcile with the CC output") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val out = Dedup.clusterSizeHistogram(d).collect()
    val cc = Dedup.clustersStar(Dedup.minhashLsh(d).select("doc_a", "doc_b"))
    assert(out.map(_.getAs[Long]("n_docs")).sum === cc.count())
    assert(out.map(_.getAs[Long]("n_clusters")).sum ===
      cc.select("cluster_id").distinct().count())
    // every clustered component has >= 2 members (singletons never enter
    // the pair graph), so bucket 0 (size 1) must be absent
    assert(!out.exists(_.getAs[Long]("bucket") == 0L))
  }
}
