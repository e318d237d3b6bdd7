package graft

import graft.operators.{Dedup, Search, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Wave-7 retrieval-composition operators: RRF hybrid fusion, MMR
  * diversity re-rank, trained-IVF recall, and embedding center+norm. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("rrfFusion: contiguous fused ranks over the candidate union; exact RRF arithmetic") {
    val fused = Search.rrfFusion(docs, emb).collect()
    val n = fused.length
    assert(n >= 20 && n <= 40, s"candidate union of two top-20 lists, got $n")
    assert(fused.map(_.getInt(4)).toSeq == (1 to n), "fused_rank must be 1..n in order")
    // every row carries at least one modality rank, and the score is the
    // literal RRF formula of whatever ranks are present
    fused.foreach { r =>
      val rl = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rd = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rl.isDefined || rd.isDefined)
      val expected = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rd.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(3) == expected, s"row $r")
    }
    // a doc ranked by BOTH modalities outscores any doc seen by one
    // modality at an equal-or-worse best rank
    val both = fused.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    if (both.nonEmpty) {
      val b = both.minBy(r => math.min(r.getInt(1), r.getInt(2)))
      val bBest = math.min(b.getInt(1), b.getInt(2))
      fused.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
        .filter(r => (if (r.isNullAt(1)) r.getInt(2) else r.getInt(1)) >= bBest)
        .foreach(r => assert(b.getDouble(3) > r.getDouble(3)))
    }
  }

  test("mmrRerank: per-query first pick is the relevance argmax; selections distinct") {
    val cands = Similarity.bruteForceTopK(emb, nQueries = 4, k = 20)
      .select(col("query_id"), col("neighbor_id"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val out = Similarity.mmrRerank(emb).collect()
    assert(out.length == 40, "10 selections × 4 queries")
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 10))
      val picked = rows.sortBy(_.getInt(2)).map(_.getLong(1))
      assert(picked.distinct.length == 10)
      assert(picked.toSet.subsetOf(cands(q).map(_._2).toSet))
      val bestRel = cands(q).maxBy(c => (c._3, -c._2))
      assert(picked.head == bestRel._2, s"q$q rank-1 must be the pure-relevance argmax")
      val first = rows.minBy(_.getInt(2))
      assert(first.getDouble(4) == 0.7 * bestRel._3)
    }
  }

  test("mmrRerank demotes an exact duplicate of an already-selected result") {
    // Query q = [1,.5,.5,0...]; vecs 1 and 2 are IDENTICAL with
    // cos(q)=0.866; vec 3 has the SAME relevance 0.866 but only 0.5
    // similarity to the dup pair. Pure relevance ranks (1,2) adjacently;
    // MMR must interleave 3 between them: after picking 1, score(2) =
    // 0.7·0.866 − 0.3·1.0 ≈ 0.31 < score(3) = 0.7·0.866 − 0.3·0.5 ≈ 0.46.
    def v(xs: Double*): Array[Float] = xs.toArray.map(_.toFloat).padTo(8, 0f)
    val rows = Seq(
      0L -> v(1, 0.5, 0.5), // the query vector
      1L -> v(1, 1, 0),
      2L -> v(1, 1, 0),
      3L -> v(1, 0, 1),
      4L -> v(0, 0, 0, 1),
      5L -> v(0, 0, 0, 0, 1),
      6L -> v(0, 0, 0, 0, 0, 1),
      7L -> v(0, 0, 0, 0, 0, 0, 1))
    val e = rows.toDF("vec_id", "embedding")
    val picked = Similarity.mmrRerank(e, nQueries = 1, k = 4, nSelect = 3)
      .collect().map(_.getLong(1)).toSeq
    assert(picked.take(2) == Seq(1L, 3L),
      s"MMR should break up the duplicate pair, got $picked")
  }

  test("ivfTrainedRecall: one row per query, recall in [0,1], consistent with recallAtK") {
    val out = Similarity.ivfTrainedRecall(emb).collect()
    assert(out.length == 8)
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(2) == r.getLong(1).toDouble / 10.0)
    }
  }

  test("knnGraph: ≤k neighbors per source, no self-edges, within-cell exactness") {
    val g = Similarity.knnGraph(emb, k = 5).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "no self edges")
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 5)
    }
    val bySrc = g.groupBy(_.getLong(0))
    bySrc.foreach { case (src, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to rows.length), s"ranks for $src must be dense: $ranks")
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        s"cosines for $src must be non-increasing")
    }
    // a planted identical pair must be mutual rank-1 neighbors (identical
    // vectors always share a cell: same argmax over the same centroids)
    val dup = (0 until 40).map { i =>
      val arr =
        if (i == 7 || i == 23) Array.tabulate(64)(d => (d + 1).toFloat)
        else Array.tabulate(64)(d => ((d * 31 + i * 17) % 13 - 6).toFloat + (if (d == 0) i else 0))
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
    val gd = Similarity.knnGraph(dup, k = 3).collect()
      .map(r => ((r.getLong(0), r.getInt(3)), r.getLong(1))).toMap
    assert(gd.get((7L, 1)).contains(23L) && gd.get((23L, 1)).contains(7L))
  }

  test("chunkDedup keeps only the first corpus-wide occurrence of a repeated chunk") {
    // doc 0 and doc 2 share an identical 64-word block (doc 2's SECOND
    // chunk); doc 1 is unrelated
    val block = (0 until 64).map(i => s"w$i").mkString(" ")
    val other = (0 until 64).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (0L, block, "en", "a", 1L),
      (1L, (0 until 30).map(i => s"y$i").mkString(" "), "en", "a", 1L),
      (2L, other + " " + block, "en", "a", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.chunkDedup(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getBoolean(4)))).toMap
    assert(out((0L, 0L)) == ((2L, true)), "doc 0 chunk 0 is the first copy")
    assert(out((2L, 1L)) == ((2L, false)), "doc 2's repeat of the block is dropped")
    assert(out((1L, 0L)) == ((1L, true)) && out((2L, 0L)) == ((1L, true)))
  }

  test("minhashEval: exact jaccard in [0,1], abs_err consistent, near-dups score high") {
    val out = graft.operators.Dedup.minhashEval(docs).collect()
    assert(out.nonEmpty, "sf0.001 corpus should produce LSH candidates")
    out.foreach { r =>
      val (est, ex, err) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(ex >= 0.0 && ex <= 1.0)
      assert(err == math.abs(est - ex))
    }
  }

  test("matryoshkaRecall: valid recall rows; longer prefixes never hurt aggregate recall") {
    val r16 = Similarity.matryoshkaRecall(emb, dims = 16).collect()
    val r48 = Similarity.matryoshkaRecall(emb, dims = 48).collect()
    assert(r16.length == 8 && r48.length == 8)
    (r16 ++ r48).foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(2) == r.getLong(1).toDouble / 10.0)
    }
    val sum16 = r16.map(_.getLong(1)).sum
    val sum48 = r48.map(_.getLong(1)).sum
    assert(sum48 >= sum16,
      s"48-dim prefix aggregate recall $sum48 must be >= 16-dim $sum16")
    val full = Similarity.matryoshkaRecall(emb, dims = 64).collect()
    assert(full.forall(_.getDouble(2) == 1.0), "64-dim prefix is the identity")
  }

  test("ngramNovelty: exact duplicate of an earlier doc scores 0, fresh doc scores 1") {
    val a = (0 until 40).map(i => s"a$i").mkString(" ")
    val b = (0 until 40).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (10L, a, "en", "s", 1L), // first copy: all shingles novel
      (20L, a, "en", "s", 1L), // exact duplicate, later id: nothing novel
      (30L, b, "en", "s", 1L)  // disjoint: all novel
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.ngramNovelty(d).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(10L) == 1.0 && out(30L) == 1.0)
    assert(out(20L) == 0.0)
  }

  test("contrastivePairs: planted duplicate becomes the positive, negative is dissimilar") {
    val out = Similarity.contrastivePairs(emb).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (anchor, pos, posCos, neg, negCos) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(pos != anchor && neg != anchor && pos != neg)
      assert(posCos >= 0.3)
      assert(negCos <= posCos, s"negative must be the far end: $r")
    }
    // two tight clusters; 7 and 23 are EXACT duplicates inside cluster A,
    // whose other members are near-identical variants — so the dup pair
    // shares a cell with distinct negatives and must pick each other as
    // the positive
    val dup = (0 until 64).map { i =>
      val cluster = if (i < 32) 1f else -1f
      val j = if (i == 23) 7 else i // 23 clones 7's noise → exact dup
      val arr = Array.tabulate(64)(d =>
        cluster * (d + 1).toFloat + 0.01f * ((j * 13 + d * 7) % 101))
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
    val m = Similarity.contrastivePairs(dup, nCentroids = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m.get(7L).contains(23L) && m.get(23L).contains(7L),
      s"exact duplicates must be mutual positives, got ${m.get(7L)}/${m.get(23L)}")
  }

  test("BPE learn+encode golden: hand-computed merges and fertilities") {
    val d = Seq(
      (1L, "abab ab abab", "en", "s", 1L),
      (2L, "ab ba", "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // round 1: (a,b) weight 6 beats (b,a) 3 → merge "ab";
    // round 2: (ab,ab) weight 2 beats (b,a) 1 → merge "abab"
    val merges = Search.bpeLearn(d, nMerges = 2)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    val out = Search.bpeEncode(d, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // doc 1: abab|ab|abab → 1+1+1 tokens over 3 words
    assert(out(1L) == ((3L, 10L, 3L, 1.0)))
    // doc 2: ab → 1 token, ba → 2 tokens ((b,a) never merged at nMerges=2)
    assert(out(2L) == ((2L, 4L, 3L, 1.5)))
    // learning to exhaustion merges (b,a) too and everything collapses
    val all = Search.bpeLearn(d, nMerges = 10)
    assert(all == Seq(("a", "b"), ("ab", "ab"), ("b", "a")))
    val out2 = Search.bpeEncode(d, all).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out2(2L) == 2L, "ba collapses to one token once (b,a) is learned")
  }

  test("budgetSelect: selected prefix maximal under the token budget, quality-ordered") {
    val out = graft.operators.Corpus.budgetSelect(docs, tokenBudget = 2000L).collect()
    assert(out.nonEmpty)
    val sel = out.filter(_.getBoolean(4))
    val unsel = out.filterNot(_.getBoolean(4))
    assert(sel.nonEmpty && unsel.nonEmpty, "budget should bite at sf0.001")
    // the selected set is exactly the ranked prefix: every selected row
    // precedes every unselected row in output order
    val flags = out.map(_.getBoolean(4))
    assert(flags.mkString.matches("true*(truefalse|false)?.*") || flags.dropWhile(identity).forall(!_))
    assert(flags.dropWhile(identity).forall(!_), "selection must be a prefix")
    // budget maximality: selected total <= budget < selected total + first cut doc
    val selTok = sel.map(_.getLong(2)).sum
    assert(selTok <= 2000L)
    assert(selTok + unsel.head.getLong(2) > 2000L, "first cut doc must overflow the budget")
    // cum_tokens is the running sum of n_tokens in order
    assert(out.map(_.getLong(2)).scanLeft(0L)(_ + _).tail.sameElements(out.map(_.getLong(3))))
  }

  test("budgetSelectPerLang: each language keeps an independent maximal prefix") {
    val out = graft.operators.Corpus.budgetSelectPerLang(docs, tokenBudget = 1500L).collect()
    val byLang = out.groupBy(_.getString(0))
    assert(byLang.size >= 2, "sf0.001 should have multiple languages")
    byLang.foreach { case (lang, rows) =>
      val flags = rows.map(_.getBoolean(5))
      assert(flags.dropWhile(identity).forall(!_), s"$lang selection must be a prefix")
      val sel = rows.filter(_.getBoolean(5))
      if (sel.nonEmpty) assert(sel.map(_.getLong(3)).sum <= 1500L, s"$lang over budget")
      // per-lang cumulative restarts at the language boundary
      assert(rows.map(_.getLong(3)).scanLeft(0L)(_ + _).tail
        .sameElements(rows.map(_.getLong(4))), s"$lang cum must restart")
    }
  }

  test("dimStats: one row per dim, variance non-negative, dead dim detected") {
    val out = Similarity.dimStats(emb).collect()
    assert(out.length == 64)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) >= -1e-9, s"variance negative: $r")
      assert(r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5),
        "mean must sit within [min, max]")
    }
    // a planted constant dimension reports ~zero variance
    val dead = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(d => if (d == 3) 2.5f else (i * 7 + d).toFloat % 5)))
      .toDF("vec_id", "embedding")
    val ds = Similarity.dimStats(dead).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(ds(3L)) < 1e-12, s"dead dim variance ${ds(3L)}")
    assert(ds.filterKeys(_ != 3L).values.exists(_ > 0.1))
  }

  test("whiten: ~unit variance and ~zero mean per dimension afterwards") {
    val out = Similarity.whiten(emb)
    val post = out.groupBy("pos").agg(
      avg("y").as("m"),
      (sum(col("y") * col("y")) / count(lit(1))).as("msq")).collect()
    post.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-7, s"post-whiten mean ${r.getDouble(1)}")
      val v = r.getDouble(2) - r.getDouble(1) * r.getDouble(1)
      assert(v > 0.9 && v < 1.1, s"post-whiten variance $v (eps shifts it slightly)")
    }
  }

  test("centerNormalize: unit output norms and ~zero centered means") {
    val out = Similarity.centerNormalize(emb)
    val norms = out.groupBy("vec_id").agg(sum(col("y") * col("y")).as("ss")).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, s"norm² ${r.getDouble(1)}"))
    // centering: per-dimension mean of (y·nrm) is 0 up to float rounding;
    // check on y directly with a loose bound (norms vary per vector)
    val dimMeans = out.groupBy("pos").agg(avg("y").as("m")).collect()
    dimMeans.foreach(r => assert(math.abs(r.getDouble(1)) < 0.05, s"dim ${r.get(0)} mean ${r.getDouble(1)}"))
  }
}
