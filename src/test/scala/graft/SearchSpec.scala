package graft

import graft.operators.{Search, Similarity}
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("BPE merge counting: token-frequency-weighted pair counts, deterministic order") {
    val d = Seq(
      (1L, "abab ab"),   // 'ab' freq 1 + 'abab' freq 1
      (2L, "abab cd x")) // 'abab' again -> freq 2; 'x' too short, dropped
      .toDF("doc_id", "text")
    val out = graft.operators.Search.bpeTopMerges(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("pair_freq")).toMap
    // 'abab' (freq 2) contributes a-b x2, b-a x1 per occurrence;
    // 'ab' (freq 1) contributes a-b x1; 'cd' (freq 1) c-d x1
    assert(out(("a", "b")) === 2L * 2 + 1L)
    assert(out(("b", "a")) === 2L)
    assert(out(("c", "d")) === 1L)
    assert(!out.keySet.exists(p => p._1 == "x" || p._2 == "x"))
  }

  private lazy val docs = Seq(
    (0L, "rare apple apple common common common", "en", "s", 6L),
    (1L, "common common common common banana common", "en", "s", 6L),
    (2L, "common plum common plum orange orange", "en", "s", 6L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tf-idf golden ranking: score = tf·N/df, ties by term") {
    // hand-computed with N=3: doc0 apple 2·3/1=6 > {common 3·3/3, rare 1·3/1}=3
    // (tie → term asc); doc1 common 5·3/3=5 > banana 3; doc2 orange=plum=6
    // (tie → orange first) > common 2
    val got = Search.tfidfTopTerms(docs, k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Double]("score"), r.getAs[Int]("rnk")))
    val want = Seq(
      (0L, "apple", 6.0, 1), (0L, "common", 3.0, 2), (0L, "rare", 3.0, 3),
      (1L, "common", 5.0, 1), (1L, "banana", 3.0, 2),
      (2L, "orange", 6.0, 1), (2L, "plum", 6.0, 2), (2L, "common", 2.0, 3))
    assert(got.toSeq === want)
  }

  test("bm25 ranks the doc matching a rarer query term first, scores positive") {
    val out = Search.bm25Search(docs, query = Seq("apple", "common"), topK = 10).collect()
    assert(out.nonEmpty)
    // doc 0 matches both terms incl. the rare 'apple' → top rank
    assert(out.head.getAs[Long]("doc_id") === 0L)
    assert(out.head.getAs[Long]("n_terms_hit") === 2L)
    out.foreach(r => assert(r.getAs[Double]("score") > 0.0))
  }

  test("bigram LM conditional probabilities sum to 1 per left word") {
    val lm = Search.bigramLm(docs, topK = 1000)
    val sums = lm.groupBy("w1")
      .agg(sum(col("c_bigram").cast("double") / col("c_w1").cast("double")).as("s"))
      .collect().map(_.getAs[Double]("s"))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("Kneser-Ney bigram LM matches the hand-computed model bit-for-bit " +
      "and its full-vocabulary conditionals sum to 1") {
    // hand model from the same whitespace bigrams
    val bigrams = docs.select("doc_id", "text").collect().flatMap { r =>
      val t = r.getString(1).split(" ")
      t.zip(t.tail)
    }
    val c = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cW1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1pW1 = c.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1pW2 = c.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nB = c.size.toLong
    def pkn(w1: String, w2: String): Double = {
      val cc = c.getOrElse((w1, w2), 0L)
      (math.max(4 * cc - 3, 0) * nB + 3 * n1pW1(w1) * n1pW2(w2)).toDouble /
        (4 * cW1(w1) * nB).toDouble
    }
    val got = Search.bigramKnLm(docs, topK = 1000).collect()
    assert(got.length === nB.toInt)
    got.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("c_bigram") === c((w1, w2)))
      assert(r.getAs[Long]("c_w1") === cW1(w1))
      assert(r.getAs[Long]("n1p_w1") === n1pW1(w1))
      assert(r.getAs[Long]("n1p_w2") === n1pW2(w2))
      assert(r.getAs[Double]("p_kn") === pkn(w1, w2)) // exact, not approx
    }
    // interpolated KN is a proper distribution: summing P_KN(w2|w1) over
    // the whole continuation vocabulary (seen AND unseen pairs) gives 1
    val vocab2 = n1pW2.keys.toSeq
    cW1.keys.foreach { w1 =>
      val s = vocab2.map(pkn(w1, _)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"sum for '$w1' was $s")
    }
  }

  test("normalize strips exactly the stopword tokens and keeps order") {
    val in = Seq((7L, "The quick the fox of a it jumps", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Search.normalize(in).head()
    assert(r.getAs[String]("clean_text") === "quick fox jumps")
    assert(r.getAs[Long]("n_stopwords_removed") === 5L)
    assert(r.getAs[Long]("n_tokens_kept") === 3L)
  }

  test("range search returns exactly the brute-force pairs clearing the threshold") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val tau = 0.3
    val range = Similarity.rangeSearch(emb, minCosine = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(emb, k = Int.MaxValue).collect()
      .filter(_.getAs[Double]("cosine") >= tau)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(range.nonEmpty)
    assert(range === brute)
  }

  test("label centroids are the exact per-dimension means") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f), 1),
      (1L, Array(3.0f, 6.0f), 1),
      (2L, Array(5.0f, 5.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out((1, 0L)) === ((2L, 2.0)))
    assert(out((1, 1L)) === ((2L, 4.0)))
    assert(out((2, 0L)) === ((1L, 5.0)))
    assert(out((2, 1L)) === ((1L, 5.0)))
  }

  test("indexed BM25 is bit-identical to the direct scan, with term pushdown") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    Search.buildIndex(docs, idx)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_hit"), r.getAs[Double]("score")))
      .toSeq
    // default query: identical ranked rows, scores bit-equal
    val direct = rows(Search.bm25Search(docs))
    val indexed = rows(Search.searchIndexed(spark, idx))
    assert(indexed === direct)
    // a different query against the SAME index (no rebuild) also agrees
    val q2 = Seq("data", "user", "event")
    assert(rows(Search.searchIndexed(spark, idx, q2)) ===
      rows(Search.bm25Search(docs, q2)))
    // the term predicate reaches the clustered postings scan
    val plan = Search.searchIndexed(spark, idx).queryExecution.sparkPlan
    val postingsScan = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata("Location").contains("postings") => s
    }
    assert(postingsScan.nonEmpty)
    assert(postingsScan.head.metadata("PushedFilters").contains("In(term"),
      postingsScan.head.metadata("PushedFilters"))
  }

  test("tokenPmi ranks a collocation above frequent-but-independent pairs") {
    import spark.implicits._
    // "new york" always adjacent; "the" frequent everywhere → PMI(new,york)
    // high, PMI(the, *) near zero
    val d = (1 to 20).map { i =>
      (i.toLong, s"the a$i new york the b$i the c$i new york the d$i")
    }.toDF("doc_id", "text")
    val out = graft.operators.Search.tokenPmi(d, topK = 10, minCount = 5).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("w1") === "new" && top.getAs[String]("w2") === "york", top.toString)
    assert(top.getAs[Double]("pmi") > 1.0)
    // graft_lni: the SQL-registered expression must equal the Scala twin
    // bit-for-bit and sit within 1 ulp of true ln (faithful rounding)
    val ln3 = spark.sql("SELECT graft_lni(CAST(3 AS BIGINT)) AS v").collect().head.getDouble(0)
    assert(ln3 === graft.functions.LnIntImpl.ln(3L))
    assert(math.abs(ln3 - math.log(3.0)) <= math.ulp(math.log(3.0)))
    // the divergence that motivated it: Math.log(9170) != libm; graft_lni
    // is deterministic by construction, so just pin faithful rounding
    val ln9170 = graft.functions.LnIntImpl.ln(9170L)
    assert(math.abs(ln9170 - math.log(9170.0)) <= math.ulp(math.log(9170.0)))
  }

  test("unigram-LM golden: dominant word becomes one piece, OOV word segments via UNK singles") {
    val d = Seq(
      (1L, "abcd abcd abcd", "en", "s", 12L),
      (2L, "abcd ab cd", "en", "s", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Search.unigramLearn(d)
    assert(m.maxPieceLen === 4)
    // inventory: all singles survive with their final EM counts; "abcd"
    // is the Viterbi segmentation of the dominant word, so it carries
    // its frequency after EM
    val pieces = Search.unigramPieces(spark, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("a", "b", "c", "d").subsetOf(pieces.keySet))
    assert(pieces("abcd") === 4L) // 4 occurrences of word "abcd"
    assert(pieces("ab") === 1L && pieces("cd") === 1L)
    // model total = Σcounts + |inventory| (add-1 smoothing mass)
    assert(m.total === pieces.values.sum + pieces.size)
    val enc = Search.unigramEncode(d, m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(enc(1L) === ((3L, 12L, 3L))) // three words, one piece each
    assert(enc(2L) === ((3L, 8L, 3L)))
    // OOV: 'z' was never seen — every code point still segments through
    // the smoothed single-cp UNK path, one piece per cp
    val oov = Seq((9L, "zzzzz", "xx", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val encOov = Search.unigramEncode(oov, m).collect().head
    assert(encOov.getLong(3) === 5L, "OOV word must segment cp-by-cp")
    val fert = Search.unigramFertility(d, m).collect()
    assert(fert.length === 1 && fert.head.getAs[String]("lang") === "en")
    assert(fert.head.getAs[Long]("n_words") === 6L)
    assert(fert.head.getAs[Long]("n_pieces") === 6L)
    assert(fert.head.getAs[Double]("single_frac") === 1.0)
  }

  test("unigram-LM: maxPieceLen threads from training into encode (no hardcoded window)") {
    // trained with maxPieceLen=6 the 6-cp word is a single piece; a
    // hardcoded 4-cp encode window could never reproduce it
    val d = Seq((1L, "abcdef abcdef", "en", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m6 = Search.unigramLearn(d, maxPieceLen = 6)
    assert(m6.maxPieceLen === 6)
    assert(Search.unigramEncode(d, m6).collect().head.getLong(3) === 2L)
    // and a maxPieceLen=2 model can only tile 2-cp pieces
    val m2 = Search.unigramLearn(d, maxPieceLen = 2)
    assert(Search.unigramEncode(d, m2).collect().head.getLong(3) === 6L)
  }

  test("unigram-LM: multi-byte code points count as single symbols end-to-end") {
    // é is 2 UTF-8 bytes / 1 UTF-16 unit; 👍 is a supplementary cp
    // (2 UTF-16 units) — both must count as ONE char and ONE seed symbol
    val d = Seq(
      (1L, "héé héé", "fr", "s", 6L),
      (2L, "👍x 👍x 👍x", "xx", "s", 6L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Search.unigramLearn(d)
    val pieces = Search.unigramPieces(spark, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pieces.contains("é") && pieces.contains("👍"))
    assert(pieces("héé") === 2L && pieces("👍x") === 3L)
    val enc = Search.unigramEncode(d, m).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(enc(1L) === ((6L, 2L))) // 3 cps per word, one piece per word
    assert(enc(2L) === ((6L, 3L)))
  }

  test("lmPplBuckets: tiles partition each language, sizes within 1, ranges ordered") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = Search.lmPplBuckets(docs).collect()
    val perLang = out.groupBy(_.getAs[String]("lang"))
    assert(perLang.nonEmpty)
    val scoredPerLang = Search.lmScore(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    perLang.foreach { case (lang, rows) =>
      val byBucket = rows.sortBy(_.getAs[Int]("bucket"))
      assert(byBucket.map(_.getAs[Int]("bucket")).toSeq === (1 to byBucket.length))
      // tiles partition the scored docs of the language
      assert(byBucket.map(_.getAs[Long]("n_docs")).sum === scoredPerLang(lang))
      // ntile balance: sizes differ by at most one, never increasing
      val sizes = byBucket.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1L && sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
      // head scores dominate the tail: bucket b's min >= bucket b+1's max
      byBucket.zip(byBucket.tail).foreach { case (hi, lo) =>
        assert(hi.getAs[Double]("min_lik") >= lo.getAs[Double]("max_lik"),
          s"$lang: bucket ranges out of order")
      }
    }
  }
}
