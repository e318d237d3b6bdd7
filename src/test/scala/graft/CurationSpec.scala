package graft

import graft.operators.{Corpus, Search}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Specs for the round-5 curation operators: RAG chunking, sequence
  * packing, mixture sampling, curriculum staging, LM doc scoring. */
class CurationSpec extends SparkSpec {

  test("chunking covers every token exactly once modulo the declared overlap") {
    import spark.implicits._
    val doc = (1 to 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc, "en")).toDF("doc_id", "text", "lang")
    val chunks = Corpus.chunkDocuments(df, chunkSize = 64, overlap = 16).collect()
    // 150 tokens, step 48 -> starts 0,48,96,144 -> 4 chunks
    assert(chunks.length === 4)
    val texts = chunks.sortBy(_.getAs[Int]("chunk_id")).map(_.getAs[String]("chunk_text"))
    // chunk i's trailing 16 tokens == chunk i+1's leading 16 tokens (full chunks)
    val t0 = texts(0).split(" ")
    val t1 = texts(1).split(" ")
    assert(t0.length === 64 && t1.length === 64)
    assert(t0.takeRight(16).toSeq === t1.take(16).toSeq)
    // last chunk is the tail: starts at 144, holds tokens 145..150
    assert(texts(3) === (145 to 150).map(i => s"w$i").mkString(" "))
    assert(chunks.map(_.getAs[Long]("n_tokens")).sum === 64 + 64 + 54 + 6)
    // a doc shorter than one window still yields exactly one chunk
    val tiny = Corpus.chunkDocuments(
      Seq((2L, "a b c", "en")).toDF("doc_id", "text", "lang")).collect()
    assert(tiny.length === 1 && tiny.head.getAs[String]("chunk_text") === "a b c")
  }

  test("sequence packing: offsets stay under budget and cumsum reconstructs bins") {
    val out = Corpus.sequencePacking(Tables.documents(spark, sfDir)).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("bin_offset") >= 0 &&
      r.getAs[Long]("bin_offset") < 2048))
    // within each (lang, shard), replay the packing sequentially
    out.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"))).foreach {
      case (_, rows) =>
        var cum = 0L
        rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          assert(r.getAs[Long]("bin") === cum / 2048)
          assert(r.getAs[Long]("bin_offset") === cum % 2048)
          cum += r.getAs[Long]("n_tokens")
        }
    }
  }

  test("mixture sampling keeps every doc of the binding language, rates <= 1") {
    import spark.implicits._
    // en is 8x the others but targets only 0.4 of the mix -> some non-en
    // language binds (n/w smallest) and must be kept in full
    val docs = (1L to 80L).map(i => (i, s"t $i", "en", "s")) ++
      Seq((81L, "x a", "de", "s"), (82L, "x b", "de", "s"),
        (83L, "x c", "fr", "s"))
    val df = docs.toDF("doc_id", "text", "lang", "source")
    val out = Corpus.mixtureSample(df).collect()
    // fr: n=1, w=0.15 -> cap 6.67 (binding); fr admits at rate 1.0
    assert(out.count(_.getAs[String]("lang") === "fr") === 1)
    // en rate = 0.4*6.67/80 = 0.033 -> en admits far fewer than 80
    assert(out.count(_.getAs[String]("lang") === "en") < 20)
    // deterministic: same input, same admitted set
    val again = Corpus.mixtureSample(df).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet ===
      again.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("curriculum stages are balanced, ordered, and internally consistent") {
    val rows = Corpus.qualityCurriculum(Tables.documents(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, stages) =>
      val byStage = stages.sortBy(_.getAs[Int]("stage"))
      assert(byStage.map(_.getAs[Int]("stage")).toSeq === (1 to byStage.length))
      // ntile balance: group sizes differ by at most 1
      val sizes = byStage.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1)
      // quality ranges are ordered within and across stages
      byStage.foreach { r =>
        assert(r.getAs[Double]("min_quality") <= r.getAs[Double]("avg_quality") + 1e-9)
        assert(r.getAs[Double]("avg_quality") <= r.getAs[Double]("max_quality") + 1e-9)
      }
      byStage.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getAs[Double]("max_quality") <= hi.getAs[Double]("min_quality") + 1e-12)
        case _ =>
      }
    }
  }

  test("LM doc score golden: hand-computed bigram likelihoods") {
    import spark.implicits._
    // corpus: doc1 = "a b a b", doc2 = "b a"
    // bigrams: d1: (a,b),(b,a),(a,b); d2: (b,a)
    // c(a,b)=2, c(b,a)=2, c(a.)=2, c(b.)=2 -> p(b|a)=1.0, p(a|b)=1.0
    val df = Seq((1L, "a b a b", "en"), (2L, "b a", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Search.lmScore(df).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_bigrams") === 3)
    assert(out(0).getAs[Double]("avg_lik") === 1.0)
    assert(out(1).getAs[Long]("n_bigrams") === 1)
    assert(out(1).getAs[Double]("avg_lik") === 1.0)
    // asymmetric corpus: "a b", "a c" -> p(b|a)=p(c|a)=0.5
    val out2 = Search.lmScore(
      Seq((1L, "a b", "en"), (2L, "a c", "en")).toDF("doc_id", "text", "lang"))
      .collect().sortBy(_.getAs[Long]("doc_id"))
    assert(out2.forall(_.getAs[Double]("avg_lik") === 0.5))
    // single-token docs produce no bigrams and are absent
    val out3 = Search.lmScore(
      Seq((1L, "only", "en"), (2L, "a b", "en")).toDF("doc_id", "text", "lang"))
      .collect()
    assert(out3.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L))
  }

  test("priority sample: small strata exact, k-cap enforced, HT estimates calibrated") {
    import spark.implicits._
    // a 3-doc stratum (below k) and a 40-doc stratum (above k)
    val docs = (1L to 3L).map(i => (i, "aa", 10L * i)) ++
      (101L to 140L).map(i => (i, "bb", i))
    val df = docs.toDF("doc_id", "lang", "n_chars")
    val out = Corpus.prioritySample(df, k = 20).collect()
    val aa = out.filter(_.getAs[String]("lang") === "aa")
    val bb = out.filter(_.getAs[String]("lang") === "bb")
    // below-k stratum: the sample IS the population and estimates are exact
    assert(aa.length === 3)
    assert(aa.forall(r =>
      r.getAs[Double]("w_est") === r.getAs[Long]("n_chars").toDouble))
    // above-k stratum: exactly k rows, ranks 1..k, ŵ = max(w, τ) ≥ w
    assert(bb.length === 20)
    assert(bb.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to 20).toSeq)
    assert(bb.forall(r =>
      r.getAs[Double]("w_est") >= r.getAs[Long]("n_chars").toDouble))
    // deterministic: md5 priorities, not RNG
    val again = Corpus.prioritySample(df, k = 20).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      again.map(_.getAs[Long]("doc_id")).toSeq)
    // on the real corpus the subset-sum estimator Σŵ lands near the true
    // stratum total (HT-unbiased; this fixed realization is within 2×)
    val real = Corpus.prioritySample(Tables.documents(spark, sfDir)).collect()
    real.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val est = rows.map(_.getAs[Double]("w_est")).sum
      val tot = rows.head.getAs[Long]("total_chars").toDouble
      assert(est > 0.5 * tot && est < 2.0 * tot, s"$lang: est $est vs total $tot")
    }
  }

  test("DSIR selection ranks target-like documents above off-distribution ones") {
    import spark.implicits._
    // Target ('en') mass lives on the "the quick brown fox" bigrams; doc 10
    // (non-target lang, target-like text) must outscore doc 11 (pure noise
    // bigrams that appear nowhere in the target slice).
    val en = (1 to 8).map(i => (i.toLong, "en", "the quick brown fox jumps"))
    val probe = Seq(
      (10L, "xx", "the quick brown fox jumps"),
      (11L, "xx", "zz1 zz2 zz3 zz4 zz5"))
    val df = (en ++ probe).toDF("doc_id", "lang", "text")
    val out = Corpus.dsirSelect(df, targetLang = "en", k = 100).collect()
    val score = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(score(10L) > score(11L),
      s"target-like doc must outscore noise doc: ${score(10L)} vs ${score(11L)}")
    // target-like docs all share one profile -> identical scores
    assert(score(10L) === score(1L))
    // ranking is deterministic and k-capped
    val top = Corpus.dsirSelect(df, targetLang = "en", k = 3).collect()
    assert(top.length === 3)
    assert(top.map(_.getAs[Double]("score")).toSeq.reverse === top.map(_.getAs[Double]("score")).toSeq.sorted)
  }

  test("corpus datasheet: strata cover the corpus exactly, quality bounds hold") {
    val df = Tables.documents(spark, sfDir)
    val out = Corpus.corpusDatasheet(df).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === df.count())
    assert(out.map(_.getAs[Long]("total_chars")).sum ===
      df.agg(sum("n_chars")).head.getLong(0))
    out.foreach { r =>
      val (mn, mx, avg) = (r.getAs[Double]("min_quality"),
        r.getAs[Double]("max_quality"), r.getAs[Double]("avg_quality"))
      // the mean's decimal(27,9) term rounding can put it ~1e-9 outside
      // the raw-double min/max on single-doc strata
      assert(mn - 1e-8 <= avg && avg <= mx + 1e-8)
      assert(mn >= 0.0 && mx <= 1.0)
      assert(r.getAs[Long]("total_tokens") > 0)
    }
    // strata are the full lang × source cross product present in the data
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.length === out.length)
  }

  test("training shards: reproducible dense permutation, epochs independent") {
    val df = Tables.documents(spark, sfDir)
    val run1 = Corpus.trainingShards(df).collect()
    val run2 = Corpus.trainingShards(df).collect()
    // bitwise-reproducible across runs (resumable-training requirement)
    assert(run1.map(_.toSeq).toSeq === run2.map(_.toSeq).toSeq)
    val n = df.count()
    assert(run1.length === n)
    assert(run1.map(_.getAs[Long]("doc_id")).distinct.length === n)
    // dense positions 1..count within every shard
    run1.groupBy(_.getAs[Long]("shard")).foreach { case (s, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to rows.length).toSeq, s"shard $s")
    }
    // md5 spreads shards: no shard is empty or dominant at 500 docs
    val sizes = run1.groupBy(_.getAs[Long]("shard")).view.mapValues(_.length)
    assert(sizes.size === 8 && sizes.values.max < n / 2)
    // a different epoch is a genuinely different permutation
    val e1 = Corpus.trainingShards(df, epoch = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    val e0 = run1
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    assert(e0.count { case (id, sp) => e1(id) != sp } > n / 2)
  }

  test("shard checksums: reproducible; order change flips only the order " +
    "checksum, content change flips both") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"doc body number $i with words"))
      .toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame, epoch: Long) =
      Corpus.shardChecksums(d, nShards = 1, epoch = epoch).collect()
        .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("content_checksum"),
          r.getAs[Long]("order_checksum")))
    val base = rows(docs, 0L)
    assert(base.length === 1)
    // bit-reproducible across runs — the manifest two exports diff
    assert(rows(docs, 0L).toSeq === base.toSeq)
    // a different epoch permutes positions within the single shard:
    // same content sum, different order sum
    val e1 = rows(docs, 1L)
    assert(e1.head._1 === base.head._1)
    assert(e1.head._2 === base.head._2, "content checksum is order-free")
    assert(e1.head._3 !== base.head._3, "order checksum must see the permutation")
    // editing one document flips the content checksum
    val edited = docs.withColumn("text",
      when(col("doc_id") === 7L, lit("edited body")).otherwise(col("text")))
    val e = rows(edited, 0L)
    assert(e.head._2 !== base.head._2)
  }

  test("corpus drift: identical profiles are silent; a one-sided bucket " +
    "is skipped from PSI and moves KS") {
    import spark.implicits._
    def doc(id: Long, n: Int) = (id, (1 to n).map(i => s"t$i").mkString(" "))
    // ids ≡ 0 mod 5 are the batch; both sides get one doc in bucket 2
    // (4-7 tokens) and one in bucket 3 (8-15) → identical shape
    val same = Seq(doc(5L, 4), doc(10L, 8), doc(1L, 5), doc(2L, 9))
      .toDF("doc_id", "text")
    val s1 = Corpus.corpusDriftSummary(same).head()
    assert(s1.getAs[Double]("ks") === 0.0)
    assert(s1.getAs[Double]("psi") === 0.0)
    assert(s1.getAs[Long]("n_skipped") === 0L)

    // batch gains a bucket-4 doc the corpus lacks: that bucket is
    // PSI-skipped (zero-sided) but the cumulative gap must register
    val drifted = Seq(doc(5L, 4), doc(10L, 16), doc(1L, 5), doc(2L, 9))
      .toDF("doc_id", "text")
    val rows = Corpus.corpusDrift(drifted).collect()
    val byBucket = rows.map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(byBucket(4L).getAs[Long]("n_ref") === 0L)
    assert(byBucket(4L).getAs[Double]("psi_term") === 0.0)
    val s2 = Corpus.corpusDriftSummary(drifted).head()
    assert(s2.getAs[Double]("ks") > 0.0)
    assert(s2.getAs[Long]("n_skipped") === 2L,
      "bucket 3 (ref-only) and bucket 4 (batch-only) are both one-sided")
    // both CDFs end at 1 → the last bucket's gap is exactly zero
    val last = rows.maxBy(_.getAs[Long]("bucket"))
    assert(last.getAs[Double]("ks_diff") === 0.0)
    // a shared-bucket imbalance yields a strictly positive PSI
    val skewed = Seq(doc(5L, 4), doc(10L, 4), doc(15L, 8),
      doc(1L, 5), doc(2L, 9), doc(3L, 9)).toDF("doc_id", "text")
    assert(Corpus.corpusDriftSummary(skewed).head().getAs[Double]("psi") > 0.0)
  }

  test("corpusDrift PSI product guard raises on int64 overflow instead of wrapping") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // The guard itself, on planted counts: 4e9 * 4e9 wraps a raw long
    // multiply to a NEGATIVE value, which graft_lni would silently turn
    // into a wrong drift verdict — the checked product must raise.
    val big = Seq((4000000000L, 4000000000L)).toDF("n_new", "t_ref")
    val ex = intercept[Exception] {
      big.select(Corpus.lniCheckedProduct("n_new", "t_ref")).collect()
    }
    assert(ex.getMessage.contains("overflows int64"),
      s"expected the loud overflow error, got: ${ex.getMessage}")
    // In-range products evaluate exactly as the unchecked path
    val ok = Seq((3000000L, 2000000L)).toDF("n_new", "t_ref")
    assert(ok.select(Corpus.lniCheckedProduct("n_new", "t_ref")).head().getDouble(0) ===
      ok.selectExpr("graft_lni(n_new * t_ref)").head().getDouble(0))
  }

  test("DSIR score survives counts whose long products would overflow") {
    import spark.implicits._
    // Real-corpus magnitudes: sum_t ~1e16 over nr ~1e12 grams makes the
    // numerator ~1e28 — far past Long.MaxValue (9.2e18). The Decimal(38,0)
    // intermediates must produce the exact ratio where long×long wraps
    // (non-ANSI Spark wraps silently, corrupting the top-k ranking).
    val sumT = 12345678901234567L // ~1.2e16
    val sumR = 98765432109876543L // ~9.9e16
    val nr = 1000000000000L       // 1e12
    val nt = 250000000000L        // 2.5e11
    val b = 256
    val out = Seq((sumT, sumR, nr, nt))
      .toDF("sum_t", "sum_r", "nr", "nt")
      .select(Corpus.dsirScore(col("sum_t"), col("sum_r"), col("nr"), col("nt"), b)
        .as("score"))
      .collect()(0).getDouble(0)
    val expected =
      (BigDecimal(sumT) * BigDecimal(nr + b)).toDouble /
        (BigDecimal(sumR) * BigDecimal(nt + b)).toDouble
    assert(out === expected, s"decimal path must match BigDecimal: $out vs $expected")
    // and the wrapped-long value is genuinely different — the guard matters
    val wrapped = (sumT * (nr + b)).toDouble / (sumR * (nt + b)).toDouble
    assert(math.abs(wrapped - expected) > 1e-6 * math.abs(expected),
      "fixture no longer exercises the overflow regime")
  }

  test("packingEfficiency: exact fill rates incl. the over-budget spill signal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // lang x: two 1024-token docs -> one full bin (fill 1.0)
    // lang y: one 3000-token doc -> bin 0 overflows capacity (fill > 1)
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, "x", words(1024)), (8L, "x", words(1024)), // same shard: md5 dependent — use budget math per (lang, shard) group
      (1L, "y", words(3000)))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.Corpus.packingEfficiency(docs).collect()
    out.foreach { r =>
      val fill = r.getAs[Double]("fill_rate")
      val cap = r.getAs[Long]("capacity")
      val tot = r.getAs[Long]("total_tokens")
      assert(fill === tot.toDouble / cap.toDouble)
      assert(cap % 2048 === 0L)
    }
    val y = out.filter(_.getAs[String]("lang") == "y")
    assert(y.map(_.getAs[Long]("total_tokens")).sum === 3000L)
    assert(y.exists(_.getAs[Double]("fill_rate") > 1.0), "over-budget doc must overflow")
  }

  test("shardSkew: shares sum to 1 and uniform corpora balance near 1.0") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, "en", (1 to 50).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.Corpus.shardSkew(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 400L)
    val shareSum = out.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    out.foreach { r =>
      val skew = r.getAs[Double]("token_skew")
      assert(skew > 0.5 && skew < 1.5, s"uniform corpus shard skew out of band: $r")
    }
  }

  test("docLenHistogram: analytic power-of-two buckets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a"),                       // 1 token  -> bucket 0 [1,1]
      (2L, "en", "a b c d e"),               // 5 tokens -> bucket 2 [4,7]
      (3L, "en", (1 to 8).map(_ => "w").mkString(" "))) // 8 -> bucket 3 [8,15]
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.Corpus.docLenHistogram(docs).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("bucket_lo"), r.getAs[Long]("bucket_hi"), r.getAs[Long]("n_docs"))).toMap
    assert(out(0L) === ((1L, 1L, 1L)))
    assert(out(2L) === ((4L, 7L, 1L)))
    assert(out(3L) === ((8L, 15L, 1L)))
  }

  test("dupRateBySource: planted duplicates per source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "crawl", "same text"), (2L, "crawl", "same text"), (3L, "crawl", "other"),
      (4L, "books", "unique one"), (5L, "books", "unique two"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.Corpus.dupRateBySource(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct_texts"),
          r.getAs[Double]("dup_rate"))).toMap
    assert(out("crawl") === ((3L, 2L, 1.0 - 2.0 / 3.0)))
    assert(out("books") === ((2L, 2L, 0.0)))
  }

  test("winnowOverlap flags a doc sharing a long run, scores by the smaller side") {
    import spark.implicits._
    val shared = (1 to 40).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, shared),
      (2L, (100 to 130).map(i => s"pre$i").mkString(" ") + " " + shared),
      (3L, (200 to 260).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.Corpus.winnowOverlap(docs).collect()
    val r = out.find(x => x.getAs[Long]("doc_a") == 1L && x.getAs[Long]("doc_b") == 2L)
    assert(r.isDefined, s"overlap pair missing: ${out.mkString(",")}")
    assert(r.get.getAs[Double]("overlap") > 0.8, s"shared-run overlap low: ${r.get}")
    assert(!out.exists(x => x.getAs[Long]("doc_b") == 3L))
  }

  test("qualityLengthGrid cells partition the corpus with exact means") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = graft.operators.Corpus.qualityLengthGrid(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    out.foreach { r =>
      val m = r.getAs[Double]("mean_quality")
      val d = r.getAs[Long]("q_decile")
      assert(m >= d / 10.0 - 1e-9 && m < (d + 1) / 10.0 + 1e-9,
        s"mean outside its decile: $r")
    }
  }

  test("vocabGrowth: cumulative vocabulary is monotone and ends at the distinct count") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = graft.operators.Corpus.vocabGrowth(docs).collect().sortBy(_.getAs[Long]("decile"))
    val cums = out.map(_.getAs[Long]("vocab_cum"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val distinctTokens = graft.operators.Dedup.tokens(docs)
      .filter(org.apache.spark.sql.functions.col("w") =!= "").select("w").distinct().count()
    assert(cums.last === distinctTokens)
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
  }

  test("langConfusion: rates sum to 1 per declared language") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = graft.operators.Corpus.langConfusion(docs).collect()
    out.groupBy(_.getAs[String]("declared_lang")).foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Double]("rate")).sum
      assert(math.abs(s - 1.0) < 1e-9)
      assert(rows.map(_.getAs[Long]("n")).sum === rows.head.getAs[Long]("n_declared"))
    }
  }

  test("dedupThresholdSweep: cumulative counts are a valid survival curve") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = graft.operators.Corpus.dedupThresholdSweep(docs).collect()
      .sortBy(_.getAs[Long]("bucket"))
    val nTotal = graft.operators.Dedup.ngramJaccard(docs).count()
    assert(out.map(_.getAs[Long]("n_pairs")).sum === nTotal)
    // at-or-above is nonincreasing in the threshold and starts at the total
    val cums = out.map(_.getAs[Long]("n_pairs_at_or_above"))
    assert(cums.head === nTotal)
    assert(cums.zip(cums.tail).forall { case (lo, hi) => lo >= hi })
  }

  test("mixtureTemperature: sqrt weights, flattening direction, exact masses") {
    import spark.implicits._
    // token masses 1 / 4 / 16 -> s2 = 1,2,4 (t2=7); s4 = 1,sqrt2,2
    val docs = Seq(
      (1L, "a", "s1"),
      (2L, "a b c d", "s2"),
      (3L, (1 to 16).map(i => s"w$i").mkString(" "), "s3"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.mixtureTemperature(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet === Set("s1", "s2", "s3"))
    assert(out("s1").getAs[Long]("n_tokens") === 1L)
    assert(out("s2").getAs[Long]("n_tokens") === 4L)
    assert(out("s3").getAs[Long]("n_tokens") === 16L)
    // T=2 weights are exactly s2/t2 in source-ordered fold order
    assert(out("s1").getAs[Double]("w_t2") === 1.0 / 7.0)
    assert(out("s2").getAs[Double]("w_t2") === 2.0 / 7.0)
    assert(out("s3").getAs[Double]("w_t2") === 4.0 / 7.0)
    // higher temperature flattens: the smallest source gains share, the
    // largest loses it
    assert(out("s1").getAs[Double]("w_t4") > out("s1").getAs[Double]("w_t2"))
    assert(out("s3").getAs[Double]("w_t4") < out("s3").getAs[Double]("w_t2"))
    // boost > 1 iff the source is upsampled vs its natural share
    assert(out("s1").getAs[Double]("boost_t2") > 1.0)
    assert(out("s3").getAs[Double]("boost_t2") < 1.0)
    // weights form a distribution (fold order fixed, so this is exact
    // up to the final additions)
    val sum2 = Seq("s1", "s2", "s3").map(out(_).getAs[Double]("w_t2")).sum
    assert(math.abs(sum2 - 1.0) < 1e-12)
  }

  test("domainCapSample: per-source ceiling, quality order, doc_id ties") {
    import spark.implicits._
    val hi = (1 to 80).map(i => s"t$i").mkString(" ") // high quality: long+unique
    val lo = "the the the the the the the the"        // stopword soup
    val docs = (
      (1L to 7L).map(i => (i, if (i <= 3) hi else lo, "big")) ++ // 7 docs, cap 5
        Seq((10L, hi, "small"), (11L, hi, "small"))              // tie on identical text
      ).toDF("doc_id", "text", "source")
    val out = Corpus.domainCapSample(docs, cap = 5).collect()
    val big = out.filter(_.getAs[String]("source") == "big")
    assert(big.length === 5, "cap must bind for the 7-doc source")
    assert(big.map(_.getAs[Int]("rk")).sorted.toSeq === (1 to 5))
    // the three hi-quality docs outrank the lo ones
    assert(big.filter(_.getAs[Int]("rk") <= 3).map(_.getAs[Long]("doc_id")).toSet
      === Set(1L, 2L, 3L))
    // identical quality -> doc_id breaks the tie
    val small = out.filter(_.getAs[String]("source") == "small")
      .sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("doc_id")).toSeq
    assert(small === Seq(10L, 11L))
  }

  test("qualityAblation: retention curve partitions the corpus and is monotone") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val out = Corpus.qualityAblation(docs).collect()
    assert(out.nonEmpty && out.length <= 11)
    val total = docs.count()
    val nTok = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .head.getLong(0)
    // the lowest occupied decile keeps everything
    val first = out.minBy(_.getAs[Long]("q_decile"))
    assert(first.getAs[Long]("docs_kept") === total)
    assert(first.getAs[Long]("tokens_kept") === nTok)
    assert(first.getAs[Double]("doc_share") === 1.0)
    // kept counts are nonincreasing in the threshold
    val sorted = out.sortBy(_.getAs[Long]("q_decile"))
    val docsKept = sorted.map(_.getAs[Long]("docs_kept"))
    assert(docsKept.zip(docsKept.tail).forall { case (a, b) => a >= b })
    val toksKept = sorted.map(_.getAs[Long]("tokens_kept"))
    assert(toksKept.zip(toksKept.tail).forall { case (a, b) => a >= b })
    // threshold is the decile boundary
    sorted.foreach { r =>
      assert(r.getAs[Double]("threshold")
        === r.getAs[Long]("q_decile").toDouble / 10.0)
    }
  }

  test("nbClassify: separable vocab learned, zero-token doc omitted, tie to first class") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb aa cc", "en"),
      (2L, "aa bb bb", "en"),
      (3L, "xx yy zz", "de"),
      (4L, "yy zz zz xx", "de"),
      (5L, "", "en") // zero tokens: no likelihood, omitted
    ).toDF("doc_id", "text", "lang")
    val out = Search.nbClassify(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L), "empty doc must be omitted")
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id).getAs[Boolean]("correct"), s"doc $id misclassified")
      assert(out(id).getAs[String]("pred_lang") === out(id).getAs[String]("lang"))
    }
    // exactly symmetric classes -> equal scores -> lexicographically
    // first class wins
    val sym = Seq(
      (1L, "p q", "aa"), (2L, "p q", "bb"), (3L, "p q", "aa"), (4L, "p q", "bb"))
      .toDF("doc_id", "text", "lang")
    val preds = Search.nbClassify(sym).collect()
    assert(preds.forall(_.getAs[String]("pred_lang") === "aa"))
  }

  test("qualityClassifier: planted target-like doc outranks boilerplate, and the " +
    "NB classifier agrees on the separation") {
    import spark.implicits._
    // 8 curated-slice docs (source src0 -> label 1) with target vocabulary,
    // 8 crawl boilerplate docs (label 0), and ONE HELD-OUT doc (100) that
    // carries the target vocabulary but sits in the crawl slice — so the
    // trainer sees it as a NEGATIVE and the only way it can outrank the
    // boilerplate is the learned n-gram profile, not its label.
    val target = "alpha beta gamma delta epsilon zeta"
    val boiler = "click here buy now cheap offer today"
    val docs =
      (1L to 8L).map(i => (i, target, "pos", "src0")) ++
        (11L to 18L).map(i => (i, boiler, "neg", "crawl")) ++
        Seq((100L, target, "neg", "crawl"))
    val df = docs.toDF("doc_id", "text", "lang", "source")
    val out = Corpus.qualityClassifier(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("is_positive"), r.getAs[Double]("score")))).toMap
    assert(out.keySet.size === 17)
    assert((1L to 8L).forall(out(_)._1 === 1) &&
      (11L to 18L).forall(out(_)._1 === 0) && out(100L)._1 === 0)
    val boilerMax = (11L to 18L).map(out(_)._2).max
    assert(out(100L)._2 > boilerMax,
      s"held-out target-like doc must outrank boilerplate: ${out(100L)._2} vs $boilerMax")
    assert((1L to 8L).forall(out(_)._2 > boilerMax),
      "curated-slice docs must outrank boilerplate")
    // ranking agreement with the class-conditional NB model (C92) on the
    // same separable fixture: NB, trained on the lang labels, must pull
    // the held-out doc to the 'pos' class and keep boilerplate at 'neg' —
    // the same separation the logistic probe expressed as score order.
    val nb = Search.nbClassify(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(nb(100L) === "pos", "NB must agree the held-out doc is target-like")
    assert((11L to 18L).forall(nb(_) === "neg"))
    // calibration table on the same separable fixture: the 9 target-
    // vocabulary docs (8 labeled positive + the held-out doc 100, which
    // ties their score and out-sorts them by doc_id) fill the top
    // deciles, boilerplate the bottom — so the cut covering exactly the
    // top 9 docs has precision 8/9, the bottom decile is pure negative,
    // scores separate cleanly between the regions, and the loosest cut
    // recovers the corpus-wide base rate.
    val ev = Corpus.qualityClassifierEval(df).collect().sortBy(_.getAs[Int]("decile"))
    assert(ev.map(_.getAs[Long]("n_docs")).sum === 17L)
    assert(ev.map(_.getAs[Long]("n_positive")).sum === 8L)
    assert(ev.head.getAs[Double]("positive_rate") === 0.0)
    assert(ev.head.getAs[Double]("max_score") < ev.last.getAs[Double]("min_score"),
      "boilerplate scores must sit strictly below the target-vocab scores")
    val at9 = ev.find(_.getAs[Long]("cum_docs") === 9L).getOrElse(
      fail(s"no decile cut covers exactly the 9 target-vocab docs: ${ev.mkString(",")}"))
    assert(at9.getAs[Long]("cum_positive") === 8L)
    assert(math.abs(at9.getAs[Double]("cum_precision") - 8.0 / 9.0) < 1e-12)
    assert(ev.head.getAs[Long]("cum_docs") === 17L, "loosest cut covers the corpus")
    assert(math.abs(ev.head.getAs[Double]("cum_precision") - 8.0 / 17.0) < 1e-12)
    // the budget cut spends along the LEARNED ranking: the 9 target-vocab
    // docs are 6 tokens each, so a 54-token budget selects exactly them
    // (boilerplate never enters, whatever its doc ids)
    val sel = Corpus.classifierBudgetSelect(df, tokenBudget = 54L).collect()
    assert(sel.count(_.getAs[Boolean]("selected")) === 9)
    assert(sel.filter(_.getAs[Boolean]("selected")).map(_.getAs[Long]("doc_id")).toSet
      === ((1L to 8L).toSet + 100L))
    assert(sel.filter(_.getAs[Boolean]("selected"))
      .forall(_.getAs[Long]("cum_tokens") <= 54L))
  }

  test("classifierThresholdSelect: max-F1 recovers the planted positives exactly; " +
    "the precision floor is an exact integer boundary") {
    import spark.implicits._
    // Same separable fixture as the qualityClassifier golden spec: 8
    // positives (src0, target vocab), 8 boilerplate negatives, one
    // held-out target-vocab doc (100) labeled negative. Candidate order
    // (score DESC, doc_id): 1..8, 100, 11..18.
    val target = "alpha beta gamma delta epsilon zeta"
    val boiler = "click here buy now cheap offer today"
    val docs =
      (1L to 8L).map(i => (i, target, "pos", "src0")) ++
        (11L to 18L).map(i => (i, boiler, "neg", "crawl")) ++
        Seq((100L, target, "neg", "crawl"))
    val df = docs.toDF("doc_id", "text", "lang", "source")
    val out = Corpus.classifierThresholdSelect(df).collect()
      .map(r => r.getAs[String]("criterion") -> r).toMap
    assert(out.keySet === Set("max_f1", "precision_floor_90"))
    // max-F1: cut after rank 8 = exactly the labeled positives -> F1 = 1
    val mf = out("max_f1")
    assert(mf.getAs[Long]("kept_docs") === 8L)
    assert(mf.getAs[Long]("cut_doc_id") === 8L)
    assert(mf.getAs[Long]("tp") === 8L && mf.getAs[Long]("fp") === 0L &&
      mf.getAs[Long]("fn") === 0L)
    assert(mf.getAs[Double]("precision") === 1.0 &&
      mf.getAs[Double]("recall") === 1.0 && mf.getAs[Double]("f1") === 1.0)
    // floor 90: rank 9 (doc 100) would be 800 >= 810 -> fails, so the
    // largest qualifying cut is the same rank-8 set
    val pf = out("precision_floor_90")
    assert(pf.getAs[Long]("kept_docs") === 8L && pf.getAs[Long]("fp") === 0L)
    // floor 80 hits the EXACT integer boundary: rank 10 keeps tp=8 of 10
    // docs, and 800 >= 800 qualifies (no rounding in the decision) while
    // rank 11 (800 >= 880) does not — the cut lands on the first
    // boilerplate doc and its lower score becomes the threshold.
    val out80 = Corpus.classifierThresholdSelect(df, precisionFloorPct = 80)
      .collect().map(r => r.getAs[String]("criterion") -> r).toMap
    assert(out80.keySet === Set("max_f1", "precision_floor_80"))
    val p80 = out80("precision_floor_80")
    assert(p80.getAs[Long]("kept_docs") === 10L)
    assert(p80.getAs[Long]("cut_doc_id") === 11L)
    assert(p80.getAs[Long]("tp") === 8L && p80.getAs[Long]("fp") === 2L)
    assert(p80.getAs[Double]("precision") === 0.8 &&
      p80.getAs[Double]("recall") === 1.0)
    assert(p80.getAs[Double]("threshold_score") <
      mf.getAs[Double]("threshold_score"),
      "the floor-80 cut must sit at the boilerplate score level")
  }

  test("qualityDupGrid: cells partition the corpus, shares sum per decile, dup mass matches C1") {
    val docs = Tables.documents(spark, sfDir)
    val out = Corpus.qualityDupGrid(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    out.groupBy(_.getAs[Long]("q_decile")).foreach { case (d, rows) =>
      val s = rows.map(_.getAs[Double]("decile_share")).sum
      assert(math.abs(s - 1.0) < 1e-12, s"decile $d shares sum to $s")
    }
    val dupDocs = graft.operators.Dedup.exact(docs)
      .filter(col("n_copies") > 1)
      .agg(coalesce(sum("n_copies"), lit(0L))).head.getLong(0)
    assert(out.filter(_.getAs[Boolean]("is_dup")).map(_.getAs[Long]("n_docs")).sum
      === dupDocs)
  }

  test("minhashSCurve: analytic S-curve of the 8x2 banding") {
    val curve = graft.operators.Dedup.minhashSCurve(spark).collect()
      .map(r => r.getAs[Double]("jaccard") ->
        (r.getAs[Double]("p_candidate"), r.getAs[Double]("threshold_s"))).toMap
    assert(curve.size === 19)
    // the exact IEEE tree at s = 0.5, replayed here step for step
    val s2 = 0.5 * 0.5; val q = 1.0 - s2; val q2 = q * q; val q4 = q2 * q2
    assert(curve(0.5)._1 === 1.0 - q4 * q4)
    assert(curve(0.5)._2 === math.sqrt(0.125))
    // monotone, with the right tails (banding passes near-exact dups,
    // rejects low-similarity pairs)
    val ordered = curve.toSeq.sortBy(_._1).map(_._2._1)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a < b })
    // 1 − (1 − 0.05²)^8 ≈ 0.0198: the banding passes ~2% of J=0.05 pairs
    assert(curve(0.05)._1 < 0.02 && curve(0.95)._1 > 0.99)
  }

  test("lmHeldoutScore: odd half only, and memorization inflates the in-corpus score") {
    val docs = Tables.documents(spark, sfDir)
    val held = Search.lmHeldoutScore(docs).collect()
    assert(held.nonEmpty && held.forall(_.getAs[Long]("doc_id") % 2 === 1))
    val meanHeld = held.map(_.getAs[Double]("avg_lik")).sum / held.length
    // the full-corpus model has SEEN the odd docs; scoring them under it
    // must beat the held-out score on average, or memorization isn't real
    val full = Search.lmScoreAgainst(
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text"),
        Search.lmModel(docs)).collect()
    val meanFull = full.map(_.getAs[Double]("avg_lik")).sum / full.length
    assert(meanHeld < meanFull,
      s"held-out $meanHeld should be below in-corpus $meanFull")
  }

  test("sourceQualityProfile: partitions the corpus, range brackets the mean") {
    val docs = Tables.documents(spark, sfDir)
    val out = Corpus.sourceQualityProfile(docs).collect()
    assert(out.length.toLong ===
      docs.select("source").distinct().count())
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    out.foreach { r =>
      val (lo, mean, hi) = (r.getAs[Double]("min_quality"),
        r.getAs[Double]("mean_quality"), r.getAs[Double]("max_quality"))
      assert(lo <= mean && mean <= hi, s"${r.getAs[String]("source")}")
    }
  }

  test("sessionizeGapSweep: one pass reproduces B6 at the 2h point, monotone in the gap") {
    val events = Tables.events(spark, sfDir)
    val out = graft.operators.Analytics.sessionizeGapSweep(events).collect()
      .sortBy(_.getAs[Long]("gap_us"))
    assert(out.map(_.getAs[Long]("gap_us")).toSeq ===
      Seq(1800000000L, 3600000000L, 7200000000L, 14400000000L))
    // every threshold sees the same event mass
    assert(out.map(_.getAs[Long]("n_events")).distinct.length === 1)
    // a larger gap can only merge sessions
    val ns = out.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // the 2h row IS the B6 sessionization's session count
    val b6 = graft.operators.Analytics.sessionize(events).count()
    assert(out.find(_.getAs[Long]("gap_us") === 7200000000L).get
      .getAs[Long]("n_sessions") === b6)
  }

  test("trainingShardsBalanced: token masses within one doc of ideal, beating hash shards") {
    val docs = Tables.documents(spark, sfDir)
    val out = Corpus.trainingShardsBalanced(docs).collect()
    assert(out.map(_.getAs[Long]("shard")).sorted.toSeq === (0L until 8L))
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val toks = out.map(_.getAs[Long]("n_tokens"))
    val maxDoc = docs
      .select(max(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    // the prefix-boundary guarantee: every shard within one document of
    // the ideal mass, so the spread is bounded by 2 max-doc lengths
    assert(toks.max - toks.min <= 2 * maxDoc,
      s"spread ${toks.max - toks.min} exceeds 2x max doc $maxDoc")
    // and it strictly beats hash sharding's token skew (the C69 finding)
    val hashSpread = Corpus.trainingShards(docs)
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("t")), "doc_id")
      .groupBy("shard").agg(sum("t").as("tok"))
      .agg(max("tok") - min("tok")).head.getLong(0)
    assert(toks.max - toks.min < hashSpread,
      s"balanced ${toks.max - toks.min} should beat hash $hashSpread")
  }

  test("mixtureEntropy: analytic uniform and degenerate mixtures") {
    import spark.implicits._
    // 4 langs x 2 docs each -> exactly 2 bits; single lang -> 0
    val uni = (0L until 8L).map(i => (i, s"l${i % 4}", "t")).toDF("doc_id", "lang", "text")
    val u = graft.operators.Corpus.mixtureEntropy(uni).head()
    assert(u.getAs[Long]("n_docs") === 8L && u.getAs[Long]("n_langs") === 4L)
    assert(math.abs(u.getAs[Double]("entropy_bits") - 2.0) < 1e-12)
    val one = Seq((1L, "en", "t"), (2L, "en", "t")).toDF("doc_id", "lang", "text")
    assert(math.abs(graft.operators.Corpus.mixtureEntropy(one).head()
      .getAs[Double]("entropy_bits")) < 1e-12)
  }
}
