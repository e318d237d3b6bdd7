package graft

import graft.functions.Exact
import org.apache.spark.sql.functions._

/** Property-style invariants over seeded random inputs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("Exact.dsum is invariant under permutation and partitioning") {
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { _ =>
      val xs = List.fill(60)(math.round((rnd.nextDouble() - 0.5) * 2e8) / 100.0)
      val base = xs.toDF("x").repartition(1)
        .agg(Exact.dsum(col("x"))).head.getDouble(0)
      val shuffled = rnd.shuffle(xs).toDF("x").repartition(7)
        .agg(Exact.dsum(col("x"))).head.getDouble(0)
      assert(base === shuffled)
    }
  }

  test("sessionize: every event lands in exactly one session; sessions separated by > gap") {
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { _ =>
      val gapUs = 5L
      val evs = List.fill(40)(rnd.nextLong(50L)).zipWithIndex
      val df = evs.map { case (t, i) => (i.toLong, 1L, t) }.toDF("event_id", "user_id", "ts_us")
      val out = graft.operators.Analytics.sessionize(df, gapUs).collect()
      assert(out.map(_.getAs[Long]("n_events")).sum === evs.length)
      val spans = out.sortBy(_.getAs[Long]("session_start_us"))
        .map(r => (r.getAs[Long]("session_start_us"), r.getAs[Long]("session_end_us")))
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 - e1 > gapUs)
        case _ =>
      }
    }
  }

  test("session_window agrees with the relational gap sessionizer") {
    // Built-in session_window starts a new session at gap >= timeout and
    // ends at last event + timeout; sessionize(gap) starts at gap > g.
    // Over integer microseconds, `> g-1` ≡ `>= g`, so the two forms must
    // produce identical sessions modulo the +gap end offset.
    val rnd = new scala.util.Random(11)
    val gapUs = 1800000000L // 30 min, matching sessionWindow's default
    val evs = (0 until 300).map { i =>
      (i.toLong, rnd.nextLong(5L), rnd.nextLong(20L) * 600000000L)
    }
    val df = evs.toDF("event_id", "user_id", "ts_us")
    val viaBuiltin = graft.operators.Analytics.sessionWindow(df)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val viaRelational = graft.operators.Analytics.sessionize(df, gapUs - 1)
      .select(col("user_id"), col("session_start_us"),
        (col("session_end_us") + gapUs).as("session_end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(viaBuiltin.nonEmpty)
    assert(viaBuiltin === viaRelational)
  }

  test("simhash is permutation-invariant (bag-of-words)") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    (0 until 5).foreach { _ =>
      val ws = List.fill(12)(vocab(rnd.nextInt(vocab.size)))
      val df = Seq((1L, ws.mkString(" ")), (2L, rnd.shuffle(ws).mkString(" ")))
        .toDF("doc_id", "text")
      val out = graft.operators.Dedup.simhash(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out(1L) === out(2L))
    }
  }

  test("chunking reconstructs every document for random lengths (incl. boundary multiples)") {
    val rnd = new scala.util.Random(11)
    // random lengths + the step/window boundary cases 47,48,49,63,64,65,96
    val lengths = List.fill(10)(1 + rnd.nextInt(200)) ++
      List(1, 47, 48, 49, 63, 64, 65, 96, 112, 113)
    val docs = lengths.zipWithIndex.map { case (len, i) =>
      (i.toLong, (1 to len).map(t => s"d${i}t$t").mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val chunks = graft.operators.Corpus.chunkDocuments(docs, chunkSize = 64, overlap = 16)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    lengths.zipWithIndex.foreach { case (len, i) =>
      val cs = chunks(i.toLong).sortBy(_.getAs[Int]("chunk_id"))
      // expected chunk count: starts at 0, 48, ... strictly below len
      val expected = 1 + (len - 1) / 48
      assert(cs.length === expected, s"doc $i len $len")
      // de-overlapped reconstruction: chunk 0 whole, then tails past overlap
      val rebuilt = cs.zipWithIndex.flatMap { case (r, ci) =>
        val toks = r.getAs[String]("chunk_text").split(" ")
        if (ci == 0) toks else toks.drop(16)
      }
      val expectTokens = (1 to len).map(t => s"d${i}t$t")
      // trailing chunks shorter than overlap contribute nothing new; the
      // de-overlapped concat must be a prefix-complete cover
      assert(rebuilt.distinct.toSeq === expectTokens,
        s"doc $i len $len reconstruction")
      cs.foreach(r => assert(r.getAs[Long]("n_tokens") ===
        r.getAs[String]("chunk_text").split(" ").length.toLong))
    }
  }

  test("packing: bins fill to budget except each (lang, shard)'s last") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 400).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(120))).map(t => s"w$t").mkString(" "),
        Seq("en", "de", "zh")(rnd.nextInt(3)))
    }.toDF("doc_id", "text", "lang")
    val out = graft.operators.Corpus.sequencePacking(docs, budget = 256).collect()
    out.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"))).foreach {
      case (_, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
        // offsets replay exactly: next offset = (offset + tokens) mod-carried
        var cum = 0L
        sorted.foreach { r =>
          assert(r.getAs[Long]("bin") === cum / 256)
          assert(r.getAs[Long]("bin_offset") === cum % 256)
          cum += r.getAs[Long]("n_tokens")
        }
        // every bin index up to the last is present (no empty bins)
        val bins = sorted.map(_.getAs[Long]("bin")).distinct.sorted
        assert(bins === (0L to bins.max).toSeq)
    }
  }
}
