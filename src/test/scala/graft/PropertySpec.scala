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
}
