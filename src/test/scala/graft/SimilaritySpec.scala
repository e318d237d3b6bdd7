package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // vec 0 == vec 20 (identical), others random-ish but deterministic
  private lazy val emb = {
    val rows = (0 until 30).map { i =>
      val arr =
        if (i == 20) Array.tabulate(64)(d => (d + 1).toFloat)
        else Array.tabulate(64)(d => ((d * 31 + i * 17) % 13 - 6).toFloat + (if (d == 0) i else 0))
      (i.toLong, if (i == 0) Array.tabulate(64)(d => (d + 1).toFloat) else arr)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks the identical vector first with cosine 1") {
    val out = Similarity.bruteForceTopK(emb, nQueries = 1, k = 5).collect()
    assert(out.length === 5)
    val top = out.minBy(_.getAs[Int]("rank"))
    assert(top.getAs[Long]("neighbor_id") === 20L)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("ranks are dense per query and cosines non-increasing") {
    val out = Similarity.bruteForceTopK(emb, nQueries = 2, k = 10)
      .collect().groupBy(_.getAs[Long]("query_id"))
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.length))
      val cos = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k finds the identical vector (same sign bucket)") {
    val out = Similarity.lshTopK(emb, nQueries = 1, k = 5).collect()
    assert(out.exists(r => r.getAs[Long]("neighbor_id") == 20L
      && math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
  }

  test("LSH results are a subset of brute-force candidates' scores") {
    val bf = Similarity.bruteForceTopK(emb, nQueries = 1, k = 29).collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cosine")).toMap
    val lsh = Similarity.lshTopK(emb, nQueries = 1, k = 29).collect()
    lsh.foreach { r =>
      val nid = r.getAs[Long]("neighbor_id")
      assert(math.abs(bf(nid) - r.getAs[Double]("cosine")) < 1e-12)
    }
  }
}
