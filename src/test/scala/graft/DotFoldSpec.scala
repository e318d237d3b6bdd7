package graft

import graft.functions.{GraftFunctions, VectorFunctions}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** [[graft.functions.DotFold]] must be bit-identical to the ordered
  * higher-order-function fold it replaces (which is also the DuckDB
  * oracle's `list_reduce` shape) — every double compared with `==`, no
  * tolerance. */
class DotFoldSpec extends SparkSpec {
  import spark.implicits._

  private def compareBoth(df: org.apache.spark.sql.DataFrame): Unit = {
    GraftFunctions.register(spark)
    val both = df.select(
      VectorFunctions.dotFold(col("a"), col("b")).as("native"),
      VectorFunctions.dotFoldCompositional(col("a"), col("b")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) {
        val (n, h) = (r.getDouble(0), r.getDouble(1))
        assert(n === h || (n.isNaN && h.isNaN), s"dot mismatch: $r")
      }
    }
  }

  test("native fold == HOF fold on every real embedding pair (sf0.001)") {
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("b"))
    compareBoth(a.join(b, col("ia") % 7 === col("ib") % 7))
  }

  test("native fold == HOF fold on adversarial values incl. NaN/Inf/empty") {
    val rows = Seq(
      (Array(1e-7f, -1e-7f, 0.1f, 0.3f), Array(1e-6f, 1e-6f, 0.1f, 0.3f)),
      (Array(1.1754944e-38f, 1000f, -1000f, 1f), Array(1f, 1e-3f, 1e-3f, 1f)),
      (Array(Float.MaxValue, Float.MaxValue), Array(Float.MaxValue, -Float.MaxValue)),
      (Array(Float.NaN, 1f), Array(1f, 1f)),
      (Array(Float.PositiveInfinity, 1f), Array(1f, 1f)),
      (Array.fill(64)(1.0000001f), Array.fill(64)(0.9999999f)),
      (Array.empty[Float], Array.empty[Float]))
    compareBoth(rows.toDF("a", "b"))
  }

  test("length mismatch and null elements → null, like zip_with padding") {
    val mism = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    compareBoth(mism)
    val withNull = Seq((Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(2f))))
      .toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    compareBoth(withNull)
  }
}
