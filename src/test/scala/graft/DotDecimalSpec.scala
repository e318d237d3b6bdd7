package graft

import graft.functions.{GraftFunctions, VectorFunctions}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** [[graft.functions.DotDecimal]] must be bit-identical to the
  * higher-order-function decimal formulation it replaces (which is also
  * the DuckDB oracle's SQL shape) — every double compared with `==`, no
  * tolerance. */
class DotDecimalSpec extends SparkSpec {
  import spark.implicits._

  private def compareBoth(df: org.apache.spark.sql.DataFrame): Unit = {
    GraftFunctions.register(spark)
    val both = df.select(
      VectorFunctions.dotExact(col("a"), col("b")).as("native"),
      VectorFunctions.dotExactCompositional(col("a"), col("b")).as("hof"),
      VectorFunctions.normExact(col("a")).as("native_norm"),
      VectorFunctions.normExactCompositional(col("a")).as("hof_norm"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(r.getDouble(0) === r.getDouble(1), s"dot mismatch: $r")
      assert(r.isNullAt(2) === r.isNullAt(3), s"norm null mismatch: $r")
      if (!r.isNullAt(2))
        assert(r.getDouble(2) === r.getDouble(3), s"norm mismatch: $r")
    }
  }

  test("native dot == HOF dot on every real embedding pair (sf0.001)") {
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("b"))
    compareBoth(a.join(b, col("ia") % 7 === col("ib") % 7))
  }

  test("native dot == HOF dot on adversarial values") {
    val rows = Seq(
      // ties at the scale-12 rounding boundary, denormal-ish, negatives
      (Array(1e-7f, -1e-7f, 0.1f, 0.3f), Array(1e-6f, 1e-6f, 0.1f, 0.3f)),
      (Array(1.1754944e-38f, 1000f, -1000f, 1f), Array(1f, 1e-3f, 1e-3f, 1f)),
      (Array(0.5f, 0.25f, 0.125f, -0.5f), Array(0.5f, 0.25f, 0.125f, 0.5f)),
      (Array(999.99f, -999.99f, 123.456f, 0f), Array(999.99f, 999.99f, 654.321f, 42f)),
      (Array.fill(64)(1.0000001f), Array.fill(64)(0.9999999f)),
      (Array.empty[Float], Array.empty[Float]))
    compareBoth(rows.toDF("a", "b"))
  }

  test("native dot: nulls and length mismatch behave like zip_with/aggregate") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(2f))),
      (Seq[Option[Float]](Some(1f)), Seq[Option[Float]](Some(1f), Some(2f))))
      .toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val out = df.select(
      VectorFunctions.dotExact(col("a"), col("b")).as("native"),
      VectorFunctions.dotExactCompositional(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1), s"expected nulls: $r") }
  }

  test("fuzz: native dot == HOF dot on 2000 random vectors across magnitudes") {
    val rnd = new scala.util.Random(0xD07D07)
    val rows = (0 until 2000).map { _ =>
      val scale = math.pow(10, rnd.between(-6, 4)).toFloat
      val d = rnd.between(1, 8)
      (Array.fill(d)((rnd.nextFloat() - 0.5f) * scale),
        Array.fill(d)((rnd.nextFloat() - 0.5f) * scale))
    }
    compareBoth(rows.toDF("a", "b"))
  }

  test("fuzz: values engineered near the half-up rounding boundary") {
    // products whose scaled value sits near x.5e-12 exercise the
    // ambiguous-band BigDecimal fallback
    val rnd = new scala.util.Random(0xB0B0)
    val rows = (0 until 500).map { _ =>
      val base = (rnd.nextInt(1000000) + 0.5) / 1e6
      (Array(base.toFloat, 1e-6f, -base.toFloat), Array(1e-6f, base.toFloat, 1e-6f))
    }
    compareBoth(rows.toDF("a", "b"))
  }

  test("decimal(20,12) overflow region: both forms agree (null) under non-ANSI") {
    // 64 × (1e4)² = 6.4e9 > 1e8 ⇒ per-step overflow. Under ANSI the HOF
    // cast throws; DotDecimal keeps the non-ANSI null-on-overflow
    // semantics (embeddings sit far inside DECIMAL(20,12) at any scale),
    // so compare both with ANSI off where the semantics coincide.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val big = Seq((Array.fill(64)(10000.0f), Array.fill(64)(10000.0f))).toDF("a", "b")
      compareBoth(big)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
