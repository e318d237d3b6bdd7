package graft

import graft.sources.Tables
import org.apache.spark.sql.types._

/** Fast-fail guard for DRIVER-OWNED testdata drift: the r7 regression
  * (events.ts silently changing physical encoding) surfaced as 64 red
  * specs and 56 missing correctness rows; this spec pins the COLUMN
  * CONTRACT of every table the loaders derive from, so the next
  * generator change fails HERE with a one-line diff instead of
  * cascading. Types are asserted post-loader (what operators actually
  * see), not raw parquet — the loaders own the physical-encoding
  * tolerance (EventsEncodingSpec pins that separately). */
class TableContractSpec extends SparkSpec {

  private def assertCols(table: String, df: org.apache.spark.sql.DataFrame,
      required: (String, DataType)*): Unit = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    required.foreach { case (name, dt) =>
      assert(have.contains(name), s"$table: missing column `$name` — generator drift? have: ${have.keys.toSeq.sorted}")
      assert(have(name) == dt, s"$table.$name: expected $dt, got ${have(name)} — generator drift")
    }
  }

  test("derived events surface: ts_us/event_date stable whatever the physical ts encoding") {
    val ev = Tables.events(spark, sfDir)
    assertCols("events", ev,
      "event_id" -> LongType, "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType,
      "ts_us" -> LongType, "event_date" -> DateType)
    assert(ev.limit(1).count() == 1)
  }

  test("documents/embeddings contracts hold") {
    assertCols("documents", Tables.documents(spark, sfDir),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    val emb = Tables.embeddings(spark, sfDir)
    assertCols("embeddings", emb, "vec_id" -> LongType, "label" -> IntegerType)
    emb.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embeddings.embedding: expected ARRAY<FLOAT>, got $other")
    }
    // dimensionality is part of the contract: every inlined-literal index
    // (IVF centroids, PQ codebooks, JL matrix, oracle range(1,65)) assumes 64
    import org.apache.spark.sql.functions._
    val dims = emb.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0)).toSet
    assert(dims == Set(64), s"embedding dims drifted: $dims")
  }

  test("TPC-H-ish fact/dim contracts hold") {
    assertCols("orders", Tables.orders(spark, sfDir),
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderpriority" -> StringType)
    assert(Tables.orders(spark, sfDir).schema("o_orderdate").dataType
      .isInstanceOf[TimestampNTZType] ||
      Tables.orders(spark, sfDir).schema("o_orderdate").dataType == TimestampType,
      "o_orderdate must stay a timestamp flavor")
    assertCols("lineitem", Tables.lineitem(spark, sfDir),
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType)
    assertCols("customer", Tables.customer(spark, sfDir),
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType)
    assertCols("nation", Tables.nation(spark, sfDir),
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType, "n_name" -> StringType)
    assertCols("region", Tables.region(spark, sfDir),
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("supplier", Tables.supplier(spark, sfDir),
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertCols("part", Tables.part(spark, sfDir), "p_partkey" -> LongType)
  }
}
