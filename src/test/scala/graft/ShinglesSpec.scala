package graft

import graft.functions.{GraftFunctions, ShingleImpl}
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** [[graft.functions.ShingleSet]] / [[MinHashSig]] must match the
  * compositional Column formulations they replace, element for element, on
  * the real documents table. */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("native shingle set == compositional shingle set on sf0.001 documents") {
    val docs = Tables.documents(spark, sfDir)
    val native = Dedup.shingleArrays(docs)
      .select(col("doc_id"), sort_array(col("shingles")).as("s"))
    val comp = Dedup.shingleArraysCompositional(docs)
      .select(col("doc_id"), sort_array(col("shingles")).as("s"))
    assert(native.exceptAll(comp).isEmpty && comp.exceptAll(native).isEmpty)
  }

  test("native shingles handle empties, multi-spaces, and short docs like split(' ', -1)") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a  b c"), (3L, "ab"), (4L, ""), (5L, "x y z"),
      (6L, " a b c "), (7L, "a a a a a")).toDF("doc_id", "text")
    val native = Dedup.shingleArrays(docs)
      .select(col("doc_id"), sort_array(col("shingles")).as("s"))
    val comp = Dedup.shingleArraysCompositional(docs)
      .select(col("doc_id"), sort_array(col("shingles")).as("s"))
    assert(native.exceptAll(comp).isEmpty && comp.exceptAll(native).isEmpty)
  }

  test("native minhash signature == affine-reseeded mins over md5'd shingle rows") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val p = lit(ShingleImpl.P)
    val withHw = Dedup.shingles(docs).withColumn("hw",
      expr("CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT) % 2147483647"))
    val aggs = (0 until ShingleImpl.K).map { j =>
      min((lit(ShingleImpl.seedA(j)) * col("hw") + lit(ShingleImpl.seedB(j))) % p).as(s"mh$j")
    }
    val comp = withHw.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val native = Dedup.minhashSignature(docs)
    assert(native.exceptAll(comp).isEmpty && comp.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }
}
