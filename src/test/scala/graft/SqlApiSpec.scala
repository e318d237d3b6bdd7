package graft

import graft.functions.GraftFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The SQL front door: every capability is reachable through `spark.sql`
  * over registered views — including the library's native expressions,
  * which register as SQL functions (per-session via [[GraftFunctions]],
  * cluster-wide via [[graft.plans.GraftExtensions]]). Each SQL result is
  * compared against its DataFrame-API twin. */
class SqlApiSpec extends SparkSpec {

  private def init(): Unit = {
    GraftFunctions.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents_v")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_v")
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings_v")
  }

  test("spark.sql aggregation equals the DataFrame twin") {
    init()
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
         FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""")
    val viaDf = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(graft.functions.Exact.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
    assert(viaSql.collect().toSeq === viaDf.collect().toSeq)
  }

  test("native graft_* functions are callable from SQL") {
    init()
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(text) AS sh, size(graft_shingles(text)) AS n_sh,
                graft_minhash(text)[0] AS mh0, size(graft_winnow(text)) AS n_fp
         FROM documents_v ORDER BY doc_id""")
    val viaDf = graft.operators.Dedup.simhash(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("simhash"))
    val sqlSh = viaSql.select("doc_id", "sh").collect().toSeq
    assert(sqlSh === viaDf.collect().toSeq)
    assert(viaSql.filter(col("n_sh") > 0 && col("n_fp") > 0 && col("mh0").isNotNull)
      .count() === viaSql.count())
  }

  test("graft_dot from SQL equals the DataFrame dot on a self-join sample") {
    init()
    val viaSql = spark.sql(
      """SELECT a.vec_id, graft_dot(a.embedding, b.embedding) AS d
         FROM embeddings_v a JOIN embeddings_v b ON b.vec_id = a.vec_id + 1
         ORDER BY a.vec_id""")
    val e = Tables.embeddings(spark, sfDir)
    val viaDf = e.select(col("vec_id"), col("embedding").as("ea"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb")), "vec_id")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dotExact(col("ea"), col("eb")).as("d"))
      .orderBy("vec_id")
    assert(viaSql.collect().toSeq === viaDf.collect().toSeq)
  }

  test("graft_dotf from SQL equals the DataFrame ordered fold") {
    init()
    val viaSql = spark.sql(
      """SELECT a.vec_id, graft_dotf(a.embedding, b.embedding) AS d
         FROM embeddings_v a JOIN embeddings_v b ON b.vec_id = a.vec_id + 1
         ORDER BY a.vec_id""")
    val e = Tables.embeddings(spark, sfDir)
    val viaDf = e.select(col("vec_id"), col("embedding").as("ea"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb")), "vec_id")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dotFold(col("ea"), col("eb")).as("d"))
      .orderBy("vec_id")
    assert(viaSql.collect().toSeq === viaDf.collect().toSeq)
  }
}
