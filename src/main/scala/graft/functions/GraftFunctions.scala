package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Per-session registration of the library's native Catalyst expressions
  * as SQL functions. Idempotent and cheap — called from the table loaders
  * so every code path (DataFrame API, `spark.sql`, the DuckDB-oracle
  * harness) sees the same functions. Cluster deployments can instead
  * inject them globally via [[graft.plans.GraftExtensions]].
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_dot"))) {
      reg.createOrReplaceTempFunction(
        "graft_dot", exprs => DotDecimal(exprs(0), exprs(1)), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_dotf"))) {
      reg.createOrReplaceTempFunction(
        "graft_dotf", exprs => DotFold(exprs(0), exprs(1)), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_simhash"))) {
      reg.createOrReplaceTempFunction(
        "graft_simhash", exprs => SimHash32(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_simhash64"))) {
      reg.createOrReplaceTempFunction(
        "graft_simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_shingles"))) {
      reg.createOrReplaceTempFunction(
        "graft_shingles", exprs => ShingleSet(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_shingle_sids"))) {
      reg.createOrReplaceTempFunction(
        "graft_shingle_sids", exprs => ShingleSids(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_minhash"))) {
      reg.createOrReplaceTempFunction(
        "graft_minhash", exprs => MinHashSig(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_winnow"))) {
      reg.createOrReplaceTempFunction(
        "graft_winnow", exprs => Winnow(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_ahash64"))) {
      reg.createOrReplaceTempFunction(
        "graft_ahash64", exprs => AHash64(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_dhash64"))) {
      reg.createOrReplaceTempFunction(
        "graft_dhash64", exprs => DHash64(exprs.head), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_gram_ids"))) {
      reg.createOrReplaceTempFunction(
        "graft_gram_ids", exprs => GramIdPairs(exprs(0), exprs(1)), "scala_udf")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_lni"))) {
      reg.createOrReplaceTempFunction(
        "graft_lni", exprs => LnInt(exprs.head), "scala_udf")
    }
  }
}
