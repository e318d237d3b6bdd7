package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY §2.C6-C7).
  *
  * Baseline: brute-force cosine top-k — the QUERY side is small and
  * broadcast, so the corpus streams through one codegen'd stage
  * (zip_with/aggregate dot product, no explode, no shuffle of the corpus
  * beyond the final per-query top-k). Scale path: sign-LSH bucketing —
  * candidates come from one hash-partitioned bucket join, turning
  * O(|Q|·|corpus|) into O(|Q|·bucket_size).
  */
object Similarity {

  private def withFeat(embeddings: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    embeddings.select(
      col("vec_id"), col("embedding"),
      VectorFunctions.signBucket(col("embedding")).as("bucket"),
      VectorFunctions.normExact(col("embedding")).as("nrm"))
  }

  /** Exact top-k cosine neighbors for queries `vec_id < nQueries`. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 10): DataFrame = {
    val feat = withFeat(embeddings)
    val q = feat.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("q_nrm"))
    val c = feat.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("nrm").as("c_nrm"))
    val rk = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", VectorFunctions.dotExact(col("qe"), col("ce")))
      .withColumn("cosine", col("dot") / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .orderBy("query_id", "rank")
  }

  /** IVF-style approximate top-k: corpus vectors are assigned to their
    * nearest coarse centroid (the "inverted file" cells); a query probes
    * its `nProbe` nearest cells and ranks only those candidates. Centroids
    * here are the first `nCentroids` vectors (deterministic stand-in for
    * offline k-means — the index structure and probe path are the real
    * thing). Scale: assignment is |corpus|×K broadcast work, probing is
    * |Q|·(nProbe/K) of the corpus — the standard recall/cost dial. */
  def ivfTopK(
      embeddings: DataFrame,
      nCentroids: Int = 16, nQueries: Int = 8, nProbe: Int = 2, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val feat = embeddings.select(
      col("vec_id"), col("embedding"),
      VectorFunctions.normExact(col("embedding")).as("nrm"))
    val centX = feat.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cent"), col("nrm").as("cent_nrm"))
    val byVec = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    val assigned = feat.crossJoin(broadcast(centX))
      .withColumn("ccos",
        VectorFunctions.dotExact(col("embedding"), col("cent")) / (col("nrm") * col("cent_nrm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid").as("cell"))
    val probes = feat.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("q_nrm"))
      .crossJoin(broadcast(centX))
      .withColumn("qcos",
        VectorFunctions.dotExact(col("qe"), col("cent")) / (col("q_nrm") * col("cent_nrm")))
      .withColumn("qrn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("qcos").desc, col("cid"))))
      .filter(col("qrn") <= nProbe)
      .select(col("query_id"), col("qe"), col("q_nrm"), col("cid").as("cell"))
    val rk = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    probes
      .join(assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        col("nrm").as("c_nrm"), col("cell")), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        VectorFunctions.dotExact(col("qe"), col("ce")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * sign bucket. Recall trades against bucket width (nBits). */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 10): DataFrame = {
    val feat = withFeat(embeddings)
    val q = feat.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("q_nrm"), col("bucket"))
    val c = feat.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      col("nrm").as("c_nrm"), col("bucket"))
    val rk = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", VectorFunctions.dotExact(col("qe"), col("ce")))
      .withColumn("cosine", col("dot") / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .orderBy("query_id", "rank")
  }
}
