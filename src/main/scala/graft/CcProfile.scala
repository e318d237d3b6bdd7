package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc wall-clock breakdown of the CC pipeline phases (candidate
  * generation vs star rounds) — local profiling aid, not a driver surface. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val tp = t("minhash pairs")(
        graft.operators.Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b"))
          .localCheckpoint())
      val ep = t("embedding pairs")(
        graft.operators.Dedup.embeddingNearDup(emb)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).localCheckpoint())
      println(s"[cc] edges: text=${tp.count()} emb=${ep.count()}")
      t("star CC on union")(
        graft.operators.Dedup.clustersStar(tp.unionByName(ep)).count())
      t("propagation CC on text")(
        graft.operators.Dedup.clusters(tp).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
