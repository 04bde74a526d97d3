package graft.tools

/**
 * Two-JVM warm-start demo (r18, VERDICT r17 #5): run this main TWICE
 * with the same `GRAFT_STORE_DIR` — the first process builds the
 * standing stores into the durable catalog, the second must serve
 * warm (wall collapses to the serve cost; no refit jobs). Usage:
 *
 *   GRAFT_STORE_DIR=/tmp/graft_stores \
 *     sbt "runMain graft.tools.WarmStart /root/testdata/sf0.1"
 */
object WarmStart {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[warmstart] catalog root = ${graft.StoreCatalog.root}")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[warmstart] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    t("q_index_serve")(
      graft.operators.Retrieval.indexServeQuery(spark, sfDir))
    t("q_lang_id2")(
      graft.operators.TextAnalysis.langId2Query(spark, sfDir))
    t("q_pq_append")(
      graft.operators.Similarity.pqAppendQuery(spark, sfDir))
    spark.stop()
  }
}
