package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/**
 * Fit-phase wall probe (r18, VERDICT r17 #1): times JUST the k-means
 * fit of the two dynamic-k consumers — the semantic-dedup quantizer
 * (k = n/1024, L2) and the media feature-store coarse quantizer
 * (k = max(256, n/1024), cosine) — so the sf10→sf100 exponent of the
 * FIT itself is measured, not inferred from whole-query walls.
 * Output lines use the TimeProbe format so deepscale_report.py can
 * ingest them (`[time] fit_semantic pass1 12.34 s`).
 */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[time] $name pass1 ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm-up
    Tables.load(spark, sfDir, "embeddings").count()

    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val kSem = if (n <= 20000L) 8 else (n / 1024L).toInt
    println(s"[fit] semantic k=$kSem n=$n")
    t("fit_semantic") {
      val m = Similarity.kmeansCentroids(emb, kSem, 2, l2 = true)
        .orderBy(col("cent_id")).collect()
      require(m.nonEmpty)
    }

    val feats = Multimodal.extractFeatures(
        spark, Multimodal.syntheticMedia(spark, sfDir))
      .localCheckpoint()
    val nMedia = feats.count()
    val kMedia = math.max(256L, nMedia / 1024L).toInt
    println(s"[fit] media k=$kMedia n=$nMedia")
    t("fit_media") {
      val m = Similarity.fitCentroidMatrix(
        feats.select(col("media_id").as("vec_id"), col("embedding")),
        k = kMedia)
      require(m.nonEmpty)
    }
    spark.stop()
  }
}
