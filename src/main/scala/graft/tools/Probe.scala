package graft.tools
import graft.functions.VectorOps.{foldRound => fr}
import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Ad-hoc plan/size probe used while iterating (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2fs"); r
    }
    // media near-dup phase costs, staged
    val rawFeats = t("extractFeatures+ckpt")(
      Multimodal.extractFeatures(spark,
        Multimodal.syntheticMedia(spark, sfDir)).localCheckpoint())
    val m0 = t("kmeans seed+count")( {
      val n = rawFeats.count(); n } )
    println("[probe] n=" + m0)
    val cents = t("fitCentroidMatrix k=256")(
      Similarity.fitCentroidMatrix(
        rawFeats.select(col("media_id").as("vec_id"), col("embedding")),
        k = 256))
    t("assign+write")(
      rawFeats.withColumn("cells", call_function("graft_nearest_cells",
        col("embedding"), Similarity.centroidLit(cents), lit(2)))
        .write.mode("overwrite").parquet("/tmp/probe_feats"))
    t("feature store build")(Multimodal.buildFeatureStore(spark, sfDir))
    t("neardup pass 1 (cached)")(
      Multimodal.mediaNearDupQuery(spark, sfDir).count())
    t("neardup pass 2 (cached)")(
      Multimodal.mediaNearDupQuery(spark, sfDir).count())
    // candidate-pair count inside the bucketed self-join
    val feats = spark.read.parquet(Multimodal.buildFeatureStore(spark, sfDir))
    println("[probe] feats rows=" + feats.count())
    val celled = feats.select(col("media_id"), col("kind"),
      explode(col("cells")).as("cell"))
    println("[probe] occupied cells=" + celled
      .select(col("kind"), col("cell")).distinct().count())
    val aa = celled.select(col("media_id").as("media_a"), col("kind"), col("cell"))
    val bb2 = celled.select(col("media_id").as("media_b"), col("kind"), col("cell"))
    println("[probe] candidate pairs=" + aa.join(bb2, Seq("kind", "cell"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b")).distinct().count())
    // recall vs kind-blocked brute force at the 0.999 threshold
    val af = feats.select(col("media_id").as("media_a"), col("kind"),
      col("embedding").as("emb_a"))
    val bf = feats.select(col("media_id").as("media_b"), col("kind"),
      col("embedding").as("emb_b"))
    val brute = af.join(bf, Seq("kind"))
      .filter(col("media_a") < col("media_b"))
      .withColumn("cos_sim", fr(
        graft.functions.VectorOps.cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos_sim") >= 0.999)
      .select(col("media_a"), col("media_b"))
    val bucketed = Multimodal.mediaNearDupQuery(spark, sfDir)
      .select(col("media_a"), col("media_b"))
    println("[probe] brute pairs=" + brute.count()
      + " bucketed pairs=" + bucketed.count()
      + " missed=" + brute.except(bucketed).count())
    spark.stop()
  }
}
