package graft.tools
import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Measurement CLI behind the ANN recall-gate floors
  * (`Similarity.recallGate`): prints mean/min recall of each serving
  * path (ivf, lsh, pq, ivfpq) against in-engine brute force, from
  * which the gate floors were set with margin (measured ivf .54–.62,
  * lsh .10–.12, pq .32–.44, ivfpq .36–.52 at sf0.01–sf0.1).
  * Driver-side by design — it exists to measure, not to serve. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    val exact = ranks(Similarity.annBruteForceQuery(spark, sfDir))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def mean(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val approx = ranks(df).groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, ex) =>
        approx.getOrElse(q, Set.empty).count(ex).toDouble / ex.size }
      println(f"[recall] $name%-14s mean=${rs.sum / rs.size}%.4f min=${rs.min}%.4f")
    }
    mean("ivf", Similarity.ivfTopK(spark, sfDir))
    mean("lsh", Similarity.lshBucketQuery(spark, sfDir))
    mean("pq", Similarity.annPqQuery(spark, sfDir))
    mean("ivfpq", Similarity.annIvfPqQuery(spark, sfDir))
    spark.stop()
  }
}
