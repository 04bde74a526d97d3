package graft.tools
import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Measurement CLI behind `q_dedup_minhash`'s gate bounds: joins every
  * LSH candidate back to its exact shingle-set Jaccard and prints the
  * max estimate error and min exact similarity observed, from which the
  * gate's 0.25 / 0.4 margins were set (measured 0.12 / 0.8 at
  * sf0.01–sf0.1). Driver-side by design — it exists to measure, not
  * to serve. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(Dedup.hashedShingles(col("text"))).as("sh"))
    val cand = Dedup.minhashLshQuery(spark, sfDir)
    val j = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("exact",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("est_jaccard"), col("exact"),
        abs(col("est_jaccard") - col("exact")).as("err"))
    j.agg(count(lit(1)), max(col("err")), min(col("exact"))).show(false)
    spark.stop()
  }
}
