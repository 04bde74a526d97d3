package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/**
 * Cell-population diagnostic for the semantic-dedup quantizer (r18):
 * fits the dynamic-k quantizer exactly as [[Similarity.semanticDedupQuery]]
 * does, then reports the cell-size distribution and the pair budget
 * Σ|cell|²/2 — the number the in-cell pair join actually executes.
 * A balanced quantizer gives Σ|cell|²/2 ≈ n·1024/2; skewed cells
 * inflate it quadratically, which is the scale question this answers.
 */
object CellHist {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = graft.Tables.load(spark, sfDir, "embeddings").count()
    val k = if (n <= 20000L) 8 else (n / 1024L).toInt
    val sizes = Similarity.kmeansAssignmentsFast(spark, sfDir, k, 2)
      .groupBy(col("cell")).agg(count(lit(1)).as("m"))
      .select(col("m")).as[Long].collect().sorted.reverse
    val pairBudget = sizes.map(m => m * (m - 1) / 2).sum
    println(s"[hist] n=$n k=$k cells_used=${sizes.length} " +
      s"mean=${n / math.max(sizes.length, 1)} " +
      s"top10=${sizes.take(10).mkString(",")} " +
      s"pair_budget=$pairBudget balanced=${n * 1024 / 2}")
    spark.stop()
  }
}
