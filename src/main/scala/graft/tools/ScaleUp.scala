package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-factor multiplier for the benchmark tables: builds an N×
 * corpus from a base sf directory by replicating each table with
 * id-space remapping, so scaling evidence (does a plan's wall time
 * grow linearly with data?) can be measured beyond the largest
 * driver-provided sf.
 *
 * Replication preserves WORKLOAD SHAPE, not just row count:
 *  - every id column shifts by `copy × 10^9` so keys stay unique and
 *    join/group cardinalities scale linearly;
 *  - document text is token-suffixed per copy (`regexp_replace` of
 *    the token separator), so shingle sets of different copies are
 *    DISJOINT — near-dup/cluster structure replicates per copy
 *    instead of every doc gaining factor−1 cross-copy near-dups
 *    (which would quadratically inflate the pair graph and measure a
 *    different problem);
 *  - copy 0 is byte-identical to the base corpus.
 *
 * Usage: runMain graft.tools.ScaleUp <baseSfDir> <outDir> <factor>
 */
object ScaleUp {

  private val CopyStride = 1000000000L

  private def replicate(base: DataFrame, factor: Int)(
      remap: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => remap(base, i)).reduce(_.unionAll(_))

  def scaleUp(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    def shift(c: String, i: Int) = col(c) + lit(i.toLong * CopyStride)

    val lineitem = replicate(
      spark.read.parquet(Tables.path(baseDir, "lineitem")), factor) {
      (df, i) => df.withColumn("l_orderkey", shift("l_orderkey", i))
    }
    val documents = replicate(
      spark.read.parquet(Tables.path(baseDir, "documents")), factor) {
      (df, i) =>
        val mutated =
          if (i == 0) df
          // suffix every non-final token with the copy tag: all 3-gram
          // shingles differ across copies → no cross-copy dup edges
          else df.withColumn("text",
            regexp_replace(col("text"), lit(" "), lit(s"~$i ")))
        mutated.withColumn("doc_id", shift("doc_id", i))
    }
    val embeddings = replicate(
      spark.read.parquet(Tables.path(baseDir, "embeddings")), factor) {
      (df, i) => df.withColumn("vec_id", shift("vec_id", i))
    }
    val events = replicate(
      spark.read.parquet(Tables.path(baseDir, "events")), factor) {
      (df, i) => df
        .withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))
    }

    Seq("lineitem" -> lineitem, "documents" -> documents,
      "embeddings" -> embeddings, "events" -> events).foreach {
      case (name, df) =>
        df.write.mode("overwrite").parquet(Tables.path(outDir, name))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <baseSfDir> <outDir> <factor>")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleUp(spark, args(0), args(1), args(2).toInt)
    println(s"scaled ${args(0)} ×${args(2)} → ${args(1)}")
    spark.stop()
  }
}
