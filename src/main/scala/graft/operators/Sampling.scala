package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deterministic sampling operators for training-data pipelines.
 *
 * A 100 TB corpus is never trained on whole during ablations; the two
 * shapes every pipeline needs are (a) Bernoulli sampling that is
 * *reproducible and repartition-stable* — membership decided by a
 * content hash, never by `rand()` whose draw depends on task layout —
 * and (b) fixed-size per-stratum samples for balanced eval sets.
 *
 * Both are expressed over cryptographic digests (md5) so the DuckDB
 * oracle replays membership bit-for-bit, and both scale: the Bernoulli
 * filter is embarrassingly parallel (a pushable predicate over a
 * projection), and the stratified top-k is one window shuffle on the
 * stratum key. (The reference has no sampling surface — this is part of
 * the LLM-pipeline extension in BASELINE.json's north star.)
 */
object Sampling {

  /** Membership column for rate ≈ `numerator`/256: first md5 byte of
    * the keying column compared against a threshold. Hex compare is
    * correct because both hex digits are lowercase and fixed-width. */
  def hashBernoulli(key: Column, numerator: Int): Column =
    substring(md5(key), 1, 2) < lit(f"$numerator%02x")

  /**
   * Content-hash Bernoulli sample at ~15.6% (40/256): stable under
   * re-runs, repartitions and cluster-size changes, and deduplicating
   * (identical texts land on the same side of the threshold).
   */
  def hashSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .filter(hashBernoulli(col("text"), 40))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("text")), 1, 2).as("hash_bucket"))
      .orderBy(col("doc_id"))

  /**
   * Fixed-size per-stratum sample: k docs per language, chosen by
   * md5 order (a deterministic "random" permutation), ties broken by
   * doc_id. One window shuffle on the stratum key; at extreme scale
   * with few strata, pre-filter with [[hashBernoulli]] at a few times
   * the target rate first so the sort input per stratum is bounded.
   */
  def stratifiedSampleQuery(spark: SparkSession, sfDir: String,
      k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("text")), col("doc_id"))
    Tables.load(spark, sfDir, "documents")
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= k)
      .select(col("lang"), col("pick"), col("doc_id"))
      .orderBy(col("lang"), col("pick"))
  }
}
