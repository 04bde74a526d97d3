package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end training-corpus cleaning pipeline — the composition the
 * north-star operators exist for: quality filter → language filter →
 * exact dedup (keep lowest doc_id) → cleaned corpus with scores.
 *
 * Single pass over the corpus for the scoring stages (all codegen'd
 * column expressions, no shuffle), then one digest-keyed shuffle for
 * the dedup — the minimal shuffle count for this semantics. At 100 TB
 * every stage before the dedup is embarrassingly parallel.
 */
object Pipeline {

  /** Quality score exactly as [[TextAnalysis.qualityQuery]] — same
    * one-pass native token-stats kernel. */
  private def qualityScore = {
    val ts = TextAnalysis.tokenStats(col("text"))
    val nTok = ts.getField("n_tok").cast("double")
    val nStop = ts.getField("n_stop").cast("double")
    val nShort = ts.getField("n_short").cast("double")
    val nDistinct = ts.getField("n_distinct").cast("double")
    (nStop / nTok) * 0.25 + (nDistinct / nTok) * 0.5 +
      (lit(1.0) - nShort / nTok) * 0.25
  }

  /**
   * Correctness-gate query: clean the documents table — quality ≥ 0.5,
   * keep one doc per distinct text (lowest doc_id), emit scores.
   * The whole chain is SQL-expressible so the oracle replays it.
   */
  def cleanCorpusQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .withColumn("quality_score", qualityScore)
      .filter(col("quality_score") >= 0.5)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .orderBy(col("doc_id"))

  /**
   * Full curation pipeline — the round-trip composition of every gate
   * a pretraining corpus passes: quality score ≥ 0.5, repetition gates
   * (Gopher-style dup/top bigram fractions, [[Curation.repetition]]),
   * benchmark decontamination ([[Curation.contamination]], 4-gram
   * overlap with the doc_id%50==0 eval slice — those eval docs are
   * themselves excluded from the corpus), then exact dedup keep-first.
   *
   * Plan shape: all three scoring gates are narrow codegen'd
   * projections over ONE scan; contamination adds one broadcast join
   * against the (tiny) eval n-gram set; dedup adds the single
   * digest-keyed shuffle. Nothing here changes at 100 TB.
   */
  def curateCorpusQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val contaminated = Curation.contamination(
      train, docs.filter(col("doc_id") % 50 === 0), n = 4)
      .select(col("doc_id"))
    val rep = call_function("graft_ngram_rep", col("text"), lit(2))
    val nGrams = col("_r.n_grams")
    val dupFrac = when(nGrams === 0, lit(0.0))
      .otherwise(lit(1.0) -
        col("_r.n_distinct").cast("double") / nGrams.cast("double"))
    val topFrac = when(nGrams === 0, lit(0.0))
      .otherwise(col("_r.top_count").cast("double") / nGrams.cast("double"))
    train
      .withColumn("quality_score", qualityScore)
      .withColumn("_r", rep)
      .filter(col("quality_score") >= 0.5 &&
        dupFrac <= 0.1 && topFrac <= 0.1)
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .orderBy(col("doc_id"))
  }
}
