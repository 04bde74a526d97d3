package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sparse-retrieval operators for training-data pipelines: BM25 scoring
 * (the ranking function behind corpus search / quality-by-relevance
 * selection) and fixed-window chunking with overlap (the RAG /
 * context-window preparation pass).
 *
 * Both are designed scan-shaped for 100 TB: BM25 never builds an
 * inverted index — the query-term frequencies come from ONE native
 * tokenize+probe pass per document ([[graft.functions.VectorKernels.CountInSets]]),
 * corpus statistics (N, avgdl, per-term df) reduce map-side to a single
 * broadcast row, and the only wide operation is the final global top-k
 * (Spark's TakeOrderedAndProject — no full sort). Chunking is a pure
 * codegen'd projection + posexplode: zero shuffle, output streamed.
 */
object Retrieval {

  // BM25 free parameters (Robertson/Sparck Jones convention): k1 = 1.2,
  // b = 0.75. Inlined below as the literals 2.2 (= k1+1), 1.2, 0.25
  // (= 1−b) and 0.75 so the Scala expression tree and the SQL oracle
  // carry the SAME double constants — a compile-time k1+1.0 could round
  // differently from the literal 2.2.

  /**
   * BM25 top-k over the `documents` table for a fixed term query.
   *
   * score(d) = Σ_t ln(1 + (N − df_t + ½)/(df_t + ½)) ·
   *            tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *
   * Shape at 100 TB: one narrow kernel scan computes (tf_1..tf_q, dl)
   * per doc; N, avgdl and every df fold into ONE map-side-partial
   * aggregate row that is broadcast back; scoring is a codegen'd
   * projection; the top-k is a bounded-heap TakeOrdered, not a sort.
   * The corpus text never shuffles.
   */
  def bm25Query(spark: SparkSession, sfDir: String,
      terms: Seq[String] = Seq("spark", "query", "table"),
      k: Int = 20): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val tfs = call_function("graft_count_in_sets", col("text"),
      typedLit(terms.map(Seq(_))))
    val perDoc = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("double").as("dl"),
      tfs.as("tfs"))
    // N, total token count, and df per query term in one partial-agg row
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum((element_at(col("tfs"), i + 1) > 0).cast("long"))
          .cast("double").as(s"df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl") / col("n_docs")
    // idf and saturation written in the exact shape the oracle replays:
    // IEEE ops are deterministic given an identical expression tree.
    val score = terms.indices.map { i =>
      val tf = element_at(col("tfs"), i + 1).cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * (tf * 2.2) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 4))
      .filter(col("score") > 0)
      .select(col("doc_id") +: col("dl").cast("long").as("dl") +:
        terms.indices.map(i =>
          element_at(col("tfs"), i + 1).as(s"tf_$i")) :+
        col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Chunking free parameters: window (words per chunk) and stride. */
  private val Window = 32
  private val Stride = 24

  /**
   * Fixed word-window chunking with overlap — the RAG / long-document
   * preparation pass. Chunk i covers words [i·stride, i·stride+window);
   * the chunk count is 1 + max(0, ⌈(n − window)/stride⌉), so a document
   * shorter than one window yields exactly one chunk and no chunk is
   * fully contained in its predecessor.
   *
   * Pure projection + posexplode — zero shuffle; at 100 TB each task
   * streams its documents through codegen and emits chunks inline.
   */
  def chunkQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    val nChunks = (lit(1) + greatest(lit(0),
      ceil((n - lit(Window)).cast("double") / Stride).cast("int")))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), toks.as("toks"),
        posexplode(sequence(lit(0), nChunks - 1)))
      .select(
        col("doc_id"),
        col("pos").as("chunk_idx"),
        concat_ws(" ",
          slice(col("toks"), col("pos") * Stride + 1, lit(Window)))
          .as("chunk"))
      .withColumn("n_words", size(split(col("chunk"), " ")))
      .withColumn("chunk_md5", md5(col("chunk")))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }
}
