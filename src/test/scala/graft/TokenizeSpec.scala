package graft

import graft.operators.Tokenize
import org.apache.spark.sql.functions._

/** BPE trainer/tokenizer gates: a hand-computed merge trace (the
  * Sennrich counting semantics, ties lexicographic), character
  * preservation, monotone compression, refit determinism, and the
  * fit's distributed shape (text never shuffles). */
class TokenizeSpec extends SparkSpec {

  private def df(texts: String*) = {
    val ss = spark
    import ss.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("fit replays the hand-computed merge trace on aaab x3") {
    // words: aaab, aaab, aaab
    // round 1: pairs (a a)x6, (a b)x3            -> merge "a a"
    // round 2: segm [aa,a,b]; (aa a)x3, (a b)x3  -> tie, lex -> "a b"
    // round 3: segm [aa,ab]; (aa ab)x3           -> merge "aa ab"
    // round 4: single symbol per word, no pairs  -> exhausted
    val merges = Tokenize.fitBpe(df("aaab aaab", "aaab"), 5)
    assert(merges == Seq("a a", "a b", "aa ab"), s"got $merges")
    val toks = df("aaab").select(
      Tokenize.bpeTokens(col("text"), merges)).collect()
      .head.getSeq[String](0)
    assert(toks == Seq("aaab"))
  }

  test("zero merges tokenizes to code points (surrogates intact)") {
    val toks = df("ab 😀c").select(
      Tokenize.bpeTokens(col("text"), Nil)).collect()
      .head.getSeq[String](0)
    assert(toks == Seq("a", "b", "😀", "c"))
  }

  test("merges preserve characters and only ever shrink token count") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = Tokenize.fitBpe(docs, 12)
    assert(merges.nonEmpty)
    val rows = docs.select(
      regexp_replace(col("text"), " ", "").as("squashed"),
      concat_ws("", Tokenize.bpeTokens(col("text"), merges)).as("joined"),
      size(Tokenize.bpeTokens(col("text"), merges)).as("n_bpe"),
      size(Tokenize.bpeTokens(col("text"), Nil)).as("n_char"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        "BPE must never alter the character stream")
      assert(r.getInt(2) <= r.getInt(3),
        "BPE tokens must not exceed character tokens")
    }
    // learned merges must actually compress somewhere
    assert(rows.exists(r => r.getInt(2) < r.getInt(3)))
  }

  test("refit is deterministic") {
    val docs = Tables.load(spark, sfDir, "documents")
    assert(Tokenize.fitBpe(docs, 8) == Tokenize.fitBpe(docs, 8))
  }

  test("gate query: every invariant the oracle predicts holds") {
    val rows = Tokenize.bpeQuery(spark, sfDir, nMerges = 8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"doc ${r.get(0)}: BPE re-join diverged from the char stream")
      assert(r.getAs[Boolean]("compress_ok"),
        s"doc ${r.get(0)}: token count outside [1, n_chars]")
      assert(r.getAs[Int]("n_chars") >= 0)
    }
  }

  test("plan: per-round pair count shuffles (pair, count) only — " +
      "text never enters an exchange") {
    val docs = Tables.load(spark, sfDir, "documents")
    val roundPlan = docs
      .select(explode(call_function("graft_bpe_pairs",
        col("text"), typedLit(Seq("a a")))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    val exchanges = roundPlan.linesIterator
      .filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"corpus text flows through the fit shuffle:\n$exchanges")
    assert(roundPlan.contains("partial_count") ||
      roundPlan.contains("HashAggregate"),
      s"pair count must partial-aggregate map-side:\n$roundPlan")
  }
}
