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

  test("encode executor: ids in range, OOV-free, decode lossless, " +
      "and the id stream replays an independent piece->id mapping") {
    val rows = Tokenize.bpeEncodeQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ids_ok"), s"doc ${r.get(0)}: id range")
      assert(r.getAs[Boolean]("oov_zero"), s"doc ${r.get(0)}: OOV id")
      assert(r.getAs[Boolean]("decode_ok"),
        s"doc ${r.get(0)}: id decode diverged from the char stream")
      assert(r.getAs[Boolean]("len_ok"), s"doc ${r.get(0)}: id/token " +
        "length mismatch")
    }
    // independent replay of the vocabulary recipe: every token the
    // segmenter emits must be a base char or a merge output, so the
    // sorted (alphabet ++ merge-outputs) vocab covers the token set
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = Tokenize.buildMerges(spark, sfDir)
    val toks = docs
      .select(explode(Tokenize.bpeTokens(col("text"), merges)).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    val alphabet = docs.select(col("text")).collect()
      .flatMap(_.getString(0).replace(" ", "").toSeq.map(_.toString))
      .toSet
    val vocab = alphabet ++ merges.map(_.split(' ').mkString)
    assert(toks.subsetOf(vocab),
      s"tokens outside the derived vocab: ${toks.diff(vocab).take(5)}")
  }

  private def viterbi(text: String, pieces: Seq[String],
      logps: Seq[Double]): Seq[String] =
    df(text).select(call_function("graft_unigram", col("text"),
      typedLit(pieces), typedLit(logps))).collect().head.getSeq[String](0)

  test("unigram Viterbi replays a hand-computed segmentation") {
    // "abc" under p(ab)=-0.5, p(a)=-1, p(b)=-2, p(c)=-3:
    //   [ab, c] = -3.5 beats [a, b, c] = -6.0
    assert(viterbi("abc", Seq("ab", "a", "b", "c"),
      Seq(-0.5, -1.0, -2.0, -3.0)) == Seq("ab", "c"))
    // exact tie [ab] = -3.0 vs [a, b] = -3.0: the longer piece wins
    assert(viterbi("ab", Seq("ab", "a", "b"),
      Seq(-3.0, -1.0, -2.0)) == Seq("ab"))
    // per-word segmentation across spaces, stream concatenated
    assert(viterbi("ab ab", Seq("ab", "a", "b"),
      Seq(-0.5, -1.0, -2.0)) == Seq("ab", "ab"))
  }

  test("unigram: out-of-model characters fall back to single chars") {
    assert(viterbi("xy", Seq("x"), Seq(-0.5)) == Seq("x", "y"))
  }

  test("unigram E-step replays hand-computed forward-backward " +
      "expected counts and marginal likelihood") {
    // word "ab", two lattice paths: [ab] with weight e^{-1} and
    // [a, b] with weight e^{-0.5-2.0}; Z = e^{-1} + e^{-2.5}
    val (lab, la, lb) = (-1.0, -0.5, -2.0)
    val w1 = math.exp(lab)
    val w2 = math.exp(la + lb)
    val z = w1 + w2
    val rows = df("ab").select(explode(
        call_function("graft_unigram_ecounts", col("text"),
          typedLit(Seq("ab", "a", "b")), typedLit(Seq(lab, la, lb))))
        .as("pe"))
      .select(col("pe.piece"), col("pe.ec")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows("") - math.log(z)) < 1e-12,
      s"marginal LL sentinel: ${rows("")} vs ${math.log(z)}")
    assert(math.abs(rows("ab") - w1 / z) < 1e-12)
    assert(math.abs(rows("a") - w2 / z) < 1e-12)
    assert(math.abs(rows("b") - w2 / z) < 1e-12)
    // expected counts cover every char position exactly once:
    // 2·ec(ab) + ec(a) + ec(b) = 2
    assert(math.abs(2 * rows("ab") + rows("a") + rows("b") - 2.0) < 1e-12)
  }

  test("unigram fit is deterministic and likelihood is monotone " +
      "within each EM stage") {
    val docs = Tables.load(spark, sfDir, "documents")
    val m1 = Tokenize.fitUnigram(docs, vocabSize = 64)
    val m2 = Tokenize.fitUnigram(docs, vocabSize = 64)
    assert(m1 == m2, "refit must be bit-identical")
    assert(m1.llByStage.size == 2)
    m1.llByStage.foreach { lls =>
      lls.sliding(2).foreach {
        case Seq(a, b) => assert(b >= a - 1e-6,
          s"CEM likelihood decreased within a stage: $lls")
        case _ =>
      }
    }
    // the budget holds and single-char coverage survives the prune
    assert(m1.pieces.size <= 64 ||
      m1.pieces.forall(_.length == 1))
    assert(m1.pieces.exists(_.length > 1),
      "fit learned no multi-char pieces")
  }

  test("unigram gate query: every oracle-predicted invariant holds, " +
      "and the learned pieces actually compress") {
    val rows = Tokenize.unigramQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"doc ${r.get(0)}: unigram re-join diverged from the char stream")
      assert(r.getAs[Boolean]("compress_ok"),
        s"doc ${r.get(0)}: token count outside [1, n_chars]")
      assert(r.getAs[Boolean]("vocab_ok"),
        s"doc ${r.get(0)}: multi-char piece outside the fitted vocab")
    }
    val m = Tokenize.buildUnigram(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    val compressed = docs.select(
        (size(Tokenize.unigramTokens(col("text"), m)) <
          length(regexp_replace(col("text"), " ", ""))).as("c"))
      .collect()
    assert(compressed.exists(_.getBoolean(0)),
      "unigram segmentation never beat char-level anywhere")
  }

  test("plan: unigram E-step shuffles (piece, count) only — text " +
      "never enters an exchange; serving is codegen") {
    val docs = Tables.load(spark, sfDir, "documents")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val roundPlan = words.select(col("freq"),
        explode(call_function("graft_unigram", col("w"),
          typedLit(Seq("a")), typedLit(Seq(-1.0)))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .queryExecution.executedPlan.toString
    val exchanges = roundPlan.linesIterator
      .filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"corpus text flows through the E-step shuffle:\n$exchanges")
    val servePlan = docs.select(call_function("graft_unigram",
        col("text"), typedLit(Seq("a")), typedLit(Seq(-1.0))))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
    assert(servePlan.contains("WholeStageCodegen"),
      s"unigram serving fell out of codegen:\n${servePlan.take(2000)}")
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

  test("wordpiece fit maximizes likelihood score, not raw frequency " +
      "(hand-computed trace)") {
    // words: ab x5, a x5, b x5, cd x3
    // round 1 scores: (a b) np=5, na=10, nb=10 -> 5/100 = 0.05
    //                 (c d) np=3, nc=3,  nd=3  -> 3/9   = 0.333
    //   WordPiece merges "c d" — BPE (raw frequency) would take "a b".
    // round 2: only (a b) remains with np>=2 -> "a b"
    // round 3: every word is one symbol -> exhausted
    val corpus = df("ab ab ab ab ab", "a a a a a", "b b b b b",
      "cd cd cd")
    val m = Tokenize.fitWordpiece(corpus, 5)
    assert(m.merges == Seq("c d", "a b"), s"got ${m.merges}")
    assert(Tokenize.fitBpe(corpus, 1) == Seq("a b"),
      "trace premise: BPE prefers the frequent pair")
    // vocab = base chars ∪ final symbols, sorted
    assert(m.vocab == Seq("a", "ab", "b", "c", "cd", "d"),
      s"got ${m.vocab}")
  }

  test("wordpiece serving is greedy longest-match-first; unknown " +
      "characters collapse the word to [UNK]") {
    val m = Tokenize.WordpieceModel(Nil,
      Seq("a", "ab", "abc", "b", "c"))
    def serve(s: String): Seq[String] =
      df(s).select(Tokenize.wordpieceTokens(col("text"), m))
        .collect().head.getSeq[String](0)
    // longest match at each position, not Viterbi: abcb -> [abc, b]
    assert(serve("abcb") == Seq("abc", "b"))
    // greedy advances past shorter alternatives: aab -> [a, ab]
    assert(serve("aab") == Seq("a", "ab"))
    // a char outside the vocab kills the whole word, not the suffix
    assert(serve("axb") == Seq("[UNK]"))
    // per-word isolation: the [UNK] word does not poison neighbors
    assert(serve("ab axb c") == Seq("ab", "[UNK]", "c"))
  }

  test("wordpiece refit is deterministic and the gate invariants " +
      "hold on the real corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val m1 = Tokenize.fitWordpiece(docs, 8)
    val m2 = Tokenize.fitWordpiece(docs.repartition(7), 8)
    assert(m1 == m2, "wordpiece fit must not depend on partitioning")
    val rows = Tokenize.wordpieceQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"roundtrip_ok false for doc ${r.getLong(0)}")
      assert(r.getBoolean(3), s"compress_ok false for doc ${r.getLong(0)}")
      assert(r.getBoolean(4), s"vocab_ok false for doc ${r.getLong(0)}")
    }
  }

  test("bpeDrift: driver recompute of per-language snapshot token " +
      "sums, ratios, and the drift bound") {
    val rows = Tokenize.bpeDriftQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val merges = Tokenize.buildSnapshotMerges(spark, sfDir)
    assert(merges.nonEmpty, "snapshot fit must produce merges")
    val rank = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case (m, i) => rank.put(m, i) }
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
    // independent segmentation via the Java kernel entry point
    val toks = scala.collection.mutable.Map[(String, Long), Long]()
      .withDefaultValue(0L)
    docs.foreach { r =>
      val n = graft.functions.VectorKernels.bpeTokensJava(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          Option(r.getString(2)).getOrElse("")), rank).numElements()
      toks((r.getString(1), r.getLong(0) % 2)) += n
    }
    rows.foreach { r =>
      val lang = r.getString(0)
      val (ta, tb) = (toks((lang, 0L)), toks((lang, 1L)))
      val (ca, cb) = (r.getLong(3), r.getLong(4))
      assert(r.getBoolean(5) && r.getBoolean(6), s"$lang bounds flags")
      assert(ta <= ca && tb <= cb, s"$lang recomputed token sums exceed chars")
      assert(r.getBoolean(7) == (ta < ca && tb < cb),
        s"$lang merges_applied vs recompute")
      val drift = math.abs(tb.toDouble / cb - ta.toDouble / ca)
      assert(r.getBoolean(8) == (drift <= 0.1),
        s"$lang drift_ok vs recomputed drift $drift")
      assert(drift <= 0.1, s"$lang drift $drift outside the envelope")
    }
  }
}
