package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Subword tokenization for training pipelines: a real byte-pair-
 * encoding trainer and tokenizer (Sennrich et al., ACL 2016) — the
 * step every pretraining corpus goes through between curation and
 * packing, upgrading the BPE-ish regex proxy in
 * [[TextAnalysis.tokenStatsQuery]] to actual learned merges.
 *
 * Training is the distributed half: each merge round counts adjacent
 * symbol pairs over the whole corpus with ONE native kernel pass +
 * one map-side-partial aggregated shuffle of (pair, count) rows —
 * corpus text never shuffles, and the only driver material is the
 * single winning pair per round (the k-means / logistic-GD fit
 * pattern). Serving folds the learned merge table into a codegen'd
 * projection ([[graft.functions.VectorKernels.BpeTokens]]) — zero
 * shuffle, model as literal.
 *
 * A production trainer maintains incremental pair-count deltas
 * instead of re-scanning per round; the re-scan here keeps the fit a
 * pure function of the corpus (reproducible run-to-run), and rounds
 * are few (vocab budget), so the cost is rounds × one narrow scan.
 */
object Tokenize {

  /**
   * Fit `nMerges` BPE merges on the corpus: each round takes the
   * globally most frequent adjacent pair (ties broken lexicographically
   * so the fit is deterministic), then re-segments under the grown
   * table. The text projection is cached for the duration of the fit
   * so the source is scanned once, not once per round.
   */
  def fitBpe(docs: DataFrame, nMerges: Int): Seq[String] = {
    val text = docs.select(col("text")).persist()
    try {
      var merges = Vector.empty[String]
      var round = 0
      var exhausted = false
      while (round < nMerges && !exhausted) {
        val top = text
          .select(explode(call_function("graft_bpe_pairs",
            col("text"), typedLit(merges))).as("pair"))
          .groupBy(col("pair"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(1)
          .collect()
        if (top.isEmpty || top(0).getLong(1) < 2) exhausted = true
        else merges = merges :+ top(0).getString(0)
        round += 1
      }
      merges
    } finally text.unpersist()
  }

  private val mergeCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Seq[String]]

  /** Offline model build: fit (or reuse) the merge table for a corpus —
    * the [[Similarity.buildIndex]] pattern; the fit is the offline half
    * of the tokenizer's serving path. Idempotent per (corpus, budget). */
  def buildMerges(spark: SparkSession, sfDir: String,
      nMerges: Int = 24): Seq[String] =
    mergeCache.getOrElseUpdate((Tables.corpusKey(sfDir), nMerges), {
      fitBpe(Tables.load(spark, sfDir, "documents"), nMerges)
    })

  /** BPE token stream of `text` under the given ordered merges. */
  def bpeTokens(text: org.apache.spark.sql.Column, merges: Seq[String])
      : org.apache.spark.sql.Column =
    call_function("graft_bpe", text, typedLit(merges))

  /**
   * Gate query: fit 24 merges, tokenize the corpus, and hash-gate the
   * tokenizer's INVARIANTS per document — the q_approx_distinct
   * bound-check pattern for model-dependent output. The merge table
   * is data-dependent state the SQL oracle cannot refit, but every
   * valid BPE segmentation must (a) reproduce the exact character
   * stream when re-joined and (b) emit between 1 and n_chars tokens;
   * the engine computes those checks against its own real
   * segmentation and the oracle emits the expected TRUEs — so any
   * apply-order, tie-break, or character-mangling regression breaks
   * the driver hash even though the segmentation itself is
   * engine-internal. The exact segmentation (hand-computed Sennrich
   * traces, seg-md5 determinism, monotone compression) stays
   * spec-gated in TokenizeSpec.
   */
  def bpeQuery(spark: SparkSession, sfDir: String,
      nMerges: Int = 24): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = buildMerges(spark, sfDir, nMerges)
    val toks = bpeTokens(col("text"), merges)
    val squashed = regexp_replace(col("text"), " ", "")
    docs.select(
      col("doc_id"),
      length(squashed).as("n_chars"),
      (concat_ws("", toks) === squashed).as("roundtrip_ok"),
      (size(toks) <= length(squashed) &&
        (size(toks) >= 1 || length(squashed) === 0)).as("compress_ok"))
      .orderBy(col("doc_id"))
  }

  /**
   * BPE ENCODE executor — the plan→exec doctrine (`q_ffd_pack` →
   * `q_ffd_pack_exec`) applied to the tokenizer family: [[bpeQuery]]
   * proves the SEGMENTATION; this materializes what a training run
   * actually consumes — integer token IDS under a deterministic
   * vocabulary, with the id→piece decode proven lossless per doc.
   *
   * Vocabulary: the corpus's distinct non-space characters (the BPE
   * base alphabet — every un-merged symbol is one of them) plus the
   * merge outputs, deduped and sorted, ids = sorted rank. Every token
   * [[bpeTokensJava]] can emit is a base char or a merge output, so
   * the encode is OOV-free BY CONSTRUCTION and the gate proves it.
   *
   * Scale shape (100 TB): the vocab is alphabet+merges-sized model
   * state (broadcast as a map literal, like the tokenizer serving
   * pass it extends); encode and decode are narrow codegen'd
   * projections over one corpus scan — no shuffle at all. The
   * alphabet collect is bounded by the character inventory, the same
   * class as the fit's merge-table collect.
   *
   * Gate (q_bpe pattern — the merge table is engine-internal, the
   * invariants are checked in-engine on the real ids): per doc,
   * `ids_ok` (every id ∈ [0, V)), `oov_zero` (no failed lookup),
   * `decode_ok` (ids → pieces → concat == the squashed text),
   * `len_ok` (one id per token).
   */
  def bpeEncodeQuery(spark: SparkSession, sfDir: String,
      nMerges: Int = 24): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = buildMerges(spark, sfDir, nMerges)
    val alphabet = docs
      .select(explode(split(regexp_replace(col("text"), " ", ""), ""))
        .as("c"))
      .filter(length(col("c")) > 0)
      .distinct().collect().map(_.getString(0)).toSeq
    val vocab = (alphabet ++ merges.map(_.split(' ').mkString))
      .distinct.sorted
    val vmap = map(vocab.zipWithIndex.flatMap { case (p, i) =>
      Seq(lit(p), lit(i)) }: _*)
    val vArr = typedLit(vocab)
    val squashed = regexp_replace(col("text"), " ", "")
    val toks = bpeTokens(col("text"), merges)
    docs
      .withColumn("ids", transform(toks, t => element_at(vmap, t)))
      .withColumn("back",
        transform(col("ids"), i => element_at(vArr, i + 1)))
      .select(
        col("doc_id"),
        length(squashed).as("n_chars"),
        coalesce(forall(col("ids"),
          i => i.isNotNull && i >= 0 && i < vocab.size), lit(true))
          .as("ids_ok"),
        (size(filter(col("ids"), i => i.isNull)) === 0).as("oov_zero"),
        (concat_ws("", col("back")) === squashed).as("decode_ok"),
        (size(col("ids")) === size(toks)).as("len_ok"))
      .orderBy(col("doc_id"))
  }

  private val snapMergeCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Seq[String]]

  /** Merge table fitted ONLY on the reference snapshot
    * (doc_id % 2 = 0) — the shipped tokenizer [[bpeDriftQuery]]
    * monitors. Idempotent per (corpus, budget). */
  def buildSnapshotMerges(spark: SparkSession, sfDir: String,
      nMerges: Int = 24): Seq[String] =
    snapMergeCache.getOrElseUpdate((Tables.corpusKey(sfDir), nMerges), {
      fitBpe(Tables.load(spark, sfDir, "documents")
        .filter(pmod(col("doc_id"), lit(2L)) === 0L), nMerges)
    })

  /**
   * Tokenizer COMPRESSION-RATIO DRIFT monitor — the
   * [[graft.operators.TextAnalysis.vocabGrowthQuery]] twin on the BPE
   * side, and the production question behind it: a tokenizer is
   * fitted once on a reference snapshot and then serves a corpus that
   * keeps moving; when tokens-per-char rises on new data, every
   * downstream training run silently pays more sequence length for
   * the same text, and the fleet needs the retrain signal BEFORE
   * that. Here the merge table fits on the doc_id-even snapshot
   * ([[buildSnapshotMerges]]) and both snapshots segment under it;
   * the per-language ratio pair is the drift series.
   *
   * Gate (the q_bpe invariant doctrine — the merge table is
   * engine-internal model state no SQL oracle can refit): the exact
   * columns (per-language doc/char counts for both snapshots) replay
   * in SQL, and the engine checks its own real token streams against
   * the theorems — token sums bounded by [nonempty docs, chars] on
   * each snapshot, merges genuinely applied on both (toks < chars —
   * the fixture carries merge-rich text at every gate scale), and
   * the drift within the measured envelope (|Δratio| ≤ 0.1; random
   * interleaved halves measure ≤ ~0.02 at sf0.001–sf1, so the bound
   * catches a per-snapshot segmentation break with 5× margin while
   * never firing on fixture noise). Exact ratios and the drift value
   * stay spec-gated (TokenizeSpec recomputes them on the driver).
   *
   * Scale shape: one corpus scan, the merge table broadcasts inside
   * the codegen'd kernel, the shuffle carries (lang × snapshot)
   * partial sums — nothing else moves.
   */
  def bpeDriftQuery(spark: SparkSession, sfDir: String,
      nMerges: Int = 24, driftBound: Double = 0.1): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = buildSnapshotMerges(spark, sfDir, nMerges)
    val squashed = regexp_replace(col("text"), " ", "")
    val base = docs.select(col("lang"),
      pmod(col("doc_id"), lit(2L)).as("snap"),
      length(squashed).as("chars"),
      size(bpeTokens(col("text"), merges)).as("toks"))
    def side(s: Int, c: org.apache.spark.sql.Column) =
      sum(when(col("snap") === s, c).otherwise(lit(0L)))
    base.groupBy(col("lang"))
      .agg(
        side(0, lit(1L)).as("n_docs_a"), side(1, lit(1L)).as("n_docs_b"),
        side(0, col("chars").cast("long")).as("n_chars_a"),
        side(1, col("chars").cast("long")).as("n_chars_b"),
        side(0, col("toks").cast("long")).as("_t_a"),
        side(1, col("toks").cast("long")).as("_t_b"),
        side(0, when(col("chars") > 0, 1L).otherwise(0L)).as("_ne_a"),
        side(1, when(col("chars") > 0, 1L).otherwise(0L)).as("_ne_b"))
      .select(col("lang"),
        col("n_docs_a"), col("n_docs_b"),
        col("n_chars_a"), col("n_chars_b"),
        (col("_t_a") >= col("_ne_a") && col("_t_a") <= col("n_chars_a"))
          .as("bounds_ok_a"),
        (col("_t_b") >= col("_ne_b") && col("_t_b") <= col("n_chars_b"))
          .as("bounds_ok_b"),
        (col("_t_a") < col("n_chars_a") && col("_t_b") < col("n_chars_b"))
          .as("merges_applied"),
        (abs(col("_t_b").cast("double") / col("n_chars_b").cast("double") -
          col("_t_a").cast("double") / col("n_chars_a").cast("double"))
          <= driftBound).as("drift_ok"))
      .orderBy(col("lang"))
  }

  /** Fitted unigram-LM tokenizer: parallel piece/logprob arrays plus
    * the corpus marginal log-likelihood trace per EM round, grouped
    * by vocab stage (likelihood is monotone within a stage; the prune
    * between stages may drop it — that is the Kudo trade-off). */
  case class UnigramModel(pieces: Seq[String], logps: Seq[Double],
      llByStage: Seq[Seq[Double]])

  /**
   * Fit a unigram-LM subword tokenizer (Kudo, ACL 2018 — the
   * SentencePiece algorithm) by full EM over the corpus: seed a
   * candidate vocabulary from frequent substrings, then alternate
   * (E) forward-backward expected piece counts over the segmentation
   * lattice of every distinct word with (M) multinomial
   * re-estimation, pruning to the vocab budget between stages. The
   * EM theorem guarantees the corpus marginal log-likelihood is
   * non-decreasing across rounds within a stage (spec-pinned);
   * pruning keeps every single-character piece so coverage never
   * regresses. Serving segments with Viterbi ([[unigramTokens]]),
   * exactly as SentencePiece does.
   *
   * Scale shape (the BPE-trainer pattern, one better): EM iterates
   * over DISTINCT WORDS weighted by frequency, not over documents —
   * the word table is one narrow shuffle computed once and persisted,
   * and each round is a codegen'd lattice-kernel projection over it
   * plus a (piece, count) map-side-partial shuffle; only the vocab-
   * budget-sized model ever reaches the driver (the k-means /
   * logistic-GD fit pattern). Corpus text never shuffles.
   *
   * Determinism: every per-word double is a pure function of
   * (word, model) computed in fixed iteration order inside the
   * kernel; cross-row accumulation casts to DECIMAL(30,9) so the
   * shuffle-order-dependent double-sum problem never arises (the
   * exact-power-sums precedent from Stats.momentsQuery) — refits are
   * bit-identical on any partitioning.
   */
  def fitUnigram(docs: DataFrame, vocabSize: Int = 96,
      seedFactor: Int = 4, maxPieceLen: Int = 6, emRounds: Int = 2)
      : UnigramModel = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .persist()
    try {
      // Seed vocabulary: every substring up to maxPieceLen, weighted
      // by word frequency — all single chars (coverage floor) plus
      // the seedFactor·vocabSize most frequent multi-char candidates,
      // ties broken lexicographically for a deterministic fit.
      val subs = flatten(transform(
        sequence(lit(1), length(col("w"))), i => transform(
          sequence(lit(0),
            least(length(col("w")) - i, lit(maxPieceLen - 1))),
          l => col("w").substr(i, l + lit(1)))))
      val counted = words
        .select(col("freq"), explode(subs).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .persist()
      val seed = try {
        val chars = counted.filter(length(col("piece")) === 1)
        val multi = counted.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece"))
          .limit(vocabSize * seedFactor)
        chars.unionAll(multi).collect()
          .map(r => (r.getString(0), BigDecimal(r.getLong(1))))
          .sortBy(_._1).toSeq
      } finally counted.unpersist()

      def renorm(cnts: Seq[(String, BigDecimal)])
          : (Seq[String], Seq[Double]) = {
        val total = cnts.map(_._2).sum.toDouble
        (cnts.map(_._1),
          cnts.map(c => math.log(c._2.toDouble / total)))
      }

      // One EM round: forward-backward expected counts per distinct
      // word (codegen'd kernel), weighted by word frequency and
      // summed EXACTLY as DECIMAL(30,9) — plus the corpus marginal
      // log-likelihood under the CURRENT model, which rides the
      // kernel's "" sentinel row through the same aggregate.
      def emStep(pieces: Seq[String], logps: Seq[Double])
          : (Seq[(String, BigDecimal)], Double) = {
        val rows = words.select(
            explode(call_function("graft_unigram_ecounts", col("w"),
              typedLit(pieces), typedLit(logps))).as("pe"),
            col("freq"))
          .select(col("pe.piece").as("piece"),
            (col("pe.ec") * col("freq").cast("double"))
              .cast(org.apache.spark.sql.types.DecimalType(30, 9))
              .as("ec"))
          .groupBy(col("piece")).agg(sum(col("ec")).as("cnt"))
          .collect()
          .map(r => (r.getString(0), BigDecimal(r.getDecimal(1))))
          .sortBy(_._1).toSeq
        val (sentinel, cnts) = rows.partition(_._1.isEmpty)
        (cnts.filter(_._2 > 0), sentinel.head._2.toDouble)
      }

      def stage(init: Seq[(String, BigDecimal)])
          : (Seq[(String, BigDecimal)], Seq[Double]) = {
        var cnts = init
        var lls = Vector.empty[Double]
        (0 until emRounds).foreach { _ =>
          val (pieces, logps) = renorm(cnts)
          val (ec, ll) = emStep(pieces, logps)
          cnts = ec
          lls = lls :+ ll
        }
        (cnts, lls)
      }

      val (afterSeed, lls1) = stage(seed)
      // Prune to budget: keep every single-char piece, then the
      // highest-expected-count multi-char pieces up to vocabSize.
      val (chars1, multi1) = afterSeed.partition(_._1.length == 1)
      val kept = chars1 ++ multi1
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - chars1.size))
      val (afterPrune, lls2) = stage(kept.sortBy(_._1))
      val (pieces, logps) = renorm(afterPrune)
      UnigramModel(pieces, logps, Seq(lls1, lls2))
    } finally words.unpersist()
  }

  private val unigramCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), UnigramModel]

  /** Offline unigram model build — the [[buildMerges]] pattern:
    * idempotent per (corpus, budget). */
  def buildUnigram(spark: SparkSession, sfDir: String,
      vocabSize: Int = 96): UnigramModel =
    unigramCache.getOrElseUpdate((Tables.corpusKey(sfDir), vocabSize), {
      fitUnigram(Tables.load(spark, sfDir, "documents"), vocabSize)
    })

  /** Unigram token stream of `text` under the fitted model. */
  def unigramTokens(text: org.apache.spark.sql.Column, m: UnigramModel)
      : org.apache.spark.sql.Column =
    call_function("graft_unigram", text,
      typedLit(m.pieces), typedLit(m.logps))

  /**
   * Gate query for the unigram tokenizer — the [[bpeQuery]] invariant
   * pattern: the fitted model is data-dependent state the SQL oracle
   * cannot refit, but any valid segmentation must (a) re-join to the
   * exact character stream, (b) emit between 1 and n_chars tokens,
   * and (c) use only in-vocabulary pieces (single-char fallbacks
   * aside) — the engine computes those checks against its real
   * segmentation, the oracle emits the expected TRUEs, and any
   * Viterbi, tie-break, or model-fit regression flips a bit the
   * driver hashes. Exact traces (hand-computed Viterbi, tie toward
   * the longer piece, EM monotonicity) stay spec-gated in
   * TokenizeSpec.
   */
  def unigramQuery(spark: SparkSession, sfDir: String,
      vocabSize: Int = 96): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val m = buildUnigram(spark, sfDir, vocabSize)
    val toks = unigramTokens(col("text"), m)
    val vocab = typedLit(m.pieces)
    val squashed = regexp_replace(col("text"), " ", "")
    docs.select(
      col("doc_id"),
      length(squashed).as("n_chars"),
      (concat_ws("", toks) === squashed).as("roundtrip_ok"),
      (size(toks) <= length(squashed) &&
        (size(toks) >= 1 || length(squashed) === 0)).as("compress_ok"),
      (size(filter(toks, t =>
        not(array_contains(vocab, t)) && length(t) > 1)) === 0)
        .as("vocab_ok"))
      .orderBy(col("doc_id"))
  }

  /** Fitted WordPiece tokenizer: the learned merge list (training
    * state, kept for the spec's trace assertions) plus the serving
    * vocabulary (every base character of the corpus + every symbol of
    * the final training segmentation). */
  case class WordpieceModel(merges: Seq[String], vocab: Seq[String])

  /**
   * Fit a WordPiece tokenizer (Schuster & Nakajima, ICASSP 2012 — the
   * BERT vocabulary algorithm). Same merge loop as [[fitBpe]] with the
   * one defining difference: the winning pair maximizes the LIKELIHOOD
   * score count(ab) / (count(a)·count(b)) — the corpus log-likelihood
   * gain of the merge under a unigram model — rather than raw pair
   * frequency, so a rare-but-exclusive pair beats a frequent pair of
   * independently-frequent symbols. Pairs below 2 occurrences never
   * merge; ties break lexicographically for a deterministic fit.
   *
   * Scale shape (the [[fitBpe]] pattern): per round, one kernel pass
   * emits adjacent pairs and one emits segmentation symbols over the
   * cached narrow text projection; both reduce map-side to tiny
   * (symbol, count) tables, the score join broadcasts the symbol
   * counts, and only the single winning pair reaches the driver.
   * Corpus text never shuffles. The score division is IEEE double math
   * on exact longs — identical counts give identical scores on any
   * partitioning, and the lexicographic tie-break settles equal
   * scores, so refits are deterministic.
   *
   * The serving vocabulary adds every base character seen in the
   * corpus (the BERT alphabet convention), so greedy longest-match can
   * always advance on training text and [[WordpieceModel]] round-trips
   * its own corpus without [UNK].
   */
  def fitWordpiece(docs: DataFrame, nMerges: Int): WordpieceModel = {
    val text = docs.select(col("text")).persist()
    try {
      var merges = Vector.empty[String]
      var round = 0
      var exhausted = false
      while (round < nMerges && !exhausted) {
        val pairs = text
          .select(explode(call_function("graft_bpe_pairs",
            col("text"), typedLit(merges))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("np"))
        val syms = text
          .select(explode(call_function("graft_bpe",
            col("text"), typedLit(merges))).as("sym"))
          .groupBy(col("sym")).agg(count(lit(1)).as("ns"))
        val top = pairs
          .filter(col("np") >= 2)
          .withColumn("l", element_at(split(col("pair"), " "), 1))
          .withColumn("r", element_at(split(col("pair"), " "), 2))
          .join(broadcast(syms.select(col("sym").as("l"),
            col("ns").as("nl"))), Seq("l"))
          .join(broadcast(syms.select(col("sym").as("r"),
            col("ns").as("nr"))), Seq("r"))
          .withColumn("score", col("np").cast("double") /
            (col("nl") * col("nr")).cast("double"))
          .orderBy(col("score").desc, col("pair"))
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else merges = merges :+ top(0).getAs[String]("pair")
        round += 1
      }
      val vocab = text
        .select(explode(call_function("graft_bpe",
          col("text"), typedLit(Seq.empty[String]))).as("s"))
        .unionAll(text.select(explode(call_function("graft_bpe",
          col("text"), typedLit(merges))).as("s")))
        .distinct().orderBy(col("s"))
        .collect().map(_.getString(0)).toSeq
      WordpieceModel(merges, vocab)
    } finally text.unpersist()
  }

  private val wordpieceCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), WordpieceModel]

  /** Offline WordPiece model build — the [[buildMerges]] pattern:
    * idempotent per (corpus, budget). */
  def buildWordpiece(spark: SparkSession, sfDir: String,
      nMerges: Int = 24): WordpieceModel =
    wordpieceCache.getOrElseUpdate((Tables.corpusKey(sfDir), nMerges), {
      fitWordpiece(Tables.load(spark, sfDir, "documents"), nMerges)
    })

  /** WordPiece token stream of `text`: greedy longest-match-first
    * against the fitted vocabulary (codegen'd kernel, model as
    * literal — zero shuffle). */
  def wordpieceTokens(text: org.apache.spark.sql.Column,
      m: WordpieceModel): org.apache.spark.sql.Column =
    call_function("graft_wordpiece", text, typedLit(m.vocab))

  /**
   * Gate query for the WordPiece tokenizer — the [[bpeQuery]]
   * invariant pattern: the fitted vocabulary is data-dependent state
   * the SQL oracle cannot refit, but any valid greedy segmentation of
   * the TRAINING corpus must (a) re-join to the exact character stream
   * (the vocabulary contains every corpus character, so [UNK] cannot
   * fire), (b) emit between 1 and n_chars tokens, and (c) use only
   * in-vocabulary pieces. The engine computes the checks against its
   * real segmentation; the oracle emits the expected TRUEs; any
   * longest-match, vocabulary-fit, or score regression flips a hashed
   * bit. The exact behavior (likelihood-vs-frequency merge choice,
   * greedy trace, [UNK] collapse) stays spec-gated in TokenizeSpec.
   */
  def wordpieceQuery(spark: SparkSession, sfDir: String,
      nMerges: Int = 24): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val m = buildWordpiece(spark, sfDir, nMerges)
    val toks = wordpieceTokens(col("text"), m)
    val vocab = typedLit(m.vocab)
    val squashed = regexp_replace(col("text"), " ", "")
    docs.select(
      col("doc_id"),
      length(squashed).as("n_chars"),
      (concat_ws("", toks) === squashed).as("roundtrip_ok"),
      (size(toks) <= length(squashed) &&
        (size(toks) >= 1 || length(squashed) === 0)).as("compress_ok"),
      (size(filter(toks, t => not(array_contains(vocab, t)))) === 0)
        .as("vocab_ok"))
      .orderBy(col("doc_id"))
  }
}
