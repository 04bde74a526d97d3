package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Corpus-curation operators for training-data pipelines (north star):
 * benchmark-contamination detection, PII scrubbing / text
 * normalization, repetition-based quality gates, and token-budget
 * sequence packing. Each is either a narrow codegen'd projection (no
 * shuffle at all) or a single bounded shuffle, so all four survive a
 * 100 TB corpus unchanged.
 */
object Curation {

  /**
   * Benchmark-contamination detection: flag training documents that
   * share any word-n-gram with an evaluation/benchmark set — the
   * decontamination pass every pretraining pipeline runs before
   * training (n is 8–13 in practice; the correctness gate uses 4 on
   * the short synthetic docs so overlap actually occurs).
   *
   * Scale shape: the eval side reduces to its DISTINCT 64-bit n-gram
   * hashes — benchmarks are tiny by definition, so that set is
   * broadcast and the 100 TB training side is scanned once with no
   * shuffle of its text: explode n-gram hashes → broadcast-join →
   * per-doc count. Hash equality stands in for string equality as in
   * [[Dedup.hashedShingles]] (collision p ≈ n²/2⁶⁵).
   */
  def contamination(train: DataFrame, evalSet: DataFrame, n: Int)
      : DataFrame = {
    val evalGrams = evalSet
      .select(explode(Dedup.hashedShingles(col("text"), n)).as("g"))
      .distinct()
    train
      .select(col("doc_id"), Dedup.hashedShingles(col("text"), n).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("n_grams"),
        explode(col("gs")).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id"))
      // n_grams is constant per doc (first() is deterministic here)
      .agg(count(lit(1)).as("n_shared"), first(col("n_grams")).as("n_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_grams").cast("double"))
          .as("contaminated_frac"))
  }

  /** Correctness gate: docs with doc_id % 50 == 0 play the benchmark,
    * the rest the training corpus; 4-gram overlap. */
  def contaminationQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    contamination(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), n = 4)
      .orderBy(col("doc_id"))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^ ]+"
  private val phoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /**
   * PII scrubbing + normalization: redact emails / URLs / phone
   * numbers (regex) and a configurable name dictionary (word-boundary
   * match), then collapse repeated whitespace — the privacy pass
   * applied before any corpus leaves the pipeline. Pure codegen'd
   * string expressions, zero shuffle. The scrubbed text is emitted as
   * an md5 digest (content-equality witness) rather than megabytes of
   * text; counts make the redaction auditable. Patterns are RE2-safe
   * so the SQL oracle replays them verbatim.
   */
  /** Escape regex metacharacters in a dictionary entry (portable
    * escaping — `\Q…\E` is Java-only and the oracle dialect is RE2). */
  private def escapeRe(s: String): String =
    s.flatMap(c => if ("\\^$.|?*+()[]{}".contains(c)) s"\\$c" else c.toString)

  private def nameRegex(nameDict: Seq[String]): String =
    "\\b(" + nameDict.map(escapeRe).mkString("|") + ")\\b"

  /** The scrub transform itself: redactions in a fixed order (email →
    * url → phone → name-dict), then whitespace collapse + trim. */
  def piiClean(text: Column, nameDict: Seq[String]): Column = {
    val nameRe = nameRegex(nameDict)
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, emailRe, "<EMAIL>"),
            urlRe, "<URL>"),
          phoneRe, "<PHONE>"),
        nameRe, "<NAME>")
    trim(regexp_replace(scrubbed, "  +", " "))
  }

  def piiScrub(docs: DataFrame, nameDict: Seq[String]): DataFrame = {
    val nameRe = nameRegex(nameDict)
    val clean = piiClean(col("text"), nameDict)
    docs.select(
      col("doc_id"),
      (regexp_count(col("text"), lit(emailRe)) +
        regexp_count(col("text"), lit(urlRe)) +
        regexp_count(col("text"), lit(phoneRe))).as("n_pii"),
      regexp_count(col("text"), lit(nameRe)).as("n_names"),
      length(clean).as("n_chars_clean"),
      md5(clean).as("clean_md5"))
  }

  /** Correctness gate: scrub the documents table with a small name
    * dictionary drawn from its vocabulary (the synthetic corpus has no
    * real emails/URLs — those counts gate at zero). */
  def piiScrubQuery(spark: SparkSession, sfDir: String): DataFrame =
    piiScrub(Tables.load(spark, sfDir, "documents"),
      Seq("customer", "user", "key"))
      .orderBy(col("doc_id"))

  /**
   * PII redaction EXECUTOR (plan→exec doctrine applied to
   * [[piiScrub]]): instead of collapsing each match to a `<TYPE>`
   * tag, rewrite matched spans with FORMAT-PRESERVING placeholders —
   * the defanging convention: letters→`x`, digits→`N`, `@`→`#`
   * inside each span, separators/punctuation kept — so length, token
   * boundaries, and downstream statistics survive the redaction
   * while every PII pattern is structurally broken (`xNN#xxN.xxx`
   * matches no email regex; `+N (NNN) NNN-NNNN` has no digit left
   * for the phone regex; masked URLs lose their scheme). Name-dict
   * words mask to same-length `x` runs via a static regex chain.
   *
   * Gate invariants: the redacted text RE-SCANS to zero residual
   * matches across all four pattern classes, masking preserves
   * length exactly, and the per-type span counts replay in the
   * oracle.
   *
   * Shape at 100 TB: text moves ONCE — the whole redaction is a
   * per-row projection (three bounded fold-over-matches rewrites +
   * a static regex chain), no shuffle at all; output ships counts
   * and a 32-char digest, never the corpus.
   */
  def piiRedact(docs: DataFrame, nameDict: Seq[String]): DataFrame = {
    val nameRe = nameRegex(nameDict)
    def maskChars(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        lit("[A-Za-z]"), lit("x")), lit("[0-9]"), lit("N")),
        lit("@"), lit("#"))
    // fold each extracted span: replace its occurrences with its
    // per-char mask (bounded — spans per doc, not corpus-sized)
    def maskType(acc: Column, text: Column, re: String): Column =
      aggregate(regexp_extract_all(text, lit(re), lit(0)), acc,
        (a, m) => replace(a, m, maskChars(m)))
    val t = col("text")
    val m1 = maskType(t, t, emailRe)
    val m2 = maskType(m1, t, urlRe)
    val m3 = maskType(m2, t, phoneRe)
    val masked = nameDict.foldLeft(m3)((acc, w) =>
      regexp_replace(acc, lit("\\b" + escapeRe(w) + "\\b"),
        lit("x" * w.length)))
    docs
      .withColumn("_masked", masked)
      .select(col("doc_id"),
        regexp_count(t, lit(emailRe)).cast("long").as("n_email"),
        regexp_count(t, lit(urlRe)).cast("long").as("n_url"),
        regexp_count(t, lit(phoneRe)).cast("long").as("n_phone"),
        regexp_count(t, lit(nameRe)).cast("long").as("n_name"),
        (length(col("_masked")) === length(t)).as("len_ok"),
        (regexp_count(col("_masked"), lit(emailRe)) +
          regexp_count(col("_masked"), lit(urlRe)) +
          regexp_count(col("_masked"), lit(phoneRe)) +
          regexp_count(col("_masked"), lit(nameRe)))
          .cast("long").as("n_residual"),
        md5(col("_masked")).as("masked_md5"))
  }

  /** Correctness gate for [[piiRedact]]: the synthetic corpus has no
    * machine PII, so every doc gets a deterministic id-derived dirty
    * suffix — one email, one URL, one phone — appended to its
    * 120-char prefix (the q_normalize injection pattern); dict names
    * occur naturally in the prefix. All three injected spans must
    * redact (counts ≥ 1 per type), re-scan to zero residuals, and
    * preserve length. */
  def piiRedactQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    val dirty = concat(substring(col("text"), 1, 120),
      lit(" contact u"), (id % 97).cast("string"),
      lit("@ex"), (id % 7).cast("string"),
      lit(".com visit https://ex"), (id % 7).cast("string"),
      lit(".com/p"), (id % 9).cast("string"),
      lit(" call +1 (55"), (id % 10).cast("string"),
      lit(") 01"), (id % 10).cast("string"),
      lit("-"), (lit(1000L) + id % 9000).cast("string"))
    piiRedact(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), dirty.as("text")),
      Seq("customer", "user", "key"))
      .orderBy(col("doc_id"))
  }

  /**
   * Unicode + whitespace normalization — the canonicalization pass that
   * must run before any hashing/dedup stage (decomposed e+U+0301 and
   * precomposed é are the "same" text but hash differently): NFC
   * canonical composition (native codegen'd kernel
   * [[graft.functions.VectorKernels.NfcNormalize]], zero-allocation on
   * the already-composed common case), control characters → space,
   * whitespace-run collapse, trim. Pure codegen'd projection — no
   * shuffle, embarrassingly parallel over 100 TB.
   */
  def normalizeText(text: Column): Column = {
    val composed = call_function("graft_nfc", text)
    val noCtrl = regexp_replace(composed, "[\\x00-\\x1f\\x7f]", " ")
    trim(regexp_replace(noCtrl, "  +", " "))
  }

  /** Correctness gate for [[normalizeText]]: the synthetic corpus is
    * pure ASCII (already NFC), so both engines append the same dirty
    * suffix — combining acute/diaeresis (must compose), a BEL control
    * and a tab (must become collapsed spaces) — and the oracle replays
    * the cleanup with `nfc_normalize` + RE2. Char counts before/after
    * NFC witness that composition actually ran; the md5 gates the full
    * cleaned content. */
  def normalizeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = concat(substring(col("text"), 1, 120),
      lit(" cafe\u0301 nai\u0308ve \u0007beep\ttab "))
    val clean = normalizeText(dirty)
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        length(dirty).as("n_raw"),
        length(call_function("graft_nfc", dirty)).as("n_nfc"),
        length(clean).as("n_clean"),
        md5(clean).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  private val scriptStyleRe = "<(script|style)[^>]*>.*?</(script|style)>"
  private val commentRe = "<!--.*?-->"
  private val tagRe = "<[^>]*>"

  /**
   * HTML → text extraction, the first stage of every web-crawl
   * pipeline: drop <script>/<style> blocks (their CONTENT is not
   * text), then comments, then all remaining tags; decode the common
   * entities (&amp; last, so "&amp;lt;" correctly yields "&lt;" and
   * not "<"); collapse whitespace. All RE2-safe regexes + replace
   * chains, so the SQL oracle replays the definition verbatim; pure
   * codegen'd projection, no shuffle.
   */
  def htmlClean(html: Column): Column = {
    val noBlocks = regexp_replace(html, scriptStyleRe, " ")
    val noComments = regexp_replace(noBlocks, commentRe, " ")
    val noTags = regexp_replace(noComments, tagRe, " ")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&nbsp;", " "),
              "&quot;", "\""),
            "&gt;", ">"),
          "&lt;", "<"),
        "&amp;", "&")
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Correctness gate for [[htmlClean]]: both engines wrap each
    * document's text in the same deterministic HTML page (tags,
    * attributes, entities, a comment, a script with a tag-bearing
    * string literal) and the oracle replays the extraction. Tag/entity
    * counts make the strip auditable; the md5 gates the full extracted
    * content. */
  def htmlStripQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = concat(
      lit("<html><head><title>Doc</title><style>p {color: red}</style>" +
        "</head>\n<body><h1 id=\"t\">"),
      substring(col("text"), 1, 40),
      lit("</h1>\n<p class=\"body\">"),
      regexp_replace(substring(col("text"), 1, 160), " the ", " &amp; "),
      lit(" &lt;escaped&gt; &quot;q&quot;&nbsp;end</p><!-- hidden -->" +
        "<script>var x = \"<p>tricky</p>\";</script></body></html>"))
    val clean = htmlClean(dirty)
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(dirty, lit(tagRe), lit(0))).as("n_tags"),
        size(regexp_extract_all(dirty, lit("&[a-z]+;"), lit(0)))
          .as("n_entities"),
        length(clean).as("n_clean"),
        md5(clean).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /**
   * Repetition-based quality signals (Gopher-style gates): duplicate
   * word-bigram fraction and top-bigram mass per document. One native
   * one-pass kernel per row ([[graft.functions.VectorKernels.NGramRepetition]])
   * — no explode, no shuffle; the 100 TB corpus is one narrow scan.
   * A document is flagged when either fraction exceeds its threshold
   * (boilerplate/spam lists repeat; prose doesn't).
   */
  def repetition(docs: DataFrame, dupFracMax: Double = 0.1,
      topFracMax: Double = 0.1): DataFrame = {
    val nGrams = col("_r.n_grams")
    val dupFrac = when(nGrams === 0, lit(0.0))
      .otherwise(lit(1.0) -
        col("_r.n_distinct").cast("double") / nGrams.cast("double"))
    val topFrac = when(nGrams === 0, lit(0.0))
      .otherwise(col("_r.top_count").cast("double") / nGrams.cast("double"))
    docs
      .withColumn("_r", call_function("graft_ngram_rep", col("text"), lit(2)))
      .select(col("doc_id"),
        col("_r.n_grams").as("n_bigrams"),
        col("_r.n_distinct").as("n_distinct"),
        dupFrac.as("dup_frac"),
        topFrac.as("top_frac"),
        (dupFrac > dupFracMax || topFrac > topFracMax).as("flagged"))
  }

  /** Correctness gate over the documents table. */
  def repetitionQuery(spark: SparkSession, sfDir: String): DataFrame =
    repetition(Tables.load(spark, sfDir, "documents"))
      .orderBy(col("doc_id"))

  /**
   * Token-budget sequence packing (concat-and-chunk): shard documents
   * deterministically, order within shard, and cut the concatenated
   * token stream every `budget` tokens — the GPT-style packing step
   * that turns a document corpus into fixed-length training sequences.
   *
   * Scale shape: the only data movement is one shuffle onto `shards`
   * partitions; the running sum is a per-shard window (each shard's
   * stream is independent, so shards scale out with the corpus — at
   * 100 TB you raise `shards`, not the per-task memory). The shard
   * assignment (doc_id mod shards) and in-shard order (doc_id) are
   * deterministic, so packing is reproducible run-to-run — a training
   * requirement, not a nicety.
   */
  def sequencePack(docs: DataFrame, budget: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        col("cum_before"), col("bin"))
  }

  /** Correctness gate: pack the documents table into 2048-token bins
    * over 8 shards. */
  def seqPackQuery(spark: SparkSession, sfDir: String): DataFrame =
    sequencePack(Tables.load(spark, sfDir, "documents"),
      budget = 2048, shards = 8)
      .orderBy(col("doc_id"))

  /**
   * Length-bucketed batch assembly (dynamic batching): the padding-
   * waste minimizer between [[sequencePack]]'s concat-and-chunk and
   * naive fixed-size batching. Documents bucket by next-power-of-two
   * token length (bucket = 2^len(bin(n_tok − 1)), an exact
   * integer-string computation — no float log), order within bucket
   * by (n_tok desc, doc_id), and fill ⌊budget/bucket⌋ documents per
   * batch (each padded to the bucket length). The report is one row
   * per batch: real vs padded token mass and the exact fill ratio in
   * micro-units — the "how much compute does padding burn" readout
   * that decides bucketing granularity for a training run.
   *
   * Hashed-column discipline: every column is an exact integer
   * (fill_micro = ⌊10⁶·real/padded⌋, one integer division).
   *
   * Shape at 100 TB: one narrow token-count projection (text never
   * moves again); the in-bucket rank is [[Prefix.running]]'s
   * two-phase distributed scan partitioned by bucket — a handful of
   * buckets over billions of rows is exactly the skewed-partition
   * case a plain per-bucket window would serialize; the batch
   * rollup is one map-side-combinable groupBy on (bucket, batch_no).
   */
  def lengthBucketBatches(docs: DataFrame, budget: Long): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val bucketed = toks.withColumn("bucket",
      expr("shiftleft(CAST(1 AS BIGINT), " +
        "CAST(length(bin(n_tok - 1)) AS INT))"))
    val ranked = Prefix.running(bucketed, Seq("bucket"),
        Seq(col("n_tok").desc, col("doc_id")),
        Seq(Prefix.Running(lit(1L), "cnt", "rk")))
      .withColumn("cap",
        greatest(lit(1L), expr(s"$budget div bucket")))
      .withColumn("batch_no", expr("(rk - 1) div cap"))
    ranked.groupBy(col("bucket"), col("batch_no"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("real_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
      .withColumn("fill_micro",
        expr("CAST((real_tokens * 1000000) div padded_tokens AS BIGINT)"))
      .select(col("bucket"), col("batch_no"), col("n_docs"),
        col("real_tokens"), col("padded_tokens"), col("fill_micro"))
      .orderBy(col("bucket"), col("batch_no"))
  }

  /** Correctness gate: bucket-batch the documents table under a
    * 2048-token batch budget. */
  def seqBucketQuery(spark: SparkSession, sfDir: String): DataFrame =
    lengthBucketBatches(
      Tables.load(spark, sfDir, "documents").select(
        col("doc_id"), col("text")),
      budget = 2048L)

  /**
   * First-fit-decreasing sequence packing — whole-document assembly
   * into fixed-budget training rows, completing the packing triad:
   * [[sequencePack]] concatenates-and-chunks (docs may straddle row
   * boundaries — GPT pretraining), [[lengthBucketBatches]] pads
   * same-bucket docs (dynamic batching), and THIS packs WHOLE
   * documents of mixed lengths into one row with boundary
   * bookkeeping — the SFT/instruction-tuning layout where a document
   * must never straddle rows and padding waste is what FFD exists to
   * minimize. Each output row is a pack: doc offsets are the
   * attention-mask boundaries.
   *
   * Determinism + distribution: docs rank globally by n_tok DESC
   * (ties doc_id) via the DISTRIBUTED prefix rank ([[Prefix.running]]
   * — no global window), then split into fixed rank-SEGMENTS of
   * `groupSize` docs — a partition-layout-independent grouping,
   * unlike per-Spark-partition packing which would change with the
   * shuffle width. Exact FFD runs inside each segment as one native
   * kernel call ([[graft.functions.VectorKernels.ffdPackJava]] —
   * FFD's open-pack state is inherently sequential, so the honest
   * distribution is bounded-segment parallelism, not a fake prefix
   * form); global pack_id = segment · groupSize + local pack. Since
   * ranks are globally length-sorted, each segment sees a narrow
   * length band and segment-local FFD tracks corpus-global FFD
   * closely; the waste column is the measurable witness.
   *
   * Shape at 100 TB: only (doc_id, n_tok, rk) triples ever shuffle —
   * text stays at the scan; each segment is a bounded array (≤
   * groupSize structs) and the kernel is one eval per segment.
   */
  /** The FFD packing PLAN as per-doc placements — `(pack_id, doc_id,
    * offset, n_tok)` — shared by the plan gate ([[ffdPackQuery]]) and
    * the executor ([[ffdPackExecQuery]]) so they can never place
    * differently. `docs` = (doc_id, n_tok) metadata only.
    * TRUNCATION SEMANTICS for oversize documents (n_tok > budget):
    * the kernel seals such a doc alone in a dedicated pack at load =
    * budget, and the placement's `n_tok` is CLAMPED to the budget —
    * the doc contributes exactly one full pack and its tail tokens
    * are truncated (the executor cuts the text to match). Fill and
    * padding therefore stay within [0, budget] for every pack. */
  private[graft] def ffdPlacements(docs: DataFrame,
      budget: Long, groupSize: Long): DataFrame = {
    val ranked = Prefix.running(docs, Seq(),
      Seq(col("n_tok").desc, col("doc_id")),
      Seq(Prefix.Running(lit(1L), "cnt", "rk")))
    ranked
      .withColumn("g", expr(s"(rk - 1) div $groupSize"))
      .groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("rk"), col("doc_id"),
        col("n_tok")))).as("docs"))
      .select(col("g"),
        explode(call_function("graft_ffd_pack", col("docs"),
          lit(budget))).as("p"))
      .select((col("g") * groupSize + col("p.pack")).as("pack_id"),
        col("p.doc_id"), col("p.offset"),
        least(col("p.n_tok"), lit(budget)).as("n_tok"))
  }

  def ffdPackQuery(spark: SparkSession, sfDir: String,
      budget: Long = 256L, groupSize: Long = 256L): DataFrame =
    ffdPack(Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")), budget, groupSize)

  /** [[ffdPackQuery]] body over an explicit (doc_id, text) corpus —
    * split out so specs can inject oversize-document fixtures. */
  private[graft] def ffdPack(docs: DataFrame,
      budget: Long, groupSize: Long): DataFrame = {
    val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val placed = ffdPlacements(toks, budget, groupSize)
    placed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("fill_tokens"),
        // boundary map: "offset:doc_id:n_tok" per doc, offset order
        // (offsets are unique within a pack — each insertion lands at
        // the pack's running load)
        array_join(transform(sort_array(collect_list(struct(
          col("offset"), col("doc_id"), col("n_tok")))),
          x => concat_ws(":", x.getField("offset").cast("string"),
            x.getField("doc_id").cast("string"),
            x.getField("n_tok").cast("string"))), ",")
          .as("boundaries"))
      .withColumn("waste_micro",
        expr(s"(($budget - fill_tokens) * 1000000) div $budget"))
      .select(col("pack_id"), col("n_docs"), col("fill_tokens"),
        col("waste_micro"), col("boundaries"))
      .orderBy(col("pack_id"))
  }

  /**
   * FFD packing EXECUTOR — materializes the training rows the
   * [[ffdPlacements]] plan describes (the plan→exec doctrine: the
   * compaction planner has `q_compact_exec`, the drift detector has
   * `q_ann_rebalance`, the packer gets this). Placements join back
   * to the corpus and each pack's documents concatenate in offset
   * order into one packed text row; `pad_tokens` is the row's tail
   * padding. Because each document's token count is exactly its
   * contribution to the pack's running load, offset order IS token
   * order — the packed row's token `offset` is where each document
   * starts, so the plan's boundary map doubles as the attention-mask
   * spec of the materialized row (the gate's alignment columns prove
   * it from the actual packed text). Oversize documents materialize
   * TRUNCATED to the plan's clamped token count (= budget), so
   * `fill_tokens`, `pad_tokens` and `aligned` stay meaningful on any
   * corpus.
   *
   * Shape at 100 TB: text moves exactly ONCE — the placement join is
   * co-partitioned on doc_id, then one shuffle by pack_id groups
   * each pack's ≤ budget tokens; packs are bounded rows by
   * construction, so the collect_list per pack is bounded by the
   * token budget, never by corpus size.
   */
  def ffdPackExecQuery(spark: SparkSession, sfDir: String,
      budget: Long = 256L, groupSize: Long = 256L): DataFrame =
    ffdPackExec(Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")), budget, groupSize)

  /** [[ffdPackExecQuery]] body over an explicit (doc_id, text)
    * corpus — split out so specs can inject oversize fixtures. */
  private[graft] def ffdPackExec(docs: DataFrame,
      budget: Long, groupSize: Long): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val placed = ffdPlacements(toks, budget, groupSize)
    placed.join(docs, Seq("doc_id"))
      // oversize docs (raw length > placement n_tok, which is
      // clamped at the budget) truncate to their placed token count
      // — the materialized row realizes the plan's truncation
      // semantics, keeping every pack within the budget
      .withColumn("doc_text",
        when(size(split(col("text"), " ")) > col("n_tok"),
          concat_ws(" ", slice(split(col("text"), " "), lit(1),
            col("n_tok").cast("int"))))
          .otherwise(col("text")))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("fill_tokens"),
        concat_ws(" ", transform(sort_array(collect_list(struct(
          col("offset"), col("doc_text").as("text")))),
          x => x.getField("text"))).as("_packed"))
      .select(col("pack_id"), col("n_docs"), col("fill_tokens"),
        (lit(budget) - col("fill_tokens")).as("pad_tokens"),
        // the row materialized correctly iff its token count equals
        // the planned fill — a lost/duplicated/misordered doc breaks
        // equality (md5 below pins order)
        (size(split(col("_packed"), " ")).cast("long") ===
          col("fill_tokens")).as("aligned"),
        md5(col("_packed")).as("packed_md5"))
      .orderBy(col("pack_id"))
  }

  /**
   * Token-budget corpus selection: assemble the training mix by
   * reading documents in quality order and cutting at a token
   * budget — the "best N tokens" selection every data recipe runs
   * under a fixed compute budget. Order: quality desc (rounded to
   * 10 dp so the ordering decision is engine-independent), ties to
   * doc_id; a doc is kept iff the running token total INCLUDING
   * itself stays ≤ budget (prefix-cut — the boundary doc and
   * everything ranked below it are out).
   *
   * Scale shape (100 TB): one narrow scoring pass (native token
   * kernel), then a DISTRIBUTED PREFIX SUM via [[Prefix.running]] —
   * a global `Window.orderBy` with no partition key would drag every
   * row into one task (Spark warns exactly this). Only
   * (doc_id, score, n_tok) rows ever move, never text; the result is
   * partition-layout-independent because prefix sums are associative.
   * True greedy FILL (skip the over-budget doc but keep scanning for
   * smaller ones) is a sequential recurrence that cannot ride a
   * bounded-memory window — prefix-cut is the distributable
   * standard, and the budget shortfall is at most one document's
   * tokens.
   */
  def tokenBudgetSelect(docs: DataFrame, budget: Long,
      nParts: Int = 32): DataFrame = {
    val scored = TextAnalysis.qualityOver(docs)
      .select(col("doc_id"),
        (fr(col("quality_score"), 10) + lit(0.0)).as("q"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")),
        Seq("doc_id"))
    Prefix.running(scored, Seq(), Seq(col("q").desc, col("doc_id")),
        Seq(Prefix.Running(col("n_tok"), "sum", "cum_tokens")), nParts)
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("q"), col("n_tok"), col("cum_tokens"))
  }

  /** Correctness gate: select under a budget of half the corpus's
    * total tokens (computed in-plan — SQL-replayable, sf-independent). */
  def tokenBudgetQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val total = docs
      .agg(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    tokenBudgetSelect(docs, total / 2).orderBy(col("doc_id"))
  }

  /** Compression-ratio quality signal: DEFLATE size / byte length of
    * the UTF-8 text (real zlib via
    * [[graft.functions.VectorKernels.DeflateSize]]). Repetitive or
    * templated junk compresses far better than natural prose — the
    * RefinedWeb/Dolma-style filter drops docs below a ratio floor.
    * Pure codegen'd projection, zero shuffle. */
  def compressionRatio(text: Column): Column =
    call_function("graft_deflate_size", text).cast("double") /
      length(text).cast("double")

  /**
   * Correctness gate (invariant-check pattern): the raw DEFLATE size
   * is zlib-build-dependent, so the hash rides on per-doc
   * INEQUALITIES the oracle predicts — (a) the ratio is positive and
   * under 1.5 (deflate overhead on the corpus's short docs stays
   * bounded), and (b) a same-length maximally-repetitive twin (the
   * doc's first token repeated — built in-engine with the same
   * string functions the oracle could run) compresses STRICTLY
   * better than the real prose. Measured margins at sf0.01/sf0.1:
   * prose ratio ∈ [0.40, 1.02], repetitive twin ≤ 0.34 — a real
   * zlib regression (wrong level, broken stream, length-vs-ratio
   * confusion) flips rows and breaks the hash.
   */
  def compressionRatioQuery(spark: SparkSession, sfDir: String)
      : DataFrame =
    Tables.load(spark, sfDir, "documents")
      .withColumn("_rep", expr(
        "substring(repeat(concat(split(text, ' ')[0], ' '), " +
          "cast(length(text) / (length(split(text, ' ')[0]) + 1) + 1 " +
          "as int)), 1, length(text))"))
      .select(col("doc_id"),
        (compressionRatio(col("text")) > 0.0 &&
          compressionRatio(col("text")) < 1.5).as("ratio_ok"),
        (compressionRatio(col("_rep")) <
          compressionRatio(col("text"))).as("rep_more_compressible"))
      .orderBy(col("doc_id"))

  // --------------------------------------- model-based quality filtering

  /** Logistic score of a hashed-unigram feature vector against a
    * weight vector: sigmoid(w·featureHash(text) + bias). The features
    * are the oracle-replayable md5-bucket hashing trick
    * ([[TextAnalysis.featureHash]]); the dot product runs left-to-right
    * over the fixed `dims` buckets, so DuckDB's `list_dot_product`
    * reproduces it IEEE-identically (the q_ann_topk precedent). */
  def qualityScore(text: Column, weights: Seq[Double], bias: Double)
      : Column = {
    val v = TextAnalysis.featureHash(text, weights.length)
    val z = aggregate(zip_with(v, typedLit(weights), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x) + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** The fixed "pretrained" scoring model for the hash-gated query: a
    * deterministic literal weight pattern over the 64 buckets (the
    * oracle replays the same formula), bias 0.1. A production
    * deployment swaps in [[trainQualityModel]]'s fitted weights — the
    * serving plan is identical either way (weights are model material
    * folded into one codegen'd projection). */
  def pretrainedWeights(dims: Int = 64): Seq[Double] =
    (0 until dims).map(b => ((b * 37 + 11) % 13 - 6) / 10.0)

  /**
   * Model-based quality filtering (the fastText-style classifier gate
   * every pretraining pipeline runs alongside the rule-based
   * [[repetition]] heuristics): per-doc quality probability + keep
   * decision at threshold 0.5. Pure narrow projection — features,
   * dot product, and sigmoid all inside one codegen'd stage, zero
   * shuffle; at 100 TB this is a single scan.
   */
  def qualityScoreQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .withColumn("quality_score",
        fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6))
      .select(col("doc_id"), col("quality_score"),
        (col("quality_score") >= 0.5).as("is_quality"))
      .orderBy(col("doc_id"))

  /**
   * Population Stability Index drift report — the distribution-shift
   * monitor a data pipeline runs between a REFERENCE snapshot and the
   * CURRENT one before retraining or re-weighting:
   * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) with add-one smoothing
   * (deterministic, and the standard guard against empty bins), read
   * against the industry bands (< 0.1 stable, 0.1–0.25 moderate,
   * > 0.25 action). Three feature axes over the events stream —
   * event-type mix, hour-of-day profile, value deciles (fixed-width
   * bins, never data-dependent edges) — reference = the first week,
   * current = the rest of the month.
   *
   * Shape at 100 TB: one scan reduces map-side to (feature, bin,
   * side) counts — ≤ 39 cells total — and everything after is
   * metadata arithmetic. Per-bin terms round to 8 dp and DECIMAL-sum
   * (order-free), PSI reports at 6 dp.
   */
  def psiDriftQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("is_ref",
        col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
    val feats = Seq(
      ("event_type", col("event_type")),
      ("hour_of_day", hour(col("ts")).cast("string")),
      ("value_bucket",
        least(floor(col("value") / 50.0).cast("long"), lit(9L))
          .cast("string")))
    val binned = feats.map { case (name, expr0) =>
      ev.select(lit(name).as("feature"), expr0.as("bin"),
        col("is_ref"))
    }.reduce(_ unionByName _)
      .groupBy(col("feature"), col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val totals = binned.groupBy(col("feature"))
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"),
        count(lit(1)).as("n_bins"))
    val p = col("c_ref").cast("double") + 1.0
    val q = col("c_cur").cast("double") + 1.0
    val pr = p / (col("n_ref") + col("n_bins")).cast("double")
    val qr = q / (col("n_cur") + col("n_bins")).cast("double")
    binned.join(totals, Seq("feature"))
      .select(col("feature"), col("n_ref"), col("n_cur"),
        col("n_bins"),
        fr((pr - qr) * log(pr / qr), 8).cast("decimal(24,8)")
          .as("term"))
      .groupBy(col("feature"), col("n_ref"), col("n_cur"),
        col("n_bins"))
      .agg(fr(sum(col("term")).cast("double"), 6).as("psi"))
      .withColumn("band",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("action"))
      .orderBy(col("feature"))
  }

  /**
   * Bradley–Terry strength estimation (MM algorithm, Hunter 2004) —
   * the analytics pass downstream of preference data: given pairwise
   * comparisons, recover a per-item strength s_i such that
   * P(i beats j) = s_i/(s_i+s_j) — what a reward-model team computes
   * to sanity-check that preference wins are CONSISTENT (a strength
   * ordering exists) before training on them. Two unrolled MM
   * iterations from s⁰ = 1:
   * s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j), each rounded to 6 dp —
   * enough to separate and order the strengths, replayable exactly.
   *
   * Comparisons here: consecutive-id document duels (doc 2k vs
   * 2k+1), judged by the shared quality scorer; items are the ten
   * score deciles, so the fit should recover a monotone strength
   * ladder from ~5·10⁵ duels compressed into a ≤ 10×10 win matrix.
   *
   * Shape at 100 TB: duels reduce map-side to the k² matrix
   * (metadata-sized for any item vocabulary worth fitting); both MM
   * iterations are joins over that matrix. Per-item denominator terms
   * round to 8 dp and sum as DECIMAL (order-free — the q_lm_ppl
   * rule), so the distributed sums replay bit-exactly.
   */
  def bradleyTerryQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.CacheBin.TrackOps
    val id = col("doc_id")
    // tracked: the even/odd duel branches both read the scored frame —
    // unpinned, the quality-score text kernel scans the corpus twice
    val scored = Tables.load(spark, sfDir, "documents")
      .select(id,
        fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6)
          .as("q"))
      .withColumn("b", least(floor(col("q") * 10).cast("int"), lit(9)))
      .tracked()
    val left = scored.filter(id % 2 === 0)
      .select(id.as("pair"), col("b").as("ba"), col("q").as("qa"))
    val right = scored.filter(id % 2 === 1)
      .select((id - 1).as("pair"), col("b").as("bb"), col("q").as("qb"))
    val duels = left.join(right, Seq("pair"))
      .filter(col("ba") =!= col("bb"))
    // directed win counts -> the symmetric match matrix n_ij + W_i
    // wins is read three times building the symmetric matrix, the
    // matrix twice per MM iteration plus the totals fold, and totals
    // in both iterations plus the readout — all ≤ 10×10 rows, but
    // every unpinned reference re-runs the duel reduction over the
    // corpus (216 Exchange nodes in the r18 before-plan)
    val wins = duels.select(
      when(col("qa") > col("qb"), col("ba")).otherwise(col("bb"))
        .as("i"),
      when(col("qa") > col("qb"), col("bb")).otherwise(col("ba"))
        .as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("w"))
      .tracked()
    val matrix = wins.select(col("i"), col("j"), col("w"))
      .unionByName(wins.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("w")))
      .groupBy(col("i"), col("j")).agg(sum(col("w")).as("w_ij"))
      .join(wins.select(col("j").as("i"), col("i").as("j"),
          col("w").as("w_ji")),
        Seq("i", "j"), "left")
      .select(col("i"), col("j"), col("w_ij"),
        (col("w_ij") + coalesce(col("w_ji"), lit(0L))).as("n_ij"))
      .tracked()
    val totals = matrix.groupBy(col("i"))
      .agg(sum(col("w_ij")).as("w_i"), sum(col("n_ij")).as("n_i"))
      .tracked()
    def mmIter(s: DataFrame): DataFrame =
      matrix
        .join(s.select(col("i"), col("s").as("s_i")), Seq("i"))
        .join(s.select(col("i").as("j"), col("s").as("s_j")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(fr(col("n_ij").cast("double") /
            (col("s_i") + col("s_j")), 8).cast("decimal(24,8)"))
          .as("denom"))
        .join(totals, Seq("i"))
        .select(col("i"),
          fr(col("w_i").cast("double") /
            col("denom").cast("double"), 6).as("s"))
    val s0 = totals.select(col("i"), lit(1.0).as("s"))
    // s1 feeds the second MM iteration (two joins) and the readout
    val s1 = mmIter(s0).tracked()
    val s2 = mmIter(s1)
    totals
      .join(s1.select(col("i"), col("s").as("s1")), Seq("i"))
      .join(s2.select(col("i"), col("s").as("s2")), Seq("i"))
      .select(col("i").as("bucket"), col("n_i").as("n_matches"),
        col("w_i").as("n_wins"), col("s1"), col("s2"))
      .orderBy(col("bucket"))
  }

  /**
   * Filter-funnel attribution — the observability pass every curation
   * pipeline needs: documents flow through the ORDERED filter stages
   * (too-short → quality → legal → exact-dup) and each doc is charged
   * to the FIRST stage that drops it, so per-stage survivor counts
   * tell you which filter is doing the work and which is dead weight
   * (the number a mix designer reads before touching thresholds —
   * without first-drop attribution, overlapping filters double-count
   * and the funnel lies).
   *
   * Stages here are the engine's own replayable predicates: token
   * floor (≥ 20), the pretrained quality score (≥ 0.5, the shared
   * scorer), the legal pair from the compliance family (noai opt-out
   * + license allowlist, id-derived as in q_compliance), and exact
   * text dedup (keeper = min doc_id per md5). One scan computes all
   * four booleans; the funnel is a single map-side aggregate row
   * unpivoted to one row per stage — no shuffle grows with stages.
   */
  def filterFunnelQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val id = col("doc_id")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(id, col("text"),
        element_at(typedLit(Seq("cc-by", "cc0", "all-rights-reserved",
          "mit", "cc-by-nc", "public-domain", "unknown")),
          (id % 7).cast("int") + 1).as("license"),
        (id % 17 === 0).as("noai"))
    // keeper = min doc_id per digest as ONE md5-partitioned window
    // (the oracle's own form) — a groupBy+equi-join twin would scan
    // and shuffle the corpus twice for the same answer
    val wDigest = Window.partitionBy(md5(col("text")))
    val flagged = docs
      .withColumn("p_len", size(split(col("text"), " ")) >= 20)
      .withColumn("p_quality",
        fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6)
          >= 0.5)
      .withColumn("p_legal", !col("noai") && col("license").isin(
        "cc-by", "cc0", "mit", "public-domain"))
      .withColumn("p_uniq",
        col("doc_id") === min(col("doc_id")).over(wDigest))
    val c = flagged.agg(
      count(lit(1)).as("n0"),
      sum(when(!col("p_len"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("p_len") && !col("p_quality"), 1L).otherwise(0L))
        .as("d2"),
      sum(when(col("p_len") && col("p_quality") && !col("p_legal"), 1L)
        .otherwise(0L)).as("d3"),
      sum(when(col("p_len") && col("p_quality") && col("p_legal") &&
        !col("p_uniq"), 1L).otherwise(0L)).as("d4")).head()
    val (n0, d1, d2, d3, d4) = (c.getLong(0), c.getLong(1),
      c.getLong(2), c.getLong(3), c.getLong(4))
    Seq(
      (1, "min_length", n0, d1, n0 - d1),
      (2, "quality", n0 - d1, d2, n0 - d1 - d2),
      (3, "legal", n0 - d1 - d2, d3, n0 - d1 - d2 - d3),
      (4, "exact_dedup", n0 - d1 - d2 - d3, d4, n0 - d1 - d2 - d3 - d4))
      .toDF("stage_no", "stage", "n_in", "n_dropped", "n_out")
      .orderBy(col("stage_no"))
  }

  /**
   * Per-domain quota capping — keep at most `quota` highest-quality
   * documents per host, the anti-SEO-spam mix guard (C4-style): no
   * single domain may dominate the corpus however many pages it
   * serves, and the pages it does contribute should be its best.
   * Ranking is the replayable pretrained quality score
   * ([[qualityScoreQuery]]'s scorer, 6 dp) descending, ties to the
   * lower doc_id.
   *
   * Shape at 100 TB: one scoring projection, then a BOUNDED-HEAP
   * aggregate per host (`graft_topk` — quota entries of state per
   * host, merge-combinable map-side) — never a per-host sort or a
   * rank window over the corpus; a 10⁸-page spam domain costs the
   * same heap as a 10-page blog.
   */
  def domainQuotaQuery(spark: SparkSession, sfDir: String,
      quota: Int = 5): DataFrame = {
    val id = col("doc_id")
    val scored = Tables.load(spark, sfDir, "documents")
      .select(id,
        concat(lit("site"), (id % 17).cast("string"),
          when(id % 2 === 0, lit(".com")).otherwise(lit(".org")))
          .as("host"),
        fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6)
          .as("q"))
    scored.groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        call_function("graft_topk", col("q"), col("doc_id"),
          lit(quota)).as("_tk"))
      .select(col("host"), col("n_docs"),
        posexplode(col("_tk")).as(Seq("pos", "e")))
      .select(col("host"), col("n_docs"),
        (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("doc_id"), col("e.ord").as("quality_score"))
      .orderBy(col("host"), col("rank"))
  }

  /**
   * Crawl frontier scheduler — the FETCH-side twin of
   * [[domainQuotaQuery]]: given a frontier of candidate URLs with
   * priorities, emit the politeness-constrained fetch schedule for
   * the next horizon. Each host has a crawl delay (md5-derived from
   * the host name — the robots Crawl-delay stand-in, 250/500/750/
   * 1000 ms classes); within a host, fetches order by (priority
   * desc, doc_id) and slot k fires at (k−1)·delay — so consecutive
   * same-host fetches are always exactly one delay apart (the
   * politeness invariant), and only ⌈horizon/delay⌉ fetches per host
   * fit the cycle.
   *
   * Shape at 100 TB: the schedule NEVER materializes the full
   * frontier ordering — hosts group by delay class and each class
   * takes its top-⌈horizon/delay⌉ per host via the bounded
   * `graft_topk` heap (heap memory ∝ horizon window, map-side
   * combinable), exactly the domain-quota discipline; a 10⁸-URL spam
   * host costs the same heap as a 10-URL blog. Priority is the
   * replayable pretrained quality score (6 dp).
   */
  def crawlFrontierQuery(spark: SparkSession, sfDir: String,
      horizonMs: Long = 10000L): DataFrame = {
    val id = col("doc_id")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(id,
        concat(lit("site"), (id % 17).cast("string"),
          when(id % 2 === 0, lit(".com")).otherwise(lit(".org")))
          .as("host"),
        fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6)
          .as("priority"))
      .withColumn("delay_ms",
        (Sampling.hashBucket24(col("host")) % 4 + 1) * 250)
    val classes = Seq(250L, 500L, 750L, 1000L)
    classes.map { d =>
      val k = ((horizonMs + d - 1) / d).toInt
      docs.filter(col("delay_ms") === d)
        .groupBy(col("host"), col("delay_ms"))
        .agg(count(lit(1)).as("n_frontier"),
          call_function("graft_topk", col("priority"), col("doc_id"),
            lit(k)).as("_tk"))
        .select(col("host"), col("delay_ms"), col("n_frontier"),
          posexplode(col("_tk")).as(Seq("pos", "e")))
    }.reduce(_ unionByName _)
      .select(col("host"), col("delay_ms"), col("n_frontier"),
        (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("doc_id"), col("e.ord").as("priority"),
        (col("pos") * col("delay_ms")).as("sched_ms"))
      .filter(col("sched_ms") < horizonMs)
      .orderBy(col("host"), col("rank"))
  }

  /**
   * Freshness-aware RECRAWL scheduler — [[crawlFrontierQuery]]'s twin
   * on the already-crawled side: the frontier ranks what to fetch
   * FIRST; this estimates, from each page's observed fetch history,
   * how often it actually changes and therefore WHEN to fetch it
   * again (the Cho–Garcia-Molina freshness policy every production
   * crawler runs: change-rate estimation → proportional revisit
   * interval).
   *
   * Estimator (exact integer arithmetic end-to-end): per page, fetch
   * history = its events ordered by (ts, event_id); a fetch observes
   * a CHANGE when its content fingerprint differs from the previous
   * fetch's (fingerprint = event_type in the gate fixture — the
   * deterministic stand-in for a page content hash). The smoothed
   * mean inter-change gap `interval_ms = span_ms div (n_changes+1)`
   * (Laplace +1: a never-changing page is revisited once per observed
   * span, not never) and `next_due = last_fetch + interval` — so a
   * single-fetch page (span 0) is due immediately: unknown pages get
   * probed soon, which is the standard cold-start choice.
   *
   * Scale shape (100 TB of fetch logs): ONE shuffle on page_id — the
   * per-page lag window and the per-page aggregate ride the same
   * partitioning — output is page-count-sized, and the estimator is
   * an append-friendly aggregate (n_changes, first/last ts roll
   * forward incrementally as new fetch logs land). No global window;
   * the final ORDER BY is gate-only.
   */
  def recrawlSchedQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(pmod(col("user_id"), lit(101L)).as("page_id"),
        unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type").as("fp"))
    val w = Window.partitionBy(col("page_id"))
      .orderBy(col("ms"), col("event_id"))
    ev.withColumn("changed",
        lag(col("fp"), 1).over(w).isNotNull &&
          lag(col("fp"), 1).over(w) =!= col("fp"))
      .groupBy(col("page_id"))
      .agg(count(lit(1)).as("n_fetches"),
        sum(when(col("changed"), 1L).otherwise(0L)).as("n_changes"),
        min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"))
      .select(col("page_id"), col("n_fetches"), col("n_changes"),
        expr("(last_ms - first_ms) div (n_changes + 1)")
          .as("interval_ms"),
        timestamp_millis(col("last_ms")).as("last_ts"),
        timestamp_millis(
          col("last_ms") +
            expr("(last_ms - first_ms) div (n_changes + 1)"))
          .as("next_due_ts"))
      .orderBy(col("page_id"))
  }

  /**
   * Pipeline lineage ledger — the auditable per-stage manifest of the
   * COMPOSED curation chain compliance → exact dedup → quality floor
   * → domain quota → FFD pack (all existing operators; the chain a
   * 100 TB pretraining run actually executes). One row per stage:
   * (stage_no, stage, n_in, n_out, n_dropped, digest) where `digest`
   * is the ORDER-FREE content digest of the stage's SURVIVOR set —
   * the [[Versioning.manifest]] pattern: DECIMAL(38,0) sum of 60-bit
   * md5 prefixes, zero-padded to a 26-char string so no numeric
   * canonicalization can flip it. Counts conserve by construction
   * (n_in(k) = n_out(k−1)) and the digests let an operator replay any
   * stage from scratch and compare — the audit a multi-day 100 TB
   * run needs when stage k's output looks wrong and re-running
   * stages 1..k−1 costs a day.
   *
   * Stage semantics (each the gate-fixture form of its standalone
   * operator, so the oracle replays them verbatim):
   *   1 compliance   — [[complianceFilter]] verdict over the
   *     id-derived host/path/license/noai frame + 7-rule robots set
   *   2 exact_dedup  — min doc_id per md5(text) AMONG stage-1
   *     survivors (a real chain dedups what compliance admitted)
   *   3 quality      — shared pretrained scorer ≥ 0.5 (6 dp)
   *   4 domain_quota — top-`quota` per host by (score desc, doc_id)
   *     via the bounded `graft_topk` heap over stage-3 survivors
   *   5 ffd_pack     — [[ffdPlacements]] over the survivors; n_out
   *     is the PACK count (the unit changes), nothing drops, and the
   *     digest covers "pack_id:boundaries" rows (content + order).
   *
   * Shape at 100 TB: flags 1–3 ride ONE scan (the compliance join is
   * broadcast rules; the dedup keeper is the single md5-partitioned
   * window); the quota stage is a bounded heap per host; the count+
   * digest rollup is one aggregate row; packing adds the bounded-
   * segment FFD pass. Text shuffles only for the dedup window and
   * the pack grouping — exactly what the standalone operators pay.
   */
  /** The ledger chain's id-derived corpus decoration (host, path,
    * license, noai + lang), shared by [[pipelineLedgerQuery]] and the
    * quota-rebalance composition
    * ([[graft.operators.Sampling.quotaRebalanceQuery]]). */
  private[graft] def ledgerDocs(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val id = col("doc_id")
    Tables.load(spark, sfDir, "documents")
      .select(id, col("text"), col("lang"),
        concat(lit("site"), (id % 5).cast("string"),
          when(id % 2 === 0, lit(".com")).otherwise(lit(".org")))
          .as("host"),
        concat(lit("/"),
          when(id % 3 === 0, lit("private"))
            .when(id % 3 === 1, lit("public")).otherwise(lit("blog")),
          lit("/p"), (id % 9).cast("string")).as("path"),
        element_at(typedLit(Seq("cc-by", "cc0", "all-rights-reserved",
          "mit", "cc-by-nc", "public-domain", "unknown")),
          (id % 7).cast("int") + 1).as("license"),
        (id % 17 === 0).as("noai"))
  }

  /** The ledger chain's robots fixture (both group kinds per host). */
  private[graft] def ledgerRobots(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("site1.com", "/private/", false),
      ("site1.com", "/private/blog", true),
      ("site2.org", "/priva", false),
      ("site2.org", "/publi", true),
      ("site3.com", "/", false),
      ("site2.org", "/blog/", false),
      ("site2.org", "/blog/", true)).toDF("host", "prefix", "allow")
  }

  private[graft] val ledgerLicenses =
    Seq("cc-by", "cc0", "mit", "public-domain")

  /** The composed compliance → exact-dedup → quality-floor flag chain
    * over [[ledgerDocs]]: columns p1/p2/p3 plus the 6-dp quality
    * score — the survivor population every downstream allocation
    * (ledger stages 4–5, quota rebalance) draws from. */
  private[graft] def ledgerFlagged(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val id = col("doc_id")
    val withC = complianceFilter(ledgerDocs(spark, sfDir),
      ledgerRobots(spark), ledgerLicenses)
    val wDigest = Window.partitionBy(md5(col("text")))
    withC
      .withColumn("p1", col("compliant"))
      // keeper among stage-1 survivors: min ignores the nulls the
      // `when` leaves on non-compliant rows
      .withColumn("p2", col("p1") &&
        id === min(when(col("p1"), id)).over(wDigest))
      .withColumn("q",
        fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6))
      .withColumn("p3", col("p2") && col("q") >= 0.5)
  }

  def pipelineLedgerQuery(spark: SparkSession, sfDir: String,
      quota: Int = 3, budget: Long = 256L): DataFrame = {
    import spark.implicits._
    val flagged = ledgerFlagged(spark, sfDir)
    val keepers = flagged.filter(col("p3"))
      .groupBy(col("host"))
      .agg(call_function("graft_topk", col("q"), col("doc_id"),
        lit(quota)).as("_tk"))
      .select(explode(col("_tk")).as("e"))
      .select(col("e.id").as("doc_id"), lit(true).as("p4"))
    val fl = flagged
      .join(broadcast(keepers), Seq("doc_id"), "left")
      .withColumn("p4", coalesce(col("p4"), lit(false)))
      .withColumn("dg", conv(substring(md5(col("text")), 1, 15), 16, 10)
        .cast("decimal(38,0)"))
      .persist()
    val c = fl.agg(
      count(lit(1)).as("n0"),
      sum(when(col("p1"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("p1"), col("dg"))).as("g1"),
      sum(when(col("p2"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("p2"), col("dg"))).as("g2"),
      sum(when(col("p3"), 1L).otherwise(0L)).as("s3"),
      sum(when(col("p3"), col("dg"))).as("g3"),
      sum(when(col("p4"), 1L).otherwise(0L)).as("s4"),
      sum(when(col("p4"), col("dg"))).as("g4")).head()
    val packs = ffdPack(
      fl.filter(col("p4")).select(col("doc_id"), col("text")),
      budget, 256L)
    val pk = packs.agg(
      count(lit(1)).as("np"),
      sum(conv(substring(md5(concat_ws(":",
        col("pack_id").cast("string"), col("boundaries"))), 1, 15),
        16, 10).cast("decimal(38,0)")).as("gp")).head()
    fl.unpersist()
    def dig(v: Any): String = {
      val s = v match {
        case null => "0"
        case d: java.math.BigDecimal => d.toBigInteger.toString
        case d: org.apache.spark.sql.types.Decimal =>
          d.toJavaBigDecimal.toBigInteger.toString
        case other => other.toString
      }
      ("0" * 26 + s).takeRight(26)
    }
    // agg row layout: n0, s1, g1, s2, g2, s3, g3, s4, g4
    val (n0, s1, s2, s3, s4) = (c.getLong(0), c.getLong(1),
      c.getLong(3), c.getLong(5), c.getLong(7))
    val np = pk.getLong(0)
    Seq(
      (1, "compliance", n0, s1, n0 - s1, dig(c.get(2))),
      (2, "exact_dedup", s1, s2, s1 - s2, dig(c.get(4))),
      (3, "quality", s2, s3, s2 - s3, dig(c.get(6))),
      (4, "domain_quota", s3, s4, s3 - s4, dig(c.get(8))),
      (5, "ffd_pack", s4, np, 0L, dig(pk.get(1))))
      .toDF("stage_no", "stage", "n_in", "n_out", "n_dropped",
        "digest")
      .orderBy(col("stage_no"))
  }

  /**
   * Span-corruption planning (the T5/UL2 denoising-objective data
   * prep): deterministically select the mask spans for each document —
   * one 3-token span per 20-token block at an md5-derived offset, so
   * the masked fraction is exactly 15% on full blocks, spans never
   * overlap (block-local by construction), and the SAME spans
   * reproduce on any cluster, any partitioning, any rerun — the
   * reproducibility property a training-data pipeline needs from its
   * corruption pass (a seeded RNG per task gives partition-dependent
   * masks). The plan is positions only; the actual sentinel rewrite
   * is a downstream projection over (doc, starts).
   *
   * Shape at 100 TB: one narrow projection + a per-doc block explode
   * (bounded by doc length / 20); the per-doc rollup re-aggregates on
   * the same doc key — rows are (doc_id, 3 longs), text never moves.
   */
  def spanCorruptQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("n_blocks", expr("n_tokens div 20"))
      .filter(col("n_blocks") > 0)
    val spans = docs
      .select(col("doc_id"), col("n_tokens"), col("n_blocks"),
        explode(sequence(lit(0L), col("n_blocks") - 1)).as("blk"))
      .withColumn("start", col("blk") * 20 +
        pmod(Sampling.hashBucket24(concat(col("doc_id").cast("string"),
          lit(":"), col("blk").cast("string"))), lit(18L)))
    spans.groupBy(col("doc_id"), col("n_tokens"), col("n_blocks"))
      .agg(count(lit(1)).as("n_spans"),
        (count(lit(1)) * 3).as("n_masked"),
        expr("CAST(count(1) * 3 * 1000000 div n_tokens AS BIGINT)")
          .as("masked_ppm"),
        min(col("start")).as("first_span_start"),
        md5(array_join(transform(array_sort(collect_list(col("start"))),
          x => x.cast("string")), ",")).as("spans_digest"))
      .orderBy(col("doc_id"))
  }

  /**
   * Preference-pair mining (the DPO/RLHF-style contrastive data
   * constructor): per language stratum, pair the k highest-quality
   * documents with the k lowest rank-for-rank (best vs worst, 2nd
   * best vs 2nd worst, …) and report each pair's score margin — the
   * chosen/rejected construction a preference-tuning pipeline builds
   * from any scalar quality signal. Pair count is capped at
   * ⌊stratum/2⌋ so chosen and rejected sets can never overlap in a
   * small stratum.
   *
   * Shape at 100 TB: scoring is the [[qualityScore]] zero-shuffle
   * codegen projection; per-stratum extremes ride TWO bounded-heap
   * `graft_topk` aggregates (score and −score) — map-side partial,
   * k·16 bytes per (partition, stratum), never a stratum sort; the
   * pairing is a per-stratum array zip on the k-row aggregate frame.
   */
  def prefPairsQuery(spark: SparkSession, sfDir: String,
      k: Int = 5): DataFrame = {
    val scored = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6)
          .as("score"))
    val extremes = scored.groupBy(col("lang"))
      .agg(
        call_function("graft_topk", col("score"), col("doc_id"),
          lit(k)).as("top"),
        call_function("graft_topk", -col("score"), col("doc_id"),
          lit(k)).as("bot"),
        count(lit(1)).as("n_docs"))
      .withColumn("pair_cnt",
        least(lit(k.toLong), expr("n_docs div 2")))
    extremes
      // a 1-doc stratum has pair_cnt = 0, and Spark's
      // sequence(1, 0) DESCENDS to [1, 0] (element_at(..., 0) then
      // throws) — such strata simply emit no pairs
      .filter(col("pair_cnt") >= 1L)
      .select(col("lang"), col("n_docs"), col("top"), col("bot"),
        explode(sequence(lit(1L), col("pair_cnt"))).as("pair_rank"))
      .select(col("lang"), col("pair_rank"),
        element_at(col("top"), col("pair_rank").cast("int"))
          .getField("id").as("chosen_id"),
        element_at(col("bot"), col("pair_rank").cast("int"))
          .getField("id").as("rejected_id"),
        element_at(col("top"), col("pair_rank").cast("int"))
          .getField("ord").as("chosen_score"),
        (-element_at(col("bot"), col("pair_rank").cast("int"))
          .getField("ord")).as("rejected_score"),
        col("n_docs"))
      .withColumn("margin",
        fr(col("chosen_score") - col("rejected_score"), 6))
      .orderBy(col("lang"), col("pair_rank"))
  }

  /**
   * Classifier evaluation: threshold-sweep confusion counts +
   * precision/recall/F1 over a scored corpus — the eval harness run
   * against every quality/langid/filter model before its threshold is
   * frozen into a pipeline. Counts are integers (exact in any order);
   * the ratios are computed FROM the counts and rounded, so the whole
   * curve replays cross-engine.
   *
   * Scale shape: one scan; each row contributes to every threshold's
   * conditional sums via a small explode (|thresholds| copies of two
   * booleans, not of the text), map-side partial-aggregated down to
   * |thresholds| rows. No sort, no per-class shuffle.
   */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    val exploded = scored.select(col(scoreCol).as("_s"),
      col(labelCol).as("_y"),
      explode(typedLit(thresholds)).as("thr"))
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val counts = exploded.groupBy(col("thr")).agg(
      cnt(col("_s") >= col("thr") && col("_y")).as("tp"),
      cnt(col("_s") >= col("thr") && !col("_y")).as("fp"),
      cnt(col("_s") < col("thr") && col("_y")).as("fn"),
      cnt(col("_s") < col("thr") && !col("_y")).as("tn"))
    def ratio(num: Column, den: Column) =
      when(den > 0L, fr(num.cast("double") / den.cast("double"), 6))
    counts
      .withColumn("prec", ratio(col("tp"), col("tp") + col("fp")))
      .withColumn("rec", ratio(col("tp"), col("tp") + col("fn")))
      .withColumn("f1",
        when(col("prec").isNotNull && col("rec").isNotNull &&
          col("prec") + col("rec") > 0.0,
          fr(lit(2.0) * col("prec") * col("rec") /
            (col("prec") + col("rec")), 6)))
      .orderBy(col("thr"))
  }

  /** Correctness gate for [[prCurve]]: the shared quality scorer
    * ([[qualityScoreQuery]]'s exact formula) evaluated against the
    * `lang = 'en'` label over nine fixed thresholds; the oracle
    * recomputes scores from the shared CTE and replays every count
    * and rounded ratio. */
  def prCurveQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val scored = docs.select(
      fr(qualityScore(col("text"), pretrainedWeights(), 0.1), 6)
        .as("score"),
      (col("lang") === "en").as("y"))
    prCurve(scored, "score", "y",
      Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
  }

  /**
   * Fit the quality classifier by deterministic full-batch gradient
   * descent (logistic loss): the offline half of the operator, like
   * [[Similarity.kmeansCentroids]] for IVF. The bias rides as a
   * constant 65th feature, so each iteration is ONE pass: residuals
   * (p − y) are a narrow projection against the current weights
   * (broadcast as a literal — model material, not data), and the
   * gradient is a posexplode + partial-aggregated groupBy whose
   * shuffle is O(dims · partitions), independent of corpus size. The
   * seeding, order, and iteration count are fixed, so the fit is
   * reproducible run-to-run (CurationSpec gates accuracy and loss
   * descent on a synthetic separable label).
   *
   * @return (weights, bias)
   */
  def trainQualityModel(docs: DataFrame, label: Column, dims: Int = 64,
      iters: Int = 50, lr: Double = 8.0): (Seq[Double], Double) = {
    // x' = [featureHash | 1.0]: bias as the last feature
    val feats = docs.select(
      concat(TextAnalysis.featureHash(col("text"), dims),
        array(lit(1.0))).as("x"),
      label.cast("double").as("y"))
      .localCheckpoint()
    val n = feats.count().toDouble
    var w = Array.fill(dims + 1)(0.0)
    (1 to iters).foreach { _ =>
      val wLit = typedLit(w.toSeq)
      val grad = feats
        .select(((lit(1.0) / (lit(1.0) + exp(-aggregate(
          zip_with(col("x"), wLit, (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v)))) - col("y")).as("r"),
          col("x"))
        .select(col("r"), posexplode(col("x")).as(Seq("dim", "xv")))
        .groupBy(col("dim"))
        .agg(sum(col("r") * col("xv")).as("g"))
        .collect()
      val next = w.clone()
      grad.foreach { row =>
        next(row.getInt(0)) -= lr * row.getDouble(1) / n
      }
      w = next
    }
    (w.take(dims).toSeq, w(dims))
  }

  /** Mean logistic loss of a (weights, bias) model over labelled docs —
    * the spec's descent/accuracy probe. */
  def qualityLoss(docs: DataFrame, label: Column, weights: Seq[Double],
      bias: Double): Double =
    docs.select(qualityScore(col("text"), weights, bias).as("p"),
      label.cast("double").as("y"))
      .select((-(col("y") * log(col("p")) +
        (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))).as("l"))
      .agg(avg(col("l"))).head.getDouble(0)

  // ------------------------------------------------ URL canonicalization

  /** Canonical form of a URL column — the web-curation dedup/grouping
    * key. One codegen'd pass ([[graft.functions.VectorKernels.UrlNormalize]]):
    * real `java.net.URI` parsing; lowercased scheme+host, default ports
    * and fragments stripped, duplicate/trailing slashes collapsed,
    * tracking params (utm_*, fbclid, gclid) removed, remaining query
    * params sorted. Malformed input → null (quarantine, not garbage). */
  def normalizeUrl(url: Column): Column =
    call_function("graft_url_normalize", url)

  /**
   * Gate query for [[normalizeUrl]] over an id-derived synthetic URL
   * corpus (the multimodal gating pattern: the oracle predicts the
   * canonical form from doc_id arithmetic, so a hash match proves the
   * REAL parser recovered scheme, host, port, path, query, and
   * fragment handling exactly). The synthetic mess covers uppercase
   * scheme/host, default and non-default ports, duplicate and trailing
   * slashes, tracking and unsorted query params, and fragments. Pure
   * projection — zero shuffle at any scale.
   */
  /** The id-derived messy crawl URL fixture (uppercase scheme/host,
    * default + non-default ports, duplicate/trailing slashes,
    * tracking + unsorted params, fragments) — shared by the
    * normalization gate and the cross-snapshot URL dedup. */
  def syntheticUrl(id: Column): Column = concat(
    when(id % 2 === 0, lit("HTTPS")).otherwise(lit("http")),
    lit("://WWW.Site"), (id % 7).cast("string"), lit(".COM"),
    when(id % 5 === 0, lit(":8080"))
      .when(id % 5 === 1,
        when(id % 2 === 0, lit(":443")).otherwise(lit(":80")))
      .otherwise(lit("")),
    lit("/a//b"), (id % 4).cast("string"), lit("/"),
    lit("?utm_source=news&b="), (id % 3).cast("string"), lit("&a=1"),
    when(id % 3 === 0, lit("#frag")).otherwise(lit("")))

  def urlNormalizeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    Tables.load(spark, sfDir, "documents")
      .select(id, syntheticUrl(id).as("url_raw"))
      .withColumn("url_norm", normalizeUrl(col("url_raw")))
      .select(col("doc_id"), col("url_raw"), col("url_norm"),
        (col("url_norm") =!= col("url_raw")).as("changed"))
      .orderBy(col("doc_id"))
  }

  /** All dot-boundary suffixes of a hostname with at least two labels
    * (`a.b.spam.com` → `[a.b.spam.com, b.spam.com, spam.com]`) — the
    * unit a domain blocklist matches against (never a bare TLD). */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels) - 1),
      j => array_join(slice(labels, j, size(labels)), "."))
  }

  /**
   * Domain blocklist filter: flag every document whose host matches a
   * blocklisted domain SUFFIX at a label boundary (`spam.com` blocks
   * `a.spam.com` but not `notspam.com`), reporting the most-specific
   * (longest) matching entry. The deny-list pass every crawl-derived
   * corpus runs before training.
   *
   * Scale shape (100 TB): the blocklist is broadcast (deny lists are
   * thousands of rows); each doc explodes into at most
   * `label_count - 1` suffixes (hostnames are ≤ ~5 labels), so the
   * match is a narrow explode → broadcast-hash semi-join → per-doc
   * `max_by` — the corpus never shuffles on content, only the tiny
   * (doc_id, suffix) match set aggregates.
   */
  def domainFilter(docs: DataFrame, hostCol: String,
      blocklist: DataFrame): DataFrame = {
    val bl = blocklist
      .withColumnRenamed(blocklist.columns.head, "_suf").distinct()
    val matches = docs
      .select(col("doc_id"),
        explode(domainSuffixes(col(hostCol))).as("_suf"))
      .join(broadcast(bl), Seq("_suf"))
      .groupBy(col("doc_id"))
      .agg(max_by(col("_suf"), length(col("_suf")))
        .as("matched_suffix"))
    docs.join(matches, Seq("doc_id"), "left")
      .withColumn("blocked", col("matched_suffix").isNotNull)
  }

  /** Correctness gate for [[domainFilter]]: id-derived hosts
    * (`w{id%3}.{spam | site{id%7}}.{com | org}`) against a fixed
    * five-entry blocklist. Exercises boundary-only matching (`site3.
    * com` never blocks `site33.com` — no such host exists, but
    * `notspam` analogues reduce to the LIKE boundary in the oracle),
    * a never-matching entry (`evil.org`), and most-specific selection
    * (`w1.spam.org` hosts match both `spam.org` and the full
    * three-label entry — the longer one must win). */
  def domainFilterQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val id = col("doc_id")
    val host = concat(lit("w"), (id % 3).cast("string"), lit("."),
      when(id % 11 === 0, lit("spam"))
        .otherwise(concat(lit("site"), (id % 7).cast("string"))),
      lit("."),
      when(id % 2 === 0, lit("com")).otherwise(lit("org")))
    val docs = Tables.load(spark, sfDir, "documents")
      .select(id, host.as("host"))
    val blocklist = Seq("spam.com", "spam.org", "site3.com",
      "evil.org", "w1.spam.org").toDF("suffix")
    domainFilter(docs, "host", blocklist)
      .select(col("doc_id"), col("host"), col("matched_suffix"),
        col("blocked"))
      .orderBy(col("doc_id"))
  }

  /**
   * Robots/license compliance filter — the legal-exclusion pass a
   * crawl-derived training corpus runs after the domain deny-list
   * ([[domainFilter]] removes bad ACTORS; this removes disallowed
   * CONTENT from otherwise-fine hosts). Three signals, with the
   * crawl-practice precedence robots > meta directive > license:
   *
   *  - robots rules: per-host (prefix, allow) entries; a doc's path
   *    matches under the longest-match rule, ties broken toward
   *    allow (the published robots.txt evaluation rule). No rule for
   *    the host ⇒ allowed.
   *  - meta directive: a per-doc `noai`-style opt-out always excludes.
   *  - license: only tags on the permissive allowlist may train;
   *    unknown or restrictive tags exclude.
   *
   * Output: every doc with its matched robots rule (most specific),
   * the decision, and the FIRST exclusion reason by precedence —
   * the audit columns a compliance review asks for.
   *
   * Scale shape (100 TB): the ruleset and license allowlist are
   * broadcast (rule corpora are thousands of rows); the robots match
   * is a broadcast equi-join on host + a startswith filter + one
   * per-doc max_by over its few matching rules — the corpus never
   * shuffles, only the small (doc, rule) match set aggregates, and
   * the verdict is a codegen'd projection.
   */
  def complianceFilter(docs: DataFrame, robots: DataFrame,
      allowedLicenses: Seq[String]): DataFrame = {
    val rules = robots.select(col("host").as("_rh"),
      col("prefix").as("_rp"), col("allow").as("_ra"))
    val matched = docs
      .select(col("doc_id"), col("host"), col("path"))
      .join(broadcast(rules), col("host") === col("_rh") &&
        col("path").startsWith(col("_rp")))
      .groupBy(col("doc_id"))
      // longest match wins; tie -> allow (struct max orders by
      // length first, then allow=true > false)
      .agg(max(struct(length(col("_rp")).as("l"), col("_ra").as("a"),
        col("_rp").as("p"))).as("m"))
      .select(col("doc_id"), col("m.p").as("robots_rule"),
        col("m.a").as("robots_allow"))
    val lic = allowedLicenses.map(lit(_))
    docs.join(matched, Seq("doc_id"), "left")
      .withColumn("robots_ok",
        coalesce(col("robots_allow"), lit(true)))
      .withColumn("license_ok", col("license").isin(lic: _*))
      .withColumn("meta_ok", !col("noai"))
      .withColumn("compliant",
        col("robots_ok") && col("meta_ok") && col("license_ok"))
      .withColumn("exclude_reason",
        when(!col("robots_ok"), lit("robots"))
          .when(!col("meta_ok"), lit("meta_noai"))
          .when(!col("license_ok"), lit("license")))
  }

  /**
   * robots.txt parsing — the upstream half of the compliance family:
   * [[complianceFilter]] consumes (host, prefix, allow) rule rows;
   * this operator PRODUCES them from raw robots.txt blobs, so the
   * chain parse → filter → streaming re-classification is end-to-end.
   * Grammar (RFC 9309, the subset crawl pipelines implement):
   * User-agent lines open a group — CONSECUTIVE User-agent lines
   * share the group — and Allow/Disallow lines bind to the nearest
   * preceding group; matching is case-insensitive with arbitrary
   * whitespace; `#` comments, blank lines, empty-path rules (an
   * empty Disallow means "allow everything" and emits no rule), and
   * rules before any group (invalid per RFC) are all dropped. Group
   * selection is RFC 9309 §2.2.1's most-specific rule: if ANY group
   * on the host names our agent token, only agent-named groups apply
   * and `*` groups are ignored; `*` groups apply only as the
   * fallback when no agent-named group exists — merging both would
   * let a `*` Allow of equal-or-longer prefix override an
   * agent-specific Disallow downstream.
   *
   * Shape at 100 TB: robots documents are per-host and small; every
   * window is PARTITIONED by host (thousands of lines each, never
   * corpus-wide), so parsing scales with host count like any
   * per-entity pass.
   */
  def robotsParse(robots: DataFrame, agent: String = "graftbot")
      : DataFrame = {
    val lines = robots.select(col("host"),
      posexplode(split(col("robots_txt"), "\n"))
        .as(Seq("line_no", "line")))
    val typed = lines.select(col("host"), col("line_no"),
      lower(regexp_extract(col("line"),
        "(?i)^\\s*user-agent\\s*:\\s*([^#\\s]+)", 1)).as("ua"),
      lower(regexp_extract(col("line"),
        "(?i)^\\s*(allow|disallow)\\s*:", 1)).as("dir"),
      regexp_extract(col("line"),
        "(?i)^\\s*(?:allow|disallow)\\s*:\\s*([^#\\s]*)", 1).as("path"))
    val w = Window.partitionBy(col("host")).orderBy(col("line_no"))
    val blocked = typed
      .withColumn("is_ua", col("ua") =!= "")
      .withColumn("new_block", col("is_ua") &&
        !coalesce(lag(col("ua") =!= "", 1).over(w), lit(false)))
      .withColumn("block",
        sum(when(col("new_block"), 1L).otherwise(0L)).over(w))
    // two-pass group selection (RFC 9309): agent-named groups win
    // over `*` groups host-wide; both aggregates are group-count
    // sized (metadata, never corpus-shaped)
    val groupNames = blocked.filter(col("is_ua"))
      .groupBy(col("host"), col("block"))
      .agg(max(col("ua") === agent).as("names_agent"),
        max(col("ua") === "*").as("names_star"))
    val hostMode = groupNames.groupBy(col("host"))
      .agg(max(col("names_agent")).as("host_has_agent"))
    val blockAgents = groupNames.join(hostMode, Seq("host"))
      .select(col("host"), col("block"),
        when(col("host_has_agent"), col("names_agent"))
          .otherwise(col("names_star")).as("applies"))
    blocked
      .filter(!col("is_ua") && col("dir").isin("allow", "disallow") &&
        col("path") =!= "")
      .join(blockAgents, Seq("host", "block"))
      .filter(col("applies"))
      .select(col("host"), col("line_no").cast("long").as("line_no"),
        col("path").as("prefix"), (col("dir") === "allow").as("allow"))
      .orderBy(col("host"), col("line_no"))
  }

  /** Correctness gate for [[robotsParse]]: six literal robots.txt
    * blobs (mirrored verbatim in the oracle) covering comments,
    * blank lines, case/whitespace variants, trailing comments on
    * rule lines, a consecutive-UA shared group that includes our
    * agent, a foreign-only group (no output), an empty Disallow
    * (dropped), an orphan rule before any group (dropped), and a
    * host carrying BOTH a `*` group and an agent-specific group —
    * RFC 9309 group selection must emit only the agent group's
    * rules (the `*` Allow would otherwise override the specific
    * Disallow downstream). */
  def robotsParseQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fixtures = Seq(
      ("a.example", Seq(
        "# robots for a.example",
        "User-agent: *",
        "Disallow: /private/",
        "Allow: /private/blog",
        "",
        "User-agent: badbot",
        "Disallow: /").mkString("\n")),
      ("b.example", Seq(
        "User-agent: GraftBot",
        "User-Agent: otherbot",
        "Disallow: /tmp/",
        "Allow: /tmp/pub").mkString("\n")),
      ("c.example", Seq(
        "Disallow: /orphan",
        "User-agent: *",
        "Disallow:",
        "Disallow: /x # temporary",
        "  User-Agent :  *",
        "DISALLOW: /z").mkString("\n")),
      ("d.example", Seq(
        "User-agent: badbot",
        "Disallow: /everything").mkString("\n")),
      ("e.example", Seq(
        "User-agent: *",
        "Allow: /a",
        "Disallow: /a/b").mkString("\n")),
      ("f.example", Seq(
        "User-agent: *",
        "Allow: /private/",
        "Disallow: /tmp/",
        "User-agent: graftbot",
        "Disallow: /private/").mkString("\n")))
    robotsParse(fixtures.toDF("host", "robots_txt"))
  }

  /** Correctness gate for [[complianceFilter]]: id-derived hosts
    * (`site{id%5}.{com|org}`), paths (`/{public|private|blog}/p{id%9}`),
    * licenses (7-cycle over permissive and restrictive tags) and a
    * 17-cycle noai bit, against a fixed rule set exercising longest
    * match (`/private/` disallowed but `/private/blog` re-allowed on
    * site1.com), the allow-on-tie rule (equal-length allow+disallow
    * entries on site2.org), a host with no rules, and each reason of
    * the precedence chain. */
  def complianceFilterQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import spark.implicits._
    val id = col("doc_id")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(id,
        concat(lit("site"), (id % 5).cast("string"),
          when(id % 2 === 0, lit(".com")).otherwise(lit(".org")))
          .as("host"),
        concat(lit("/"),
          when(id % 3 === 0, lit("private"))
            .when(id % 3 === 1, lit("public")).otherwise(lit("blog")),
          lit("/p"), (id % 9).cast("string")).as("path"),
        element_at(typedLit(Seq("cc-by", "cc0", "all-rights-reserved",
          "mit", "cc-by-nc", "public-domain", "unknown")),
          (id % 7).cast("int") + 1).as("license"),
        (id % 17 === 0).as("noai"))
    val robots = Seq(
      ("site1.com", "/private/", false),
      ("site1.com", "/private/blog", true),  // longest match re-allows
      ("site2.org", "/priva", false),
      ("site2.org", "/publi", true),
      ("site3.com", "/", false),             // whole host disallowed
      ("site2.org", "/blog/", false),
      ("site2.org", "/blog/", true))         // exact tie -> allow wins
      .toDF("host", "prefix", "allow")
    complianceFilter(docs, robots,
      Seq("cc-by", "cc0", "mit", "public-domain"))
      .select(col("doc_id"), col("host"), col("path"), col("license"),
        col("robots_rule"), col("robots_ok"), col("meta_ok"),
        col("license_ok"), col("compliant"), col("exclude_reason"))
      .orderBy(col("doc_id"))
  }

  /**
   * K-anonymity via a fixed generalization ladder (global recoding):
   * each row's quasi-identifier tuple is released at the FINEST level
   * whose equivalence class (count of rows sharing the level's
   * generalized tuple) reaches `k`; rows whose class is still smaller
   * than `k` at the coarsest level are suppressed outright. This is
   * the release gate a privacy-reviewed dataset export runs so no
   * published row is re-identifiable among fewer than k peers.
   *
   * Every level must emit the SAME output column names (progressively
   * coarser values — wider bands, then `*`). Deterministic by
   * construction: class sizes are plain counts, the chosen level is
   * the first that clears `k`, so the whole decision replays in SQL.
   *
   * Scale shape (100 TB): one scan; each ladder level adds one
   * map-side-partial groupBy over its DISTINCT generalized tuples — a
   * result that is tiny relative to the row count by definition of
   * anonymization (classes are large or the data isn't releasable) —
   * broadcast back onto the scan. No window over the full table, no
   * sort.
   *
   * @param levels finest-first; each level maps output-column name →
   *               generalized (string-typed) expression
   */
  def kAnonymize(df: DataFrame, levels: Seq[Seq[(String, Column)]],
      k: Int): DataFrame =
    anonymizeLadder(df, levels, k, None, 0)

  /**
   * L-diversity on the same generalization ladder: k-anonymity stops
   * identity disclosure (you hide among ≥ k rows) but not ATTRIBUTE
   * disclosure — if all k rows of a class share one sensitive value,
   * the attacker learns it without re-identifying anyone. Distinct
   * l-diversity (Machanavajjhala et al., ICDE 2006) additionally
   * requires every released equivalence class to contain ≥ `l`
   * distinct values of the sensitive column, so a level clears only
   * when BOTH gates hold; rows whose class fails either gate at the
   * coarsest level are suppressed. Generalizing coarser merges
   * classes, so diversity is monotone up the ladder the same way size
   * is — the first-clearing-level choice stays well-defined.
   *
   * Scale shape: identical to [[kAnonymize]] — the per-level class
   * stats gain one exact `count_distinct(sensitive)` (a second
   * partial-agg over tuples that are tiny by the anonymization
   * argument); still one scan, no window, no sort.
   */
  def lDiversify(df: DataFrame, levels: Seq[Seq[(String, Column)]],
      k: Int, sensitive: String, l: Int): DataFrame =
    anonymizeLadder(df, levels, k, Some(sensitive), l)

  private def anonymizeLadder(df: DataFrame,
      levels: Seq[Seq[(String, Column)]], k: Int,
      sensitive: Option[String], l: Int): DataFrame = {
    require(levels.nonEmpty &&
      levels.forall(_.map(_._1) == levels.head.map(_._1)),
      "all ladder levels must emit the same output columns")
    val names = levels.head.map(_._1)
    // materialize every level's generalized tuple once
    val tagged = levels.zipWithIndex.foldLeft(df) { case (d, (lvl, i)) =>
      lvl.foldLeft(d) { case (d2, (nm, e)) =>
        d2.withColumn(s"_l${i}_$nm", e.cast("string"))
      }
    }
    // per-level equivalence-class stats (size, and distinct sensitive
    // values when l-diversity is on), broadcast back
    val sized = levels.indices.foldLeft(tagged) { (d, i) =>
      val keys = names.map(nm => s"_l${i}_$nm")
      val aggs = count(lit(1)).as(s"_n$i") +: sensitive.toSeq
        .map(s => count_distinct(col(s)).as(s"_div$i"))
      val sizes = tagged.groupBy(keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
      d.join(broadcast(sizes), keys)
    }
    def clears(i: Int): Column = sensitive match {
      case Some(_) => col(s"_n$i") >= k && col(s"_div$i") >= l
      case None => col(s"_n$i") >= k
    }
    val level = coalesce(
      (levels.indices.map(i => when(clears(i), lit(i))) :+
        lit(levels.size)): _*)
    val out = sized.withColumn("anon_level", level)
      .withColumn("released", col("anon_level") < levels.size)
    val generalized = names.map { nm =>
      val perLevel = levels.indices.foldRight(lit("*"): Column) { (i, acc) =>
        when(col("anon_level") === i, col(s"_l${i}_$nm")).otherwise(acc)
      }
      perLevel.as(nm)
    }
    // under l-diversity, surface the chosen class's stats (null when
    // suppressed) — the released row's privacy certificate
    val classStats = sensitive.toSeq.flatMap { _ =>
      def pick(pre: String) = coalesce(levels.indices
        .map(i => when(col("anon_level") === i, col(s"$pre$i"))): _*)
      Seq(pick("_n").cast("bigint").as("class_size"),
        pick("_div").cast("bigint").as("class_div"))
    }
    // generalized QI columns REPLACE same-named input columns — keeping
    // both would leak the raw quasi-identifier past the release gate
    out.select((df.columns.filterNot(names.contains).map(col).toSeq ++
      Seq(col("anon_level"), col("released")) ++ classStats ++
      generalized): _*)
  }

  /** Correctness gate for [[kAnonymize]]: customer quasi-identifiers
    * (nation, segment, account-balance band) down a three-level ladder
    * — $100 bands → $1000 bands → band dropped (`*`) — with k = 10.
    * Banding rides integer cents (exact at any magnitude); the oracle
    * replays all three class-size counts and the first-clearing-level
    * choice. At sf0.01 most rows release at the band-dropped level and
    * a real minority suppress (sparse nation×segment classes); at
    * sf0.1 the $1000 bands start clearing k — the ladder is exercised
    * differently at every SF. */
  /** Account-balance banding trio shared by [[kAnonQuery]] and
    * [[lDiversityQuery]] — one copy so the two ladders (and their SQL
    * oracles, which replay the same arithmetic) cannot drift apart.
    * Banding rides integer cents: exact at any magnitude. */
  private def acctCents: Column =
    fr(col("c_acctbal") * 100, 0).cast("bigint")
  private def acctBand(width: Long): Column =
    floor(acctCents.cast("double") / lit(width * 100.0)).cast("bigint")
  private def acctBandLabel(width: Long): Column = {
    val b = acctBand(width)
    concat(lit("["), (b * width).cast("string"), lit(","),
      ((b + 1) * width).cast("string"), lit(")"))
  }

  def kAnonQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = col("c_nationkey").cast("string")
    val segment = col("c_mktsegment")
    val ladder = Seq(
      Seq("nation" -> nation, "segment" -> segment,
        "acct_band" -> acctBandLabel(100)),
      Seq("nation" -> nation, "segment" -> segment,
        "acct_band" -> acctBandLabel(1000)),
      Seq("nation" -> nation, "segment" -> segment,
        "acct_band" -> (lit("*"): Column)))
    kAnonymize(Tables.load(spark, sfDir, "customer"), ladder, k = 10)
      .select(col("c_custkey"), col("anon_level"), col("released"),
        col("nation"), col("segment"), col("acct_band"))
      .orderBy(col("c_custkey"))
  }

  /** Correctness gate for [[lDiversify]]: quasi-identifiers are
    * (nation, account band) down the same $100 → $1000 → dropped
    * ladder; market segment is the SENSITIVE attribute (5 categories),
    * k = 10, l = 3. Dropping segment from the QI set is what makes the
    * exercise real: a class can easily hold 10 rows that all share one
    * segment, so the diversity gate — not the size gate — decides many
    * rows' release level. The released class's (size, distinct-segment)
    * certificate is part of the output, so the oracle re-deriving both
    * stats per level pins the whole decision, not just the label. */
  def lDiversityQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = col("c_nationkey").cast("string")
    val ladder = Seq(
      Seq("nation" -> nation, "acct_band" -> acctBandLabel(100)),
      Seq("nation" -> nation, "acct_band" -> acctBandLabel(1000)),
      Seq("nation" -> nation, "acct_band" -> (lit("*"): Column)))
    lDiversify(Tables.load(spark, sfDir, "customer"), ladder, k = 10,
        sensitive = "c_mktsegment", l = 3)
      // c_mktsegment (the sensitive value itself) is part of the gated
      // output: the hash then witnesses the values the class_div
      // certificate summarizes, not just the certificate — a bug that
      // permuted sensitive values within a class while preserving the
      // distinct count would otherwise be invisible.
      .select(col("c_custkey"), col("anon_level"), col("released"),
        col("class_size"), col("class_div"), col("c_mktsegment"),
        col("nation"), col("acct_band"))
      .orderBy(col("c_custkey"))
  }

  /**
   * Isotonic probability calibration of the heuristic quality score
   * against the `lang = 'en'` label, via the CLOSED-FORM pool-
   * adjacent-violators solution (Ayer et al. 1955): over score
   * buckets b, iso(i) = max_{j≤i} min_{k≥i} weightedMean(y, j..k) —
   * the minimax formula equals the PAV fit without PAV's sequential
   * pool merging, so the whole estimator is three relational passes
   * on the bucket grid and the oracle replays it verbatim. This is
   * the reliability-calibration step (Zadrozny & Elkan 2002) every
   * quality-classifier release needs before its scores are used as
   * probabilities in sampling weights.
   *
   * Exactness: bucket weights and positives are exact BIGINTs;
   * cumulative sums make every windowed mean ONE double division of
   * integer differences; min/max over those doubles is IEEE-
   * deterministic. The triple (j ≤ i ≤ k) expansion is O(B³) on the
   * 16-bucket grid — domain-sized at any corpus scale.
   */
  def calibrationQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val scored = TextAnalysis.qualityOver(docs)
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("y")),
        Seq("doc_id"))
      .select(least(lit(15L),
        floor(col("quality_score") * 16).cast("long")).as("bucket"),
        col("y"))
    val grid = scored.groupBy(col("bucket"))
      .agg(count(lit(1)).as("w"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = grid
      .withColumn("cw", sum(col("w")).over(wOrd))
      .withColumn("cp", sum(col("pos")).over(wOrd))
    val iFrame = cum.select(col("bucket").as("bi"), col("w"),
      col("pos"))
    val jFrame = cum.select(col("bucket").as("bj"),
      (col("cp") - col("pos")).as("cpj0"),
      (col("cw") - col("w")).as("cwj0"))
    val kFrame = cum.select(col("bucket").as("bk"), col("cp").as("cpk"),
      col("cw").as("cwk"))
    iFrame
      .join(jFrame, col("bj") <= col("bi"))
      .join(kFrame, col("bk") >= col("bi"))
      .select(col("bi"), col("w"), col("pos"), col("bj"),
        ((col("cpk") - col("cpj0")).cast("double") /
          (col("cwk") - col("cwj0")).cast("double")).as("avgjk"))
      .groupBy(col("bi"), col("w"), col("pos"), col("bj"))
      .agg(min(col("avgjk")).as("mn"))
      .groupBy(col("bi"), col("w"), col("pos"))
      .agg(max(col("mn")).as("iso0"))
      .select(col("bi").as("bucket"), col("w"), col("pos"),
        fr(col("pos").cast("double") / col("w").cast("double"), 10)
          .as("raw_rate"),
        fr(col("iso0"), 10).as("iso_rate"))
      .orderBy(col("bucket"))
  }

  /**
   * Expected / maximum calibration error — the one-number summary of
   * [[calibrationQuery]]'s reliability diagram (Naeini et al., AAAI
   * 2015): ECE = Σ_b (w_b/n)·|acc_b − conf_b|, MCE = max_b of the
   * same gap. Confidence per bucket is the bucket MIDPOINT
   * (2b+1)/32 — the fixed-grid convention that keeps every gap an
   * exact rational: |acc_b − mid_b| = |32·pos_b − (2b+1)·w_b| /
   * (32·w_b), so ECE clears to Σ_b |32·pos_b − (2b+1)·w_b| / (32·n)
   * — pure BIGINT, one division. The worst bucket rides along
   * (deterministic tie to the lowest bucket).
   *
   * Shape at 100 TB: the same one-scan 16-bucket fold as the
   * reliability diagram; everything after is arithmetic on ≤ 16 rows.
   */
  def eceQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val grid = TextAnalysis.qualityOver(docs)
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("y")),
        Seq("doc_id"))
      .select(least(lit(15L),
        floor(col("quality_score") * 16).cast("long")).as("bucket"),
        col("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("w"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
      .withColumn("gap_num",
        abs(col("pos") * 32 - (col("bucket") * 2 + 1) * col("w")))
      .withColumn("gap_micro",
        expr("CAST(gap_num * 1000000 div (32 * w) AS BIGINT)"))
    val wPick = Window.orderBy(col("gap_micro").desc, col("bucket"))
    grid
      .withColumn("rk", row_number().over(wPick))
      .agg(sum(col("w")).as("n"),
        count(lit(1)).as("n_buckets"),
        sum(col("gap_num")).as("ece_num"),
        max(col("gap_micro")).as("mce_micro"),
        max(when(col("rk") === 1, col("bucket"))).as("worst_bucket"))
      .select(col("n"), col("n_buckets"),
        expr("CAST(ece_num * 1000000 div (32 * n) AS BIGINT)")
          .as("ece_micro"),
        col("mce_micro"), col("worst_bucket"))
  }

  /**
   * Dataset card: the one-row corpus summary a training-data release
   * publishes (Gebru et al., "Datasheets for Datasets", CACM 2021) —
   * sizes, language/source breadth, exact-duplicate rate, and
   * corpus-level text-quality ratios. Every field derives from EXACT
   * integer sums with at most one final division (corpus ratios from
   * summed counts — never a mean of per-doc doubles, whose summation
   * order is engine-dependent). Duplicate rate counts md5 digest
   * groups, the same identity the exact-dedup family keys on.
   *
   * Shape at 100 TB: ONE narrow aggregation pass (plus the digest
   * distinct) — the card is a broadcastable artifact recomputed per
   * release.
   */
  def datasetCardQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = split(col("text"), " ")
    val stats = docs.select(
      col("doc_id"), col("lang"), col("source"),
      col("n_chars"),
      size(toks).cast("long").as("n_tok"),
      size(filter(toks, t =>
        t.isin("the", "a", "of", "and", "to", "in", "is")))
        .cast("long").as("n_stop"),
      md5(col("text")).as("digest"),
      (col("lang") === "en").cast("long").as("is_en"))
    stats.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("n_chars_total"),
      sum(col("n_tok")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("digest")).as("n_distinct_texts"),
      sum(col("is_en")).as("n_en"),
      sum(col("n_stop")).as("n_stop"))
      .select(col("n_docs"), col("n_chars_total"), col("n_tokens"),
        col("n_langs"), col("n_sources"),
        fr(lit(1.0) - col("n_distinct_texts").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"),
        fr(col("n_en").cast("double") /
          col("n_docs").cast("double"), 6).as("pct_en"),
        fr(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 4).as("mean_tokens"),
        fr(col("n_stop").cast("double") /
          col("n_tokens").cast("double"), 6).as("stopword_ratio"))
  }

  /**
   * Leakage-safe target encoding (the K-fold "mean of the target per
   * category" feature, Micci-Barreca SIGKDD Expl. 2001): for each
   * (category, fold), the m-smoothed target mean computed from the
   * OTHER folds only — encode(c, f) = (sum_loo + m·prior)/(n_loo + m)
   * — so no row's own target value leaks into its feature, the
   * mistake that silently inflates offline metrics. Category =
   * order priority, target = order value in exact integer cents,
   * folds = md5(orderkey) mod 4 (reproducible, partitioning-free).
   *
   * Exactness: per-(category, fold) cent sums and counts are exact
   * BIGINTs; leave-one-fold-out sums are SUBTRACTIONS of those (no
   * second pass over the data); prior and each encoding are one
   * double expression rounded 6 dp. One map-side-partial groupBy to
   * k·K cells — nothing wider ever shuffles.
   */
  def targetEncodeQuery(spark: SparkSession, sfDir: String,
      folds: Int = 4, m: Int = 10): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("category"),
        (Sampling.hashBucket24(col("o_orderkey").cast("string"))
          % folds).as("fold"),
        fr(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val cells = ord.groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val cats = cells.groupBy(col("category"))
      .agg(sum(col("n")).as("cat_n"), sum(col("s")).as("cat_s"))
    val tot = cells.agg(sum(col("n")).as("tot_n"),
      sum(col("s")).as("tot_s"))
    cells.join(broadcast(cats), Seq("category"))
      .crossJoin(broadcast(tot))
      .withColumn("prior",
        col("tot_s").cast("double") / lit(100.0) /
          col("tot_n").cast("double"))
      .select(col("category"), col("fold"), col("n"),
        (col("cat_n") - col("n")).as("n_loo"),
        fr(col("prior"), 6).as("prior"),
        fr(((col("cat_s") - col("s")).cast("double") / lit(100.0) +
          lit(m.toDouble) * col("prior")) /
          (col("cat_n") - col("n") + m).cast("double"), 6)
          .as("encoding"))
      .orderBy(col("category"), col("fold"))
  }

  /**
   * Differentially-private count release (Dwork et al., TCC 2006):
   * event counts per (event_type, hour-of-day) with Laplace(1/ε)
   * noise — the third rung of the privacy ladder next to
   * [[kAnonQuery]]/[[lDiversityQuery]]: k-anonymity hides rows,
   * l-diversity hides attributes, DP bounds what ANY release reveals
   * about one record. Event-level ε-DP (adding/removing one event
   * changes each cell by ≤ 1, so sensitivity = 1 and b = 1/ε);
   * user-level DP would first clamp per-user contributions — a
   * groupBy cap — before this same mechanism.
   *
   * Determinism (the gate's requirement, NOT a production property):
   * the Laplace draw inverts the CDF at a deterministic md5 uniform
   * u = (h24 + 0.5)/2²⁴ ∈ (0,1) derived from the CELL KEY —
   * noise = −b·sign(u−½)·ln(1−2|u−½|) — so both engines replay the
   * identical noise. Production swaps u for a secure RNG; nothing
   * else changes. The exact `n` column is gate-only audit material; a
   * real release publishes `noisy_n` alone.
   *
   * Shape at 100 TB: one map-side-partial groupBy to k·24 cells, then
   * the noise is a scalar projection on the tiny released frame.
   */
  def dpCountsQuery(spark: SparkSession, sfDir: String,
      epsilon: Double = 1.0): DataFrame = {
    val counts = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
    val u = (Sampling.hashBucket24(concat(col("event_type"), lit(":"),
      col("hod").cast("string"))).cast("double") + lit(0.5)) /
      lit(16777216.0)
    val b = 1.0 / epsilon
    val noise = -lit(b) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    counts
      .select(col("event_type"), col("hod"), col("n"),
        fr(col("n").cast("double") + noise, 6).as("noisy_n"))
      .orderBy(col("event_type"), col("hod"))
  }

  /**
   * Greedy maximum-coverage subset selection (the (1−1/e)-approximate
   * greedy for submodular coverage, Nemhauser–Wolsey–Fisher 1978):
   * pick `k` documents that together cover the most distinct
   * vocabulary — the facility-location/diversity pass that builds
   * small eval sets and dedup-cluster exemplar pools ("which 100 docs
   * best represent the corpus"), where top-k by any per-doc score
   * picks k near-duplicates.
   *
   * Iteration shape (the k-means/BPE driver-coordination pattern):
   * each round is one ANTI-JOIN of the (doc, word) pairs against the
   * covered-word set — which is bounded by k · |doc vocabulary|, so
   * it BROADCASTS — one map-side-partial gain count, and a 1-row
   * bounded-heap argmax to the driver (ties → smallest doc_id). Only
   * per-round scalars reach the driver; corpus text never shuffles.
   * Greedy's marginal gains are non-increasing (submodularity), which
   * the spec asserts.
   */
  def setCoverQuery(spark: SparkSession, sfDir: String,
      k: Int = 3): DataFrame = {
    // universe = word BIGRAMS: the unigram vocabulary of the synthetic
    // corpus is 31 words (one doc covers it — greedy saturates in one
    // round); bigrams give a 900+-element universe with real overlap
    // structure, which is also the honest production choice (coverage
    // of CONTEXTS, not bare tokens)
    // native O(L) bigram kernel: the HOF formulation
    // (transform(sequence, i -> element_at(split(text), i)...)) gets
    // its split() inlined per lambda invocation — O(L²) interpreted
    // per doc, measured 3.1 s of this gate's 3.9 s warm time at
    // sf0.1; the kernel pass is 0.2 s (the graft_cdc_cuts lesson)
    val docWords = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(
          call_function("graft_ngrams", col("text"), lit(2))))
          .as("wrd"))
    greedyCover(spark, docWords, k)
  }

  /** The [[setCoverQuery]] greedy over an explicit (doc_id, wrd)
    * element frame — spec entry point. */
  private[graft] def greedyCover(spark: SparkSession, docWords: DataFrame,
      k: Int): DataFrame = {
    var chosen = List.empty[Long]
    var saturated = false
    var covered = 0L
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, Long, Long, Long)]
    // one materialization serves every greedy round (the explode is
    // re-evaluated per action otherwise — k rounds × full scans)
    docWords.cache()
    try (1 to k).foreach { r =>
      if (!saturated) {
        // the covered set derives from docWords itself — alias its
        // column so the anti join is a real equi-join, not a
        // self-join on one shared attribute. Round 1's covered set
        // is empty by definition: skip the filter/distinct/broadcast
        // jobs entirely (measured ~0.7 s of the gate's 3.9 s warm).
        val remaining =
          if (chosen.isEmpty) docWords
          else {
            val cov = docWords
              .filter(col("doc_id").isInCollection(chosen))
              .select(col("wrd").as("cov_wrd")).distinct()
            docWords.join(broadcast(cov),
              col("wrd") === col("cov_wrd"), "left_anti")
          }
        val win = remaining
          .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1)
          .collect()
        // an empty gains frame means the universe is fully covered —
        // greedy stops (fewer than k rows is the saturation witness)
        if (win.isEmpty) saturated = true
        else {
          chosen = chosen :+ win(0).getLong(0)
          // the winner's gain counts exactly its not-yet-covered
          // elements, so cumulative coverage is the running gain sum
          // — no extra distinct-count action per round
          covered += win(0).getLong(1)
          out += ((r, win(0).getLong(0), win(0).getLong(1), covered))
        }
      }
    } finally docWords.unpersist()
    spark.createDataFrame(out.toSeq)
      .toDF("round", "doc_id", "gain", "covered_total")
  }

  /**
   * Borda-count quality ensemble: fuse three heterogeneous per-doc
   * quality signals (length, lexical diversity, mean word length) by
   * RANK rather than value — the rank-aggregation answer to
   * incommensurable score scales, the corpus-wide complement of the
   * top-k [[Retrieval.rrfFusionQuery]]. rank_m(d) = number of docs
   * strictly better on metric m (descending, 0-based, ties share);
   * borda = Σ ranks, lower = better.
   *
   * The 100 TB trick is how ranks are computed WITHOUT a corpus-wide
   * sort: each metric is rounded to a bounded value domain, reduced
   * to a (value, count) table — value-DOMAIN-sized, not corpus-sized
   * — the "docs strictly better" cumulative count runs as a window
   * over that tiny table, and the result broadcasts back onto the
   * scan. Three metric CDFs = three broadcast joins on one pass;
   * corpus text never shuffles.
   */
  def rankEnsembleQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = split(col("text"), " ")
    val scored = docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("s_len"),
      fr(size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"), 4).as("s_div"),
      fr(length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(toks).cast("double"), 4).as("s_wlen"))
    def cdf(metric: String): DataFrame =
      scored.groupBy(col(metric)).agg(count(lit(1)).as("c"))
        .withColumn(s"r_$metric", coalesce(
          sum(col("c")).over(Window.orderBy(col(metric).desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(metric), col(s"r_$metric"))
    scored
      .join(broadcast(cdf("s_len")), Seq("s_len"))
      .join(broadcast(cdf("s_div")), Seq("s_div"))
      .join(broadcast(cdf("s_wlen")), Seq("s_wlen"))
      .select(col("doc_id"), col("s_len"), col("s_div"), col("s_wlen"),
        col("r_s_len").as("r_len"), col("r_s_div").as("r_div"),
        col("r_s_wlen").as("r_wlen"),
        (col("r_s_len") + col("r_s_div") + col("r_s_wlen")).as("borda"))
      .orderBy(col("doc_id"))
  }

  /**
   * T-closeness (Li, Li & Venkatasubramanian, ICDE 2007): the third
   * rung of the release-privacy ladder after [[kAnonymize]] (identity)
   * and [[lDiversify]] (attribute count) — a class can hold ≥ k rows
   * and ≥ l distinct sensitive values yet still leak, if its sensitive
   * DISTRIBUTION sits far from the table-wide one (e.g. one nation's
   * released class concentrating in the top account-balance band).
   * For an ORDERED sensitive attribute the distance is the ordered
   * Earth-Mover's Distance: with buckets j = 1..m in value order,
   * class proportions r_j = c_j/n_c and global q_j = g_j/N,
   * EMD = Σ_i |Σ_{j≤i} (r_j − q_j)| / (m − 1).
   *
   * Exact-rational form (no doubles): the inner prefix sums clear to
   * the common denominator n_c·N — D_i = Σ_{j≤i} (c_j·N − g_j·n_c)
   * is an exact BIGINT, Σ|D_i| likewise, and
   * emd_micro = ⌊10⁶·Σ|D_i| / ((m−1)·n_c·N)⌋ is one DECIMAL(38,0)
   * integer division (non-negative, so floor = truncate in every
   * engine). D_m = n_c·N − N·n_c = 0 is a built-in self-check.
   *
   * Shape at 100 TB: one scan folds map-side to (class × bucket)
   * counts — classes × m rows, metadata-sized by the anonymization
   * argument — and every later step (global marginals, the dense
   * class × bucket spine, the per-class prefix window) runs on that
   * tiny frame. The corpus never shuffles; the windows partition by
   * class.
   */
  /**
   * Decision-stump split finder: for each candidate feature, the
   * threshold minimizing weighted Gini impurity against the
   * `lang = 'en'` label — the classic first move of quality-filter
   * training (CART, Breiman 1984), and the exact feature-ranking
   * primitive a labeling pipeline runs before spending on a real
   * classifier. Features: character count, whitespace token count,
   * 'e'-occurrence count.
   *
   * Exact-rational form: over the per-feature VALUE GRID (value,
   * count, positives), prefix sums give each threshold's
   * (n_L, p_L, n_R, p_R); weighted Gini clears to
   * G = [(n_L²−p_L²−q_L²)·n_R + (n_R²−p_R²−q_R²)·n_L] / (n·n_L·n_R)
   * with q = n − p — all DECIMAL(38,0) integer products (n³ ≈ 10²⁰
   * at sf10 overflows BIGINT). The argmin compares G at exact NANO
   * resolution (one integer division per row) with the threshold as
   * deterministic tie-break; the winner's G, the parent impurity,
   * and the decrease are re-emitted in micro-units.
   *
   * Shape at 100 TB: one scan folds map-side to three value grids
   * (value-domain-sized, not corpus-sized); prefix windows partition
   * by feature; everything after the first fold is grid arithmetic.
   */
  def giniSplitQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val tok = size(split(col("text"), " ", -1)).cast("long")
    val ne = (length(col("text")) -
      length(regexp_replace(col("text"), "e", ""))).cast("long")
    val base = d.select(
      col("n_chars").as("f_chars"), tok.as("f_tokens"), ne.as("f_e"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    def grid(f: String): DataFrame = base
      .groupBy(col(f).as("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p"))
      .withColumn("feature", lit(f))
    val grids = grid("f_chars")
      .unionByName(grid("f_tokens"))
      .unionByName(grid("f_e"))
    val wPre = Window.partitionBy(col("feature")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("feature"))
    val dec = "decimal(38,0)"
    val walked = grids
      .withColumn("n_l", sum(col("cnt")).over(wPre))
      .withColumn("p_l", sum(col("p")).over(wPre))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("p_tot", sum(col("p")).over(wAll))
      // the last grid row has n_R = 0: not a proper split
      .filter(col("n_l") < col("n"))
      .withColumn("n_r", col("n") - col("n_l"))
      .withColumn("p_r", col("p_tot") - col("p_l"))
      .withColumn("q_l", col("n_l") - col("p_l"))
      .withColumn("q_r", col("n_r") - col("p_r"))
      .withColumn("g_num",
        (col("n_l").cast(dec) * col("n_l") -
          col("p_l").cast(dec) * col("p_l") -
          col("q_l").cast(dec) * col("q_l")) * col("n_r") +
        (col("n_r").cast(dec) * col("n_r") -
          col("p_r").cast(dec) * col("p_r") -
          col("q_r").cast(dec) * col("q_r")) * col("n_l"))
      .withColumn("g_den",
        col("n").cast(dec) * col("n_l") * col("n_r"))
      .withColumn("g_nano",
        expr("CAST(g_num * 1000000000 div g_den AS BIGINT)"))
    val wPick = Window.partitionBy(col("feature"))
      .orderBy(col("g_nano"), col("v"))
    walked
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .withColumn("gini_micro",
        expr("CAST(g_num * 1000000 div g_den AS BIGINT)"))
      // parent impurity on the same denominator family:
      // g_parent = (n² − p² − q²)/n²
      .withColumn("parent_micro", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * n - CAST(p_tot AS " +
        "DECIMAL(38,0)) * p_tot - CAST(n - p_tot AS DECIMAL(38,0)) " +
        "* (n - p_tot)) * 1000000 div (CAST(n AS DECIMAL(38,0)) " +
        "* n) AS BIGINT)"))
      .select(col("feature"), col("v").as("threshold"),
        col("n_l"), col("p_l"), col("n_r"), col("p_r"),
        col("gini_micro"), col("parent_micro"),
        (col("parent_micro") - col("gini_micro")).as("decrease_micro"))
      .orderBy(col("feature"))
  }

  def tClosenessQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = Tables.load(spark, sfDir, "customer").select(
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      acctBand(1000).as("bucket"))
    val classCounts = rows
      .groupBy(col("nation"), col("segment"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val globalCounts = classCounts.groupBy(col("bucket"))
      .agg(sum(col("c")).as("g"))
    val totals = globalCounts.agg(sum(col("g")).as("n_total"),
      count(lit(1)).as("m"))
    val classSizes = classCounts.groupBy(col("nation"), col("segment"))
      .agg(sum(col("c")).as("class_size"))
    // dense class × bucket spine so absent buckets are real zeros in
    // the prefix walk (both sides are post-aggregation frames)
    val spine = classSizes.select(col("nation"), col("segment"))
      .crossJoin(globalCounts.select(col("bucket")))
    val cells = spine
      .join(classCounts, Seq("nation", "segment", "bucket"), "left")
      .select(col("nation"), col("segment"), col("bucket"),
        coalesce(col("c"), lit(0L)).as("c"))
      .join(broadcast(globalCounts), Seq("bucket"))
      .join(broadcast(classSizes), Seq("nation", "segment"))
      .crossJoin(broadcast(totals))
    val wPrefix = Window.partitionBy(col("nation"), col("segment"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = cells.withColumn("d_i",
      sum(col("c") * col("n_total") - col("g") * col("class_size"))
        .over(wPrefix))
    walked
      .groupBy(col("nation"), col("segment"))
      .agg(max(col("class_size")).as("class_size"),
        max(col("n_total")).as("n_total"),
        max(col("m")).as("m"),
        sum(abs(col("d_i"))).as("sum_absd"))
      .withColumn("emd_micro", expr(
        "CAST(CAST(sum_absd AS DECIMAL(38,0)) * 1000000 div " +
        "(CAST(m - 1 AS DECIMAL(38,0)) * class_size * n_total) " +
        "AS BIGINT)"))
      .select(col("nation"), col("segment"), col("class_size"),
        col("m"), col("sum_absd"), col("emd_micro"),
        (col("emd_micro") <= 200000L).as("t_ok"))
      .orderBy(col("nation"), col("segment"))
  }
}
