package graft.operators

import graft.Tables
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
}
