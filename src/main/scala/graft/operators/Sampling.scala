package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import graft.operators.CacheBin.TrackOps
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

  /** 24-bit content-hash bucket (first 6 md5 hex chars): the
    * fine-grained deterministic coin for rate-accurate sampling —
    * [[hashBernoulli]]'s byte gives 1/256 granularity, mixture targets
    * need better. */
  def hashBucket24(key: Column): Column =
    conv(substring(md5(key), 1, 6), 16, 10).cast("long")

  /**
   * Neyman allocation — split a fixed sample budget across strata
   * ∝ N_h·σ_h (Neyman 1934), the variance-optimal design for
   * stratified estimation: a stratum earns sample share for being
   * BIG or for being VOLATILE, which is why it beats proportional
   * allocation whenever spreads differ — exactly the planner a
   * labeling or eval-set budget runs through before sampling. Strata
   * = order priority, variable = order value in exact integer cents.
   *
   * Exactness: per-stratum Σx and Σx² accumulate as DECIMAL(38,0)
   * over cents (order-free, overflow-free at any SF — cents² sums
   * pass 2^63 near sf1); the population variance
   * (Σx² − (Σx)²/N)/N and everything after is one double expression
   * from those exact sums, 6 dp floor-form. Integer seats come from
   * floor(budget·share + ½); the ±k rounding drift is reported, not
   * hidden (largest-remainder repair is a presentation choice the
   * caller makes).
   *
   * Shape at 100 TB: one map-side-partial groupBy to k stratum rows;
   * the allocation is metadata arithmetic on the k-row frame.
   */
  def neymanAllocQuery(spark: SparkSession, sfDir: String,
      budget: Long = 10000L): DataFrame = {
    val cents = fr(col("o_totalprice") * 100, 0).cast("long")
    val strata = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("stratum"), cents.as("x"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("x").cast("decimal(38,0)")).as("s1"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("s2"))
    val nD = col("n_h").cast("double")
    val sd = sqrt((col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / nD) / nD)
    // weights live in EXACT integer space: sd quantizes to
    // micro-DOLLARS (≈1.4e11 at sf10 — inside floor's safe range),
    // then w = n_h · sd_micro as an exact DECIMAL product. The first
    // formulation rounded w = n·sd through foldRound and silently
    // SATURATED at sf10: Spark's floor(DOUBLE) returns BIGINT and
    // clamps at 2^63−1 where DuckDB's floor stays DOUBLE, so
    // fr(x, s) is only cross-engine-safe while |x|·10^s < 2^63 —
    // n·sd·1e6 ≈ 4.3e19 was past it and every stratum weight clamped
    // to the same value (share 0.2 exactly, caught by the sf10 gate).
    val weighted = strata
      .withColumn("sd_dollars", fr(sd / 100.0, 6))
      .withColumn("sd_micro",
        floor(col("sd_dollars") * lit(1e6) + 0.5).cast("long"))
      .withColumn("w_dec", col("n_h").cast("decimal(19,0)") *
        col("sd_micro").cast("decimal(19,0)"))
    val tot = weighted.agg(sum(col("w_dec")).as("w_tot"))
    val share = col("w_dec").cast("double") /
      col("w_tot").cast("double")
    weighted.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_h"),
        col("s1").cast("string").as("sum_cents"),
        col("sd_dollars"),
        fr(share, 6).as("share"),
        floor(lit(budget.toDouble) * share + 0.5)
          .cast("long").as("alloc_n"))
      .orderBy(col("stratum"))
  }

  /**
   * Domain-mixture resampling: downsample each stratum so the kept
   * corpus approaches a target mixture (the data-mixing pass every
   * pretraining run does before training — over-represented domains
   * are cut, never upsampled). Acceptance rate per stratum
   * r_s = min(1, target_s · N_total / N_s); membership is the 24-bit
   * content-hash coin against floor(r_s · 2^24), so the sample is
   * reproducible, repartition-stable, and exactly replayable by the
   * SQL oracle.
   *
   * Shape at 100 TB: pass 1 is a map-side-partial count per stratum
   * (5 rows); the rate table broadcasts back onto the scan; pass 2 is
   * a pushable hash-predicate filter + another partial-agg summary.
   * Two scans, zero wide shuffles, no driver collect.
   */
  def domainMixQuery(spark: SparkSession, sfDir: String,
      targetPct: Seq[(String, Int)] = Seq(
        "de" -> 15, "en" -> 40, "es" -> 15, "fr" -> 15, "zh" -> 15))
      : DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val pct = spark.createDataFrame(targetPct)
      .toDF("lang", "target_pct")
    val rates = counts
      .join(broadcast(pct), Seq("lang"))
      .crossJoin(broadcast(total))
      .withColumn("rate", least(lit(1.0),
        (col("target_pct") * col("n_total")).cast("double") /
          (lit(100.0) * col("n_lang"))))
      .withColumn("threshold",
        floor(col("rate") * lit(16777216.0)).cast("long"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(hashBucket24(col("text")) < col("threshold"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
      .join(broadcast(rates.select(col("lang"), col("n_lang"),
        col("target_pct"), fr(col("rate"), 6).as("rate"))), Seq("lang"))
      .select(col("lang"), col("n_lang"), col("target_pct"),
        col("rate"), col("n_kept"))
      .orderBy(col("lang"))
  }

  /**
   * QUOTA-AWARE MIXTURE REBALANCING — [[domainMixQuery]] composed
   * with the curation pipeline ([[Curation.ledgerFlagged]]'s
   * compliance → exact-dedup → quality chain): mixture targets are
   * set against the TRAINING SET, but upstream stages drop documents
   * non-uniformly across languages, so rates derived from the RAW
   * corpus miss the targets. This operator allocates against the
   * SURVIVOR population instead, with the feasibility correction a
   * real mix plan needs: a language whose survivors cannot fill its
   * target share is CAPPED at availability and its shortfall
   * water-fills into the remaining languages proportionally to their
   * targets (Neyman-style iterative allocation, ≤ one round per
   * language).
   *
   * Determinism/exactness: the water-fill runs a FIXED 5-round
   * unroll in pure integer arithmetic — cap tests by cross-
   * multiplication (avail·Σpct ≤ remaining·pct), final uncapped
   * allocations one floor division — identical in the SQL oracle's
   * unrolled CTE chain, so every output column (including the kept
   * counts under the 24-bit content-hash coin) hash-replays. The
   * sample budget is half the total survivors (floor).
   *
   * Shape at 100 TB: the chain flags ride the corpus scan (ledger
   * discipline), availability is one (lang)-grid aggregate, the
   * water-fill is driver-side model arithmetic on that grid (5 rows),
   * and acceptance is a broadcast threshold + pushable hash predicate
   * — corpus text never shuffles.
   */
  def quotaRebalanceQuery(spark: SparkSession, sfDir: String,
      targetPct: Seq[(String, Int)] = Seq(
        "de" -> 15, "en" -> 40, "es" -> 15, "fr" -> 15, "zh" -> 15))
      : DataFrame = {
    import spark.implicits._
    val surv = Curation.ledgerFlagged(spark, sfDir)
      .filter(col("p3"))
      .select(col("doc_id"), col("lang"), col("text"))
      .tracked()
    val rawCounts = Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
    val availCounts = surv.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_avail"))
    val pctDf = spark.createDataFrame(targetPct).toDF("lang", "target_pct")
    // the (lang, raw, avail, pct) grid is model material — 5 rows
    val grid = rawCounts
      .join(availCounts, Seq("lang"), "left")
      .na.fill(0L, Seq("n_avail"))
      .join(broadcast(pctDf), Seq("lang"))
      .select(col("lang"), col("n_raw"), col("n_avail"),
        col("target_pct").cast("long").as("pct"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val totalAvail = grid.map(_._3).sum
    var remaining = totalAvail / 2
    val capped = scala.collection.mutable.Map(
      grid.map(g => g._1 -> false): _*)
    // fixed 5-round unroll (one round per language at most can cap);
    // each round snapshots (Σpct over active, remaining) before
    // applying its caps — the oracle's CTE chain does the identical
    // set-based step
    for (_ <- 1 to 5) {
      val active = grid.filter(g => !capped(g._1))
      val sp = active.map(_._4).sum
      if (sp > 0) {
        val newly = active.filter(g => g._3 * sp <= remaining * g._4)
        newly.foreach { g => capped(g._1) = true; remaining -= g._3 }
      }
    }
    val spF = grid.filter(g => !capped(g._1)).map(_._4).sum
    // spF = 0 is reachable via the targetPct hook (every uncapped
    // language at pct 0): allocate nothing instead of dividing by
    // zero — the oracle's al CTE carries the identical CASE guard
    val allocs = grid.map { case (lang, _, avail, pct) =>
      lang -> (if (capped(lang)) avail
               else if (spF == 0L) 0L
               else remaining * pct / spF)
    }.toMap
    val rateRows = grid.map { case (lang, raw, avail, pct) =>
      val alloc = allocs(lang)
      val rate = if (avail == 0L) 0.0 else alloc.toDouble / avail.toDouble
      (lang, raw, avail, pct, alloc, capped(lang), rate,
        math.floor(rate * 16777216.0).toLong)
    }
    val rates = rateRows.toSeq.toDF("lang", "n_raw", "n_avail",
      "target_pct", "alloc", "capped", "_rate", "threshold")
    val kept = surv.join(broadcast(rates.select(col("lang"),
        col("threshold"))), Seq("lang"))
      .filter(hashBucket24(col("text")) < col("threshold"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_raw"), col("n_avail"),
        col("target_pct"), col("alloc"), col("capped"),
        fr(col("_rate"), 6).as("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  /**
   * Temperature-weighted domain mixing: target shares derive from the
   * DATA — share_s ∝ n_s^α with α = 0.5 (the multilingual-pretraining
   * convention: up-weight small domains, flatten the head) — instead
   * of the hand-set percentages of [[domainMixQuery]]. Acceptance is
   * the same deterministic 24-bit content-hash coin, so the kept set
   * is reproducible and exactly oracle-replayable.
   *
   * Cross-engine exactness: n^0.5 is `sqrt` (IEEE correctly-rounded
   * in both engines — the ONLY portable power); each weight is
   * rounded to 6 decimals and summed in DECIMAL(38,6), so the
   * normalizing total is order-free and exact; every double step
   * after that is a single operation replayed left-assoc in the SQL.
   *
   * Shape at 100 TB: identical to [[domainMixQuery]] — one tiny
   * stratum-count agg, the rate table broadcast back onto the scan,
   * one pushable hash-predicate filter. Two scans, zero wide
   * shuffles.
   */
  def temperatureMixQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val weights = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
      .withColumn("w",
        fr(sqrt(col("n_lang").cast("double")), 6)
          .cast("decimal(38,6)"))
    val tot = weights.agg(sum(col("w")).as("w_tot"),
      sum(col("n_lang")).as("n_total"))
    val rates = weights.crossJoin(broadcast(tot))
      .withColumn("share",
        col("w").cast("double") / col("w_tot").cast("double"))
      .withColumn("rate", least(lit(1.0),
        col("share") * col("n_total").cast("double") /
          col("n_lang").cast("double")))
      .withColumn("threshold",
        floor(col("rate") * lit(16777216.0)).cast("long"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(hashBucket24(col("text")) < col("threshold"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
      .join(broadcast(rates), Seq("lang"))
      .select(col("lang"), col("n_lang"),
        (fr(col("share"), 6) + lit(0.0)).as("share"),
        (fr(col("rate"), 6) + lit(0.0)).as("rate"),
        col("n_kept"))
      .orderBy(col("lang"))
  }

  /**
   * Temperature-exponent sweep — the mixture DESIGN STUDY in front of
   * [[temperatureMixQuery]]'s single-α realization: for every α in a
   * portable grid, each stratum's re-normalized share, its
   * sampling-rate implication, and how far the mixture moves from
   * natural (total variation to the α=1 shares) — the table a data
   * recipe reads to pick its temperature before committing a corpus
   * pass. One stratum-count scan; the sweep itself is a |α|·k
   * metadata grid.
   *
   * Cross-engine exactness: the α grid is {0.25, 0.5, 1} because
   * n^0.25 = sqrt(sqrt(n)) and n^0.5 = sqrt(n) — sqrt is the ONLY
   * IEEE-correctly-rounded power both engines share (pow() is
   * libm-dependent); weights round to 6 dp and sum as DECIMAL, shares
   * and TV ride integer ppm of exact rationals.
   */
  def tempSweepQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      .localCheckpoint() // three sweep branches reuse the k-row stat
    import spark.implicits._
    val alphas = Seq((25L, 2), (50L, 1), (100L, 0)).toDF(
      "alpha_pct", "sqrts") // α = 0.25 / 0.5 / 1.0 as sqrt counts
    val weighted = counts.crossJoin(broadcast(alphas))
      // exact BIGINT micro-units straight off the double. Three
      // hazards dodged here: Spark's DECIMAL precision-loss multiply
      // rounds at floor boundaries (the q14 trap), DuckDB's `//` on a
      // DECIMAL left operand ROUNDS instead of flooring (BIGINT `//`
      // floors in both engines), and BIGINT ×1e6 headroom — weights
      // only need to be proportional WITHIN an alpha, so α=1 uses the
      // raw count (exact to 9.2e12-doc strata) while the sqrt alphas
      // keep 6dp micro-units (exact to ~7e23).
      .withColumn("w_micro",
        when(col("sqrts") === 2,
          floor(sqrt(sqrt(col("n_lang").cast("double"))) * 1e6 + 0.5)
            .cast("long"))
          .when(col("sqrts") === 1,
            floor(sqrt(col("n_lang").cast("double")) * 1e6 + 0.5)
              .cast("long"))
          .otherwise(col("n_lang")))
    val tots = weighted.groupBy(col("alpha_pct"))
      .agg(sum(col("w_micro")).as("w_tot_micro"),
        sum(col("n_lang")).as("n_tot"))
    val shares = weighted.join(broadcast(tots), Seq("alpha_pct"))
      .withColumn("share_ppm",
        expr("w_micro * 1000000L div w_tot_micro"))
      .withColumn("natural_ppm",
        expr("n_lang * 1000000 div n_tot"))
    shares
      .groupBy(col("alpha_pct"))
      .agg(count(lit(1)).as("n_strata"),
        sum(abs(col("share_ppm") - col("natural_ppm"))).as("tv2_ppm"),
        max(col("share_ppm")).as("max_share_ppm"),
        min(col("share_ppm")).as("min_share_ppm"))
      .join(shares.select(col("alpha_pct"), col("lang"),
        col("n_lang"), col("share_ppm"), col("natural_ppm")),
        Seq("alpha_pct"))
      .select(col("alpha_pct"), col("lang"), col("n_lang"),
        col("share_ppm"), col("natural_ppm"), col("n_strata"),
        col("tv2_ppm"), col("max_share_ppm"), col("min_share_ppm"))
      .orderBy(col("alpha_pct"), col("lang"))
  }

  /**
   * Deterministic epoch shuffling: the data-ORDER half of training
   * reproducibility. Each epoch gets an independent pseudorandom
   * permutation keyed by md5(epoch ":" doc_id) — shard assignment and
   * within-shard position both derive from it, so any worker can
   * reconstruct exactly which sample follows which, in any epoch,
   * without a coordinator. One shuffle on (epoch, shard) + an
   * in-partition sort — the same layout a sharded training-data write
   * produces, repeated per epoch.
   */
  def epochShuffleQuery(spark: SparkSession, sfDir: String,
      epochs: Int = 2, shards: Int = 8): DataFrame = {
    val key = md5(concat(col("epoch").cast("string"), lit(":"),
      col("doc_id").cast("string")))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("skey"), col("doc_id"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("skey", key)
      .withColumn("shard",
        pmod(conv(substring(col("skey"), 1, 6), 16, 10).cast("long"),
          lit(shards.toLong)))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("epoch"), col("shard"), col("pos"))
      .orderBy(col("epoch"), col("shard"), col("pos"))
  }

  /**
   * Competence-based curriculum schedule (the Platanios et al.,
   * NAACL 2019 shape): rank every document by a difficulty proxy
   * (token length — the standard first curriculum), cut the ranking
   * into `tiers` equal rank-quantile difficulty tiers, and emit each
   * epoch's training order over the COMPETENCE POOL — epoch e draws
   * from tiers 0..e (easy-only first, the full corpus by the last
   * epoch), ordered inside the pool by the md5 epoch key (the
   * [[epochShuffleQuery]] idiom) so every epoch's order is
   * deterministic, distinct from its siblings, and reconstructible
   * without a coordinator. This is the data-ORDER counterpart to
   * [[graft.operators.Curation.lengthBucketBatches]]'s batch-SHAPE
   * decision: together they answer "what does step t of epoch e
   * train on".
   *
   * Exactness: tier = ((rank−1)·tiers) div n — pure integers; the
   * in-pool position is a rank over (md5 key, doc_id), a total
   * order. Shape at 100 TB: the difficulty rank and every per-epoch
   * position ride [[Prefix.running]]'s two-phase distributed scan
   * (never a global window); only (doc_id, n_tok, 32-char key) rows
   * move — text never shuffles.
   */
  def curriculumSchedule(docs: DataFrame, tiers: Int,
      epochs: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val n = toks.agg(count(lit(1)).as("n"))
    val ranked = Prefix.running(toks, Seq(),
        Seq(col("n_tok"), col("doc_id")),
        Seq(Prefix.Running(lit(1L), "cnt", "rk")))
      .crossJoin(broadcast(n))
      .withColumn("tier", expr(s"((rk - 1) * $tiers) div n"))
    val pool = ranked
      .select(col("doc_id"), col("tier"),
        explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch"))
      .filter(col("tier") <= col("epoch"))
      .withColumn("skey", md5(concat(col("epoch").cast("string"),
        lit(":"), col("doc_id").cast("string"))))
    Prefix.running(pool, Seq("epoch"),
        Seq(col("skey"), col("doc_id")),
        Seq(Prefix.Running(lit(1L), "cnt", "pos")))
      .select(col("doc_id"), col("epoch"), col("tier"), col("pos"))
      .orderBy(col("epoch"), col("pos"))
  }

  /** Correctness gate: 3 tiers × 3 epochs over documents. */
  def curriculumQuery(spark: SparkSession, sfDir: String): DataFrame =
    curriculumSchedule(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")),
      tiers = 3, epochs = 3)

  // ------------------------------- importance weighting (data selection)

  /**
   * DSIR-style importance weighting (Xie et al., "Data Selection for
   * Language Models via Importance Resampling", 2023): score each
   * document by the log-likelihood ratio of a target language model
   * over a raw model, both estimated as hashed-unigram (64-bucket)
   * multinomials with add-one smoothing. Here the target distribution
   * is the corpus's English subset; positive scores mean
   * "more target-like than the average document".
   *
   * score(d) = (Σ_b cnt_d[b] · ln(p̂_tgt[b] / p̂_raw[b])) / n_tok(d)
   *
   * Shape at 100 TB: the per-doc bucket counts are ONE native codegen
   * pass ([[graft.functions.VectorKernels.BucketCounts]]); the model
   * fit is a posexplode of 64-long arrays partial-aggregated to 64
   * rows, assembled into a single broadcast weight row (sort_array ∘
   * collect_list — 64 elements, no driver collect); scoring is a
   * codegen'd fixed-order dot product (the list_dot_product /
   * q_quality_score precedent). The corpus text never shuffles — only
   * 64-row model material moves.
   */
  def importanceQuery(spark: SparkSession, sfDir: String,
      dims: Int = 64): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val cnts = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("n_tok"),
      call_function("graft_bucket_counts", col("text"), lit(dims))
        .as("cnts"))
    // model fit: bucket totals for raw (all docs) and target (English)
    val perBucket = cnts
      .select(col("lang"), posexplode(col("cnts")).as(Seq("bucket", "c")))
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as("raw"),
        sum(when(col("lang") === "en", col("c")).otherwise(0.0)).as("tgt"))
    val totals = perBucket.agg(sum(col("raw")).as("rtot"),
      sum(col("tgt")).as("ttot"))
    val lnr = perBucket.crossJoin(broadcast(totals))
      .withColumn("lnr",
        log(((col("tgt") + 1.0) / (col("ttot") + dims.toDouble)) /
          ((col("raw") + 1.0) / (col("rtot") + dims.toDouble))))
      .agg(sort_array(collect_list(struct(col("bucket"), col("lnr"))))
        .as("pairs"))
      .select(transform(col("pairs"), p => p.getField("lnr")).as("w"))
    // scoring: fixed-order dot product over the dims buckets
    cnts.crossJoin(broadcast(lnr))
      .withColumn("dot", aggregate(
        zip_with(col("cnts"), col("w"), (c, l) => c * l),
        lit(0.0), (acc, x) => acc + x))
      // + 0.0 canonicalizes the negative zero a tiny negative score
      // rounds to (-0.0 + 0.0 = +0.0 in IEEE; engines differ on
      // whether round preserves the sign of zero)
      .withColumn("imp_score",
        fr(col("dot") / col("n_tok").cast("double"), 6) + lit(0.0))
      // keep gates on the ROUNDED score: the raw dot's last-ulp can
      // differ across engines near zero; the rounded value cannot
      .select(col("doc_id"), col("n_tok"), col("imp_score"),
        (col("imp_score") > 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /**
   * Leakage-free train/val/test split: the deterministic 80/10/10
   * hash split, but keyed on the DUPLICATE-CLUSTER id
   * ([[Dedup.clusterLabels]]) instead of the document id — near-dup
   * documents land in the SAME split by construction, so evaluation
   * never scores paraphrases of training rows (the train/test-leakage
   * failure every dataset paper warns about; a doc-keyed split leaks
   * every cluster that straddles the boundary).
   *
   * Scale shape: cluster labels come from the cached
   * connected-components pass (one pointer-jumping job per corpus
   * version, already built by the dedup family); the split itself is
   * a pure md5 projection on the label + one broadcast-size join —
   * no new shuffle over text. The 24-bit coin makes the rate exact
   * and repartition-stable at any corpus size.
   */
  /**
   * Deterministic weighted sampling (Efraimidis–Spirakis A-ES): each
   * doc gets key u^(1/w) with u a content-hash coin and w its token
   * count, and the global top-k by key IS a weighted sample without
   * replacement — P(selected) ∝ weight, the data-mixing primitive for
   * token-budgeted corpus draws (an unweighted doc sample
   * over-represents short docs token-wise). Ranking by ln(u)/w is
   * monotone-equivalent and numerically tame; rounded to 10 dp so the
   * order is engine-independent (u is an exact dyadic rational, w an
   * exact integer — ln is the only 1-ulp term).
   *
   * Scale shape: the key is a pure projection; the global top-k is
   * orderBy+limit = TakeOrdered (bounded heap per partition, one
   * k-row collect to the driver-side stage) — no global sort, no
   * shuffle of text. Replayable: same corpus, same sample, on any
   * partitioning.
   */
  def weightedSampleQuery(spark: SparkSession, sfDir: String,
      k: Int = 100): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val nTok = size(split(col("text"), " "))
    val u = (hashBucket24(col("text")).cast("double") + lit(1.0)) /
      lit(16777216.0)
    val top = docs.select(col("doc_id"), col("lang"),
        nTok.as("n_tok"),
        fr(log(u) / nTok.cast("double"), 10).as("lnkey"))
      .orderBy(col("lnkey").desc, col("doc_id")).limit(k)
    top.withColumn("pick", row_number().over(
        Window.orderBy(col("lnkey").desc, col("doc_id"))))
      .select(col("pick"), col("doc_id"), col("lang"), col("n_tok"),
        col("lnkey"))
      .orderBy(col("pick"))
  }

  /**
   * Rendezvous (highest-random-weight) shard id for `key` over
   * `shards` shards: the winner is the shard whose keyed digest
   * `md5(key ":" shard)` is lexicographically largest. Ties (a
   * 64-bit digest collision) break toward the higher shard id via
   * the appended fixed-width suffix, so the assignment is total and
   * deterministic. Pure codegen'd projection — no state, no shuffle.
   */
  def rendezvousShard(key: Column, shards: Int): Column = {
    val keys = transform(sequence(lit(0), lit(shards - 1)),
      s => concat(
        substring(md5(concat(key.cast("string"), lit(":"),
          s.cast("string"))), 1, 16),
        lit("#"), lpad(s.cast("string"), 2, "0")))
    substring(array_max(keys), -2, 2).cast("int")
  }

  /**
   * Consistent shard assignment with minimal-movement reshard — the
   * layout operator for an incrementally-growing corpus: shard id is
   * a pure function of the stable doc key (never of partition layout
   * or arrival order), and growing S → S+1 shards relocates only the
   * ~1/(S+1) of keys whose new shard *wins* the rendezvous, instead
   * of the ~S/(S+1) a mod-S scheme reshuffles. The gate materializes
   * the assignment at 16 and 17 shards per document plus the moved
   * flag; the SQL oracle replays the digest tournament bit-for-bit.
   *
   * Scale shape: serving is one narrow projection (S digests per
   * row, no shuffle, no index); a reshard touches only the moved
   * slice — at 100 TB that is the difference between rewriting ~6%
   * and ~94% of the corpus. Every doc with the same key lands on the
   * same shard on any cluster size, so downstream bucketed readers
   * can rely on the layout across runs.
   */
  def shardAssignQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val s16 = rendezvousShard(col("doc_id"), 16)
    val s17 = rendezvousShard(col("doc_id"), 17)
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), s16.as("shard16"), s17.as("shard17"),
        (s16 =!= s17).as("moved"))
      .orderBy(col("doc_id"))
  }

  def leakFreeSplitQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = Dedup.clusterLabels(spark, sfDir)
    cc.select(col("id").as("doc_id"), col("label").as("cluster_id"),
      (hashBucket24(col("label").cast("string")) % 10).as("b"))
      .withColumn("split",
        when(col("b") < 8, "train")
          .when(col("b") === 8, "val").otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  /**
   * Weighted sampling WITHOUT replacement via exponential sort keys
   * (Efraimidis & Spirakis 2006, the A-ES scheme): each item draws
   * key = ln(u)/w from a deterministic md5 uniform u ∈ (0,1], and the
   * k largest keys ARE a weight-proportional WOR sample — the
   * one-pass, coordinator-free answer to "pick 100 docs biased by
   * quality, no duplicates", where the md5-coin Bernoulli sampler
   * ([[hashSampleQuery]]) can neither hit an exact k nor avoid
   * replacement semantics across strata.
   *
   * Shape at 100 TB: one narrow projection computes the key; the
   * top-k is a bounded-heap TakeOrderedAndProject — no sort, no
   * shuffle of the corpus. Selection ranks on the RAW double keys
   * (ln and division agree bit-for-bit across engines — the q_lm_ppl
   * ln precedent), so the selected SET is deterministic; the reported
   * key is rounded for the gate.
   */
  def weightedWorQuery(spark: SparkSession, sfDir: String,
      k: Int = 100): DataFrame = {
    val w = length(col("text")).cast("double")
    val u = (hashBucket24(col("doc_id").cast("string")) + lit(1L))
      .cast("double") / lit(16777216.0)
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), w.as("w"), (log(u) / w).as("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("w").cast("long").as("w"),
        fr(col("key") * 1e6, 4).as("key_e6"))
  }

  /** Cumulative Poisson(1) CDF as 24-bit integer thresholds
    * (⌊cdf(k)·2²⁴⌋ for k = 0..6): a doc's replicate weight is the
    * count of thresholds ≤ its 24-bit digest value — pure integer
    * comparisons, no float CDF anywhere, so both engines agree
    * bit-for-bit. Weights ≥ 7 collapse into 7 (P ≈ 8·10⁻⁵). */
  private val PoissonThresholds = Seq(6171992L, 12343985L, 15429982L,
    16458647L, 16715813L, 16767247L, 16775819L)

  /**
   * Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
   * Massive Data Streams", Google 2012): the distributed answer to
   * "what is the error bar on this corpus metric". Classical
   * bootstrap resampling needs coordinated sampling WITH replacement
   * — impossible in one pass at 100 TB; the Poisson approximation
   * gives every (doc, replicate) an independent Poisson(1) weight, so
   * B resample replicates ride ONE narrow scan as a ×B row explode
   * followed by a (replicate, sums) map-side-partial aggregation —
   * 32 output rows, no shuffle of the corpus, fully deterministic
   * via the md5-coin convention ([[hashBucket24]]).
   *
   * Metric here: mean document length. Weighted sums are exact
   * BIGINTs (weight × length), so the replicate means are identical
   * doubles on both engines; the replicate table IS the bootstrap
   * distribution (percentile CIs read straight off it).
   */
  def bootstrapQuery(spark: SparkSession, sfDir: String,
      reps: Int = 32): DataFrame = {
    val v = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":"), col("rep").cast("string"))), 1, 6), 16, 10).cast("long")
    val w = PoissonThresholds
      .map(t => (v >= lit(t)).cast("long")).reduce(_ + _)
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"),
        explode(sequence(lit(0L), lit((reps - 1).toLong))).as("rep"))
      .select(col("rep"), col("len"), w.as("w"))
      .groupBy(col("rep"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("len")).as("sum_wlen"))
      .withColumn("mean_len", fr(
        col("sum_wlen").cast("double") / col("n_eff").cast("double"), 6))
      .orderBy(col("rep"))
  }

  /**
   * Stratified k-fold assignment for cross-validation — the third
   * split shape after hash-Bernoulli ([[sampleHash]]) and the
   * group-leak-free holdout ([[q_split_leakfree]]'s operator): every
   * stratum (here: `lang`) is divided into k folds whose sizes
   * differ by AT MOST ONE, the balance guarantee naive per-row
   * hashing (fold = hash % k) cannot give — binomial fluctuation
   * unbalances small strata by far more than 1.
   *
   * Mechanism: a deterministic md5 key permutes each stratum, the
   * in-stratum rank comes from [[Prefix.running]] (a per-stratum
   * global `Window.orderBy` would drag whole strata — a 100 TB
   * corpus has FEW languages, so strata are corpus-sized — into
   * single tasks), and fold = (rank − 1) mod k deals ranks
   * round-robin, which is what makes the ±1 balance exact rather
   * than probabilistic. Per-(stratum, fold) sizes and the stratum's
   * max−min spread are joined back (metadata-sized broadcast) so the
   * gate hashes the balance certificate, not just the assignment.
   *
   * Shape at 100 TB: only (doc_id, lang, 32-hex key) rows move; one
   * range exchange + in-partition sorts from Prefix.running, one
   * metadata groupBy, two broadcast joins back.
   */
  def kfoldQuery(spark: SparkSession, sfDir: String,
      k: Int = 5): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("skey",
        md5(concat(lit("fold:"), col("doc_id").cast("string"))))
    val ranked = Prefix.running(docs, Seq("lang"),
      Seq(col("skey"), col("doc_id")),
      Seq(Prefix.Running(lit(1L), "cnt", "rnk")))
    val assigned = ranked
      .withColumn("fold", (col("rnk") - 1) % k)
      .select(col("doc_id"), col("lang"), col("rnk"), col("fold"))
    val foldSizes = assigned.groupBy(col("lang"), col("fold"))
      .agg(count(lit(1)).as("fold_size"))
    val strata = foldSizes.groupBy(col("lang"))
      .agg(sum(col("fold_size")).as("stratum_size"),
        (max(col("fold_size")) - min(col("fold_size"))).as("spread"))
    assigned
      .join(broadcast(foldSizes), Seq("lang", "fold"))
      .join(broadcast(strata), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("rnk"), col("fold"),
        col("fold_size"), col("stratum_size"),
        (col("spread") <= 1L).as("balanced"))
      .orderBy(col("doc_id"))
  }

  /**
   * Dataset-mixture ablation bookkeeping: for every leave-one-source-
   * out variant of the corpus, the per-remaining-source document and
   * token tallies plus the re-normalized mixture shares — the ledger
   * an ablation study reads to know what mixture each variant
   * actually trains on ("how much does every domain's share inflate
   * when source X drops out, and what fraction of the budget did X
   * carry"). Complements [[graft.operators.Versioning.runDiff]],
   * which diffs two REALIZED corpus versions; this enumerates the
   * hypothetical variants from sufficient statistics without ever
   * materializing one.
   *
   * Shape at 100 TB: ONE corpus scan (source-level count/token
   * aggregate, map-side partial — the shuffle carries one row per
   * source); the ablation grid is a k×k broadcast self-join over that
   * k-row table, so adding variants costs metadata, never another
   * corpus pass. Exactness: shares are ppm via integer floor
   * division — no doubles anywhere.
   */
  def mixAblation(docs: DataFrame): DataFrame = {
    // the k-row sufficient statistic is checkpointed EAGERLY: it
    // feeds three plan branches (variants, remaining grid, totals),
    // and without the materialization each branch would re-scan the
    // corpus — the one-scan claim is the operator's whole value
    val stats = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long"))
          .as("n_tokens"))
      .localCheckpoint()
    val tot = stats.agg(sum(col("n_docs")).as("t_docs"),
      sum(col("n_tokens")).as("t_tokens"))
    val removed = stats.select(col("source").as("ablated"),
      col("n_docs").as("rm_docs"), col("n_tokens").as("rm_tokens"))
    removed.crossJoin(broadcast(stats))
      .filter(col("source") =!= col("ablated"))
      .crossJoin(broadcast(tot))
      .select(col("ablated"), col("source"),
        col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000L div t_tokens").as("share_ppm_full"),
        expr("n_tokens * 1000000L div (t_tokens - rm_tokens)")
          .as("share_ppm_variant"),
        (col("t_docs") - col("rm_docs")).as("variant_docs"),
        (col("t_tokens") - col("rm_tokens")).as("variant_tokens"),
        expr("rm_tokens * 1000000L div t_tokens")
          .as("ablated_share_ppm"))
      .orderBy(col("ablated"), col("source"))
  }

  /** Correctness gate for [[mixAblation]] over the documents table's
    * natural sources. */
  def mixAblationQuery(spark: SparkSession, sfDir: String): DataFrame =
    mixAblation(Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")))
}
