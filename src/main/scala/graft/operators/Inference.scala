package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Statistical-inference passes over the event stream — the hypothesis
 * tests and nonparametric estimators an analytics warehouse serves
 * beside the descriptive aggregates in [[Stats]] and the experiment
 * readout in [[Behavior]]: association between categorical columns
 * (chi-square / Cramér's V / mutual information), distributional
 * comparison between cohorts (Kolmogorov–Smirnov + Mann–Whitney AUC),
 * censored time-to-event estimation (Kaplan–Meier), and serial
 * dependence of the aggregated series (autocorrelation function).
 *
 * Every query here reduces the raw stream to a model-sized frame
 * first (contingency cells, distinct-value ECDF steps, distinct
 * durations, the hourly spine) so the statistics run on frames whose
 * size is set by the DOMAIN (event types × hours, value grid, study
 * length), not the corpus — the shape that survives 100 TB. Exactness
 * follows the repo-wide rule: counts and cross-products stay exact
 * BIGINT / DECIMAL as far as possible; each transcendental
 * (ln/exp/sqrt) is a single double evaluation on exact integer inputs,
 * rounded at a fixed dp so DuckDB replays it bit-for-bit.
 */
object Inference {

  /**
   * Chi-square test of independence between event type and hour of
   * day, with per-cell diagnostics plus the summary statistics every
   * association readout wants: the chi-square total and Cramér's V
   * (effect size, reported SQUARED) — the "is traffic mix
   * time-of-day dependent" question asked of any event warehouse
   * before hourly models are trusted. (Pointwise mutual information
   * stays covered by the dedicated PMI gate; its per-cell ln made
   * this frame structurally un-hashable cross-engine — see below.)
   *
   * Hashed-column discipline (round 12): every hashed value is an
   * EXACT INTEGER — no doubles, no sqrt, no ln. Per cell (i,j) with
   * observed n, margins r_i/c_j, total N:
   *   expected_micro  = ⌊10⁶·r·c/N⌋          (integer division)
   *   chi2_term_micro = ⌊10⁶·(N·n − r·c)²/(N·r·c)⌋
   * (the latter is (n−e)²/e with e = r·c/N cleared of fractions).
   * chi2_micro sums the term micros; v2_micro = ⌊chi2_micro /
   * (N·min(nr−1, nc−1))⌋ is Cramér's V SQUARED in micro-units
   * (squaring removes the sqrt; V = √(v2_micro/10⁶) for human eyes).
   * All dividends are non-negative, so truncating and flooring
   * division agree in every engine.
   *
   * Shape at 100 TB: one map-side-partial groupBy folds the stream to
   * ≤ k·24 cells; margins and totals are broadcast one-row/`k`-row
   * frames; everything after the first pass is arithmetic on a
   * ~120-row frame. Overflow: (N·n − r·c)² ≤ N⁴ rides DECIMAL(38,0)
   * (safe through N ≈ 3·10⁹, i.e. petabyte event streams).
   */
  def contingencyQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val cells = ev
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("r"))
    val colT = cells.groupBy(col("hod")).agg(sum(col("n")).as("c"))
    val tot = cells.agg(sum(col("n")).as("n_total"),
      countDistinct(col("event_type")).as("nr"),
      countDistinct(col("hod")).as("nc"))
    val terms = cells
      .join(broadcast(rowT), Seq("event_type"))
      .join(broadcast(colT), Seq("hod"))
      .crossJoin(broadcast(tot))
      .withColumn("rc",
        col("r").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
      .withColumn("expected_micro",
        expr("CAST((rc * 1000000) div n_total AS BIGINT)"))
      .withColumn("dnum",
        col("n").cast("decimal(19,0)") * col("n_total").cast("decimal(19,0)")
          - col("rc"))
      .withColumn("chi2_term_micro",
        expr("CAST((dnum * dnum * 1000000) div (n_total * rc) AS BIGINT)"))
    val summary = terms.groupBy(lit(1).as("one"))
      .agg(sum(col("chi2_term_micro")).as("chi2_micro"),
        first(col("n_total")).as("nt"),
        first(col("nr")).as("nrr"), first(col("nc")).as("ncc"))
      .withColumn("dof", (col("nrr") - 1) * (col("ncc") - 1))
      .withColumn("v2_micro",
        expr("CAST(chi2_micro div (nt * least(nrr - 1, ncc - 1)) " +
          "AS BIGINT)"))
      .select(col("one"), col("chi2_micro"), col("dof"), col("v2_micro"))
    terms.withColumn("one", lit(1))
      .join(broadcast(summary), Seq("one"))
      .select(col("event_type"), col("hod"), col("n"), col("r"), col("c"),
        col("expected_micro"), col("chi2_term_micro"), col("chi2_micro"),
        col("dof"), col("v2_micro"))
      .orderBy(col("event_type"), col("hod"))
  }

  /**
   * Two-sample distribution comparison of purchase values between the
   * id-parity cohorts: the exact Kolmogorov–Smirnov statistic (max
   * ECDF gap) and the exact Mann–Whitney AUC (midrank-corrected) —
   * the nonparametric twins of [[Behavior.abTestQuery]]'s z-test,
   * answering "did the WHOLE value distribution shift", not just the
   * mean.
   *
   * Both statistics are emitted as EXACT integer fractions
   * (`ks_num`/`ks_den`, `auc_num`/`auc_den`) with the rounded double
   * ratio beside them, so the hash gate rides pure BIGINT arithmetic
   * and no float comparison ever decides the result: the ECDF gap at
   * a step is |cumA·nB − cumB·nA| over nA·nB, and the midrank sum
   * uses 2×midrank = 2·cum_before + cnt + 1 (always integer).
   *
   * Shape at 100 TB: groupBy(value) folds the stream map-side to the
   * distinct value grid. The grid is bounded by the VALUE DOMAIN in
   * cents, not the row count — values are 2-dp money, so distinct
   * values saturate at 100·max(value): measured 1,785 distinct of
   * 1,981 purchases at sf0.01 and 9,808 of 20,084 at sf0.1 against a
   * cent-saturation ceiling of ≈47.6k for the observed ≤ $476 domain
   * — but the ECDF prefix sums still ride [[Prefix.running]]'s
   * two-phase scan rather than trusting that bound, so the plan holds
   * even if a fat value tail pushes the grid to millions of steps.
   * Totals are a one-row broadcast. The final frame is one row.
   */
  def ksTestQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("value"), (col("user_id") % 2).as("grp"))
    val steps = ev.groupBy(col("value"))
      .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cb"))
    val walked0 = Prefix.running(steps, Seq(), Seq(col("value")),
      Seq(Prefix.Running(col("ca"), "sum", "cuma"),
        Prefix.Running(col("cb"), "sum", "cumb")))
    // cohort sizes are the LAST running values (increments ≥ 0 so the
    // max is the final cum) — read off the cached prefix frame instead
    // of re-running the corpus-sized steps groupBy
    val tot = walked0.agg(max(col("cuma")).as("na"),
      max(col("cumb")).as("nb"))
    val walked = walked0
      .crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(col("cuma") * col("nb") - col("cumb") * col("na")))
      // 2×midrank of this tied value block (integer): ranks are over
      // the POOLED sample, cum columns already walk both cohorts
      .withColumn("mr2",
        lit(2) * (col("cuma") + col("cumb") - col("ca") - col("cb")) +
          (col("ca") + col("cb")) + 1)
    walked.groupBy(col("na"), col("nb"))
      .agg(max(col("gap")).as("ks_num"),
        sum(col("ca") * col("mr2")).as("rs2a"))
      .withColumn("ks_den", col("na") * col("nb"))
      .withColumn("ks_d",
        fr(col("ks_num").cast("double") / col("ks_den").cast("double"),
          10))
      // 2U = 2·RankSumA − nA(nA+1); AUC = 2U / (2·nA·nB)
      .withColumn("auc_num", col("rs2a") - col("na") * (col("na") + 1))
      .withColumn("auc_den", lit(2) * col("na") * col("nb"))
      .withColumn("auc",
        fr(col("auc_num").cast("double") /
          col("auc_den").cast("double"), 10))
      // α=0.05 large-sample KS critical value c(α)·sqrt((nA+nB)/nA·nB)
      .withColumn("ks_sig",
        col("ks_d") > fr(lit(1.358) *
          sqrt((col("na") + col("nb")).cast("double") /
            col("ks_den").cast("double")), 10))
      .select(col("na"), col("nb"), col("ks_num"), col("ks_den"),
        col("ks_d"), col("auc_num"), col("auc_den"), col("auc"),
        col("ks_sig"))
  }

  /**
   * Kaplan–Meier survival estimate of user lifetime (hours from first
   * to last event), right-censored at the observation window edge: a
   * user whose last event falls within `censorHours` of the global max
   * timestamp is still-active (censored), otherwise their silence is
   * the churn event — the retention curve every engagement warehouse
   * publishes, done properly (censoring-aware) instead of the biased
   * "average lifetime of churned users".
   *
   * Output rows are the distinct duration grid with the exact at-risk
   * count, death count, censor count, and the product-limit estimate
   * Ŝ(t) = Π(1 − d/n): each factor's ln(1−d/n) is one double on two
   * exact BIGINTs rounded to 12 dp, the cumulative sum runs as
   * DECIMAL over the duration-ordered window (deterministic order),
   * and Ŝ = exp(cum) rounds at 10 dp — the q_lm_ppl ln/exp rule, so
   * DuckDB replays the curve bit-for-bit. A step where d = n drives
   * Ŝ to exact 0 via a windowed min flag, not ln(0).
   *
   * Shape at 100 TB: one groupBy(user) min/max pass (map-side
   * partial, shuffle carries two timestamps per user), then the
   * entire estimator runs on the distinct-duration grid — bounded by
   * the study length in hours, not the user count.
   */
  def survivalQuery(spark: SparkSession, sfDir: String,
      censorHours: Long = 12L): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val endRef = ev.agg(max(unix_millis(col("ts"))).as("end_ms"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(unix_millis(col("ts"))).as("first_ms"),
        max(unix_millis(col("ts"))).as("last_ms"))
      .crossJoin(broadcast(endRef))
      .select(
        expr("(last_ms - first_ms) div 3600000").as("t_h"),
        when(col("end_ms") - col("last_ms") > censorHours * 3600000L, 1L)
          .otherwise(0L).as("death"))
    val grid = users.groupBy(col("t_h"))
      .agg(sum(col("death")).as("d"),
        sum(lit(1L) - col("death")).as("c"))
    val total = grid.agg(sum(col("d") + col("c")).as("n_users"))
    val wOrd = Window.orderBy(col("t_h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = grid.crossJoin(broadcast(total))
      .withColumn("left_thru",
        sum(col("d") + col("c")).over(wOrd))
      // at risk AT t = everyone not yet exited strictly before t
      .withColumn("n_risk",
        col("n_users") - col("left_thru") + col("d") + col("c"))
      .withColumn("ln_factor",
        when(col("d") === 0, lit(0.0))
          .when(col("d") < col("n_risk"),
            fr(log(lit(1.0) -
              col("d").cast("double") / col("n_risk").cast("double")),
              12))
          .otherwise(lit(0.0)))
      .withColumn("hit_zero",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L))
          .over(wOrd))
      .withColumn("cum_ln",
        sum(col("ln_factor").cast("decimal(24,12)")).over(wOrd)
          .cast("decimal(38,12)"))
      .withColumn("survival",
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(fr(exp(col("cum_ln").cast("double")), 10)))
    walked.select(col("t_h"), col("n_risk"), col("d"), col("c"),
        col("survival"))
      .orderBy(col("t_h"))
  }

  /**
   * Cohen's kappa (Cohen 1960): chance-corrected agreement between a
   * cheap heuristic screen and a gold label — the calibration
   * statistic every labeling/filter pipeline reports before trusting
   * a heuristic at corpus scale (raw accuracy flatters screens on
   * imbalanced labels; kappa does not). Here: rater A is an
   * English-function-word screen (text contains " the " or " is "),
   * rater B the `lang = 'en'` metadata label.
   *
   * Exact-rational form (no doubles): with the 2×2 confusion counts
   * and N, kappa = (po − pe)/(1 − pe) clears to
   * (po_num·N − pe_num)/(N² − pe_num) where po_num = n11 + n00 and
   * pe_num = r1·c1 + r0·c0; kappa_micro = ⌊10⁶·kappa⌋ via the offset
   * floor-division (dividend shifted by 2·10⁶·den so the negative-
   * kappa branch floors identically in every engine). DECIMAL
   * products keep N² exact past the BIGINT ceiling (N ≈ 6·10⁶ at
   * sf10 already pushes N²·10⁶ past 2⁶³).
   *
   * Shape at 100 TB: one codegen'd boolean projection folding
   * map-side to four counters; the kappa row is driver-free
   * arithmetic on a 1-row frame.
   */
  def cohenKappaQuery(spark: SparkSession, sfDir: String): DataFrame =
    cohenKappaOver(Tables.load(spark, sfDir, "documents").select(
      (col("text").contains(" the ") || col("text").contains(" is "))
        .as("pred"),
      (col("lang") === "en").as("gold")))

  /** [[cohenKappaQuery]]'s statistic over an explicit (pred, gold)
    * boolean frame — spec entry point. */
  private[graft] def cohenKappaOver(d: DataFrame): DataFrame = {
    d.agg(
        sum(when(col("pred") && col("gold"), 1L).otherwise(0L))
          .as("n11"),
        sum(when(col("pred") && !col("gold"), 1L).otherwise(0L))
          .as("n10"),
        sum(when(!col("pred") && col("gold"), 1L).otherwise(0L))
          .as("n01"),
        sum(when(!col("pred") && !col("gold"), 1L).otherwise(0L))
          .as("n00"))
      .withColumn("n",
        col("n11") + col("n10") + col("n01") + col("n00"))
      .withColumn("po_num", col("n11") + col("n00"))
      .withColumn("pe_num",
        (col("n11") + col("n10")).cast("decimal(19,0)") *
          (col("n11") + col("n01")).cast("decimal(19,0)") +
        (col("n01") + col("n00")).cast("decimal(19,0)") *
          (col("n10") + col("n00")).cast("decimal(19,0)"))
      .withColumn("knum",
        col("po_num").cast("decimal(19,0)") *
          col("n").cast("decimal(19,0)") - col("pe_num"))
      .withColumn("kden",
        col("n").cast("decimal(19,0)") *
          col("n").cast("decimal(19,0)") - col("pe_num"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"), col("n"),
        col("po_num"), col("pe_num").cast("string").as("pe_num_str"),
        when(col("kden") > 0,
          expr("CAST((knum * 1000000 + 2000000 * kden) div kden " +
            "AS BIGINT) - 2000000")).as("kappa_micro"))
  }

  /**
   * Autocorrelation function of the hourly event-count series at lags
   * 1..`maxLag` — the serial-dependence diagnostic that decides
   * whether the daily seasonality in [[q_seasonal_anomaly]] is real
   * (a ≈24 h peak) and how far apart bootstrap blocks must be before
   * samples are independent.
   *
   * The series is the DENSE hourly spine (missing hours are real
   * zeros — [[Scale]]'s gap-fill rule), so lags mean wall-clock
   * hours. Each r_k is an exact DECIMAL(38,0) fraction:
   * num_k = Σ (H·x_t − S)(H·x_{t+k} − S) and den = Σ (H·x_t − S)² —
   * the mean-centered cross products scaled by H² so everything stays
   * integer.
   *
   * Hashed-column discipline (round 12): NO doubles anywhere. The
   * big fractions travel as digit STRINGS (immune to any float64
   * transport in the compare harness), and the ratio is quantized as
   * an exact integer: r_micro = floor(10⁶·num/den) computed with
   * integer division only — the dividend is offset by 2·10⁶·den
   * (|num| ≤ den by Cauchy–Schwarz, so it stays positive, making
   * truncating and flooring division identical in every engine) and
   * the offset subtracted back after the divide.
   *
   * Shape at 100 TB: the stream folds to the hourly grid in one
   * map-side-partial groupBy; the spine, the lag self-join, and the
   * per-lag aggregation all run on that grid (study hours × maxLag
   * rows), independent of corpus size.
   */
  def acfQuery(spark: SparkSession, sfDir: String,
      maxLag: Int = 24): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val hours = ev
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
    val bounds = hours.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = bounds
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hours, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("x"))
    val stats = spine.agg(count(lit(1)).as("bigH"), sum(col("x")).as("s"))
    val centered = spine.crossJoin(broadcast(stats))
      .select(col("h"), (col("bigH") * col("x") - col("s")).as("cx"))
    // cast each factor BEFORE multiplying: H·x can pass 3e9 at
    // petabyte hourly volumes, where a BIGINT square would overflow
    val den = centered
      .agg(sum(col("cx").cast("decimal(19,0)") *
          col("cx").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("den"))
    val lags = spark.range(1, maxLag + 1).select(col("id").as("lag"))
    // lag pairs: (t, t+k) via an equi-join on shifted hour index
    val pairs = centered.crossJoin(broadcast(lags))
      .select(col("lag"), (col("h") + col("lag")).as("h_lead"), col("cx"))
      .join(centered.select(col("h").as("h_lead"),
        col("cx").as("cx_lead")), Seq("h_lead"))
    pairs.groupBy(col("lag"))
      .agg(sum(col("cx").cast("decimal(19,0)") *
          col("cx_lead").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("num"), count(lit(1)).as("pairs"))
      .crossJoin(broadcast(den))
      .withColumn("r_micro",
        expr("CAST((num * 1000000 + 2000000 * den) div den AS BIGINT)" +
          " - 2000000"))
      .select(col("lag"), col("pairs"),
        col("num").cast("string").as("num_str"),
        col("den").cast("string").as("den_str"), col("r_micro"))
      .orderBy(col("lag"))
  }

  /**
   * Holt's linear-trend exponential smoothing (Holt 1957) over the
   * daily event-count series: level and trend states plus the
   * one-step-ahead fitted forecast per day — the capacity-planning
   * forecast a warehouse publishes beside [[q_cusum]]'s drift alarm
   * (CUSUM says "the mean SHIFTED"; Holt says "here is tomorrow").
   *
   * Recursion (α = 0.5, β = 0.3; l₁ = x₁, b₁ = x₂ − x₁):
   * l_t = α·x_t + (1−α)(l + b), b_t = β(l_t − l) + (1−β)·b — each
   * state pins to 10 dp per step via floor(x·1e10 + 0.5)/1e10 (pure
   * IEEE ops the oracle mirrors literally — library round() is
   * engine-dependent on tie inputs, see [[graft.functions.VectorOps.foldRound]]),
   * so the DuckDB recursive CTE replays the chain without drift.
   *
   * Shape at 100 TB: the stream folds to the daily grid in one
   * map-side-partial groupBy; the recursion runs on that
   * study-length-sized series — driver-side MODEL material (like
   * k-means centroids), its size set by the calendar, not the corpus.
   */
  def holtQuery(spark: SparkSession, sfDir: String,
      alpha: Double = 0.5, beta: Double = 0.3): DataFrame = {
    val days = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("day"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    require(days.length >= 2, "Holt needs at least two periods")
    def r10(x: Double): Double =
      graft.functions.VectorOps.foldRound(x, 10)
    var level = days(0)._2.toDouble
    var trend = (days(1)._2 - days(0)._2).toDouble
    val out = days.zipWithIndex.map { case ((day, x), i) =>
      if (i == 0) (day, x, level, trend, level)
      else {
        val fitted = r10(level + trend)
        val lNew = r10(alpha * x + (1 - alpha) * (level + trend))
        val tNew = r10(beta * (lNew - level) + (1 - beta) * trend)
        level = lNew; trend = tNew
        (day, x, lNew, tNew, fitted)
      }
    }
    import spark.implicits._
    out.toSeq.toDF("day", "x", "level", "trend", "fitted")
      .orderBy(col("day"))
  }

  /**
   * EWMA control chart (Roberts 1959, the SPC classic) over daily
   * event counts: z_t = λ·x_t + (1−λ)·z_{t−1} with λ = 0.2 against
   * ±3σ̂·√(λ/(2−λ)·(1−(1−λ)^{2t})) limits — the small-persistent-
   * shift monitor between [[q_cusum]]'s change localization and
   * [[holtQuery]]'s forecast: CUSUM says where the level moved, the
   * EWMA chart ALARMS while it is moving.
   *
   * Engine-exactness discipline: the EWMA state AND the (1−λ)^{2t}
   * width factor are both carried recursively with per-step
   * floor(x·10^s + 0.5)/10^s pinning (the [[holtQuery]] rule) — the
   * width factor recursion f_t = 0.64·f_{t−1} exists precisely
   * because a cross-engine `pow(0.8, 2t)` is a libm call with no
   * correctly-rounded guarantee. μ and σ come from exact BIGINT
   * power sums over the PHASE-I BASELINE window (the first
   * `baseline` days) — the SPC discipline: estimating control limits
   * from the whole series lets the very shift being monitored
   * inflate σ and mute its own alarm. The daily grid is driver-side
   * model material.
   */
  def ewmaChartQuery(spark: SparkSession, sfDir: String,
      lambda: Double = 0.2, l: Double = 3.0,
      baseline: Int = 20): DataFrame = {
    val days = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("day"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    import spark.implicits._
    ewmaChart(days, lambda, l, baseline).toSeq
      .toDF("day", "x", "z", "ucl", "lcl", "alarm")
      .orderBy(col("day"))
  }

  /** The [[ewmaChartQuery]] recursion over an explicit daily series —
    * spec entry point (alarm behavior is asserted on a planted-shift
    * series, since whether REAL data alarms is a property of the
    * data, not the chart). */
  private[graft] def ewmaChart(days: Array[(java.sql.Timestamp, Long)],
      lambda: Double = 0.2, l: Double = 3.0, baseline: Int = 20)
      : Array[(java.sql.Timestamp, Long, Double, Double, Double,
        Boolean)] = {
    require(days.length >= 2, "EWMA chart needs at least two periods")
    val base = days.take(baseline)
    val n = base.length
    val s1 = base.map(_._2).sum
    val s2 = base.map(d => d._2 * d._2).sum
    val mu = s1.toDouble / n
    // population sd from exact integer power sums: σ² = (n·s2−s1²)/n²
    val sigma = math.sqrt((n.toDouble * s2 - s1.toDouble * s1) /
      (n.toDouble * n))
    def r10(x: Double) = graft.functions.VectorOps.foldRound(x, 10)
    def r12(x: Double) = graft.functions.VectorOps.foldRound(x, 12)
    val decay2 = (1 - lambda) * (1 - lambda)
    var z = mu
    var f = 1.0
    days.map { case (day, x) =>
      z = r10(lambda * x + (1 - lambda) * z)
      f = r12(decay2 * f)
      val width = l * sigma *
        math.sqrt(lambda / (2 - lambda) * (1 - f))
      val ucl = r10(mu + width)
      val lcl = r10(mu - width)
      (day, x, z, ucl, lcl, z > ucl || z < lcl)
    }
  }

  /**
   * Classical additive seasonal decomposition of the hourly series
   * (the moving-average method of Macaulay 1931 — the pre-STL
   * standard): x_t = trend + seasonal + residual, with trend the
   * centered 2×24 moving average, seasonal the per-hour-of-day mean
   * of the detrended series, residual the remainder — the
   * "is this spike seasonality or signal" splitter feeding
   * [[q_seasonal_anomaly]]'s z-scores and [[q_acf]]'s lag readout.
   *
   * Exactness: the centered MA over integer counts is carried as the
   * exact 48-scaled integer 48·x − S₁ − S₂ (S = the two 24-hour
   * window sums), so trend, detrended, and each seasonal mean are
   * ONE double division of exact BIGINTs rounded 10 dp; residual
   * subtracts two already-rounded doubles. Edge hours without a full
   * ±12 window emit null trend (and are excluded from seasonal
   * fitting), the classical convention. Seasonal is reported
   * UNCENTERED (its level offset lands in the residual mean instead
   * of redistributing through a second rounding pass — documented
   * rather than hidden).
   *
   * Shape at 100 TB: the stream folds to the dense hourly spine
   * first; windows and the 24-cell seasonal fit run on the spine.
   */
  def seasonalDecomposeQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val hours = ev
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
    val bounds = hours.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = bounds
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hours, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("x"))
    val wOrd = Window.orderBy(col("h"))
    val f1 = wOrd.rowsBetween(-12, 11)
    val f2 = wOrd.rowsBetween(-11, 12)
    val withMa = spine
      .withColumn("s1", sum(col("x")).over(f1))
      .withColumn("c1", count(lit(1)).over(f1))
      .withColumn("s2", sum(col("x")).over(f2))
      .withColumn("c2", count(lit(1)).over(f2))
      .withColumn("det48",
        when(col("c1") === 24 && col("c2") === 24,
          col("x") * 48 - col("s1") - col("s2")))
      .withColumn("hod", pmod(col("h"), lit(24L)))
    val seasonal = withMa.filter(col("det48").isNotNull)
      .groupBy(col("hod"))
      .agg(sum(col("det48")).as("ds"), count(lit(1)).as("dc"))
      .select(col("hod"),
        fr(col("ds").cast("double") /
          (col("dc") * 48).cast("double"), 10).as("seasonal"))
    withMa.join(broadcast(seasonal), Seq("hod"))
      .select(timestamp_millis(col("h") * 3600000L).as("hour_start"),
        col("x"),
        when(col("det48").isNotNull,
          fr((col("s1") + col("s2")).cast("double") / lit(48.0), 10))
          .as("trend"),
        col("seasonal"),
        when(col("det48").isNotNull,
          fr(fr(col("det48").cast("double") / lit(48.0), 10) -
            col("seasonal"), 10)).as("residual"))
      .orderBy(col("hour_start"))
  }

  /**
   * Mann–Kendall monotone-trend test with Sen's slope (Mann 1945,
   * Kendall 1975, Sen 1968): the distribution-free "is the series
   * drifting" decision over daily event counts — the robust companion
   * to [[holtQuery]] (Holt forecasts assuming structure; MK decides
   * whether a monotone structure exists at all, immune to outliers
   * and non-normality that break OLS slopes).
   *
   * S = Σ_{i<j} sign(x_j − x_i) (exact BIGINT over all pairs);
   * tie-corrected variance scaled EXACT by 18:
   * var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5); z = (S ∓ 1)/√(var18/18).
   * Sen's slope is the median of the pairwise slopes
   * (x_j − x_i)/(j − i) — each slope ONE double division on integers,
   * the median an avg over the one or two middle ranks (IEEE-
   * commutative, engine-independent).
   *
   * Shape at 100 TB: the stream folds to the daily grid first; the
   * O(n²) pair pass runs on study-length days (30 days → 435 pairs),
   * a domain-sized frame at any corpus scale.
   */
  def trendTestQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val idx = days
      .withColumn("i", row_number().over(Window.orderBy(col("day")))
        .cast("long"))
    val pairs = idx.as("a")
      .join(idx.as("b"), col("b.i") > col("a.i"))
      .select((col("b.x") - col("a.x")).as("dx"),
        (col("b.i") - col("a.i")).as("di"))
    val sVar = pairs
      .select(signum(col("dx").cast("double")).cast("long").as("sgn"))
      .agg(sum(col("sgn")).as("s_stat"))
    val n = idx.agg(count(lit(1)).as("n_days"))
    val ties = idx.groupBy(col("x"))
      .agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1) *
        (col("t") * 2 + 5)), lit(0L)).as("tie18"))
    val slopes = pairs
      .select((col("dx").cast("double") / col("di").cast("double"))
        .as("slope"))
    val ranked = slopes
      .withColumn("rn", row_number().over(Window.orderBy(col("slope")))
        .cast("long"))
      .crossJoin(broadcast(slopes.agg(count(lit(1)).as("m"))))
    val sen = ranked
      .filter(col("rn") === (col("m") + 1) / 2 ||
        col("rn") === (col("m") + 2) / 2)
      .agg(avg(col("slope")).as("sen_slope"))
    sVar.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .crossJoin(broadcast(sen))
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
          - col("tie18"))
      .withColumn("z",
        when(col("s_stat") > 0,
          fr((col("s_stat") - 1).cast("double") /
            sqrt(col("var18").cast("double") / lit(18.0)), 10))
          .when(col("s_stat") < 0,
            fr((col("s_stat") + 1).cast("double") /
              sqrt(col("var18").cast("double") / lit(18.0)), 10))
          .otherwise(lit(0.0)))
      .select(col("n_days"), col("s_stat"), col("var18"),
        col("z"), fr(col("sen_slope"), 10).as("sen_slope"),
        when(abs(col("z")) < 1.96, lit("no trend"))
          .when(col("z") > 0, lit("increasing"))
          .otherwise(lit("decreasing")).as("trend"))
  }

  /**
   * Fleiss' kappa (Fleiss 1971): chance-corrected agreement among
   * MORE than two raters over more than two categories — the
   * companion to [[cohenKappaQuery]] a labeling pipeline needs once
   * three cheap heuristics (or three annotators) vote on every
   * document. Here three length "raters" tercile each document into
   * {short=0, medium=1, long=2} by different proxies: raw character
   * count, whitespace token count, and 'e'-occurrence count —
   * correlated enough to agree often, noisy enough that the
   * chance-corrected statistic is doing real work.
   *
   * Exact-rational form (no doubles): with n items, R raters, k
   * categories, n_ij raters placing item i in category j, and
   * C_j = Σ_i n_ij: let S2 = Σ_ij n_ij², T = nR(R−1), M = (nR)².
   * P̄ = (S2 − nR)/T, P̄_e = ΣC_j²/M, and kappa clears to
   * ((S2 − nR)·M − T·ΣC_j²) / (T·(M − ΣC_j²)). DECIMAL(38,0)
   * products (n³R⁴ ≈ 10²² at sf10 — far past BIGINT, far under
   * 10³⁸); kappa_micro/pbar_micro/pe_micro are offset floor-divisions
   * so the negative branch floors identically in every engine.
   *
   * Shape at 100 TB: the per-document vote row is one codegen'd
   * projection (no shuffle); everything folds map-side to k+2
   * counters, and the kappa row is arithmetic on a 1-row frame.
   */
  def fleissKappaQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val tok = size(split(col("text"), " ", -1)).cast("long")
    val ne = (length(col("text")) -
      length(regexp_replace(col("text"), "e", ""))).cast("long")
    def tercile(v: Column, lo: Long, hi: Long): Column =
      when(v < lo, 0L).when(v < hi, 1L).otherwise(2L)
    val votes = d.select(
      tercile(col("n_chars"), 216L, 380L).as("r1"),
      tercile(tok, 40L, 70L).as("r2"),
      tercile(ne, 18L, 30L).as("r3"))
    fleissKappaOver(votes, nCats = 3)
  }

  /** [[fleissKappaQuery]]'s statistic over an explicit (r1, r2, r3)
    * category-vote frame — spec entry point. `nCats` fixes the
    * category universe so empty categories still enter P̄_e. */
  private[graft] def fleissKappaOver(votes: DataFrame, nCats: Int)
      : DataFrame = {
    val spark = votes.sparkSession
    val raters = votes.columns.length // R
    // Per-item category counts n_ij as k columns, then the two item
    // sums the statistic needs: Σ_j n_ij² (exact) and the per-category
    // contributions to C_j — all in ONE map-side-foldable aggregate.
    val catCols = (0 until nCats).map { j =>
      votes.columns.map(c =>
          when(col(c) === j.toLong, 1L).otherwise(0L))
        .reduce(_ + _).as(s"n_$j")
    }
    val perItem = votes.select(catCols: _*)
    val s2 = (0 until nCats).map(j => col(s"n_$j") * col(s"n_$j"))
      .reduce(_ + _)
    val aggCols =
      Seq(count(lit(1)).cast("long").as("n"),
        sum(s2).cast("long").as("s2")) ++
      (0 until nCats).map(j =>
        sum(col(s"n_$j")).cast("long").as(s"c_$j"))
    val g = perItem.agg(aggCols.head, aggCols.tail: _*)
    val dec = "decimal(38,0)"
    val sumC2 = (0 until nCats).map(j =>
        col(s"c_$j").cast(dec) * col(s"c_$j").cast(dec))
      .reduce(_ + _)
    val withT = g
      .withColumn("n_raters", lit(raters.toLong))
      .withColumn("n_cats", lit(nCats.toLong))
      .withColumn("nr", (col("n") * raters).cast(dec))
      .withColumn("t_den",
        (col("n") * raters * (raters - 1)).cast(dec))
      .withColumn("m_den", col("nr") * col("nr"))
      .withColumn("sum_c2", sumC2)
      .withColumn("pbar_num", col("s2").cast(dec) - col("nr"))
      .withColumn("knum",
        col("pbar_num") * col("m_den") - col("t_den") * col("sum_c2"))
      .withColumn("kden",
        col("t_den") * (col("m_den") - col("sum_c2")))
    def microFloor(num: String, den: String): Column =
      expr(s"CAST(($num * 1000000 + 2000000 * $den) div $den " +
        "AS BIGINT) - 2000000")
    withT.select(
      Seq(col("n"), col("n_raters"), col("n_cats")) ++
      (0 until nCats).map(j => col(s"c_$j")) ++
      Seq(
        col("s2"),
        microFloor("pbar_num", "t_den").as("pbar_micro"),
        microFloor("sum_c2", "m_den").as("pe_micro"),
        when(col("kden") > 0,
          microFloor("knum", "kden")).as("kappa_micro")): _*)
  }

  /**
   * Kendall rank association between two daily series — event VOLUME
   * (count) and event REACH (distinct users) — the ordinal answer to
   * "do busy days mean broad days, or a few heavy users?" that
   * Pearson correlation gets wrong under heavy tails. Over all day
   * pairs i < j, pairs are concordant when volume and reach move the
   * same way, discordant when opposite; ties are split the standard
   * three ways (x-only, y-only, both). Reported: Kendall's tau-a
   * = (C − D)/n₀ with n₀ = n(n−1)/2, and Goodman–Kruskal's gamma
   * = (C − D)/(C + D) — BOTH exact rationals (tau-b's √ correction
   * is deliberately out of the hashed frame; C, D and the tie counts
   * let any consumer derive it).
   *
   * Exactness: day = epoch-ms div 86 400 000 (pure integer, no
   * date_trunc), counts and pair classifications are BIGINT, and the
   * two statistics are offset floor-divisions in micro-units (the
   * negative branch floors identically in every engine).
   *
   * Shape at 100 TB: the corpus folds map-side to the daily grid
   * (count + partial-agg exact distinct); the pair join and the
   * final fold run on that grid — days², set by the CALENDAR window,
   * not the corpus. The grid frame is broadcast to its own self-join.
   */
  def kendallQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.load(spark, sfDir, "events")
      .select(expr("unix_millis(ts) div 86400000").as("day"),
        col("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("x"),
        count_distinct(col("user_id")).as("y"))
    val a = daily.select(col("day").as("di"), col("x").as("xi"),
      col("y").as("yi"))
    val b = daily.select(col("day").as("dj"), col("x").as("xj"),
      col("y").as("yj"))
    val pairs = a.join(broadcast(b), col("dj") > col("di"))
      .select((col("xj") - col("xi")).as("dx"),
        (col("yj") - col("yi")).as("dy"))
    val g = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L))
        .as("conc"),
      sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L))
        .as("disc"),
      sum(when(col("dx") === 0 && col("dy") =!= 0, 1L).otherwise(0L))
        .as("tie_x"),
      sum(when(col("dx") =!= 0 && col("dy") === 0, 1L).otherwise(0L))
        .as("tie_y"),
      sum(when(col("dx") === 0 && col("dy") === 0, 1L).otherwise(0L))
        .as("tie_xy"))
    g.crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .withColumn("s_num", col("conc") - col("disc"))
      .select(col("n_days"), col("n_pairs"), col("conc"), col("disc"),
        col("tie_x"), col("tie_y"), col("tie_xy"),
        expr("CAST((s_num * 1000000 + 2000000 * n_pairs) div " +
          "n_pairs AS BIGINT) - 2000000").as("tau_a_micro"),
        when(col("conc") + col("disc") > 0,
          expr("CAST((s_num * 1000000 + 2000000 * (conc + disc)) " +
            "div (conc + disc) AS BIGINT) - 2000000"))
          .as("gamma_micro"))
  }

  /**
   * Krippendorff's alpha (nominal data) — the agreement statistic the
   * kappa family cannot give you once raters ABSTAIN: Cohen needs
   * exactly two complete raters, Fleiss a constant rater count per
   * item; alpha is defined over whatever ratings exist, weighting
   * each unit by how much pairing information it carries. Here the
   * three tercile raters of [[fleissKappaQuery]] gain abstention
   * bands: the token rater withholds within ±3 of its cut points,
   * the 'e'-count rater within ±2 — the "annotator skipped the hard
   * ones" shape every labeling pipeline meets. Units with < 2
   * remaining votes drop out (they carry no pairs).
   *
   * Exact-rational form: with per-unit category counts c_{i,v},
   * m_i = Σ_v c_{i,v} ≥ 2, the disagreeing ordered pairs are
   * disp_i = m_i(m_i−1) − Σ_v c_{i,v}(c_{i,v}−1) — always EVEN, so
   * A = Σ_i 2·disp_i/(m_i−1) is an exact integer for R ≤ 3 (m_i−1 ∈
   * {1,2}). Global marginals n_v = Σ_i c_{i,v}, n = Σ_v n_v, and
   * B = n² − Σ_v n_v² gives alpha = 1 − (n−1)·A/(2B); alpha_micro is
   * one offset floor-division on DECIMAL(38,0) products (alpha < 0 —
   * worse than chance — floors identically in every engine).
   *
   * Shape at 100 TB: votes are a codegen projection; the whole
   * statistic folds map-side to 6 counters (A, n, n_v, units); the
   * alpha row is arithmetic on a 1-row frame. No shuffle wider than
   * one partial-agg exchange.
   */
  def krippendorffQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val tok = size(split(col("text"), " ", -1)).cast("long")
    val ne = (length(col("text")) -
      length(regexp_replace(col("text"), "e", ""))).cast("long")
    def tercile(v: Column, lo: Long, hi: Long): Column =
      when(v < lo, 0L).when(v < hi, 1L).otherwise(2L)
    def band(v: Column, cut: Long, w: Long): Column =
      v >= cut - w && v <= cut + w
    val votes = d.select(
      tercile(col("n_chars"), 216L, 380L).as("r1"),
      when(!band(tok, 40L, 3L) && !band(tok, 70L, 3L),
        tercile(tok, 40L, 70L)).as("r2"),
      when(!band(ne, 18L, 2L) && !band(ne, 30L, 2L),
        tercile(ne, 18L, 30L)).as("r3"))
    krippendorffOver(votes)
  }

  /** [[krippendorffQuery]]'s statistic over an explicit nullable
    * category-vote frame (one column per rater, null = abstained) —
    * spec entry point. Categories are whatever values appear. */
  private[graft] def krippendorffOver(votes: DataFrame): DataFrame = {
    val rCols = votes.columns.toSeq
    // per-unit counts per category value v in {0,1,2}
    def cnt(v: Int): Column = rCols
      .map(c => when(col(c) === v.toLong, 1L).otherwise(0L))
      .reduce(_ + _)
    val perUnit = votes.select(
        cnt(0).as("c0"), cnt(1).as("c1"), cnt(2).as("c2"))
      .withColumn("m", col("c0") + col("c1") + col("c2"))
      .filter(col("m") >= 2)
    val disp = col("m") * (col("m") - 1) -
      (col("c0") * (col("c0") - 1) + col("c1") * (col("c1") - 1) +
        col("c2") * (col("c2") - 1))
    val g = perUnit.agg(
      count(lit(1)).as("n_units"),
      sum(col("m")).as("n_ratings"),
      sum(col("c0")).as("n_0"),
      sum(col("c1")).as("n_1"),
      sum(col("c2")).as("n_2"),
      // 2·disp/(m−1): m=2 → 2·disp, m=3 → disp — exact integers
      sum(when(col("m") === 2, disp * 2)
        .otherwise(disp)).as("a_scaled"))
    val dec = "decimal(38,0)"
    g.withColumn("b_pairs",
        col("n_ratings").cast(dec) * col("n_ratings").cast(dec) -
          (col("n_0").cast(dec) * col("n_0").cast(dec) +
           col("n_1").cast(dec) * col("n_1").cast(dec) +
           col("n_2").cast(dec) * col("n_2").cast(dec)))
      .withColumn("num",
        (col("n_ratings") - 1).cast(dec) * col("a_scaled").cast(dec))
      .withColumn("den", col("b_pairs") * 2)
      .select(col("n_units"), col("n_ratings"),
        col("n_0"), col("n_1"), col("n_2"), col("a_scaled"),
        when(col("den") > 0,
          expr("CAST(((den - num) * 1000000 + 2000000 * den) div " +
            "den AS BIGINT) - 2000000")).as("alpha_micro"))
  }
}
