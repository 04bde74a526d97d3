package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Behavioral analytics over the event stream — the sequence-model,
 * recency-weighting, and experiment-inference passes an event
 * warehouse runs beside the windowed aggregates in [[Scale]]. Each
 * query reduces the raw stream to a model-sized frame (k² transition
 * cells, one row per event type, one inference row), so nothing here
 * ever shuffles event text or wide rows — counts and weights only.
 */
object Behavior {

  /**
   * First-order Markov transition matrix of the per-user event-type
   * sequence, plus the per-row Shannon entropy (nats) — the
   * "predictability of the stream" diagnostic that screens bot traffic
   * (near-zero entropy rows) from organic sessions, and the
   * transition model session-simulators sample from.
   *
   * Shape at 100 TB: the lag() window partitions BY USER — thousands
   * of small per-user sorts co-located with the groupBy shuffle, never
   * a corpus-wide sort; bigram counts reduce map-side to ≤ k² cells,
   * and the row totals / entropies are k-row broadcasts. Exactness:
   * counts are exact BIGINT; p = n/row_total is ONE double division
   * rounded to 6 dp; entropy terms −p·ln p round to 6 dp and sum as
   * DECIMAL (order-free) — ln's last ulp is libm-dependent, so
   * nothing hashed sits closer than 6 dp to it.
   */
  def markovQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val bigrams = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = bigrams.groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_total"))
    val withP = counts.join(broadcast(totals), Seq("prev_type"))
      .withColumn("p",
        fr(col("n").cast("double") / col("row_total").cast("double"),
          6) + lit(0.0))
    // r13 transport discipline (PROBES.md): the DECIMAL witness
    // hashes as a digit string — entropy values are data-dependent
    // and could land on a trailing-zero / sub-1e-4 value, the classes
    // the driver's decimal-to-float transport mangles. The sum stays
    // DECIMAL (order-free exactness); only the transport is textual.
    val entropy = withP
      .select(col("prev_type"),
        fr(-col("p") * log(col("p")), 6).cast("decimal(20,6)")
          .as("term"))
      .groupBy(col("prev_type"))
      .agg(sum(col("term")).cast("decimal(38,6)").cast("string")
        .as("row_entropy_nats"))
    withP.join(broadcast(entropy), Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n"), col("p"),
        col("row_entropy_nats"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /**
   * Exponential time-decay aggregates: per event type, the
   * half-life-weighted event count and value sum as of the stream's
   * last timestamp — the recency-weighted engagement score
   * (w = 2^(−age/half-life)) that powers trending rankings and
   * freshness-weighted sampling, where a plain windowed sum either
   * forgets everything outside the window or weights a year-old event
   * like yesterday's.
   *
   * Shape at 100 TB: the reference time is a one-row broadcast
   * (max ts); weights are a codegen'd projection on the scan; the
   * aggregation is an ordinary map-side-partial groupBy on event_type
   * — one narrow shuffle of k·(2 decimals + 1 long). Exactness: ages
   * are exact BIGINT millisecond differences; each 2^(−x) weight and
   * each weight·value product rounds to 6 dp then sums as DECIMAL
   * (order-free) — pow() is a transcendental whose last ulp is
   * libm-dependent, so hashed state keeps 6 dp of headroom.
   */
  def decayAggQuery(spark: SparkSession, sfDir: String,
      halfLifeHours: Double = 168.0): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val ref = ev.agg(max(unix_millis(col("ts"))).as("ref_ms"))
    val ageH = (col("ref_ms") - unix_millis(col("ts"))).cast("double") /
      lit(3.6e6)
    val wRaw = pow(lit(2.0), -ageH / lit(halfLifeHours))
    ev.crossJoin(broadcast(ref))
      .select(col("event_type"),
        fr(wRaw, 6).cast("decimal(20,6)").as("wt"),
        fr(wRaw * col("value"), 6).cast("decimal(24,6)").as("wv"))
      .groupBy(col("event_type"))
      // r13 transport discipline (PROBES.md): DECIMAL witnesses hash
      // as digit strings; sums stay DECIMAL internally (order-free).
      .agg(count(lit(1)).as("n"),
        sum(col("wt")).cast("decimal(38,6)").cast("string")
          .as("decayed_n"),
        sum(col("wv")).cast("decimal(38,6)").cast("string")
          .as("decayed_value"))
      .orderBy(col("event_type"))
  }

  /**
   * Two-proportion experiment readout (the A/B test z-test): users
   * split into cohorts by id parity, conversion = repeat purchaser
   * (≥ 14 purchase events — the stream's per-user median, so both
   * cohorts stay non-degenerate at every scale factor; "did anyone
   * purchase" saturates to 100% and zeroes the pooled variance);
   * reports per-cohort rates, the uplift, the pooled
   * standard error, the z statistic, and the |z| ≥ 1.96 significance
   * call — the decision-gate summary every event warehouse serves.
   *
   * Shape at 100 TB: one groupBy(user) max() pass folds the stream to
   * (user, converted) — map-side partial, shuffle carries one bit per
   * user — then a 2-row aggregate; the inference arithmetic runs on
   * four BIGINTs in the driver plan, no data motion. Exactness: all
   * counts exact; the z pipeline is a fixed double expression tree on
   * those integers, rounded to 10 dp at the outputs.
   */
  def abTestQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val users = ev.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("np"))
      .select(col("user_id"),
        when(col("np") >= 14L, 1L).otherwise(0L).as("conv"))
      .withColumn("grp", pmod(col("user_id"), lit(2L)))
    val cohorts = users.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    val a = cohorts.filter(col("grp") === 0L)
      .select(col("n").as("n_a"), col("x").as("x_a"))
    val b = cohorts.filter(col("grp") === 1L)
      .select(col("n").as("n_b"), col("x").as("x_b"))
    val pA = col("x_a").cast("double") / col("n_a").cast("double")
    val pB = col("x_b").cast("double") / col("n_b").cast("double")
    val pPool = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    val z = (pB - pA) / se
    a.crossJoin(b)
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        (fr(pA, 10) + lit(0.0)).as("rate_a"),
        (fr(pB, 10) + lit(0.0)).as("rate_b"),
        (fr(pB - pA, 10) + lit(0.0)).as("uplift"),
        (fr(se, 10) + lit(0.0)).as("se"),
        (fr(z, 10) + lit(0.0)).as("z"),
        (abs(fr(z, 10) + lit(0.0)) >= 1.96).as("significant"))
  }

  /**
   * Frequent-itemset pairs with association metrics (Agrawal &
   * Srikant, VLDB 1994 — the Apriori 2-itemset layer): each user's
   * "basket" is the set of event types they engaged with (≥ 14
   * events, the per-user-type median, so baskets are non-degenerate
   * mixes instead of "everyone has everything"); every type pair gets
   * exact support counts, confidence both directions, and lift — the
   * cross-feature affinity readout behind "users who do A also do B".
   *
   * Shape at 100 TB: the basket build is one map-side-partial
   * groupBy(user, type); the pair expansion self-joins BASKETS (≤ k
   * items per user — the shuffle carries (user, type) pairs, never
   * events); pair metrics reduce to ≤ k² cells. Exactness: all
   * supports exact BIGINT; confidence/lift are single double
   * divisions on those integers rounded 10 dp.
   */
  def itemsetsQuery(spark: SparkSession, sfDir: String,
      minEvents: Int = 14): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val basket = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minEvents)
      .select(col("user_id"), col("event_type"))
    val nUsers = basket.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val itemSup = basket.groupBy(col("event_type"))
      .agg(count(lit(1)).as("sup"))
    val pairs = basket.as("a")
      .join(basket.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("item_a"),
        col("b.event_type").as("item_b"))
      .agg(count(lit(1)).as("sup_ab"))
    pairs
      .join(broadcast(itemSup.select(col("event_type").as("item_a"),
        col("sup").as("sup_a"))), Seq("item_a"))
      .join(broadcast(itemSup.select(col("event_type").as("item_b"),
        col("sup").as("sup_b"))), Seq("item_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("item_a"), col("item_b"), col("sup_a"), col("sup_b"),
        col("sup_ab"), col("n_users"),
        fr(col("sup_ab").cast("double") /
          col("n_users").cast("double"), 10).as("support"),
        fr(col("sup_ab").cast("double") /
          col("sup_a").cast("double"), 10).as("conf_a_b"),
        fr(col("sup_ab").cast("double") /
          col("sup_b").cast("double"), 10).as("conf_b_a"),
        fr((col("sup_ab") * col("n_users")).cast("double") /
          (col("sup_a") * col("sup_b")).cast("double"), 10).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /**
   * Item-item collaborative-filtering similarity (Sarwar et al., WWW
   * 2001): cosine between event types over the user-engagement count
   * matrix — "items rated similarly by the same users are similar",
   * the memory-based recommender primitive, computed here over the
   * event stream's implicit feedback (per-user type counts).
   *
   * Exactness: the co-engagement inner products Σ_u n_ui·n_uj and the
   * squared norms are exact (DECIMAL cast BEFORE the product — user
   * lifetime counts can pass 3e9·3e9 at extreme scale).
   *
   * Hashed-column discipline (round 12): no doubles, no sqrt. The
   * gate emits cos² in micro-units as ONE exact integer division:
   * cos2_micro = ⌊10⁶·dot²/(ss_a·ss_b)⌋ (dot > 0 here — counts are
   * positive — so cos = √(cos2_micro/10⁶) loses nothing). The dot
   * witness travels as a digit string. Overflow headroom:
   * 10⁶·dot² needs dot < 10¹⁶, which holds through sf100 on this
   * schema (dot ≈ users·n̄² ≈ 2·10¹¹ at sf10).
   *
   * Shape at 100 TB: the count matrix build is one map-side-partial
   * groupBy; the pair pass self-joins per-user vectors (≤ k entries
   * per user — the shuffle carries (user, type, count) triples) and
   * reduces to ≤ k² cells.
   */
  def itemCfQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val m = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val norms = m.groupBy(col("event_type"))
      .agg(sum(col("n").cast("decimal(19,0)") *
        col("n").cast("decimal(19,0)")).cast("decimal(38,0)").as("ss"),
        count(lit(1)).as("n_users"))
    val dots = m.as("a")
      .join(m.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("item_a"),
        col("b.event_type").as("item_b"))
      .agg(sum(col("a.n").cast("decimal(19,0)") *
        col("b.n").cast("decimal(19,0)")).cast("decimal(38,0)")
        .as("dot"), count(lit(1)).as("co_users"))
    dots
      .join(broadcast(norms.select(col("event_type").as("item_a"),
        col("ss").as("ss_a"), col("n_users").as("users_a"))),
        Seq("item_a"))
      .join(broadcast(norms.select(col("event_type").as("item_b"),
        col("ss").as("ss_b"), col("n_users").as("users_b"))),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("co_users"),
        col("dot").cast("string").as("dot_str"),
        expr("CAST((dot * dot * 1000000) div (ss_a * ss_b) AS BIGINT)")
          .as("cos2_micro"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /**
   * Sequential path mining: the top-20 three-step event-type paths
   * (trigrams of each user's time-ordered stream) with exact counts
   * and the share of all trigrams — the "what do users actually DO"
   * readout one order above [[markovQuery]]'s first-order transitions
   * (a Markov chain cannot distinguish a→b→a ping-pong from a→b→c
   * progression; the trigram table can).
   *
   * Shape at 100 TB: the lag windows partition BY USER (co-located
   * per-user sorts, never a corpus sort); path counts reduce
   * map-side to ≤ k³ cells; top-20 is a bounded TakeOrdered.
   */
  def eventPathsQuery(spark: SparkSession, sfDir: String,
      k: Int = 20): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tri = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("p1", lag(col("event_type"), 2).over(w))
      .withColumn("p2", lag(col("event_type"), 1).over(w))
      .filter(col("p1").isNotNull)
      .select(concat_ws(">", col("p1"), col("p2"), col("event_type"))
        .as("path"))
    val counts = tri.groupBy(col("path")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("path"), col("n"),
        fr(col("n").cast("double") / col("n_total").cast("double"),
          10).as("share"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /**
   * User growth curve: first-seen day per user → daily new-user
   * counts and the cumulative audience — the acquisition curve every
   * product warehouse serves, computed the scalable way (a cumulative
   * windowed COUNT DISTINCT is quadratic state; first-seen-then-
   * cumsum is one groupBy + a calendar-sized window).
   */
  def userGrowthQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).as("day"))
    val daily = firstSeen.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    val wOrd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_users", sum(col("new_users")).over(wOrd))
      .orderBy(col("day"))
  }

  /**
   * RFM feature frame (Hughes 1994, the classic CRM triad) plus
   * rolling activity windows: per user — recency in hours from the
   * stream's last timestamp, purchase frequency, monetary total
   * (exact integer cents), and 1/7/30-day trailing event counts —
   * the per-entity feature extraction pass a training pipeline runs
   * before any model sees the stream. Quartile scores come from
   * ntile(4) over the user domain (deterministic tie-break by id).
   *
   * Shape at 100 TB: ONE map-side-partial groupBy(user) computes
   * every feature as conditional aggregates against a broadcast
   * reference time — no per-window self-joins, no event-time
   * windows. The quartile scores do NOT use `ntile` windows (three
   * unpartitioned `Window.orderBy`s = three single-task sorts of the
   * whole user frame): each score is the ntile closed form
   * bucket(rn, n) evaluated on a [[Prefix.running]] distributed rank
   * — with n = 4·q + rem, the first rem buckets hold q+1 rows, so
   * bucket = ⌈rn/(q+1)⌉ while rn ≤ rem·(q+1), else
   * rem + ⌈(rn − rem·(q+1))/q⌉ — pure integer arithmetic, identical
   * to the SQL-standard NTILE both engines implement.
   */
  def rfmFeaturesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val ref = ev.agg(max(unix_millis(col("ts"))).as("ref_ms"))
    val dayMs = 86400000L
    val feats = ev.crossJoin(broadcast(ref))
      .groupBy(col("user_id"))
      .agg(
        expr("(max(ref_ms) - max(unix_millis(ts))) div 3600000")
          .as("recency_h"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("frequency"),
        sum(when(col("event_type") === "purchase",
          fr(col("value") * 100, 0).cast("long")).otherwise(0L))
          .as("monetary_cents"),
        sum(when(unix_millis(col("ts")) > col("ref_ms") - dayMs, 1L)
          .otherwise(0L)).as("n_1d"),
        sum(when(unix_millis(col("ts")) > col("ref_ms") - 7 * dayMs, 1L)
          .otherwise(0L)).as("n_7d"),
        sum(when(unix_millis(col("ts")) > col("ref_ms") - 30 * dayMs, 1L)
          .otherwise(0L)).as("n_30d"))
    // ntile(4) closed form over a distributed rank — the shared
    // [[Prefix.ntileFromRank]] device (exact integer arithmetic, no
    // float ever places a quartile boundary)
    def bucket(rn: Column, n: Column): Column =
      Prefix.ntileFromRank(rn, n, 4)
    val ranked = Seq(
      ("rn_r", Seq(col("recency_h"), col("user_id"))),
      ("rn_f", Seq(col("frequency").desc, col("user_id"))),
      ("rn_m", Seq(col("monetary_cents").desc, col("user_id"))))
      .foldLeft(feats) { case (acc, (out, ord)) =>
        Prefix.running(acc, Seq(), ord,
          Seq(Prefix.Running(lit(1L), "cnt", out)))
      }
    // the user count is the LAST running rank — read it off the cached
    // prefix frame instead of re-running the corpus-sized groupBy(user)
    val nUsers = ranked.agg(max(col("rn_r")).as("n_users"))
    ranked.crossJoin(broadcast(nUsers))
      .withColumn("r_score", bucket(col("rn_r"), col("n_users")))
      .withColumn("f_score", bucket(col("rn_f"), col("n_users")))
      .withColumn("m_score", bucket(col("rn_m"), col("n_users")))
      .drop("rn_r", "rn_f", "rn_m", "n_users")
      .orderBy(col("user_id"))
  }

  /**
   * Conversion-lag distribution: hours from each user's FIRST signup
   * to their first purchase AT OR AFTER it — the funnel's latency
   * readout ([[Relational.funnelQuery]] counts who converts; this
   * says how long conversion takes, the input to attribution-window
   * and nurture-cadence choices). Non-converters are reported with a
   * null lag so the conversion rate rides the same frame.
   *
   * Shape at 100 TB: two conditional min-aggregates in ONE
   * groupBy(user) pass (min signup ts, min purchase-after-signup via
   * a staged self-threshold), never an event self-join. Lags are
   * exact integer hours.
   */
  def conversionLagQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_millis(col("ts"))).as("signup_ms"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"))
    signup.join(purch, Seq("user_id"), "left")
      .groupBy(col("user_id"))
      .agg(min(col("signup_ms")).as("signup_ms"),
        min(when(col("p_ms") >= col("signup_ms"), col("p_ms")))
          .as("first_purchase_ms"))
      .select(col("user_id"),
        timestamp_millis(col("signup_ms")).as("signup_ts"),
        expr("(first_purchase_ms - signup_ms) div 3600000")
          .as("lag_h"),
        col("first_purchase_ms").isNotNull.as("converted"))
      .orderBy(col("user_id"))
  }

  /**
   * DAU/MAU stickiness: per day, the distinct daily actives, the
   * distinct 30-day trailing actives, and their ratio — THE
   * engagement health metric. Computed the scalable way: the (user,
   * day) distinct frame explodes each activity day into the ≤ 30
   * future window-days it supports, and a second distinct collapses
   * to (window-day, user) — domain-sized work (30 × active-days),
   * never a per-day trailing DISTINCT re-scan (quadratic state) and
   * never a range join. The exact twin of what the bitmap/HLL rollup
   * would serve at extreme scale.
   */
  def stickinessQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val userDays = ev
      .select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("d"))
      .distinct()
    val spine = userDays.select(col("d")).distinct()
    val dau = userDays.groupBy(col("d"))
      .agg(count(lit(1)).as("dau"))
    val mau = userDays
      .select(col("user_id"),
        explode(sequence(col("d"), col("d") + 29)).as("wd"))
      .distinct()
      .join(spine.select(col("d").as("wd")), Seq("wd"), "left_semi")
      .groupBy(col("wd").as("d"))
      .agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("d"))
      .select(timestamp_millis(col("d") * 86400000L).as("day"),
        col("dau"), col("mau"),
        fr(col("dau").cast("double") / col("mau").cast("double"),
          10).as("stickiness"))
      .orderBy(col("day"))
  }

  /**
   * McNemar's test (1947) — the PAIRED companion to [[abTestQuery]]:
   * the A/B z-test compares two independent cohorts, but "did the
   * same users change behavior between period 1 and period 2" is a
   * paired design, and only the DISCORDANT pairs carry information.
   * Each user is paired with themselves across the two halves of the
   * observation window (split at the integer epoch-ms midpoint);
   * outcome = REPEAT purchaser in that half (≥ 7 purchases — half of
   * [[abTestQuery]]'s full-window median threshold, so the bit flips
   * for a real fraction of users; "purchased at all" saturates to
   * 100% concordance and zeroes the statistic). With b =
   * converted-then-not
   * and c = not-then-converted, the statistic is
   * chi² = (b − c)²/(b + c) — an EXACT rational in the two counts,
   * emitted in micro-units with one non-negative integer division
   * (the concordant cells a and d are reported but, correctly, never
   * enter the statistic).
   *
   * Shape at 100 TB: the window midpoint is a 1-row broadcast; the
   * stream folds map-side to two bits per user; the 2×2 table is one
   * 4-counter aggregate and the statistic is driver-free arithmetic
   * on a 1-row frame.
   */
  def mcnemarQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts)").as("ms"))
    val mid = ev.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
      .select(expr("(lo + hi + 1) div 2").as("mid_ms"))
    val users = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" &&
          col("ms") < col("mid_ms"), 1L).otherwise(0L)).as("k1"),
        sum(when(col("event_type") === "purchase" &&
          col("ms") >= col("mid_ms"), 1L).otherwise(0L)).as("k2"))
      .select(col("user_id"),
        when(col("k1") >= 7L, 1L).otherwise(0L).as("p1"),
        when(col("k2") >= 7L, 1L).otherwise(0L).as("p2"))
    users.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("p1") === 1L && col("p2") === 1L, 1L)
          .otherwise(0L)).as("a_both"),
        sum(when(col("p1") === 1L && col("p2") === 0L, 1L)
          .otherwise(0L)).as("b_lost"),
        sum(when(col("p1") === 0L && col("p2") === 1L, 1L)
          .otherwise(0L)).as("c_gained"),
        sum(when(col("p1") === 0L && col("p2") === 0L, 1L)
          .otherwise(0L)).as("d_neither"))
      .select(col("n_users"), col("a_both"), col("b_lost"),
        col("c_gained"), col("d_neither"),
        when(col("b_lost") + col("c_gained") > 0, expr(
          "CAST(CAST(b_lost - c_gained AS DECIMAL(38,0)) * " +
          "(b_lost - c_gained) * 1000000 div (b_lost + c_gained) " +
          "AS BIGINT)")).as("chi2_micro"),
        when(col("b_lost") === col("c_gained"), lit("none"))
          .when(col("c_gained") > col("b_lost"), lit("up"))
          .otherwise(lit("down")).as("direction"))
  }

  /**
   * Per-user history materialization — the "event stream → training
   * example" constructor for sequence models: each user's most recent
   * `window` events in (ts, event_id) order, emitted as a sequence
   * digest plus the window's bounds and counts. This is the exact
   * shape a behavior-model training pipeline writes out (bounded
   * recent-history context per user), and the digest makes the FULL
   * ordered sequence hash-gated without shipping the sequence.
   *
   * Shape at 100 TB: ONE user-hash shuffle; the recency cut is a
   * row_number window co-partitioned with the final groupBy (same
   * key, no second exchange); after the cut every user carries at
   * most `window` rows, so the collect_list buffers are fixed-size —
   * never a whole unbounded history. No global sort; the output is
   * one row per user.
   */
  def userHistoryQuery(spark: SparkSession, sfDir: String,
      window: Int = 32): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val byUser = Window.partitionBy(col("user_id"))
    val recent = byUser.orderBy(col("ts").desc, col("event_id").desc)
    ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("rn", row_number().over(recent))
      .withColumn("n_total", count(lit(1)).over(byUser))
      .filter(col("rn") <= window)
      .groupBy(col("user_id"))
      .agg(max(col("n_total")).as("n_events_total"),
        count(lit(1)).as("n_window"),
        // array_sort on (ts, event_id, type) structs restores forward
        // order deterministically; the digest gates the sequence
        md5(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), ",")).as("seq_digest"),
        min(col("ts")).as("window_start"),
        max(col("ts")).as("window_end"))
      .orderBy(col("user_id"))
  }
}
