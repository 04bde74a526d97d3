package graft

import graft.operators.Inference
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Statistical-inference invariants: the contingency frame carries a
  * true contingency table (margins replay, MI ≥ 0, V ∈ [0,1]), the
  * KS/AUC integer fractions obey their exact identities, the KM curve
  * is a monotone step function honoring the at-risk recursion, and the
  * ACF is a correlation (|r| ≤ 1 with an exact lag-0 normalizer). */
class InferenceSpec extends SparkSpec {

  test("contingency: margins replay, chi2 terms reconstruct the " +
      "total, expected replays, V² in [0,1]") {
    // columns: event_type, hod, n, r, c, expected_micro,
    //          chi2_term_micro, chi2_micro, dof, v2_micro
    val rows = Inference.contingencyQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(2)).sum
    val ev = Tables.load(spark, sfDir, "events")
    assert(n == ev.count(), "cell mass != event count")
    // summary columns are constant across the frame and the per-cell
    // micro terms re-sum to the total EXACTLY (pure BIGINT)
    val chi2 = rows.map(_.getLong(7)).distinct
    assert(chi2.length == 1)
    assert(rows.map(_.getLong(6)).sum == chi2.head)
    // expected_micro replays from the margins: ⌊10⁶·r·c/n⌋
    rows.foreach { r =>
      val want = (BigInt(r.getLong(3)) * BigInt(r.getLong(4)) *
        1000000L) / BigInt(n)
      assert(BigInt(r.getLong(5)) == want,
        s"expected_micro mismatch at ${r.getString(0)}/${r.getLong(1)}")
    }
    val v2 = rows.head.getLong(9)
    assert(v2 >= 0L && v2 <= 1000000L, s"V² micro $v2 outside [0,1e6]")
    // v2_micro = ⌊chi2_micro/(n·min(nr−1, nc−1))⌋ with nr=5, nc=24
    assert(v2 == chi2.head / (n * 4L))
    assert(rows.head.getLong(8) == (5 - 1) * (24 - 1))
  }

  test("cohen kappa: counts conserve the corpus, kappa replays from " +
      "the confusion cells as an exact rational, bounds hold") {
    // columns: n11, n10, n01, n00, n, po_num, pe_num_str, kappa_micro
    val r = Inference.cohenKappaQuery(spark, sfDir).collect()(0)
    val (n11, n10, n01, n00) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    val n = r.getLong(4)
    assert(n == n11 + n10 + n01 + n00)
    assert(n == Tables.load(spark, sfDir, "documents").count())
    assert(r.getLong(5) == n11 + n00)
    val peNum = BigInt(n11 + n10) * BigInt(n11 + n01) +
      BigInt(n01 + n00) * BigInt(n10 + n00)
    assert(BigInt(r.getString(6)) == peNum)
    val kden = BigInt(n) * BigInt(n) - peNum
    val knum = BigInt(n11 + n00) * BigInt(n) - peNum
    val want = (knum * 1000000 + 2000000 * kden) / kden - 2000000
    val kappa = r.getLong(7)
    assert(BigInt(kappa) == want, s"kappa $kappa != $want")
    assert(kappa >= -1000000L && kappa <= 1000000L)
    // the synthetic corpus draws one vocabulary for every lang, so
    // the function-word screen carries ~no signal and kappa sits
    // near zero — which is exactly what a chance-corrected statistic
    // must report where raw accuracy would flatter the screen
    assert(math.abs(kappa) < 200000L,
      s"kappa $kappa suspiciously far from chance on a no-signal corpus")
    // kappa math on constructed frames: perfect agreement -> 1,
    // perfect disagreement on balanced cells -> -1
    import SparkSpec.spark.implicits._
    def k(rows: Seq[(Boolean, Boolean)]): Long =
      Inference.cohenKappaOver(rows.toDF("pred", "gold"))
        .collect()(0).getLong(7)
    assert(k(Seq((true, true), (false, false), (true, true),
      (false, false))) == 1000000L)
    assert(k(Seq((true, false), (false, true), (true, false),
      (false, true))) == -1000000L)
    // half right on balanced marginals -> kappa 0
    assert(k(Seq((true, true), (true, false), (false, true),
      (false, false))) == 0L)
  }

  test("ks/auc: integer fractions obey exact identities and bounds") {
    val r = Inference.ksTestQuery(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    val (na, nb) = (row.getLong(0), row.getLong(1))
    assert(na > 0 && nb > 0)
    assert(row.getLong(3) == na * nb)            // ks_den identity
    assert(row.getLong(6) == 2 * na * nb)        // auc_den identity
    val ksNum = row.getLong(2)
    assert(ksNum >= 0 && ksNum <= na * nb)
    val aucNum = row.getLong(5)
    assert(aucNum >= 0 && aucNum <= 2 * na * nb) // AUC ∈ [0,1]
    def r10(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(4) == r10(ksNum.toDouble / (na * nb)))
    assert(row.getDouble(7) == r10(aucNum.toDouble / (2.0 * na * nb)))
    // id-parity cohorts of the same stream: no real shift, AUC ≈ ½
    assert(math.abs(row.getDouble(7) - 0.5) < 0.1)
  }

  test("survival: counts conserve users, at-risk recursion holds, " +
      "curve is a monotone step in [0,1]") {
    val rows = Inference.survivalQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val users = Tables.load(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == users)
    // n_risk starts at the full cohort and shrinks by the previous
    // row's exits (the KM at-risk recursion)
    assert(rows.head.getLong(1) == users)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) ==
          a.getLong(1) - a.getLong(2) - a.getLong(3),
          s"at-risk recursion broken at t=${b.getLong(0)}")
      case _ =>
    }
    val surv = rows.map(_.getDouble(4))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    assert(surv.sliding(2).forall {
      case Array(a, b) => b <= a + 1e-12
      case _ => true
    }, "survival not monotone nonincreasing")
    // censoring must be non-degenerate at every sf (12 h threshold)
    assert(rows.map(_.getLong(2)).sum > 0, "no deaths observed")
    assert(rows.map(_.getLong(3)).sum > 0, "no censored users")
  }

  test("acf: |r| <= 1, pair counts match the spine, and lag-0 " +
      "normalizer is the exact centered sum of squares") {
    val rows = Inference.acfQuery(spark, sfDir).collect()
    assert(rows.length == 24)
    val ev = Tables.load(spark, sfDir, "events")
    val hb = ev.agg(
      min(expr("unix_millis(ts) div 3600000")),
      max(expr("unix_millis(ts) div 3600000"))).collect()(0)
    val hours = hb.getLong(1) - hb.getLong(0) + 1
    rows.foreach { r =>
      assert(r.getLong(1) == hours - r.getLong(0),
        s"lag ${r.getLong(0)}: pair count ${r.getLong(1)}")
      // columns: lag, pairs, num_str, den_str, r_micro
      val rMicro = r.getLong(4)
      assert(rMicro >= -1000000L && rMicro <= 1000000L,
        s"lag ${r.getLong(0)}: r_micro $rMicro outside [-1e6,1e6]")
      // r_micro is the exact floor of 10⁶·num/den (BigInt replay)
      val num = BigInt(r.getString(2))
      val den = BigInt(r.getString(3))
      val want = (num * 1000000L + 2000000L * den) / den - 2000000L
      assert(BigInt(rMicro) == want,
        s"lag ${r.getLong(0)}: r_micro $rMicro != $want")
    }
    // all lags share one normalizer
    assert(rows.map(_.getString(3)).distinct.length == 1)
  }

  test("holt: recursion replays from its own outputs and fitted is " +
      "the one-step-ahead forecast") {
    val rows = Inference.holtQuery(spark, sfDir).collect()
    assert(rows.length >= 2)
    def r10(x: Double) = graft.functions.VectorOps.foldRound(x, 10)
    // day 1 init: level = x1, trend = x2 - x1, fitted = x1
    val h = rows.head
    assert(h.getDouble(2) == h.getLong(1).toDouble)
    assert(h.getDouble(3) ==
      (rows(1).getLong(1) - h.getLong(1)).toDouble)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val fitted = r10(a.getDouble(2) + a.getDouble(3))
        assert(b.getDouble(4) == fitted,
          s"day ${b.getTimestamp(0)}: fitted ${b.getDouble(4)} != " +
            s"level+trend $fitted")
        val lNew = r10(0.5 * b.getLong(1) +
          (1 - 0.5) * (a.getDouble(2) + a.getDouble(3)))
        assert(b.getDouble(2) == lNew)
        val tNew = r10(0.3 * (lNew - a.getDouble(2)) +
          (1 - 0.3) * a.getDouble(3))
        assert(b.getDouble(3) == tNew)
      case _ =>
    }
  }

  test("mann-kendall: S bounded by pair count, variance formula " +
      "replays, slope sign agrees with strong trends") {
    val r = Inference.trendTestQuery(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    val n = row.getLong(0)
    val s = row.getLong(1)
    val pairs = n * (n - 1) / 2
    assert(math.abs(s) <= pairs, s"|S|=$s > pairs=$pairs")
    // no ties in daily counts ⇒ var18 = n(n−1)(2n+5); with ties it
    // only shrinks
    assert(row.getLong(2) <= n * (n - 1) * (2 * n + 5))
    assert(row.getLong(2) > 0)
    val z = row.getDouble(3)
    val trend = row.getString(5)
    assert(trend == (if (math.abs(z) < 1.96) "no trend"
      else if (z > 0) "increasing" else "decreasing"))
    // Sen's slope and S must agree in sign when the call is firm
    if (trend != "no trend")
      assert(row.getDouble(4).sign == z.sign)
  }

  test("ewma chart: state replays, limits widen monotonically to " +
      "the asymptote, and the shifted tail alarms") {
    val rows = Inference.ewmaChartQuery(spark, sfDir).collect()
    assert(rows.length >= 2)
    def r10(x: Double) = graft.functions.VectorOps.foldRound(x, 10)
    // recursion replay from day 2 on
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getDouble(2) ==
          r10(0.2 * b.getLong(1) + (1 - 0.2) * a.getDouble(2)))
      case _ =>
    }
    // band widths are non-decreasing (the (1-(1-λ)^2t) ramp)
    val widths = rows.map(r => r.getDouble(3) - r.getDouble(4))
    assert(widths.sliding(2).forall {
      case Array(a, b) => b >= a - 1e-9
      case _ => true
    }, "EWMA band did not widen monotonically")
    // alarms replay from the emitted columns
    rows.foreach { r =>
      assert(r.getBoolean(5) ==
        (r.getDouble(2) > r.getDouble(3) ||
          r.getDouble(2) < r.getDouble(4)))
    }
    // planted persistent shift: baseline 20 days around 100, then a
    // +3σ-grade level move — the chart MUST alarm in the tail and
    // MUST stay quiet in the baseline
    val ts = (i: Int) => new java.sql.Timestamp(86400000L * i)
    val baseVals = Array[Long](98, 103, 101, 96, 100, 104, 99, 102,
      97, 101, 100, 95, 105, 99, 103, 98, 100, 102, 96, 101)
    val shifted = baseVals ++ Array.fill(10)(112L)
    val planted = graft.operators.Inference.ewmaChart(
      shifted.zipWithIndex.map { case (v, i) => (ts(i), v) })
    assert(!planted.take(20).exists(_._6),
      "baseline alarmed — limits mis-estimated")
    assert(planted.drop(20).exists(_._6),
      "planted +4σ shift did not alarm")
  }

  test("seasonal decompose: identity x = trend + seasonal + residual " +
      "holds on interior hours and edges carry null trend") {
    val rows = Inference.seasonalDecomposeQuery(spark, sfDir).collect()
    assert(rows.length >= 48)
    // first/last hours lack a full ±12 window
    assert(rows.head.isNullAt(2) && rows.last.isNullAt(2))
    var interior = 0
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        interior += 1
        val x = r.getLong(1).toDouble
        val recon = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
        // each component is individually rounded at 1e-10; the
        // identity re-assembles to x within that rounding budget
        assert(math.abs(recon - x) < 1e-6,
          s"${r.getTimestamp(0)}: $recon != $x")
      } else {
        assert(r.isNullAt(4), "residual must be null where trend is")
      }
    }
    assert(interior > 0)
    // 24 distinct seasonal values, one per clock hour
    assert(rows.filterNot(_.isNullAt(3)).map(_.getDouble(3)).distinct
      .length <= 24)
  }

  test("fleiss kappa: category sums conserve n*R, kappa replays from " +
      "the aggregate sums as an exact rational, constructed extremes") {
    // columns: n, n_raters, n_cats, c_0, c_1, c_2, s2, pbar_micro,
    //          pe_micro, kappa_micro
    val r = Inference.fleissKappaQuery(spark, sfDir).collect()(0)
    val n = r.getLong(0)
    val (raters, cats) = (r.getLong(1), r.getLong(2))
    assert(raters == 3 && cats == 3)
    assert(n == Tables.load(spark, sfDir, "documents").count())
    val cs = Seq(r.getLong(3), r.getLong(4), r.getLong(5))
    assert(cs.sum == n * raters, "per-category totals must conserve nR")
    val s2 = r.getLong(6)
    // n_ij in [0,R] with Σ_j n_ij = R bounds S2 between nR (all
    // spread) and nR² (all raters in one cat per item)
    assert(s2 >= n * raters && s2 <= n * raters * raters)
    val (nr, tDen) = (BigInt(n) * 3, BigInt(n) * 6)
    val mDen = nr * nr
    val sumC2 = cs.map(c => BigInt(c) * BigInt(c)).sum
    val pbarNum = BigInt(s2) - nr
    def micro(num: BigInt, den: BigInt): BigInt =
      (num * 1000000 + 2000000 * den) / den - 2000000
    assert(BigInt(r.getLong(7)) == micro(pbarNum, tDen))
    assert(BigInt(r.getLong(8)) == micro(sumC2, mDen))
    val knum = pbarNum * mDen - tDen * sumC2
    val kden = tDen * (mDen - sumC2)
    assert(kden > 0)
    assert(BigInt(r.getLong(9)) == micro(knum, kden))
    // three length proxies of the same document genuinely agree:
    // kappa must be positive and well clear of chance
    assert(r.getLong(9) > 200000L,
      s"correlated raters should agree: kappa ${r.getLong(9)}")
    // constructed extremes through the explicit-votes entry point
    import SparkSpec.spark.implicits._
    def k(rows: Seq[(Long, Long, Long)], cats: Int): Long =
      Inference.fleissKappaOver(rows.toDF("r1", "r2", "r3"), cats)
        .collect()(0).getLong(6 + cats)
    // unanimous on every item -> kappa 1 exactly
    assert(k(Seq((0L, 0L, 0L), (1L, 1L, 1L), (2L, 2L, 2L)), 3)
      == 1000000L)
    // every item maximally split across 3 cats -> P̄ = 0, kappa < 0
    assert(k(Seq((0L, 1L, 2L), (1L, 2L, 0L), (2L, 0L, 1L)), 3) < 0L)
  }

  test("kendall: pair classification partitions n0, statistics " +
      "replay as exact rationals, gamma bounds tau-a") {
    // columns: n_days, n_pairs, conc, disc, tie_x, tie_y, tie_xy,
    //          tau_a_micro, gamma_micro
    val r = Inference.kendallQuery(spark, sfDir).collect()(0)
    val nDays = r.getLong(0)
    val n0 = r.getLong(1)
    assert(n0 == nDays * (nDays - 1) / 2, "pair count must be C(n,2)")
    val (c, d) = (r.getLong(2), r.getLong(3))
    val ties = r.getLong(4) + r.getLong(5) + r.getLong(6)
    assert(c + d + ties == n0, "classification must partition pairs")
    def micro(num: BigInt, den: BigInt): BigInt =
      (num * 1000000 + 2000000 * den) / den - 2000000
    assert(BigInt(r.getLong(7)) == micro(BigInt(c - d), BigInt(n0)))
    assert(!r.isNullAt(8))
    assert(BigInt(r.getLong(8)) == micro(BigInt(c - d), BigInt(c + d)))
    // |gamma| >= |tau-a| always (same numerator, smaller denominator)
    assert(math.abs(r.getLong(8)) >= math.abs(r.getLong(7)))
    assert(math.abs(r.getLong(7)) <= 1000000L &&
      math.abs(r.getLong(8)) <= 1000000L)
    // volume and reach of the same stream co-move: association must
    // be decisively positive
    assert(r.getLong(7) > 0L, s"tau-a ${r.getLong(7)} not positive")
  }

  test("krippendorff: marginals conserve ratings, alpha replays as " +
      "an exact rational, abstention really drops units, extremes") {
    // columns: n_units, n_ratings, n_0, n_1, n_2, a_scaled,
    //          alpha_micro
    val r = Inference.krippendorffQuery(spark, sfDir).collect()(0)
    val nUnits = r.getLong(0)
    val nRatings = r.getLong(1)
    val docs = Tables.load(spark, sfDir, "documents").count()
    // abstention bands must actually bite: fewer ratings than 3n,
    // and possibly fewer units than documents
    assert(nUnits <= docs && nRatings < 3 * docs)
    assert(nRatings >= 2 * nUnits && nRatings <= 3 * nUnits)
    assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == nRatings)
    val a = r.getLong(5)
    val b = BigInt(nRatings) * nRatings -
      Seq(2, 3, 4).map(i => BigInt(r.getLong(i)) * r.getLong(i)).sum
    val num = BigInt(nRatings - 1) * a
    val den = b * 2
    val want = ((den - num) * 1000000 + 2000000 * den) / den - 2000000
    assert(BigInt(r.getLong(6)) == want)
    // correlated raters agree beyond chance
    assert(r.getLong(6) > 200000L,
      s"alpha ${r.getLong(6)} not clearly positive")
    // constructed frames through the explicit-votes entry point;
    // java.lang.Long so the DF columns are nullable
    import SparkSpec.spark.implicits._
    def jl(x: Int): java.lang.Long = java.lang.Long.valueOf(x.toLong)
    val nl: java.lang.Long = null
    def alpha(rows: Seq[(java.lang.Long, java.lang.Long,
        java.lang.Long)]): Row =
      Inference.krippendorffOver(rows.toDF("r1", "r2", "r3"))
        .collect()(0)
    // unanimous everywhere (with one abstention) -> alpha 1
    val perfect = alpha(Seq((jl(0), jl(0), jl(0)),
      (jl(1), jl(1), nl), (jl(2), jl(2), jl(2))))
    assert(perfect.getLong(6) == 1000000L)
    assert(perfect.getLong(1) == 8L) // the null really dropped out
    // a unit with a single vote carries no pairs and must vanish
    val dropped = alpha(Seq((jl(0), nl, nl), (jl(1), jl(1), jl(1))))
    assert(dropped.getLong(0) == 1L && dropped.getLong(1) == 3L)
  }
}
