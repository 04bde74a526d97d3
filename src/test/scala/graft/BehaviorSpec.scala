package graft

import graft.operators.{Behavior, Retrieval}
import org.apache.spark.sql.functions._

/** Behavioral-analytics invariants: Markov rows are probability
  * distributions with correctly-bounded entropy, decay weights respect
  * the half-life envelope, and the A/B readout replays from its own
  * counts. */
class BehaviorSpec extends SparkSpec {

  test("markov: rows are probability distributions, bigram mass " +
      "matches, entropy bounded by ln(k)") {
    val rows = Behavior.markovQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per prev_type: Σ p ≈ 1 (each p rounded to 6 dp, ≤ k terms)
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val mass = rs.map(_.getDouble(3)).sum
      assert(math.abs(mass - 1.0) < rs.length * 1e-6,
        s"$prev: transition mass $mass != 1")
      // entropy: 0 ≤ H ≤ ln(#successors), one value per row group
      // (each −p·ln p term quantizes at 6 dp, so the bound carries
      // a per-term 5e-7 slack)
      // entropy transports as a digit string (r13 DECIMAL-in-hash
      // discipline, PROBES.md); parse back for the bound check
      val hs = rs.map(r => BigDecimal(r.getString(4)).doubleValue)
        .distinct
      assert(hs.length == 1)
      assert(hs.head >= -rs.length * 1e-6 &&
        hs.head <= math.log(rs.length) + rs.length * 1e-6,
        s"$prev: entropy ${hs.head} outside [0, ln(${rs.length})]")
    }
    // total bigram count = total events − distinct users (each user's
    // first event opens no transition)
    val ev = Tables.load(spark, sfDir, "events")
    val expected = ev.count() -
      ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("decay agg: weights live in the half-life envelope and the " +
      "count/weight ordering holds") {
    val rows = Behavior.decayAggQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sfDir, "events")
    val Array(minMs, maxMs) = ev
      .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val wMin = math.pow(2.0, -((maxMs - minMs) / 3.6e6) / 168.0)
    rows.foreach { r =>
      val n = r.getLong(1)
      // decayed_n transports as a digit string (r13 DECIMAL-in-hash
      // discipline, PROBES.md); parse it back for the envelope check
      val dn = BigDecimal(r.getString(2)).doubleValue
      // every weight ∈ [2^(−maxAge/hl), 1] ⇒ n·wMin ≤ decayed_n ≤ n,
      // with n·5e-7 slack for the per-weight 6 dp quantization
      assert(dn <= n + n * 1e-6,
        s"${r.getString(0)}: decayed_n $dn > n $n")
      assert(dn >= n * wMin - n * 1e-6,
        s"${r.getString(0)}: decayed_n $dn below envelope ${n * wMin}")
    }
    // determinism across repartition-insensitive DECIMAL summation
    val again = Behavior.decayAggQuery(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("user history: window bound holds, digest replays by hand " +
      "for a full-history user") {
    val rows = Behavior.userHistoryQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= 32L)
      assert(r.getLong(2) <= r.getLong(1))
      // a user with history shorter than the window keeps all of it
      if (r.getLong(1) <= 32L) assert(r.getLong(2) == r.getLong(1))
    }
    // hand-replay one user's digest from the raw events
    val u = rows.head.getLong(0)
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("user_id") === u)
      .select(col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1),
        r.getString(2)))
      .sortBy(t => (-t._1, -t._2)).take(32)
      .sortBy(t => (t._1, t._2)).map(_._3).mkString(",")
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(ev.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.head.getString(3) == expect,
      s"digest mismatch for user $u")
  }

  test("hard negatives: self excluded, ranks contiguous, scores " +
      "non-increasing, every query present") {
    val rows = Retrieval.hardNegativesQuery(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ==
        (1L to sorted.length).toSeq)
      assert(sorted.forall(_.getLong(2) != q), s"query $q in its own negatives")
      val scores = sorted.map(r => BigDecimal(r.getString(3)))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q: scores not non-increasing")
      // one pos_score per query, parseable
      assert(rs.map(_.getString(4)).distinct.length == 1)
      BigDecimal(rs.head.getString(4))
    }
  }

  test("ab test: readout replays from its own counts and the " +
      "significance call matches |z|") {
    val r = Behavior.abTestQuery(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    val (na, xa, nb, xb) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    assert(na > 0 && nb > 0)
    // the conversion split must be non-degenerate (the reason the
    // metric is "repeat purchaser", not "any purchase")
    assert(xa > 0 && xa < na, s"cohort A degenerate: $xa/$na")
    assert(xb > 0 && xb < nb, s"cohort B degenerate: $xb/$nb")
    val pa = xa.toDouble / na
    val pb = xb.toDouble / nb
    val pp = (xa + xb).toDouble / (na + nb)
    val se = math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    def r10(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(4) - r10(pa)) < 1e-12)
    assert(math.abs(row.getDouble(5) - r10(pb)) < 1e-12)
    assert(math.abs(row.getDouble(7) - r10(se)) < 1e-12)
    val z = row.getDouble(8)
    assert(math.abs(z - r10((pb - pa) / se)) < 1e-9)
    assert(row.getBoolean(9) == (math.abs(z) >= 1.96))
  }

  test("itemsets: supports obey containment bounds, lift replays, " +
      "baskets non-degenerate") {
    val rows = Behavior.itemsetsQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (supA, supB, supAB, n) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      // pair support can't exceed either item's, items can't exceed N
      assert(supAB <= math.min(supA, supB))
      assert(supA <= n && supB <= n)
      assert(supAB >= 1)
      def r10(x: Double) = BigDecimal(x)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(9) ==
        r10(supAB.toDouble * n / (supA.toDouble * supB)))
      // the threshold must bite: some basket lacks some item
      assert(supA < n || supB < n,
        "every item in every basket — threshold degenerate")
    }
  }

  test("item cf: cos² micro in (0, 1e6], symmetric pair count, dot " +
      "positive (Cauchy-Schwarz)") {
    // columns: item_a, item_b, co_users, dot_str, cos2_micro
    val rows = Behavior.itemCfQuery(spark, sfDir).collect()
    // 5 event types -> C(5,2) pairs
    assert(rows.length == 10)
    rows.foreach { r =>
      val cos2 = r.getLong(4)
      assert(cos2 > 0L && cos2 <= 1000000L,
        s"${r.getString(0)}/${r.getString(1)}: cos2_micro $cos2")
      assert(r.getLong(2) >= 1)
      assert(BigInt(r.getString(3)) > 0)
    }
  }

  test("event paths: trigram mass bounded by stream length, shares " +
      "replay, total order on (n desc, path)") {
    val rows = Behavior.eventPathsQuery(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ev = Tables.load(spark, sfDir, "events")
    val users = ev.select(col("user_id")).distinct().count()
    val total = ev.count() - 2 * users // each user loses 2 trigrams
    rows.foreach { r =>
      assert(r.getString(0).split(">").length == 3)
      assert(r.getLong(1) >= 1 && r.getLong(1) <= total)
    }
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted)
    // top-20 shares re-derive from counts / full trigram mass
    def r10(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      assert(r.getDouble(2) == r10(r.getLong(1).toDouble / total),
        s"${r.getString(0)}: share mismatch")
    }
  }

  test("user growth: new users sum to the audience and the " +
      "cumulative curve is the running total") {
    val rows = Behavior.userGrowthQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val users = Tables.load(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(2) == cum, s"${r.getTimestamp(0)}: cum broken")
    }
    assert(rows.last.getLong(2) == users)
  }

  test("conversion lag: every signup user present, lags nonneg, " +
      "converted iff lag defined, and a hand-checked user replays") {
    val rows = Behavior.conversionLagQuery(spark, sfDir).collect()
    val ev = Tables.load(spark, sfDir, "events")
    val signupUsers = ev.filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(rows.length == signupUsers)
    rows.foreach { r =>
      val lag = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(r.getBoolean(3) == lag.isDefined)
      lag.foreach(l => assert(l >= 0, s"user ${r.getLong(0)}: lag $l"))
    }
    // independent replay for the first converting user
    rows.find(_.getBoolean(3)).foreach { r =>
      val uid = r.getLong(0)
      val es = ev.filter(col("user_id") === uid)
        .select(col("event_type"), unix_millis(col("ts")).as("ms"))
        .collect().map(x => (x.getString(0), x.getLong(1)))
      val s0 = es.filter(_._1 == "signup").map(_._2).min
      val p0 = es.filter(e => e._1 == "purchase" && e._2 >= s0)
        .map(_._2).min
      assert(r.getLong(2) == (p0 - s0) / 3600000L)
    }
  }

  test("stickiness: DAU <= MAU <= audience, ratio in (0,1], and a " +
      "hand-recomputed window matches") {
    val rows = Behavior.stickinessQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sfDir, "events")
    val userDays = ev.select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val audience = userDays.map(_._1).distinct.length
    rows.foreach { r =>
      val (dau, mau, st) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dau >= 1 && dau <= mau, s"${r.getTimestamp(0)}: $dau/$mau")
      assert(mau <= audience)
      assert(st > 0.0 && st <= 1.0)
    }
    // brute-force the last day's MAU (trailing 30 incl. today)
    val lastDay = rows.last.getTimestamp(0).getTime / 86400000L
    val wantMau = userDays
      .filter { case (_, d) => d > lastDay - 30 && d <= lastDay }
      .map(_._1).distinct.length
    assert(rows.last.getLong(2) == wantMau,
      s"last-day MAU ${rows.last.getLong(2)} != brute $wantMau")
  }

  test("mcnemar: cells partition the users, chi2 replays from the " +
      "discordant counts, direction consistent, brute-force agrees") {
    // columns: n_users, a_both, b_lost, c_gained, d_neither,
    //          chi2_micro, direction
    val r = Behavior.mcnemarQuery(spark, sfDir).collect()(0)
    val n = r.getLong(0)
    val (a, b, c, d) = (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
    assert(a + b + c + d == n, "cells must partition the users")
    assert(b + c > 0, "premise: some discordant users at every sf")
    val want = BigInt(b - c) * (b - c) * 1000000 / (b + c)
    assert(BigInt(r.getLong(5)) == want)
    assert(r.getString(6) ==
      (if (b == c) "none" else if (c > b) "up" else "down"))
    // brute-force the 2x2 from raw events with the same midpoint rule
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts)").as("ms"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max + 1) / 2
    val byUser = ev.groupBy(_._1).view.mapValues { es =>
      (es.count(e => e._2 == "purchase" && e._3 < mid) >= 7,
        es.count(e => e._2 == "purchase" && e._3 >= mid) >= 7)
    }.toMap
    assert(n == byUser.size)
    assert(b == byUser.values.count(p => p._1 && !p._2))
    assert(c == byUser.values.count(p => !p._1 && p._2))
  }
}
