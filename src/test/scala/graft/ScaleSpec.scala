package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("bucketed join elides the shuffle (no Exchange above the scans)") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, orders, li, "o_orderkey", 8,
        "b_orders", "b_lineitem")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // correctness: equal to the plain join count
      assert(joined.count() == orders.join(li, "o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join returns exactly the unsalted result") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("k"), col("l_quantity"))
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("k"), col("p_name"))
    val plain = li.join(part, "k").count()
    val salted = Scale.saltedJoin(li, part, "k", salt = 4).count()
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("approx distinct lands within 3% of exact (bound flag true, " +
      "exact column really exact)") {
    val got = Scale.approxDistinctQuery(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(got(k)._1 == ex, s"$k: exact_orders ${got(k)._1} vs $ex")
      assert(got(k)._2, s"$k: HLL estimate outside the 3·rsd bound")
    }
  }

  test("asOfJoin: inclusive boundary, latest-prior match, no-prior drop") {
    import SparkSpec.spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),  // after both rights
      (2L, 1L, ts("2024-01-01 08:00:00")),  // exactly at right t (incl.)
      (3L, 1L, ts("2024-01-01 06:00:00")),  // before any right -> drop
      (4L, 2L, ts("2024-01-01 10:00:00"))   // other key
    ).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), "a"),
      (1L, ts("2024-01-01 09:00:00"), "b"),
      (2L, ts("2024-01-01 07:00:00"), "c")
    ).toDF("rk", "rt", "payload")
    val got = Scale.asOfJoin(left, right, "k", "t", "rk", "rt",
        Seq("payload"))
      .select(col("id"), col("_match.payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 2L -> "a", 4L -> "c"))
  }

  test("top-k aggregate matches the window formulation, without a sort") {
    val agg = Scale.topKAggQuery(spark, sfDir, k = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val win = Tables.load(spark, sfDir, "lineitem")
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("l_returnflag"), col("rank"),
        round(col("l_extendedprice"), 2).as("price"), col("l_orderkey"))
    assert(agg.collect().map(_.toSeq).toSet ==
      win.collect().map(_.toSeq).toSet)
    // the aggregate path must be a partial-aggregated ObjectHashAggregate
    // with no per-group sort of the input
    val plan = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(call_function("graft_topk", col("l_extendedprice"),
        col("l_orderkey"), lit(3)).as("tk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Sort "), s"no sort expected:\n$plan")
  }

  test("approx percentiles: exact columns match the exact gate and " +
      "every GK estimate sits inside its rank-epsilon band") {
    val exact = graft.operators.Relational.percentileQuery(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toMap
    val approx = Scale.approxPercentileQuery(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)), r.getBoolean(6))).toMap
    assert(approx.keySet == exact.keySet)
    for ((g, (ps, ok)) <- approx) {
      assert(ok, s"group $g: a GK estimate left its q±0.002 band")
      ps.zip(exact(g)).foreach { case (a, e) =>
        assert(a == e, s"group $g: exact column $a vs exact gate $e")
      }
    }
  }

  test("session windows split on gaps > threshold only") {
    import SparkSpec.spark.implicits._
    val res = Scale.sessionWindowQuery(spark, sfDir, gapMinutes = 30)
    // events per user must be conserved across sessions
    val total = res.agg(sum(col("n_events"))).as[Long].head()
    assert(total == Tables.load(spark, sfDir, "events").count())
    // session numbering starts at 1 and is dense per user
    val perUser = res.select(col("user_id"), col("session_no"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq)
    perUser.foreach { case (u, ss) =>
      assert(ss == (1L to ss.size), s"user $u sessions not dense: $ss")
    }
  }

  test("range join: binned plan is a hash equi-join (no nested loop), " +
      "and matches the naive inequality join exactly") {
    import org.apache.spark.sql.functions._
    val binned = graft.operators.Scale.rangeJoinQuery(spark, sfDir)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a product plan:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"),
      s"no join in plan:\n$plan")
    // semantics: identical to the naive inequality join
    val ev = Tables.load(spark, sfDir, "events")
    val w = ev.filter(col("event_type") === "error" &&
        col("event_id") % 20 === 0)
      .select(col("event_id").as("incident_id"),
        (col("ts") - expr("INTERVAL 15 MINUTES")).as("lo"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("hi"))
    val naive = ev.join(w, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("incident_id"))
      .collect().map(_.toString)
    assert(binned.collect().map(_.toString).toSeq == naive.toSeq)
  }

  test("funnel: stage timestamps strictly ordered, stage counts " +
      "monotone non-increasing; cohort retention bounded by cohort") {
    import org.apache.spark.sql.functions._
    val f = graft.operators.Relational.funnelQuery(spark, sfDir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val (tv, tc, tp) = (r.getTimestamp(2), r.getTimestamp(3),
        r.getTimestamp(4))
      if (tc != null) assert(tv != null && tc.after(tv),
        s"user ${r.get(0)}: click not after view")
      if (tp != null) assert(tc != null && tp.after(tc),
        s"user ${r.get(0)}: purchase not after click")
      val stage = r.getInt(1)
      assert(stage == Seq(tv, tc, tp).count(_ != null))
    }
    val byStage = (0 to 3).map(k => f.count(_.getInt(1) >= k))
    assert(byStage.zip(byStage.tail).forall { case (a, b) => a >= b })
    val c = graft.operators.Relational.cohortQuery(spark, sfDir).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1),
        s"cohort ${r.get(0)}: retained exceeds cohort size")
    }
    // every user appears in exactly one cohort
    assert(c.map(_.getLong(1)).sum == f.length)
  }

  test("count-min sketch: estimate replays exactly from true counts, " +
      "never under-counts, and is repartition-invariant") {
    import org.apache.spark.sql.functions._
    val terms = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
    val sk = terms.agg(call_function("graft_cms", col("term")))
      .collect().head.getSeq[Long](0).toArray
    val skRepart = terms.repartition(7)
      .agg(call_function("graft_cms", col("term")))
      .collect().head.getSeq[Long](0).toArray
    // mergeable aggregate: partition layout must not change the sketch
    assert(sk.sameElements(skRepart), "sketch depends on partitioning")
    val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // reference sketch replayed from the exact counts
    val md = java.security.MessageDigest.getInstance("MD5")
    val ref = new Array[Long](graft.functions.CmsAgg.Depth *
      graft.functions.CmsAgg.Width)
    exact.foreach { case (t, n) =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      (0 until graft.functions.CmsAgg.Depth).foreach { j =>
        ref(j * graft.functions.CmsAgg.Width + (d(j) & 0xFF)) += n
      }
    }
    assert(sk.sameElements(ref), "sketch diverges from replay")
    // one-sided guarantee over the WHOLE vocabulary
    exact.foreach { case (t, n) =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      val est = (0 until graft.functions.CmsAgg.Depth).map { j =>
        sk(j * graft.functions.CmsAgg.Width + (d(j) & 0xFF))
      }.min
      assert(est >= n, s"'$t': est $est under-counts true $n")
    }
  }

  test("bloom sketch: zero false negatives, repartition-invariant, " +
      "and the keep set equals plain incremental dedup") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(col("text")).as("_digest")).distinct()
    val bloom = corpus
      .agg(call_function("graft_bloom", col("_digest")))
      .collect().head.getAs[Array[Byte]](0)
    val bloomRepart = corpus.repartition(7)
      .agg(call_function("graft_bloom", col("_digest")))
      .collect().head.getAs[Array[Byte]](0)
    assert(bloom.sameElements(bloomRepart), "bloom depends on partitioning")
    // no false negatives: every corpus digest must probe positive
    val members = corpus.collect().map(_.getString(0))
    members.foreach { d =>
      assert(graft.functions.BloomAgg.mightJava(bloom,
        org.apache.spark.unsafe.types.UTF8String.fromString(d)),
        s"false negative for member $d")
    }
    // probe result replays from the md5-slice positions (byte-layout
    // check of mightJava against the update path)
    val probe = org.apache.spark.unsafe.types.UTF8String
      .fromString("definitely-not-in-corpus")
    val ref = new Array[Long](graft.functions.BloomAgg.Words)
    members.foreach(d => graft.functions.BloomAgg.add(ref,
      org.apache.spark.unsafe.types.UTF8String.fromString(d)))
    val ps = graft.functions.BloomAgg.positions(probe)
    val expect = ps.forall(p => (ref(p >>> 6) & (1L << (p & 63))) != 0L)
    assert(graft.functions.BloomAgg.mightJava(bloom, probe) == expect)
    // exactness: bloom path keeps exactly what plain incremental keeps
    val plain = graft.operators.Dedup.incrementalQuery(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val viaBloom = graft.operators.Dedup
      .bloomIncrementalQuery(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaBloom == plain, "bloom prefilter changed the keep set")
  }

  test("kmv sketch: estimates within the 3/sqrt(k) KMV bound, " +
      "repartition-invariant, exact below saturation") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Scale.kmvSketchQuery(spark, sfDir)
      .collect().head
    val pairs = Seq(
      (r.getLong(0), r.getDouble(1)), (r.getLong(2), r.getDouble(3)),
      (r.getLong(4), r.getDouble(5)))
    pairs.foreach { case (exact, est) =>
      if (exact <= 256) assert(est == exact.toDouble,
        s"below saturation est must be exact: $est vs $exact")
      else assert(math.abs(est / exact - 1.0) <= 3.0 / math.sqrt(256.0),
        s"est $est outside KMV bound of exact $exact")
    }
    // intersection: looser bound (variance ~ 1/sqrt(rho)), sanity only
    val (exI, estI) = (r.getLong(6), r.getDouble(7))
    if (exI > 256)
      assert(math.abs(estI / exI - 1.0) <= 0.5,
        s"intersection est $estI wildly off exact $exI")
    // mergeability: sketch independent of partitioning
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").cast("string").as("key"))
    val s1 = li.agg(call_function("graft_kmv", col("key"), lit(256)))
      .collect().head.getSeq[Long](0)
    val s2 = li.repartition(11)
      .agg(call_function("graft_kmv", col("key"), lit(256)))
      .collect().head.getSeq[Long](0)
    assert(s1 == s2, "KMV sketch depends on partitioning")
    assert(s1 == s1.sorted && s1.toSet.size == s1.size,
      "sketch must be sorted distinct hashes")
  }

  test("heavy hitters query: over_n non-negative, probes are the " +
      "exact top-k") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Scale.heavyHittersQuery(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("over_n") >= 0L)
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n"))
    }
    val counts = rows.map(_.getAs[Long]("exact_n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("bloom-filtered join returns exactly the plain join") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val urgent = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    val bloomed = Scale.bloomFilteredJoin(li, urgent, "l_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"))
      .collect().map(_.toString).sorted.toSeq
    val plain = li.join(urgent, Seq("l_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"))
      .collect().map(_.toString).sorted.toSeq
    assert(bloomed == plain,
      s"bloom prefilter changed the join: ${bloomed.length} vs ${plain.length} rows")
    // the pre-filter must run BEFORE the join's exchange: the plan
    // carries a bloom-membership Filter, and no broadcast-hash-join
    // shadows the merge-join shape the at-scale plan would have
    val plan = Scale.bloomFilteredJoin(li, urgent, "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might"),
      "bloom membership filter missing from physical plan")
    assert(plan.contains("SortMergeJoin"),
      s"expected hinted merge join in:\n$plan")
  }

  test("interpFill: gaps take the time-weighted blend, observed pass") {
    import SparkSpec.spark.implicits._
    import java.sql.Timestamp
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val obs = Seq(("a", t(0), 10.0), ("a", t(3), 40.0), ("a", t(4), 0.0))
      .toDF("g", "ts", "v")
    val out = Scale.interpFill(obs, "g", "ts", "1 hour", "v")
      .orderBy(col("ts")).select(col("v_interp")).as[Double].collect()
    assert(out.toSeq == Seq(10.0, 20.0, 30.0, 40.0, 0.0))
  }

  test("compactionPlan: oversize parts isolate, small parts coalesce") {
    import SparkSpec.spark.implicits._
    val parts = Seq(
      // group g1: one oversize part + four small ones, target 100
      ("g1", 1L, 250L), ("g1", 2L, 40L), ("g1", 3L, 40L),
      ("g1", 4L, 30L), ("g1", 5L, 10L),
      // group g2: exactly filling parts never straddle wrongly
      ("g2", 1L, 60L), ("g2", 2L, 60L)
    ).toDF("grp", "part_id", "bytes")
    val out = Scale.compactionPlan(parts, Seq("grp"), "part_id",
      "bytes", targetBytes = 100L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // descending fill: 250 alone in bin 0; 40+40+30 spill as prefix
    // crosses 100; nothing lands inside the oversize part's bin
    assert(out(("g1", 1L))._1 == 0L)
    assert(out.filter(_._1._1 == "g1").values.count(_._1 == 0L) == 1,
      "oversize part must own its bin")
    // every part of a bin agrees on the rollup
    val byBin = out.groupBy { case ((g, _), (bin, _, _)) => (g, bin) }
    byBin.foreach { case ((g, bin), m) =>
      val (_, parts0, bytes0) = m.values.head
      assert(m.values.forall(v => v._2 == parts0 && v._3 == bytes0))
      assert(m.size.toLong == parts0)
    }
    // no multi-part bin exceeds target by more than its last part
    // (sorted-fill guarantee: prefix-before < target for every member)
    val g1bins = out.filter(_._1._1 == "g1").values.groupBy(_._1)
    g1bins.values.foreach { vs =>
      if (vs.size > 1) assert(vs.map(_._3).head <= 100L + 40L)
    }
  }

  test("compactionExec: both paths fire, one file per bin, content " +
      "conserved byte-for-byte through the rewrite") {
    val out = Scale.compactionExecQuery(spark, sfDir).collect()
    // deterministic plan: 4 bins at every SF (synthetic sizes)
    assert(out.length == 4, s"expected 4 bins, got ${out.length}")
    val modes = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    // bins {11,10,9} zlib / {4,3,2} {1,0} snappy -> stripe-append;
    // {8,7,6,5} mixed-codec -> rewrite
    assert(modes == Map(0L -> "append", 1L -> "rewrite",
      2L -> "append", 3L -> "append"))
    // the executor's file count matches the plan: one output per bin
    assert(out.forall(_.getLong(3) == 1L))
    // conservation: per-bin read-back rows sum to the whole table
    val orders = Tables.load(spark, sfDir, "orders")
    assert(out.map(_.getLong(4)).sum == orders.count())
    val wholeSum = orders
      .agg(sum(col("o_orderkey")), sum(col("o_custkey"))).collect()(0)
    assert(out.map(_.getLong(5)).sum == wholeSum.getLong(0))
    assert(out.map(_.getLong(6)).sum == wholeSum.getLong(1))
  }

  test("skyline: prune+sweep equals brute-force dominance on an " +
      "adversarial tie/duplicate corpus, across bucket boundaries") {
    import SparkSpec.spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // Hand corpus crossing three month buckets with every edge family:
    //  - identical twins (1, 2): tie on both dims -> BOTH skyline
    //    unless a third point dominates them (none does: 900 is the
    //    global max price, in the earliest month)
    //  - same-date ties (3, 4): equal price+date -> both live; (5)
    //    same date lower price -> dominated
    //  - cross-bucket kill: (6) high price early month dominated by
    //    NOTHING later (late months all cheaper), survives; (7) early
    //    cheap -> dominated by (8) later-and-pricier
    //  - (9): latest date, lowest price -> skyline (nothing later,
    //    equal-date nothing higher)
    val rows = Seq(
      (1L, 900.0, ts("2024-01-05")), (2L, 900.0, ts("2024-01-05")),
      (3L, 500.0, ts("2024-02-10")), (4L, 500.0, ts("2024-02-10")),
      (5L, 400.0, ts("2024-02-10")),
      (6L, 880.0, ts("2024-01-20")),
      (7L, 300.0, ts("2024-01-25")), (8L, 450.0, ts("2024-03-01")),
      (9L, 100.0, ts("2024-03-15")))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val got = operators.Relational.skylineOf(rows).collect()
      .map(_.getLong(0)).toSet
    // brute force the dominance definition
    val pts = rows.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getTimestamp(2).getTime))
    val brute = pts.filter { case (_, p, d) =>
      !pts.exists { case (_, qp, qd) =>
        qp >= p && qd >= d && (qp > p || qd > d) }
    }.map(_._1).toSet
    assert(got == brute, s"engine $got != brute $brute")
    // the named expectations, so the trace itself is pinned:
    // dead are exactly 5 (same-date lower price, killed by 3/4) and
    // 7 (killed cross-bucket by 8: later AND pricier); 6 survives —
    // 1/2 are pricier but STRICTLY EARLIER, which is not dominance
    assert(got == Set(1L, 2L, 3L, 4L, 6L, 8L, 9L), s"got $got")
  }

  test("cusum: closed form equals the textbook recursion on an " +
      "injected mean-shift series, and only the shift alarms") {
    import SparkSpec.spark.implicits._
    import java.sql.Timestamp
    def day(i: Int) = Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")
    // 20 quiet days around 100 then a persistent +1.5σ-ish shift:
    // no single day is a spike, but the accumulated drift must alarm
    val quiet = (1 to 20).map(i => ("a", day(i), 100L + (i % 3) - 1L))
    val shifted = (21 to 28).map(i => ("a", day(i), 104L))
    val series = (quiet ++ shifted).toDF("event_type", "day", "n")
    val rows = operators.Scale.cusumOver(series).collect()
      .sortBy(_.getTimestamp(1).getTime)
    // replay the textbook recursion S+_t = max(0, S+_{t-1} + z_t - k)
    // from the SAME integer micro z values the engine emits
    // (columns: event_type, day, n, zr_micro, s_plus, alarm)
    var s = 0L
    rows.foreach { r =>
      val z = r.getLong(3)
      s = math.max(0L, s + z - 500000L)
      assert(r.getLong(4) == s,
        s"day ${r.getTimestamp(1)}: closed form ${r.getLong(4)} " +
          s"!= recursion $s")
      assert(r.getBoolean(5) == (s > 4000000L))
    }
    // the alarm fires somewhere in the shifted tail, never in quiet
    val alarms = rows.filter(_.getBoolean(5))
      .map(_.getTimestamp(1).toLocalDateTime.getDayOfMonth)
    assert(alarms.nonEmpty && alarms.min >= 21,
      s"alarm days: ${alarms.toSeq}")
  }

  test("join cardest: sample consistency and estimate identities") {
    val r = graft.operators.Scale.joinCardEstQuery(spark, sfDir)
      .collect()(0)
    val (na, nb, sa, sb) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    val (js, jest, jx) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert(sa > 0 && sa < na, s"sample_a $sa of $na")
    assert(sb > 0 && sb < nb, s"sample_b $sb of $nb")
    assert(jest == js * 16)
    // correlated sampling keeps whole keys: the sampled join can't
    // exceed the exact join, and scaling is in the right ballpark
    assert(js <= jx)
    assert(jest > 0, "sample missed every joining key")
    val rel = math.abs(jest - jx).toDouble / jx
    assert(rel < 0.5, s"relative error $rel implausibly large for p=1/16")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(7) == r6(rel))
  }

  test("bitmap audience: popcounts equal exact distincts, set " +
      "algebra identities hold, rollup total matches") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Scale.bitmapAudienceQuery(spark, sfDir)
      .collect()
    assert(rows.length == 10) // C(5,2) type pairs
    val ev = Tables.load(spark, sfDir, "events")
    val exact = ev.select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalUsers = ev.select(col("user_id")).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(2) == exact(r.getString(0)))
      assert(r.getLong(3) == exact(r.getString(1)))
      val (ua, ub, inter, uni) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(inter <= math.min(ua, ub))
      assert(uni == ua + ub - inter)
      assert(uni <= totalUsers)
      assert(r.getLong(7) == totalUsers,
        s"bitmap rollup ${r.getLong(7)} != exact $totalUsers")
    }
  }

  test("layout advisor: time-clustering wins for time-range skipping") {
    val rows = graft.operators.Scale.layoutAdvisorQuery(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(rows.keySet == Set("by_hash", "by_user", "by_ts"))
    rows.values.foreach { case (nf, _, frac) =>
      assert(nf == 16)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    val (_, tsOverlap, tsFrac) = rows("by_ts")
    // a time-sorted layout tiles the axis: zero overlapping file
    // ranges, each file ≈ 1/16 of the span
    assert(tsOverlap == 0, s"by_ts overlap $tsOverlap")
    assert(tsFrac < 0.10, s"by_ts span fraction $tsFrac")
    // the unclustered layouts are near-worst-case on both metrics
    for (l <- Seq("by_hash", "by_user")) {
      val (_, ov, frac) = rows(l)
      assert(ov > 100, s"$l overlap $ov suspiciously low")
      assert(frac > 0.9, s"$l span fraction $frac")
    }
  }

  test("slo burn: rates replay from counts, alert is the multiwindow " +
      "conjunction, trailing day covers at most 24 hours") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Scale.sloBurnQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def r10(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byHour = rows.map(r =>
      r.getTimestamp(0).getTime / 3600000L ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    byHour.foreach { case (h, (tot, err, b1, bd, alert)) =>
      assert(err <= tot)
      assert(b1 == r10(err.toDouble * 20 / tot))
      // trailing-day totals re-derive from the hour map
      val (td, ed) = (0 to 23).flatMap(k => byHour.get(h - k))
        .map(v => (v._1, v._2)).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      assert(bd == r10(ed.toDouble * 20 / td),
        s"hour $h: burn_1d $bd != recomputed")
      assert(alert == (err * 20 > tot * 2 && ed * 20 > td))
    }
  }

  test("lateness audit: monotone in delay, rates replay, and the " +
      "append-ordered event log is almost never late") {
    val rows = graft.streaming.StreamingIngest
      .latenessAuditQuery(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 5L, 10L, 30L))
    val drops = rows.map(_.getLong(1))
    // larger delay can only drop fewer
    assert(drops.sliding(2).forall {
      case Array(a, b) => b <= a
      case _ => true
    })
    val total = rows.head.getLong(2)
    rows.foreach { r =>
      assert(r.getLong(1) <= total)
      def r10(x: Double) = BigDecimal(x)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == r10(r.getLong(1).toDouble / total))
    }
    // the generator emits in timestamp order: max lateness is 0
    assert(rows.head.getLong(3) == 0L,
      "append-ordered log should have zero lateness")
  }

  test("q13/null-semantics: outer joins conserve customers and NULL " +
      "aggregate rules hold") {
    val nCust = Tables.load(spark, sfDir, "customer").count()
    val dist = graft.operators.Relational.q13CustDist(spark, sfDir)
      .collect()
    assert(dist.map(_.getLong(1)).sum == nCust,
      "custdist does not conserve customers")
    val ns = graft.operators.Relational.nullSemanticsQuery(spark, sfDir)
      .collect()
    assert(ns.length == nCust)
    var sawEmpty = false
    ns.foreach { r =>
      val (star, cnt) = (r.getLong(1), r.getLong(2))
      assert(cnt <= star)
      val noOrders = r.getBoolean(7)
      assert(noOrders == (cnt == 0))
      if (noOrders) {
        sawEmpty = true
        // empty group: COUNT(*) still 1 (the NULL row), SUM/AVG/MAX
        // are NULL — never zero
        assert(star == 1)
        assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
        assert(r.getLong(6) == 0, "NULL comparison leaked into n_big")
      }
    }
    assert(sawEmpty, "premise: some customer must lack 1995 orders")
  }

  test("concurrency sweep: equals a brute-force interval stab at " +
      "every sweep point and conserves session counts") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Scale.concurrencyQuery(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // rebuild sessions independently (driver-side, spec scale)
    val evs = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head._2; var last = sorted.head._2
      for (e <- sorted.tail) {
        if (e._2 - last > 1800000L) { out += ((start, last)); start = e._2 }
        last = e._2
      }
      out += ((start, last))
      out
    }.toSeq
    assert(rows.map(_.getLong(2)).sum == sessions.size,
      "sessions_started does not conserve")
    // replay the sweep independently: global (ts asc, +1 before −1)
    // order, running sum, per-hour max of the post-event value; and
    // cross-check the +1 instants against an interval stab (the
    // value after the starts at instant t IS |{s ≤ t ≤ e}|)
    val sweep = sessions.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy { case (t, d) => (t, -d) }
    var c = 0L
    val maxByHour = scala.collection.mutable.Map.empty[Long, Long]
    val stabOk = sessions
    for ((t, d) <- sweep) {
      c += d
      val h = t / 3600000L
      maxByHour(h) = math.max(maxByHour.getOrElse(h, Long.MinValue), c)
      if (d == 1L) {
        val stab = stabOk.count { case (s, e) => s <= t && t <= e }
        assert(c <= stab, s"post-start value $c exceeds stab $stab")
      }
    }
    rows.foreach { r =>
      val h = r.getTimestamp(0).getTime / 3600000L
      assert(maxByHour.contains(h), s"unexpected hour $h")
      assert(r.getLong(1) == maxByHour(h),
        s"hour $h: engine ${r.getLong(1)} != replay ${maxByHour(h)}")
    }
    assert(rows.length == maxByHour.size)
  }

  test("weighted percentiles: quantiles are attained grid values, " +
      "ordered, and cover the exact weight thresholds") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Relational
      .weightedPercentilesQuery(spark, sfDir).collect()
    assert(rows.length == 3)
    val li = Tables.load(spark, sfDir, "lineitem")
    rows.foreach { r =>
      val flag = r.getString(0)
      val qs = (2 to 6).map(r.getDouble)
      assert(qs.sliding(2).forall {
        case Seq(a, b) => a <= b
        case _ => true
      }, s"$flag: quantiles not ordered: $qs")
      // threshold check for the median: weight at or below p50
      // covers >= half the units, and strictly below covers < half
      val units = r.getLong(1)
      val p50 = r.getDouble(3)
      val below = li.filter(col("l_returnflag") === flag &&
          col("l_extendedprice") <= p50)
        .agg(sum(col("l_quantity").cast("long"))).collect()(0).getLong(0)
      val strictly = li.filter(col("l_returnflag") === flag &&
          col("l_extendedprice") < p50)
        .agg(coalesce(sum(col("l_quantity").cast("long")), lit(0L)))
        .collect()(0).getLong(0)
      assert(below * 100 >= units * 50, s"$flag: p50 under-covers")
      assert(strictly * 100 < units * 50, s"$flag: p50 not minimal")
    }
  }
}
