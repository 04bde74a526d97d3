package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic-sampling invariants: membership is a pure function of
  * content (stable under repartitioning — the property `rand()`-based
  * sampling lacks), rates land near nominal, and strata are exact-size. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("hash Bernoulli sample is stable under repartitioning") {
    val once = Sampling.hashSampleQuery(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val repart = docs.repartition(13, col("lang"))
      .filter(Sampling.hashBernoulli(col("text"), 40))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == repart)
    assert(once.nonEmpty)
  }

  test("hash Bernoulli rate is near nominal 40/256") {
    val n = docs.count().toDouble
    val k = docs.filter(Sampling.hashBernoulli(col("text"), 40))
      .count().toDouble
    val rate = k / n
    // md5 is uniform; 3σ window for the spec corpus size
    val p = 40.0 / 256.0
    val sigma = math.sqrt(p * (1 - p) / n)
    assert(math.abs(rate - p) < 3 * sigma + 0.02,
      s"rate $rate too far from nominal $p")
  }

  test("stratified sample returns exactly min(k, stratum size) per lang") {
    val k = 5
    val sizes = Sampling.stratifiedSampleQuery(spark, sfDir, k)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == full.keySet)
    full.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(k.toLong, n),
        s"stratum $lang: got ${sizes(lang)} of $n")
    }
  }

  test("rendezvous shard: moved docs move only TO the new shard") {
    val rows = Sampling.shardAssignQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s16, s17, moved) = (r.getInt(1), r.getInt(2), r.getBoolean(3))
      assert(s16 >= 0 && s16 < 16)
      assert(s17 >= 0 && s17 < 17)
      // the defining rendezvous property: growing S only ever
      // relocates keys INTO the new shard — a doc that changes
      // assignment must land on shard 16, never migrate between
      // pre-existing shards
      if (moved) assert(s17 == 16, s"doc ${r.getLong(0)} moved $s16->$s17")
      else assert(s16 == s17)
    }
    val movedFrac = rows.count(_.getBoolean(3)).toDouble / rows.length
    val p = 1.0 / 17.0
    val sigma = math.sqrt(p * (1 - p) / rows.length)
    assert(math.abs(movedFrac - p) < 4 * sigma + 0.01,
      s"moved fraction $movedFrac far from 1/17")
  }

  test("rendezvous shard matches a locally replayed digest tournament") {
    def hex16(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(8).map(b => f"${b & 0xff}%02x").mkString
    }
    def expected(id: Long, shards: Int): Int =
      (0 until shards).map(s => (hex16(s"$id:$s") + "#" + f"$s%02d", s))
        .maxBy(_._1)._2
    Sampling.shardAssignQuery(spark, sfDir).limit(50).collect()
      .foreach { r =>
        val id = r.getLong(0)
        assert(r.getInt(1) == expected(id, 16), s"doc $id shard16")
        assert(r.getInt(2) == expected(id, 17), s"doc $id shard17")
      }
  }

  test("duplicate texts land on the same side of the sample boundary") {
    import SparkSpec.spark.implicits._
    val dup = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val kept = dup.filter(Sampling.hashBernoulli(col("text"), 128))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) == kept.contains(2L))
  }

  test("domain mix: rates capped at 1, kept counts track rate·n within " +
      "binomial noise, under-represented strata keep everything") {
    val rows = Sampling.domainMixQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nLang = r.getAs[Long]("n_lang").toDouble
      val rate = r.getAs[Double]("rate")
      val nKept = r.getAs[Long]("n_kept").toDouble
      assert(rate > 0.0 && rate <= 1.0)
      if (rate == 1.0) assert(nKept == nLang,
        s"${r.getString(0)}: rate 1 must keep the whole stratum")
      else {
        val sigma = math.sqrt(rate * (1 - rate) * nLang)
        assert(math.abs(nKept - rate * nLang) <= 4 * sigma + 2,
          s"${r.getString(0)}: kept $nKept of $nLang at rate $rate")
      }
    }
    // the whole point: the over-represented stratum is cut hardest
    val byLang = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_lang"))).toMap
    assert(byLang.values.min < 1.0, "no stratum was downsampled")
  }

  test("domain mix: kept-set membership is repartition-stable") {
    // membership coin is a content hash: the summary must not change
    // when the source is repartitioned (rand()-based sampling fails this)
    val a = Sampling.domainMixQuery(spark, sfDir).collect().toSeq
    val b = Sampling.domainMixQuery(spark, sfDir).collect().toSeq
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted)
  }

  test("epoch shuffle: every doc exactly once per epoch, dense " +
      "positions per shard, epochs genuinely reordered") {
    val rows = Sampling.epochShuffleQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val nDocs = docs.count()
    (0 to 1).foreach { e =>
      val epoch = rows.filter(_._2 == e)
      assert(epoch.length == nDocs, s"epoch $e is not a permutation")
      assert(epoch.map(_._1).toSet.size == nDocs)
      epoch.groupBy(_._3).foreach { case (shard, in) =>
        assert(in.map(_._4).sorted.toSeq == (1 to in.length),
          s"epoch $e shard $shard positions not dense")
      }
    }
    // the two epochs must order docs differently (independent keys)
    val order0 = rows.filter(_._2 == 0).sortBy(r => (r._3, r._4)).map(_._1)
    val order1 = rows.filter(_._2 == 1).sortBy(r => (r._3, r._4)).map(_._1)
    assert(!order0.sameElements(order1), "epochs produced the same order")
  }

  test("curriculum: tiers are rank-exact thirds, pools grow " +
      "easy-first, positions dense per epoch, epochs reordered") {
    // columns: doc_id, epoch, tier, pos
    val rows = Sampling.curriculumQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = docs.count()
    // tier assignment is a rank-quantile cut into thirds
    val tiers = rows.filter(_._2 == 2).groupBy(_._3)
      .view.mapValues(_.length.toLong).toMap
    assert(tiers.keySet == Set(0L, 1L, 2L))
    tiers.values.foreach(sz =>
      assert(math.abs(sz - n / 3) <= 2, s"tier sizes $tiers"))
    // epoch e holds exactly tiers 0..e (competence pool growth)
    (0L to 2L).foreach { e =>
      val pool = rows.filter(_._2 == e)
      assert(pool.map(_._3).toSet == (0L to e).toSet,
        s"epoch $e pool tiers")
      assert(pool.map(_._4).sorted.toSeq == (1L to pool.length).toSeq,
        s"epoch $e positions not dense")
      assert(pool.map(_._1).distinct.length == pool.length)
    }
    // the final epoch covers the corpus; earlier epochs are subsets
    assert(rows.count(_._2 == 2) == n)
    val e0 = rows.filter(_._2 == 0).map(_._1).toSet
    val e2docs = rows.filter(_._2 == 2).map(_._1).toSet
    assert(e0.subsetOf(e2docs) && e0.size < e2docs.size)
    // distinct epoch keys genuinely reorder the shared pool
    val o1 = rows.filter(r => r._2 == 1 && e0.contains(r._1))
      .sortBy(_._4).map(_._1)
    val o2 = rows.filter(r => r._2 == 2 && e0.contains(r._1))
      .sortBy(_._4).map(_._1)
    assert(!o1.sameElements(o2), "epochs produced the same order")
  }

  test("importance: English docs score above non-English on average " +
      "(the target distribution is the en subset)") {
    val scored = Sampling.importanceQuery(spark, sfDir)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy((col("lang") === "en").as("is_en"))
      .agg(avg(col("imp_score")).as("mean_score"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(scored(true) > scored(false),
      s"mean en score ${scored(true)} should exceed " +
        s"non-en ${scored(false)}")
  }

  test("importance: corpus-level mean log-ratio of the raw model is " +
      "non-positive (Gibbs' inequality direction)") {
    // E_raw[ln(p_tgt/p_raw)] = -KL(raw || tgt) ≤ 0: the token-weighted
    // mean score over ALL docs must not be positive
    val r = Sampling.importanceQuery(spark, sfDir)
      .agg((sum(col("imp_score") * col("n_tok")) / sum(col("n_tok")))
        .as("m")).collect().head.getDouble(0)
    assert(r <= 1e-9, s"token-weighted mean $r must be ≤ 0")
  }

  test("plan: importance scoring never shuffles document text") {
    val p = Sampling.importanceQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty) // the 64-row model fit does shuffle
    assert(!exchanges.exists(_.contains("text#")),
      s"document text flows through an exchange:\n$exchanges")
  }

  test("weighted sample: token-heavy docs over-represented, " +
      "repartition-stable") {
    val sample = Sampling.weightedSampleQuery(spark, sfDir, k = 50)
      .collect()
    assert(sample.length == 50)
    val sampleMean = sample.map(_.getInt(3).toLong).sum.toDouble / 50
    val corpusMean = docs
      .agg(avg(size(split(col("text"), " ")))).head.getDouble(0)
    // P(selected) ∝ token count ⇒ the sample's mean length exceeds
    // the corpus mean (length-biased sampling, exact by construction)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean !> corpus mean $corpusMean")
    // same draw on a different partitioning (content-keyed coin)
    val again = Sampling.weightedSampleQuery(spark, sfDir, k = 50)
      .collect().map(_.getLong(1)).toSeq
    assert(again == sample.map(_.getLong(1)).toSeq)
  }

  test("leak-free split: clusters never straddle a split boundary") {
    val rows = Sampling.leakFreeSplitQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every document assigned exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    // THE property: one split per cluster (a doc-keyed 80/10/10 split
    // would violate this for any cluster crossing a bucket boundary)
    rows.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cl straddles splits: ${members.toSeq}")
    }
    // rate sanity: train strictly dominates, all three splits present
    // at gate size (500 docs, ~488 clusters)
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"$bySplit")
    assert(bySplit("train") > bySplit("val") &&
      bySplit("train") > bySplit("test"), s"$bySplit")
  }

  test("temperature mix: alpha=0.5 flattens the head, coin deterministic") {
    val rows = Sampling.temperatureMixQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val nTotal = rows.map(_._2).sum.toDouble
    // shares normalize
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    rows.foreach { case (lang, nLang, share, rate, nKept) =>
      assert(rate > 0.0 && rate <= 1.0, s"$lang rate $rate")
      assert(nKept <= nLang, s"$lang kept $nKept of $nLang")
      // sampled count lands near rate * n (24-bit coin, sf0.001 strata
      // are small, so allow a loose binomial band)
      val exp = rate * nLang
      assert(math.abs(nKept - exp) < 6 * math.sqrt(exp.max(1.0)) + 3,
        s"$lang kept $nKept, expected ~$exp")
    }
    // THE temperature property: acceptance rate = min(1, N/(sqrt(n)*S))
    // is strictly non-increasing in stratum size — the head is
    // down-sampled hardest, the tail kept whole
    val byN = rows.sortBy(_._2)
    byN.map(_._4).zip(byN.tail.map(_._4)).foreach { case (rSmall, rBig) =>
      assert(rSmall >= rBig - 1e-9,
        s"rate not monotone in stratum size: ${byN.toSeq}")
    }
    val again = Sampling.temperatureMixQuery(spark, sfDir).collect()
      .map(_.toString).toSeq
    assert(again == Sampling.temperatureMixQuery(spark, sfDir)
      .collect().map(_.toString).toSeq)
  }

  test("A-ES weighted WOR: no duplicates, weight bias, determinism, " +
      "and the exact key formula") {
    val rows = Sampling.weightedWorQuery(spark, sfDir).collect()
    assert(rows.length == 100)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "WOR must not repeat")
    // weight bias: the selected docs' mean length must exceed the
    // corpus mean (keys = ln(u)/w favor heavy docs; u is independent
    // of w, so at 100-of-500 the bias is overwhelming)
    val corpusMean = docs.agg(avg(length(col("text"))))
      .collect().head.getDouble(0)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
    // exact key replay for the top row
    val top = rows.head
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(top.getLong(0).toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 6)
    val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 16777216.0
    val key = math.log(u) / top.getLong(1).toDouble
    assert(top.getDouble(2) ==
      BigDecimal(key * 1e6).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // determinism
    val again = Sampling.weightedWorQuery(spark, sfDir).collect()
      .map(_.toString).toSeq
    assert(again == rows.map(_.toString).toSeq)
  }

  test("kfold: exhaustive JVM replay of the md5 deal, fold sizes " +
      "within one per stratum, certificate columns honest") {
    // columns: doc_id, lang, rnk, fold, fold_size, stratum_size,
    //          balanced
    val rows = Sampling.kfoldQuery(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == docs.length, "one row per document")
    // JVM replay: md5 permute, rank, round-robin deal
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }
    val want = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      ds.toSeq.map { case (id, _) => (id, hex(s"fold:$id")) }
        .sortBy { case (id, h) => (h, id) }
        .zipWithIndex.map { case ((id, _), i) =>
          id -> (lang, i + 1L, i.toLong % 5)
        }
    }.toMap
    for (r <- rows) {
      val (lang, rnk, fold) = want(r.getLong(0))
      assert(r.getString(1) == lang)
      assert(r.getLong(2) == rnk,
        s"doc ${r.getLong(0)}: rank ${r.getLong(2)} != $rnk")
      assert(r.getLong(3) == fold)
    }
    // balance: per stratum, non-empty fold sizes within 1, and the
    // hashed certificate columns match a recount
    for ((lang, rs) <- rows.groupBy(_.getString(1))) {
      val sizes = rs.groupBy(_.getLong(3)).view.mapValues(_.length)
      assert(sizes.values.max - sizes.values.min <= 1,
        s"stratum $lang unbalanced: $sizes")
      for (r <- rs) {
        assert(r.getLong(4) == sizes(r.getLong(3)))
        assert(r.getLong(5) == rs.length)
        assert(r.getBoolean(6))
      }
    }
  }

  test("mixAblation: k^2 grid, conserved variant totals, ppm shares " +
      "replay from hand counts, variant shares exceed full shares") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      ("a", "one two three"), ("a", "four five"),
      ("b", "six seven eight nine"),
      ("c", "ten"), ("c", "eleven twelve"))
      .toDF("source", "text")
    val rows = Sampling.mixAblation(docs).collect()
    val k = 3
    assert(rows.length == k * (k - 1))
    // hand counts: a = 2 docs / 5 tok, b = 1 / 4, c = 2 / 3; total 12
    val tok = Map("a" -> 5L, "b" -> 4L, "c" -> 3L)
    val dcs = Map("a" -> 2L, "b" -> 1L, "c" -> 2L)
    rows.foreach { r =>
      val (abl, src) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == dcs(src) && r.getLong(3) == tok(src))
      assert(r.getLong(4) == tok(src) * 1000000L / 12L)
      assert(r.getLong(5) == tok(src) * 1000000L / (12L - tok(abl)))
      assert(r.getLong(6) == 5L - dcs(abl))
      assert(r.getLong(7) == 12L - tok(abl))
      assert(r.getLong(8) == tok(abl) * 1000000L / 12L)
      // removing mass can only inflate every remaining share
      assert(r.getLong(5) >= r.getLong(4))
    }
  }

  test("tempSweep: shares sum to ~1e6 per alpha, higher temperature " +
      "flattens (tv monotone in alpha), alpha=1 equals natural") {
    val rows = Sampling.tempSweepQuery(spark, sfDir).collect()
    val byA = rows.groupBy(_.getLong(0))
    assert(byA.keySet == Set(25L, 50L, 100L))
    byA.foreach { case (a, rs) =>
      val tot = rs.map(_.getLong(3)).sum
      // floor-division shortfall bounded by strata count
      assert(tot <= 1000000L && tot > 1000000L - rs.length,
        s"alpha $a: shares sum to $tot")
      if (a == 100L)
        rs.foreach(r => assert(r.getLong(3) == r.getLong(4),
          "alpha=1 share must equal the natural share"))
    }
    // lower alpha = flatter mixture = larger distance from natural
    val tv = byA.map { case (a, rs) => a -> rs.head.getLong(6) }
    assert(tv(25L) >= tv(50L) && tv(50L) >= tv(100L) && tv(100L) == 0L)
  }

  test("mixAblation plan: the grid reuses the checkpointed k-row " +
      "aggregate (zero corpus re-scans) and never shuffles") {
    val p = Sampling.mixAblationQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the corpus was scanned once, eagerly, at stats-build time: the
    // grid plan itself must contain NO file scan of documents
    assert(!p.contains("documents.parquet"),
      s"grid re-scans the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"), s"grid shuffled:\n$p")
  }

  test("quotaRebalance: driver water-fill recompute, cap semantics, " +
      "and rate/kept consistency") {
    def waterFill(grid: Seq[(String, Long, Long)])
        : (Map[String, Long], Map[String, Boolean]) = {
      // the operator's fixed 5-round integer unroll, recomputed
      var remaining = grid.map(_._2).sum / 2
      val capped = scala.collection.mutable.Map(
        grid.map(g => g._1 -> false): _*)
      for (_ <- 1 to 5) {
        val active = grid.filter(g => !capped(g._1))
        val sp = active.map(_._3).sum
        if (sp > 0) {
          val newly = active.filter(g => g._2 * sp <= remaining * g._3)
          newly.foreach { g => capped(g._1) = true; remaining -= g._2 }
        }
      }
      val spF = grid.filter(g => !capped(g._1)).map(_._3).sum
      (grid.map { case (l, avail, pct) =>
        l -> (if (capped(l)) avail else remaining * pct / spF)
      }.toMap, capped.toMap)
    }
    val rows = Sampling.quotaRebalanceQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val grid = rows.map(r =>
      (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    val (alloc, capped) = waterFill(grid)
    val totalAvail = grid.map(_._2).sum
    rows.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(4) == alloc(lang), s"$lang alloc vs recompute")
      assert(r.getBoolean(5) == capped(lang), s"$lang capped flag")
      if (capped(lang)) assert(r.getLong(4) == r.getLong(2),
        s"$lang capped alloc must equal availability")
      assert(r.getLong(7) <= r.getLong(2), s"$lang kept <= avail")
      if (r.getDouble(6) == 1.0) assert(r.getLong(7) == r.getLong(2),
        s"$lang rate 1.0 must keep every survivor")
      assert(r.getLong(4) <= r.getLong(2), s"$lang alloc <= avail")
    }
    assert(rows.map(_.getLong(4)).sum <= totalAvail / 2,
      "total allocation must fit the sample budget")
    // extreme targets force the cap + redistribution path: a 96%
    // target on one small language cannot be filled from survivors
    val skew = Sampling.quotaRebalanceQuery(spark, sfDir, Seq(
      "de" -> 96, "en" -> 1, "es" -> 1, "fr" -> 1, "zh" -> 1)).collect()
    val de = skew.find(_.getString(0) == "de").get
    assert(de.getBoolean(5), "96% target on de must cap at availability")
    assert(de.getLong(4) == de.getLong(2))
    val skewGrid = skew.map(r =>
      (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    val (skewAlloc, skewCapped) = waterFill(skewGrid)
    skew.foreach { r =>
      assert(r.getLong(4) == skewAlloc(r.getString(0)))
      assert(r.getBoolean(5) == skewCapped(r.getString(0)))
    }
  }
}
