package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Gates for the sparse-retrieval family: BM25 semantics (idf ordering,
  * tf saturation, score monotonicity) and chunking invariants (full
  * coverage, stride overlap, count formula), plus the plan shapes that
  * make both scan-like at 100 TB. */
class RetrievalSpec extends SparkSpec {

  test("bm25: every returned doc contains a query term, scores ranked") {
    val rows = Retrieval.bm25Query(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tfSum = r.getAs[Int]("tf_0") + r.getAs[Int]("tf_1") +
        r.getAs[Int]("tf_2")
      assert(tfSum > 0, s"doc ${r.get(0)} has no query term")
    }
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending")
  }

  test("bm25: rarer term out-scores a common one at equal tf and dl") {
    // Synthetic 4-doc corpus: 'rare' appears in 1 doc, 'common' in 3.
    // The two probe docs have identical length and tf=1 for their term,
    // so the score difference is pure idf — rare must win.
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "rare x y z"), (2L, "common x y z"),
      (3L, "common p q r"), (4L, "common p q r"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("bm25_probe")
    val tfs = call_function("graft_count_in_sets", col("text"),
      typedLit(Seq(Seq("rare"), Seq("common"))))
    val n = docs.count().toDouble
    val withTf = docs.select(col("doc_id"),
      element_at(tfs, 1).cast("double").as("tf_r"),
      element_at(tfs, 2).cast("double").as("tf_c"))
    val byDoc = withTf.collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val dfR = byDoc.values.count(_._1 > 0).toDouble
    val dfC = byDoc.values.count(_._2 > 0).toDouble
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    // equal tf (=1) and equal dl (=4) => saturation term identical
    assert(idf(dfR) > idf(dfC),
      s"idf(rare)=${idf(dfR)} should exceed idf(common)=${idf(dfC)}")
  }

  test("bm25: tf saturation — score is concave in tf (k1 cap)") {
    // With dl = avgdl the saturation factor is tf*(k1+1)/(tf+k1):
    // marginal gain of the 2nd occurrence must be below the 1st.
    def sat(tf: Double) = tf * 2.2 / (tf + 1.2)
    assert(sat(2) - sat(1) < sat(1) - sat(0))
    assert(sat(100) < 2.2, "saturation must stay below k1+1")
  }

  test("chunk: full coverage, overlap = window - stride, count formula") {
    val out = Retrieval.chunkQuery(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_words")).as("sum_words"),
        max(col("n_words")).as("max_words"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val docLens = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, nChunks, sumWords, maxWords) =>
      val n = docLens(id)
      val expected = 1 + math.max(0, math.ceil((n - 32) / 24.0).toInt)
      assert(nChunks == expected,
        s"doc $id: $nChunks chunks, expected $expected for $n words")
      assert(maxWords <= 32)
      // coverage: total emitted words = n + overlap replays
      // (each chunk after the first re-emits up to window-stride words)
      assert(sumWords >= n, s"doc $id: chunks lost words")
      assert(sumWords <= n + (nChunks - 1) * (32 - 24),
        s"doc $id: more overlap than window-stride allows")
    }
  }

  test("chunk: consecutive chunks share exactly window-stride words " +
      "on a long doc") {
    val words = (0 until 100).map(i => s"w$i").mkString(" ")
    val toks = words.split(" ")
    // replicate the operator rule directly
    val starts = 0 until (1 + math.ceil((100 - 32) / 24.0).toInt)
    starts.sliding(2).foreach {
      case Seq(a, b) =>
        val ca = toks.slice(a * 24, a * 24 + 32).toSet
        val cb = toks.slice(b * 24, b * 24 + 32).toSet
        assert((ca & cb).size == 8) // 32 - 24
      case _ =>
    }
  }

  test("plan: chunk is shuffle-free; bm25 ends in TakeOrdered with " +
      "only the one-row stats exchange") {
    val chunkPlan = Retrieval.chunkQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the orderBy in the query is presentation for the oracle dump; the
    // chunk PRODUCTION (project + generate) must carry no hash shuffle
    assert(!chunkPlan.contains("Exchange hashpartitioning"),
      s"chunk production shuffles:\n$chunkPlan")
    val bm25Plan = Retrieval.bm25Query(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(bm25Plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k should be a bounded heap, not a global sort:\n$bm25Plan")
    assert(!bm25Plan.contains("Exchange hashpartitioning"),
      s"bm25 must not hash-shuffle the corpus:\n$bm25Plan")
    // corpus text reaches neither exchange: stats reduce map-side
    val exchanges = bm25Plan.linesIterator
      .filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"document text flows through an exchange:\n$exchanges")
  }

  test("rrf fusion: scores decompose into the arm reciprocals and a " +
      "doc present in both arms beats its single-arm twin") {
    val rows = Retrieval.rrfFusionQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sp = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val de = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(sp.isDefined || de.isDefined,
        "a fused row must come from at least one arm")
      val expected = BigDecimal(
        sp.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        de.map(r => 1.0 / (60 + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expected) < 1e-9,
        s"rrf_score must equal the reciprocal sum for doc ${r.getLong(0)}")
    }
    // ranking is non-increasing in rrf_score
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
    // both-arm docs dominate: any doc with both ranks <= armK scores
    // strictly above the best possible single-arm doc at those ranks
    rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2)).foreach { r =>
      val single = math.max(1.0 / (60 + r.getInt(1)), 1.0 / (60 + r.getInt(2)))
      assert(r.getDouble(3) > single)
    }
  }

  test("sparse cosine: identical docs score 1, disjoint docs are " +
      "absent, the df cap purges stopword-grade terms") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),  // exact twin of 0
      (2L, "delta epsilon"),     // shares nothing with 0/1
      (3L, "alpha zeta"),        // partial overlap with 0/1
      (4L, "common common"), (5L, "common"), (6L, "common x"),
      (7L, "common y"), (8L, "common z")) // "common" df=5 > cap
      .toDF("doc_id", "text")
    val rows = Retrieval.sparseCosineOver(docs, maxDf = 4, k = 50)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // exact twins: full overlap, cosine exactly 1
    assert(rows((0L, 1L)) == ((3L, 1.0)), s"got ${rows.get((0L, 1L))}")
    // disjoint docs never pair
    assert(!rows.contains((0L, 2L)) && !rows.contains((1L, 2L)))
    // partial overlap: 0 < cos < 1
    val (st, cs) = rows((0L, 3L))
    assert(st == 1L && cs > 0 && cs < 1)
    // "common" (df 5 > cap 4) must not generate any pair: docs 4,5
    // share only the purged term
    assert(!rows.contains((4L, 5L)))
    // every reported cosine is a valid normalized similarity
    rows.values.foreach { case (_, c) => assert(c > 0 && c <= 1.0) }
  }

  test("plan: rrf arms are bounded heaps — the fusion join touches " +
      "2*armK rows, never the corpus") {
    val plan = Retrieval.rrfFusionQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"rrf arms must be bounded-heap top-k:\n$plan")
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(e => e.contains("text#") || e.contains("embedding#")),
      s"corpus text/embeddings flow through an exchange:\n$exchanges")
  }

  test("mmr: 5 distinct picks, first is the top-rel candidate, " +
      "greedy scores non-increasing") {
    val rows = Retrieval.mmrQuery(spark, sfDir).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
    assert(rows.map(_.getLong(1)).distinct.length == 5)
    // step 1 has no diversity penalty: pick = argmax rel, and its
    // score is exactly round4(0.7 * rel)
    val first = rows.head
    def r4(x: Double) = BigDecimal.valueOf(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(first.getDouble(3) == r4(0.7 * first.getDouble(2)))
    assert(rows.forall(_.getDouble(2) <= first.getDouble(2) + 1e-12),
      "step-1 pick is not the max-relevance candidate")
    // the classic MMR invariant: the selected sequence's scores are
    // non-increasing (the penalty set only grows)
    val scores = rows.map(_.getDouble(3))
    assert(scores.sliding(2).forall {
      case Array(a, b) => b <= a + 1e-12
      case _ => true
    }, s"greedy scores increased: ${scores.mkString(",")}")
  }

  test("retrieval eval: three arms, metric invariants hold, DCG " +
      "recomputes from the ranked lists through the literal table") {
    val rows = Retrieval.retrievalEvalQuery(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("dense", "rrf", "sparse"))
    val idcg = BigDecimal(rows.head.getString(2))
    assert(rows.map(r => r.getString(2)).distinct.length == 1,
      "IDCG is corpus-level, identical across arms")
    rows.foreach { r =>
      val dcg = BigDecimal(r.getString(1))
      assert(dcg >= 0 && dcg <= idcg,
        s"${r.getString(0)}: DCG $dcg outside [0, IDCG $idcg]")
      val ndcg = r.getDouble(3)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      val mrr = r.getDouble(4)
      assert(mrr == 0.0 || (mrr >= 1.0 / 10 - 1e-9 && mrr <= 1.0))
      val hits = r.getLong(5); val tot = r.getLong(6)
      assert(hits >= 0 && hits <= 10 && tot > 0 && hits <= tot)
      assert(math.abs(r.getDouble(7) - BigDecimal(hits.toDouble / tot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      // mrr = 0 iff no relevant doc in the top-10 iff dcg = 0
      assert((mrr == 0.0) == (dcg == BigDecimal(0)),
        s"${r.getString(0)}: mrr/dcg zero-state disagrees")
    }
    // recompute the sparse arm's DCG independently from the arm list
    val sparse = Retrieval.sparseArm(spark, sfDir,
        Seq("spark", "query", "table"), 50)
      .collect().filter(_.getInt(1) <= 10)
    def grade(id: Long): Int =
      if (id % 97 == 0) 3 else if (id % 41 == 0) 2
      else if (id % 13 == 0) 1 else 0
    val expDcg = sparse.map { r =>
      val g = grade(r.getLong(0)) match {
        case 3 => 7.0; case 2 => 3.0; case 1 => 1.0; case _ => 0.0
      }
      // the same floor-form rounding the operator applies (fr)
      BigDecimal(math.floor(
        g * Retrieval.DcgWeights(r.getInt(1) - 1) * 1e6 + 0.5) / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val gotDcg = BigDecimal(
      rows.find(_.getString(0) == "sparse").get.getString(1))
    assert(gotDcg == expDcg, s"sparse DCG $gotDcg != recomputed $expDcg")
  }

  test("WAND serve: identical to exhaustive serve on the real corpus " +
      "across query shapes") {
    val store = Retrieval.buildInvIndex(spark, sfDir)
    Seq(Seq("batch", "window", "sort"),
        Seq("merge", "vector", "stream"),
        Seq("hash")).foreach { terms =>
      val wand = Retrieval
        .indexServeWandOver(spark, store, terms, 20).collect().toSeq
      val full = Retrieval
        .indexServeOver(spark, store, terms, 20).collect().toSeq
      assert(wand == full, s"terms=$terms")
    }
  }

  test("WAND block-max pruning: fewer posting rows read on a " +
      "conjunctive-top-k corpus, top-k still exact") {
    import SparkSpec.spark.implicits._
    // 100 docs carry BOTH terms at tf 8 (the true top-k); the other
    // 3900 carry one term at tf 1. Block-max should keep each
    // term's tf-8 block and prune the low-impact tail wholesale.
    val docs = (0L until 4000L).map { id =>
      val filler = (0 until (4 + (id % 11)).toInt)
        .map(j => s"w${(id * 7 + j) % 97}").mkString(" ")
      val body =
        if (id % 40 == 0)
          (Seq.fill(8)("alpha") ++ Seq.fill(8)("beta")).mkString(" ")
        else if (id % 2 == 0) "alpha"
        else "beta"
      (id, body + " " + filler)
    }.toDF("doc_id", "text")
    val dir = graft.sources.OrcIo.scratchDir("wand_ix")
    Retrieval.writeIndexSegment(docs, dir, "overwrite")
    val terms = Seq("alpha", "beta")
    val wand = Retrieval
      .indexServeWandOver(spark, dir, terms, 10).collect().toSeq
    val full = Retrieval
      .indexServeOver(spark, dir, terms, 10).collect().toSeq
    assert(wand == full, "pruned top-k diverged from exhaustive")
    val (total, read) = Retrieval.wandReadCounts(spark, dir, terms, 10)
    assert(read < total, s"WAND read $read of $total posting rows")
    assert(read.toDouble / total <= 0.5,
      s"no real pruning on the skewed fixture: $read/$total")
  }
}
