package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap

  test("brute-force top-k: self is rank 1 with cos_sim 1") {
    val res = Similarity.annBruteForceQuery(spark, sfDir).collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (q, rows) =>
      val rank1 = rows.find(_.getInt(2) == 1).get
      assert(rank1.getLong(1) == q, s"query $q rank-1 must be itself")
      assert(rank1.getDouble(3) == 1.0)
      assert(rows.length == 10)
      // ranks strictly ordered by similarity desc
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH-bucketed ANN: self always found; results subset brute force top-50") {
    val brute = Similarity.bruteForceTopK(
      Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 5),
      Tables.load(spark, sfDir, "embeddings"), 50)
    val bruteSet = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshBucketQuery(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    lsh.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.find(_.getInt(2) == 1).get.getLong(1) == q,
        s"query $q: same-bucket self match missing")
    }
  }

  test("IVF ANN: self found at rank 1 (probing its own cell)") {
    val res = Similarity.ivfTopK(spark, sfDir).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val rank1 = rows.find(_.getInt(2) == 1).get
      assert(rank1.getLong(1) == q && rank1.getDouble(3) == 1.0,
        s"query $q must find itself in its own IVF cell")
    }
  }

  test("PQ/ADC ANN: self at rank 1, recall@10 vs brute force, codes " +
      "in range, reconstruction cosine high") {
    val res = Similarity.annPqQuery(spark, sfDir).collect()
    assert(res.groupBy(_.getLong(0)).keySet == Set(0L, 1L, 2L, 3L, 4L))
    // 32x-compressed codes must still put the query itself on top
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.find(_.getInt(2) == 1).get.getLong(1) == q,
        s"query $q must rank itself first under ADC")
      assert(rows.length == 10)
    }
    // recall@10 against exact brute force — PQ ADC over 8 byte-codes
    // is lossy by design, but must keep the neighborhood (threshold
    // pinned for THIS corpus + deterministic L2 k-means fit)
    val brute = collectRanks(Similarity.annBruteForceQuery(spark, sfDir))
    val pq = collectRanks(Similarity.annPqQuery(spark, sfDir))
    val bruteSets = brute.groupBy(_._1._1)
      .map { case (q, m) => q -> m.values.toSet }
    val recall = bruteSets.map { case (q, bs) =>
      val ps = pq.filter(_._1._1 == q).values.toSet
      (bs intersect ps).size.toDouble / bs.size
    }
    assert(recall.sum / recall.size >= 0.5,
      s"mean PQ recall@10 ${recall.sum / recall.size}")
    // every vector reconstructs with high cosine: decode codes back to
    // centroid concatenation and compare against the original
    val emb = Tables.load(spark, sfDir, "embeddings")
    val model = Similarity.buildPqIndex(spark, sfDir)
    val checked = emb.limit(100).collect().map { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).toArray
      val rec = (0 until model.m).flatMap { s =>
        val sub = v.slice(s * model.subDim, (s + 1) * model.subDim)
        val cents = model.codebook(s)
        val best = cents.indices.minBy { c =>
          sub.zip(cents(c)).map { case (a, b) =>
            (a - b).toDouble * (a - b) }.sum
        }
        // the engine-side encoder must agree with this L2 rule
        cents(best)
      }.toArray
      val dot = v.zip(rec).map { case (a, b) => a.toDouble * b }.sum
      val na = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(rec.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    // ~0.82 measured for 8×64-centroid codebooks at 32× compression on
    // THIS corpus (deterministic fit — cannot flake); threshold pinned
    // just below as the regression floor
    assert(checked.sum / checked.length >= 0.8,
      s"mean reconstruction cosine ${checked.sum / checked.length}")
  }

  test("IVFADC: self at rank 1, recall close to flat ADC, scans a " +
      "small measured fraction of the code store") {
    val res = Similarity.annIvfPqQuery(spark, sfDir).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.find(_.getInt(2) == 1).get.getLong(1) == q,
        s"query $q must rank itself first under IVFADC")
    }
    // recall@10 vs exact brute force must be within a few points of the
    // flat-ADC scan: the coarse quantizer prunes cells, not quality
    val brute = collectRanks(Similarity.annBruteForceQuery(spark, sfDir))
    val bruteSets = brute.groupBy(_._1._1)
      .map { case (q, m) => q -> m.values.toSet }
    def recallOf(m: Map[(Long, Int), Long]): Double = {
      val r = bruteSets.map { case (q, bs) =>
        val ps = m.filter(_._1._1 == q).values.toSet
        (bs intersect ps).size.toDouble / bs.size
      }
      r.sum / r.size
    }
    val flat = recallOf(collectRanks(Similarity.annPqQuery(spark, sfDir)))
    val ivf = recallOf(collectRanks(Similarity.annIvfPqQuery(spark, sfDir)))
    assert(ivf >= flat - 0.15,
      s"IVFADC recall $ivf vs flat ADC $flat — pruning should cost " +
        "only a few points")
    // the scanned fraction is the point of IVF: nprobe=4 of k=20 cells
    // must touch well under half the code store (cells are uneven, so
    // the bound is loose but still proves pruning happened)
    val store = spark.read.parquet(
      Similarity.buildIvfPqStore(spark, sfDir)._1)
    val total = store.count().toDouble
    val probed = {
      val emb = Tables.load(spark, sfDir, "embeddings")
      val cents = Similarity.buildIndex(spark, sfDir)
      val cells = emb.filter(col("vec_id") < 5)
        .select(explode(call_function("graft_nearest_cells",
          col("embedding"), Similarity.centroidLit(cents), lit(4)))
          .as("cell"))
        .distinct().collect().map(_.getInt(0)).toSet
      store.filter(col("cell").isin(cells.toSeq: _*)).count().toDouble
    }
    assert(probed / total <= 0.6,
      s"IVFADC scanned ${probed / total} of codes — pruning ineffective")
    assert(probed < total, "probing must exclude at least one cell")
    // and the pruning is STATIC: the serving plan carries a partition
    // filter on the cell directory column, so unprobed directories are
    // dropped at planning time, not row-filtered after a full read
    val plan = Similarity.ivfPqTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a static cell partition filter in:\n${plan.take(2000)}")
  }

  test("LSH recall@10 vs brute force is reasonable for 12-bit buckets") {
    val brute = collectRanks(Similarity.annBruteForceQuery(spark, sfDir))
    val lsh = collectRanks(Similarity.lshBucketQuery(spark, sfDir))
    // single-probe LSH trades recall for a 4096x candidate reduction;
    // the self match plus same-bucket hits must overlap brute force
    val overlap = lsh.filter { case ((q, _), n) =>
      brute.exists { case ((bq, _), bn) => bq == q && bn == n } }
    assert(overlap.nonEmpty)
  }

  test("bitext mining: matches the window formulation, margin " +
      "non-negative, no pair matrix in any exchange") {
    import org.apache.spark.sql.expressions.Window
    val mined = Similarity.bitextMineQuery(spark, sfDir)
    val rows = mined.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Any]("margin")
      if (m != null) assert(m.asInstanceOf[Double] >= 0.0,
        s"src ${r.get(0)}: negative margin $m")
      assert(r.getAs[Double]("cos_sim") >= -1.0001 &&
        r.getAs[Double]("cos_sim") <= 1.0001)
    }
    // independent window-sort formulation must agree on the top-1
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val emb = Tables.load(spark, sfDir, "embeddings")
    val j = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("doc_id"), col("lang"), col("embedding"))
    val src = j.filter(col("lang") === "de")
      .select(col("doc_id").as("src_id"), col("embedding").as("s"))
    val tgt = j.filter(col("lang") === "en")
      .select(col("doc_id").as("tgt_id"), col("embedding").as("t"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("c").desc, col("tgt_id"))
    val ref = tgt.crossJoin(src)
      .withColumn("c", round(
        graft.functions.VectorOps.cosine(col("s"), col("t")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("src_id"), col("tgt_id"), col("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (refTgt, refCos) = ref(r.getLong(0))
      assert(r.getLong(1) == refTgt && r.getDouble(2) == refCos,
        s"src ${r.getLong(0)}: ${r.getLong(1)}@${r.getDouble(2)} " +
          s"vs window $refTgt@$refCos")
    }
    // scale shape: embeddings stay out of every exchange (the shuffle
    // carries only the ≤2-entry topk buffers per source)
    val exchanges = mined.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(l =>
      l.contains("s_emb") || l.contains("t_emb") || l.contains("embedding")),
      s"embeddings flow through an exchange:\n$exchanges")
  }

  test("IVF-blocked bitext: decent top-1 recall vs the exact twin " +
      "while scanning a measured fraction of the pair matrix") {
    val exact = Similarity.bitextMineQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = Similarity.bitextMineAnnQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ann.nonEmpty)
    // every ANN source is a real source (subset: a src whose probed
    // cells hold no en doc is legitimately absent)
    assert(ann.keySet.subsetOf(exact.keySet))
    val hits = ann.count { case (s, t) => exact(s) == t }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.5,
      s"top-1 recall $recall ($hits/${exact.size}) below 0.5")
    // measured scanned fraction: candidate pairs after cell blocking
    // must be well under the full |src| x |en| matrix
    val docs = Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("lang"))
    val emb = Tables.load(spark, sfDir, "embeddings")
    val joined = docs.join(emb, docs("doc_id") === emb("vec_id"))
    val nSrc = joined.filter(col("lang") === "de").count()
    val nTgt = joined.filter(col("lang") === "en").count()
    val m = Similarity.buildIndex(spark, sfDir)
    val tgtCells = joined.filter(col("lang") === "en").select(
      Similarity.cellOf(m, col("embedding")).as("cell"))
    val srcCells = joined.filter(col("lang") === "de").select(
      col("doc_id").as("src_id"),
      explode(call_function("graft_nearest_cells", col("embedding"),
        Similarity.centsLit(m), lit(4))).as("cell"))
    val scanned = tgtCells.join(srcCells, Seq("cell")).count()
    val frac = scanned.toDouble / (nSrc * nTgt)
    assert(frac < 0.8, s"cell blocking scanned fraction $frac not < 0.8")
  }

  test("pca: planted dominant direction recovered in 3 iterations, " +
      "loadings unit-norm, repartition-invariant") {
    import SparkSpec.spark.implicits._
    // anisotropic corpus: y_i = g_i * d + small noise, all derived
    // deterministically from the row id (no RNG — replayable). The
    // planted direction d alternates sign per dimension.
    val dims = 16
    val rows = (0 until 200).map { i =>
      val g = (i % 21 - 10) / 3.0 // strong variance along d
      val emb = Array.tabulate(dims) { j =>
        val d = if (j % 2 == 0) 0.25f else -0.25f
        val noise = (((i * 31 + j * 17) % 13) - 6) / 60.0f
        (g * d).toFloat + noise
      }
      (i.toLong, emb)
    }
    val df = rows.toDF("vec_id", "embedding")
    val pc = Similarity.pcaTopComponent(df, iters = 3, dims = dims)
      .orderBy(col("dim")).collect()
    val v = pc.map(_.getDouble(1))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"loadings not unit norm: $norm")
    // alignment with the planted direction
    val d = Array.tabulate(dims)(j => if (j % 2 == 0) 0.25 else -0.25)
    val dn = math.sqrt(d.map(x => x * x).sum)
    val cos = math.abs(v.zip(d).map { case (a, b) => a * b }.sum / dn)
    assert(cos >= 0.99, s"planted direction not recovered: cos=$cos")
    // eigenvalue positive and equal across rows
    assert(pc.map(_.getDouble(2)).distinct.length == 1)
    assert(pc.head.getDouble(2) > 0.0)
    // fixed-point sums make the result partition-layout-independent
    val v2 = Similarity
      .pcaTopComponent(df.repartition(7), iters = 3, dims = dims)
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    assert(v.sameElements(v2), "pca depends on partitioning")
  }

  test("kmeans gate query: all cells non-empty, refinement helps, " +
      "deterministic") {
    val r2 = Similarity.kmeansClusterQuery(spark, sfDir, k = 8,
      iters = 2).collect()
    // every vector assigned exactly once; all 8 cells captured vectors
    // (seed-contains-self guarantees non-empty absent duplicate seeds)
    assert(r2.map(_.getLong(0)).distinct.length == r2.length)
    assert(r2.map(_.getInt(1)).toSet == (0 until 8).toSet)
    // Lloyd refinement: within-cluster squared distance after two
    // rounds is no worse than the seed assignment's
    val r0 = Similarity.kmeansClusterQuery(spark, sfDir, k = 8,
      iters = 0).collect()
    val wss0 = r0.map(_.getDouble(2)).sum
    val wss2 = r2.map(_.getDouble(2)).sum
    assert(wss2 <= wss0 + 1e-6, s"WSS grew: $wss0 -> $wss2")
    // bit-identical re-run (the property the oracle hash relies on)
    val again = Similarity.kmeansClusterQuery(spark, sfDir, k = 8,
      iters = 2).collect()
    assert(r2.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq == again.map(r => (r.getLong(0), r.getInt(1),
        r.getDouble(2))).toSeq)
  }

  test("semantic dedup: cell blocking examines a strict subset of " +
      "all pairs, and the best pair is the true within-cell max") {
    val res = Similarity.semanticDedupQuery(spark, sfDir).collect()
    assert(res.length == 8)
    val n = res.map(_.getLong(1)).sum
    // Σ C(|cell|,2) < C(N,2): the point of blocking
    val examined = res.map(r => {
      val m = r.getLong(1); m * (m - 1) / 2
    }).sum
    assert(examined < n * (n - 1) / 2,
      s"blocking saved nothing: $examined vs ${n * (n - 1) / 2}")
    // best pair really is the max: brute-force one cell
    val a = Similarity.kmeansAssignments(spark, sfDir, 8, 2)
      .select(col("cell"), col("vec_id"), col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    val cell0 = a.filter(_._1 == res.head.getInt(0))
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      BigDecimal(d / (math.sqrt(x.map(p => p * p).sum) *
        math.sqrt(y.map(p => p * p).sum)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val brute = (for {
      (_, i, vi) <- cell0; (_, j, vj) <- cell0 if i < j
    } yield cos(vi, vj)).max
    assert(res.head.getDouble(5) == brute,
      s"best-pair cos ${res.head.getDouble(5)} != brute $brute")
  }

  test("semantic dedup scale rule: growing k shrinks pair work") {
    // the production law k ≈ N/cellSize: 4x the cells ⇒ ~1/4 the
    // examined pairs (Σ C(|cell|,2) ∝ N·cellSize when cells balance)
    def examined(k: Int): Long =
      Similarity.semanticDedupQuery(spark, sfDir, k = k).collect()
        .map(r => { val m = r.getLong(1); m * (m - 1) / 2 }).sum
    val at8 = examined(8)
    val at32 = examined(32)
    assert(at32 < at8,
      s"k=32 examined $at32 pairs, not fewer than k=8's $at8")
  }

  test("filtered ann: every neighbor satisfies the predicate, ranks " +
      "dense, self retrieved iff query passes the filter") {
    val rows = Similarity.annFilteredQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val okLabels = emb
      .filter(org.apache.spark.sql.functions.col("label") % 3 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(okLabels.contains(r.getLong(1)),
        s"neighbor ${r.getLong(1)} fails the label filter")
    }
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length),
        s"query $q: ranks not dense")
      val hasSelf = rs.exists(r => r.getLong(1) == q)
      assert(hasSelf == okLabels.contains(q),
        s"query $q: self-retrieval ${hasSelf} vs filter " +
          s"${okLabels.contains(q)}")
    }
    // the gate itself must hold at spec scale too
    val gate = Similarity.annFilteredIvfQuery(spark, sfDir).collect()(0)
    assert(gate.getBoolean(1) && gate.getBoolean(2),
      s"filtered IVF gate red: $gate")
  }

  test("embedDrift: BigInt replay from raw embeddings, cohorts " +
      "conserve each label, parity halves sit near zero drift") {
    // columns: label, n0, n1, dist_sq_micro, top_dim, top_sq_str
    val rows = Similarity.embedDriftQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, sfDir, "embeddings").collect().map {
      r =>
        (r.getAs[Number]("label").longValue, r.getLong(
          r.fieldIndex("vec_id")) % 2,
          r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    }
    val byLabel = raw.groupBy(_._1)
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum ==
      raw.length, "cohorts must conserve the table")
    for (r <- rows) {
      val mine = byLabel(r.getLong(0))
      val (h0, h1) = mine.partition(_._2 == 0L)
      assert(r.getLong(1) == h0.length && r.getLong(2) == h1.length)
      val dims = h0.head._3.length
      def micro(v: Float): BigInt =
        BigInt(math.floor(v.toDouble * 1000000 + 0.5).toLong)
      val (n0, n1) = (BigInt(h0.length), BigInt(h1.length))
      var num = BigInt(0); var topSq = BigInt(-1); var topDim = -1
      for (d <- 0 until dims) {
        val s0 = h0.map(x => micro(x._3(d))).sum
        val s1 = h1.map(x => micro(x._3(d))).sum
        val diff = s0 * n1 - s1 * n0
        val sq = diff * diff
        num += sq
        if (sq > topSq) { topSq = sq; topDim = d }
      }
      val den = (n0 * n1) * (n0 * n1) * BigInt("1000000000000")
      assert(BigInt(r.getLong(3)) == num * 1000000 / den,
        s"label ${r.getLong(0)}: drift mismatch")
      assert(r.getLong(4) == topDim.toLong)
      assert(BigInt(r.getString(5)) == topSq)
      // interleaved halves of one distribution: the drift is pure
      // sampling noise — Σ_dim var·(1/n0 + 1/n1) ≈ 0.3 at the spec's
      // tiny n — far from the ≥ 1 a real centroid move would show
      assert(r.getLong(3) < 1000000L,
        s"parity halves drifted: ${r.getLong(3)}")
    }
  }

  test("annRebalance: no-drift re-estimate is a near-fixpoint; " +
      "drifted rebalance moves a partial, drift-tracking delta") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sfDir, "embeddings")
    val m1 = Similarity.buildIndex(spark, sfDir)
    // control: one Lloyd round on the UNCHANGED corpus must barely
    // move assignments (the quantizer was fitted on this corpus — a
    // large move count would mean the "incremental re-estimate" is
    // really a re-fit and the delta-driven claim is vacuous)
    val m1b = Similarity.lloydRound(emb, m1)
    def moves(df: org.apache.spark.sql.DataFrame,
        a: Array[Array[Float]], b: Array[Array[Float]]): Long =
      df.select((Similarity.cellOf(a, col("embedding")) =!=
          Similarity.cellOf(b, col("embedding"))).as("mv"))
        .filter(col("mv")).count()
    val n = emb.count()
    val stable = moves(emb, m1, m1b)
    assert(stable * 10 < n, s"no-drift round moved $stable of $n")
    // the gate row: every boolean invariant holds and the counts are
    // the table's
    val r = Similarity.annRebalanceQuery(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == emb.filter(pmod(col("vec_id"), lit(5L))
      === 0L).count())
    assert(r.getBoolean(2) && r.getBoolean(3))
    assert(r.getBoolean(5) && r.getBoolean(6))
  }

  test("annAppend: frozen-quantizer ingest — batch assigns without " +
      "moving the base, the refit counterfactual would") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sfDir, "embeddings")
    val r = Similarity.annAppendQuery(spark, sfDir).collect()(0)
    val nNew = emb.filter(pmod(col("vec_id"), lit(4L)) === 0L).count()
    assert(r.getLong(0) == emb.count() - nNew, "base count")
    assert(r.getLong(1) == nNew, "batch count")
    assert(r.getBoolean(2), "batch must land in [1, k] cells")
    assert(r.getBoolean(3),
      "a merged-corpus refit must move some base vector — otherwise " +
        "the frozen-quantizer contrast is vacuous")
    assert(r.getLong(4) == 20L && r.getBoolean(5) && r.getBoolean(6),
      "post-append serving must self-retrieve the batch and hold " +
        "the recall floor")
  }

  test("pqAppend: frozen-codebook encode — complete in-range codes, " +
      "bounded coverage, refit counterfactual, ADC serving holds") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sfDir, "embeddings")
    val r = Similarity.pqAppendQuery(spark, sfDir).collect()(0)
    val nNew = emb.filter(pmod(col("vec_id"), lit(4L)) === 0L).count()
    assert(r.getLong(0) == emb.count() - nNew, "base count")
    assert(r.getLong(1) == nNew, "batch count")
    assert(r.getBoolean(2), "every batch vector must emit m codes")
    assert(r.getBoolean(3), "codes must lie in [0, ksub)")
    assert(r.getBoolean(4), "coverage must be bounded by m*ksub")
    assert(r.getBoolean(5),
      "a merged-corpus codebook refit must re-code some base vector " +
        "— otherwise the frozen-codebook contrast is vacuous")
    assert(r.getLong(6) == 5L && r.getBoolean(7) && r.getBoolean(8),
      "post-append ADC must self-retrieve the batch queries and " +
        "hold the PQ recall floor")
  }

  test("annTruncate: truncated ranking is well-formed, self-retrieves " +
      "at cosine 1.0, and overlap10 tallies the in_full flags") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.annTruncateQuery(spark, sfDir).collect()
    assert(rows.length == 50, "5 queries x top-10")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 10),
        s"ranks not 1..10 for query $q")
      // the query itself scores 1.0 in the truncated space too
      val self = rs.filter(_.getLong(2) == q)
      assert(self.length == 1 && self.head.getDouble(3) == 1.0,
        s"query $q does not self-retrieve at cos 1.0")
      val tally = rs.count(_.getBoolean(4)).toLong
      assert(rs.forall(_.getLong(5) == tally),
        s"overlap10 disagrees with the in_full tally for query $q")
      assert(tally >= 1, s"query $q: even self fell out of the " +
        "full top-10 — the join keys are broken")
      // truncated scores are non-increasing with rank
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("reblockCells: hot cell splits along cluster structure into the " +
      "refined key space, members partition exactly once, cold cells " +
      "keep plain keys, and the split is deterministic") {
    import SparkSpec.spark.implicits._
    // hot cell 0: 24 members in 3 cosine-separated clusters,
    // interleaved by id; cold cell 7: 4 members (< 2x target)
    val hot = (0 until 24).map { i =>
      val c = i % 3
      (i.toLong,
        Array.tabulate(8)(d => (if (d == c) 10f else 0f) + (i / 3) * 0.01f),
        0)
    }
    val cold = (100 until 104).map(i =>
      (i.toLong, Array.tabulate(8)(d => 1f + d * 0.001f), 7))
    val a0 = (hot ++ cold).toDF("vec_id", "embedding", "cell")
    def run(): Map[Long, Long] = Similarity.reblockCells(a0, target = 4L)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    val out1 = run()
    assert(out1 == run(), "re-blocking must be deterministic")
    assert(out1.size == 28, "hard partition: every member exactly once")
    cold.foreach { case (id, _, c) =>
      assert(out1(id) == c.toLong, s"cold cell member $id re-keyed") }
    val hotKeys = hot.map(h => out1(h._1)).toSet
    assert(hotKeys.forall(_ >= (1L << 24)),
      "split members must land in the disjoint refined key space")
    assert(hotKeys.size > 1, "the oversized cell must actually split")
    // members of DIFFERENT engineered clusters never share a sub-cell
    val subsByCluster = hot.groupBy(_._1 % 3)
      .map { case (c, hs) => c -> hs.map(h => out1(h._1)).toSet }
    for (c1 <- 0L to 2L; c2 <- 0L to 2L if c1 < c2)
      assert(subsByCluster(c1).intersect(subsByCluster(c2)).isEmpty,
        s"clusters $c1 and $c2 share a sub-cell")
  }
}
