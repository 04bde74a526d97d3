package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/**
 * Physical-plan assertions: the properties that make these operators
 * survive a 100x scale-up (pushdown, pruning, broadcast choice,
 * TakeOrdered) are pinned here so a refactor can't silently regress
 * them.
 */
class PlanSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    // materialize AQE final plan for join-strategy checks
    df.queryExecution.executedPlan.toString + "\n" +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
  }

  test("scanFilter pushes predicates and prunes columns at the scan") {
    val p = planString(Relational.scanFilter(spark, sfDir))
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_discount") &&
      p.contains("LessThan(l_quantity"), s"filters not pushed:\n$p")
    // projection pruning: the scan must not read unrelated columns
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"),
      "scan reads columns the query never uses")
  }

  test("q1 aggregation is partial (map-side) then final") {
    val p = planString(Relational.q1Agg(spark, sfDir))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"no partial aggregation stage:\n$p")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      "date filter not pushed to scan")
  }

  test("q5 star join broadcasts every dimension") {
    val df = Relational.q5Join(spark, sfDir)
    df.collect() // let AQE finalize
    val p = planString(df)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
  }

  test("topN compiles to TakeOrderedAndProject (no global sort)") {
    val p = planString(Relational.topN(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"global sort used:\n$p")
  }

  // annBruteForceQuery now serves from the shared materialized
  // reference store, so the plan under audit is the store-BUILDING
  // brute-force pass (the same expression the store write runs)
  private def bruteForcePlanUnderTest = {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    Similarity.bruteForceTopK(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
      emb, 10)
  }

  test("brute-force ANN broadcasts the query side, not the corpus") {
    val p = planString(bruteForcePlanUnderTest)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"no broadcast in ANN plan:\n$p")
  }

  test("vector kernels run inside whole-stage codegen") {
    // AQE defers codegen until execution; disable it for a static view
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = bruteForcePlanUnderTest
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      assert(codegen.contains("WholeStageCodegen"), codegen.take(2000))
      // the kernel call compiles into a generated-code unit (the
      // projection over the join output), not interpreted eval
      assert(codegen.contains("graft_cosine") ||
        codegen.contains("FloatVecCosine"), codegen.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("MIN/MAX/COUNT over ORC push to footer stats (no data scan)") {
    val dir = graft.sources.OrcIo.scratchDir("aggpd")
    graft.sources.OrcIo.write(
      Tables.load(spark, sfDir, "orders"), s"$dir/orders")
    import org.apache.spark.sql.functions._
    // aggregate pushdown requires the DSv2 read path (ORC sits in
    // useV1SourceList by default)
    spark.conf.set("spark.sql.sources.useV1SourceList", "parquet")
    try {
      val agg = spark.read.orc(s"$dir/orders")
        .agg(min(col("o_orderkey")), max(col("o_orderkey")), count(lit(1)))
      val p = planString(agg)
      assert(p.contains("PushedAggregation: [MIN(o_orderkey), " +
        "MAX(o_orderkey), COUNT(*)]"), s"aggregates not pushed:\n$p")
      val src = Tables.load(spark, sfDir, "orders")
      val expected = src.agg(min(col("o_orderkey")),
        max(col("o_orderkey")), count(lit(1))).head()
      assert(agg.head() == expected,
        s"footer answer ${agg.head()} != scan answer $expected")
    } finally spark.conf.set("spark.sql.sources.useV1SourceList",
      "avro,csv,json,kafka,orc,parquet,text")
  }

  test("filter pushdown stays correct under widened reader schema") {
    // §7.4 PPD-safety: pushing a predicate through an int->long widening
    // must not drop rows (the reference gates this via
    // SchemaEvolution.isPPDSafeConversion)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = graft.sources.OrcIo.scratchDir("ppdevo")
    graft.sources.OrcIo.write(
      Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name")), s"$dir/n")
    val evolved = spark.read.schema(StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType))))
      .orc(s"$dir/n")
      .filter(col("n_nationkey") >= 10L && col("n_nationkey") < 20L)
    assert(evolved.count() == 10L)
    val keys = evolved.select(col("n_nationkey"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(keys == (10L until 20L))
  }

  test("partition pruning: a partition-column filter reads only that " +
      "directory's files (static), and a filtered dim join prunes " +
      "fact partitions at runtime (dynamic)") {
    import org.apache.spark.sql.functions._
    import SparkSpec.spark.implicits._
    val dir = graft.sources.OrcIo.scratchDir("part_prune")
    graft.sources.OrcIo.write(
      Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type")),
      s"$dir/events", partitionBy = Seq("event_type"))
    val all = spark.read.orc(s"$dir/events")
    val nTypes = all.select(col("event_type")).distinct().count()
    assert(nTypes >= 3, "fixture needs several partitions")

    // recursive scan finder that descends into AQE stages
    def scans(p: SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }

    // static pruning: the scan plans only the matching directory
    // (collect() so the metrics belong to THIS QueryExecution — a
    // write would execute a separate plan instance)
    val one = all.filter(col("event_type") === "click")
    one.collect()
    val scan = scans(one.queryExecution.executedPlan).head
    assert(scan.metrics("numPartitions").value == 1,
      s"static pruning read ${scan.metrics("numPartitions").value} " +
        s"of $nTypes partitions")

    // dynamic pruning: join against a dim filtered to one type — the
    // fact scan's partition filter is a runtime subquery (DPP), so
    // only the surviving partition is read
    // the dim must live on disk: a filter over a LocalRelation is
    // constant-folded away, and DPP keys on a surviving selective
    // Filter on the build side
    Seq(("click", 1), ("view", 0), ("purchase", 0), ("login", 0),
      ("search", 0)).toDF("event_type", "flag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("flag") === 1)
    val joined = all.join(dim.hint("broadcast"), Seq("event_type"))
    joined.collect()
    val jp = joined.queryExecution.executedPlan.toString
    assert(jp.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery in plan:\n$jp")
    val jScan = scans(joined.queryExecution.executedPlan)
      .find(_.output.exists(_.name == "event_id")).get
    assert(jScan.metrics("numPartitions").value == 1,
      s"DPP read ${jScan.metrics("numPartitions").value} of $nTypes")
  }

  test("exact dedup shuffles the digest, not the document text") {
    val p = planString(Dedup.exactQuery(spark, sfDir))
    val hashExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(hashExchanges.nonEmpty, s"no hash shuffle found:\n$p")
    // the grouping key is the computed md5 digest (Catalyst names it
    // _groupingexpression); the raw text attribute must not be shuffled
    assert(!hashExchanges.exists(_.contains("text#")),
      s"document text flows through the shuffle:\n$hashExchanges")
  }

  test("IVF assignment is a projection: kernel inline, probes broadcast") {
    Similarity.buildIndex(spark, sfDir)
    val p = planString(Similarity.ivfTopK(spark, sfDir))
    // cell assignment happens inside a Project via the native kernel —
    // no join against a centroid table, no window over the corpus
    assert(p.contains("graft_nearest_cells"),
      s"assignment kernel missing from plan:\n$p")
    // the probe (query) side broadcasts; the corpus is never broadcast
    // and never hash-shuffled on the embedding
    assert(p.contains("BroadcastHashJoin"),
      s"probe join should be broadcast:\n$p")
    assert(!p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("c_emb")),
      s"corpus embeddings flow through a shuffle:\n$p")
  }

  test("segment dedup: text never enters an exchange; strip pass is " +
      "a native projection") {
    val p = planString(graft.SparkEntry.queries("q_dedup_segments")(
      spark, sfDir))
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"no df-count shuffle found:\n$p")
    // pass 1 shuffles (hash, doc_id) pairs only — document text and
    // the segment strings must stay out of every exchange
    assert(!exchanges.exists(e => e.contains("text#") || e.contains("segs#")),
      s"text/segments flow through a shuffle:\n$exchanges")
    // the boilerplate set rides a broadcast, and removal is the native
    // kernel inside a Project (not a join per segment)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("Broadcast"),
      s"boilerplate set not broadcast:\n$p")
    assert(p.contains("graft_seg_strip"), s"strip kernel not in plan:\n$p")
  }

  test("PQ serving scans the code store, not the fp32 embeddings") {
    val p = planString(Similarity.pqTopK(spark, sfDir))
    // the corpus side must read the materialized codes parquet; the
    // embeddings table appears only on the (broadcast) query side
    val scans = p.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(scans.exists(_.contains("pq_codes")),
      s"code-store scan missing:\n$scans")
    // the scored (streamed) side never materializes an embedding col:
    // no exchange may carry one
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("embedding#")),
      s"fp32 embeddings shuffled at serving time:\n$exchanges")
  }

  test("span dedup: only (key, doc, pos) triples enter an exchange, " +
      "never text or gram strings") {
    val p = planString(Dedup.dupSpansQuery(spark, sfDir))
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"no shuffle found:\n$p")
    assert(!exchanges.exists(e => e.contains("text#") ||
        e.contains("gram#")),
      s"text/gram strings flow through a shuffle:\n$exchanges")
  }

  test("bloom incremental dedup: the filter rides one broadcast row; " +
      "only the bloom-positive slice joins the corpus") {
    val p = planString(Dedup.bloomIncrementalQuery(spark, sfDir))
    assert(p.contains("graft_bloom_might"), s"probe not in plan:\n$p")
    assert(p.contains("Broadcast"), s"bloom row not broadcast:\n$p")
    // the probe gates both branches — Catalyst inlines it into the
    // branch join/filter conditions (NOT might(...) on the negative
    // side), and the positive slice still pays the exact anti-join
    assert(p.linesIterator.exists(l =>
      l.contains("graft_bloom_might") &&
        (l.contains("Join") || l.contains("Filter"))),
      s"probe not gating a branch:\n$p")
    assert(p.contains("LeftAnti"), s"exact verify anti-join missing:\n$p")
  }

  test("jaccard DF cap: hot-shingle filter is a broadcast anti join") {
    val p = planString(Dedup.ngramJaccardQuery(spark, sfDir))
    // the anti join against the (tiny) hot-shingle set must broadcast —
    // a shuffled anti join would move the whole inverted index twice
    assert(p.contains("LeftAnti"), s"no anti join in plan:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("LeftAnti") && l.contains("Broadcast")),
      s"hot-shingle anti join is not broadcast:\n$p")
  }

  test("label propagation / k-core rounds: exchanges carry ids and " +
      "counts, never adjacency lists or text") {
    Seq(
      graft.operators.Graph.labelPropQuery(spark, sfDir),
      graft.operators.Graph.kCoreQuery(spark, sfDir)).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(exchanges.nonEmpty)
      assert(!exchanges.exists(_.contains("text#")),
        s"document text entered a graph-iteration exchange:\n$exchanges")
    }
  }

  test("bootstrap: one narrow scan, map-side partial agg, no shuffle " +
      "of the corpus rows") {
    val p = graft.operators.Sampling.bootstrapQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"),
      s"bootstrap must partial-aggregate:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"document text entered the bootstrap exchange:\n$exchanges")
  }

  test("A-ES WOR sample compiles to a bounded heap, not a global sort") {
    val p = graft.operators.Sampling.weightedWorQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"WOR top-k should be a bounded heap:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"WOR sample must not shuffle the corpus:\n$p")
  }

  test("set-similarity join: raw document text never enters an " +
      "exchange (only token arrays for candidate verification)") {
    val p = graft.operators.Dedup.setSimJoinQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"raw text entered a set-sim exchange:\n$exchanges")
  }

  test("seasonal anomaly: the profile joins back as a broadcast — " +
      "no window over the series") {
    val p = graft.operators.Scale.seasonalAnomalyQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"seasonal profile must broadcast:\n$p")
    assert(!p.contains("Window"),
      s"seasonal scoring must not use a series window:\n$p")
  }

  test("bfs / adamic-adar: iteration exchanges carry ids, never text") {
    Seq(
      graft.operators.Graph.bfsDistQuery(spark, sfDir),
      graft.operators.Graph.adamicAdarQuery(spark, sfDir)).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(exchanges.nonEmpty)
      assert(!exchanges.exists(_.contains("text#")),
        s"document text entered a graph exchange:\n$exchanges")
    }
  }

  test("skyline: both prune tables broadcast; no cartesian or " +
      "sort-merge join anywhere") {
    val p = graft.operators.Relational.skylineQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"skyline prune tables must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin"),
      s"skyline must never go quadratic or shuffle-join the corpus:\n$p")
  }

  test("decay agg / ab test: the event stream folds map-side — " +
      "exchanges carry only group keys and partial aggregates") {
    Seq(
      graft.operators.Behavior.decayAggQuery(spark, sfDir),
      graft.operators.Behavior.abTestQuery(spark, sfDir)).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("HashAggregate"),
        s"behavior queries must partial-aggregate:\n$p")
      val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(!exchanges.exists(_.contains("props#")),
        s"event props entered a behavior exchange:\n$exchanges")
    }
  }

  test("markov: the only window partitions by user — no " +
      "corpus-global window sort") {
    val p = graft.operators.Behavior.markovQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, s"markov needs the lag window:\n$p")
    // a global window would appear as Window with an empty partition
    // spec — every window line here must mention the user_id key
    assert(windows.filter(_.contains("windowspecdefinition"))
      .forall(_.contains("user_id#")),
      s"markov window is not user-partitioned:\n$windows")
  }

  test("readability: pure projection — no exchange, no explode") {
    val p = graft.operators.TextAnalysis.readabilityQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the per-word syllable loop is a lambda over the in-row array;
    // the only wide operator is the output sort
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange")).toSeq
    assert(exchanges.size <= 1,
      s"readability should only shuffle for the output sort:\n$p")
    assert(!p.contains("Generate"),
      s"readability must not explode the token array:\n$p")
  }

  test("filtered ann: the label predicate sits under the distance " +
      "math, and corpus embeddings never shuffle") {
    val p = graft.operators.Similarity.annFilteredQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("(label"),
      s"label filter missing from the plan:\n$p")
    // embeddings may enter the broadcast of the 5 probe rows, but
    // no repartition exchange may carry the corpus embedding column
    val shuffles = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning")).toSeq
    assert(!shuffles.exists(_.contains("c_emb#")),
      s"corpus embeddings flow through a shuffle:\n$shuffles")
  }

  test("contingency / ks / survival / acf: event rows fold before " +
      "any wide operator — exchanges carry grid rows only") {
    for ((name, df) <- Seq(
      "contingency" ->
        graft.operators.Inference.contingencyQuery(spark, sfDir),
      "ks" -> graft.operators.Inference.ksTestQuery(spark, sfDir),
      "survival" -> graft.operators.Inference.survivalQuery(spark, sfDir),
      "acf" -> graft.operators.Inference.acfQuery(spark, sfDir))) {
      val p = df.queryExecution.executedPlan.toString
      val bad = p.linesIterator.filter(l =>
        l.contains("Exchange") && (l.contains("event_id#") ||
          l.contains("props#"))).toSeq
      assert(bad.isEmpty,
        s"$name: raw event rows cross an exchange:\n$bad")
      assert(p.contains("HashAggregate"),
        s"$name: expected a map-side partial aggregate:\n$p")
    }
  }

  test("bitmap audience: pair algebra runs on bitmap rows — the " +
      "bitmap words never cross a repartition exchange") {
    val p = graft.operators.Scale.bitmapAudienceQuery(spark, sfDir)
      .queryExecution.executedPlan.toString
    // user_id exchanges are expected (the dictionary-encode join and
    // the bitmap build are stream-sized by design); what must NOT
    // happen is the pair/rollup algebra shuffling the bitmap arrays
    // themselves — those stay on k-row broadcast-joined frames
    val shuffles = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!shuffles.exists(_.contains("bm#")),
      s"bitmap arrays flow through a shuffle:\n$shuffles")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"pair algebra should broadcast the k-row bitmap frame:\n$p")
  }

  /** Reusable scale gate: NO window operator anywhere in the plan may
    * have an empty partition spec. An unpartitioned window is a
    * single-task sort of its entire input frame — the plan shape that
    * silently works at sf0.1 and walls at 100 TB. Queries that need a
    * global running aggregate use [[graft.operators.Prefix.running]]
    * (range partition + per-partition windows + join-based offsets),
    * which leaves every remaining Window partitioned. */
  private def noGlobalWindow(name: String, df: DataFrame): Unit = {
    val global = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"$name has ${global.size} unpartitioned Window operator(s): " +
        global.map(_.windowExpressions.mkString(", ")).mkString("; "))
  }

  test("no unpartitioned window in any query that ships one — the " +
      "prefix-scan family and the per-entity window family") {
    for ((name, df) <- Seq(
      "q_spearman3" -> Stats.spearmanQuery(spark, sfDir),
      "q_seq_bucket" -> Curation.seqBucketQuery(spark, sfDir),
      "q_weighted_percentiles" ->
        Relational.weightedPercentilesQuery(spark, sfDir),
      "q_pareto" -> Stats.paretoQuery(spark, sfDir),
      "q_rfm_features" -> Behavior.rfmFeaturesQuery(spark, sfDir),
      "q_concurrency" -> Scale.concurrencyQuery(spark, sfDir),
      "q_lateness_audit" ->
        graft.streaming.StreamingIngest.latenessAuditQuery(spark, sfDir),
      "q_token_budget" -> Curation.tokenBudgetQuery(spark, sfDir),
      "q_markov2" -> Behavior.markovQuery(spark, sfDir),
      "q_event_paths" -> Behavior.eventPathsQuery(spark, sfDir),
      "q_cusum3" -> Scale.cusumQuery(spark, sfDir),
      "q_ks_test" -> Inference.ksTestQuery(spark, sfDir),
      "q_hierarchy_rollup" -> Graph.hierarchyRollupQuery(spark, sfDir),
      // the round-10 suite-wide WindowAudit catches: dictionary rank,
      // layout ntiles, SNM rank, vocab ranks — all corpus-derived
      // frames now on Prefix.running
      "q_bitmap_audience" -> Scale.bitmapAudienceQuery(spark, sfDir),
      "q_layout_advisor" -> Scale.layoutAdvisorQuery(spark, sfDir),
      "q_sorted_neighborhood" ->
        Linkage.sortedNeighborhoodQuery(spark, sfDir),
      "q_gini" -> TextAnalysis.giniQuery(spark, sfDir),
      "q_zipf" -> TextAnalysis.zipfQuery(spark, sfDir)))
      noGlobalWindow(name, df)
    // Queries NOT gated here ship windows over frames that do not grow
    // with the corpus, re-audited via graft.tools.WindowAudit r10
    // (r14: q_retrieval_eval's 5 ranks ride the same armK-bounded
    // lists as q_rrf_fusion):
    // k-row picks (q_kmeans seeds, q_sample_weighted top-k,
    // q_rrf_fusion / q_retrieval_eval armK lists), fixed grids
    // (q_calibration / q_ece 16 buckets,
    // q_seasonal_decompose hours, q_trend_test / q_user_growth days,
    // q_survival event-hour grid, q_skyline bucket/date grids), and
    // q_rank_ensemble's rounded value domains.
  }

  test("index serving prunes posting shards: the scan plans only the " +
      "query terms' partitions") {
    import org.apache.spark.sql.functions._
    def scans(p: SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val store = Retrieval.buildInvIndex(spark, sfDir)
    val nShardDirs = new java.io.File(s"$store/postings").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(nShardDirs >= 8, s"fixture built only $nShardDirs shards")
    val terms = Seq("merge", "vector", "stream")
    import SparkSpec.spark.implicits._
    val nQueryShards = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(16L))).distinct().count()
    val served = Retrieval.indexServeQuery(spark, sfDir, terms)
    served.collect()
    val postScan = scans(served.queryExecution.executedPlan)
      .find(_.schema.fieldNames.contains("term")).get
    val read = postScan.metrics("numPartitions").value
    assert(read == nQueryShards,
      s"postings scan read $read of $nShardDirs shard partitions — " +
        s"expected exactly the $nQueryShards query-term shards")
  }

  test("every oracleSql key names a registered query (a typo here " +
      "silently downgrades a hash gate to rows-only)") {
    val qs = graft.SparkEntry.queries.keySet
    val orphans = graft.SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    // the reverse direction is informational: a handful of gates are
    // deliberately invariant-typed, but silent growth of the
    // oracle-less set is a coverage leak — pin the exact set
    val noOracle = qs -- graft.SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without an oracle entry: $noOracle")
  }
}
