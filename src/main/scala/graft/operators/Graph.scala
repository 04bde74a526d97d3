package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CacheBin.TrackOps

/**
 * Graph centrality over document link graphs — the page-importance
 * signal web-corpus pipelines weight their sampling by (the classic
 * complement to content quality scores). Sits beside the
 * connected-components operator in [[Dedup]]: CC answers "which docs
 * are the same", centrality answers "which docs matter".
 *
 * The iteration is the standard distributed PageRank shape: ranks live
 * as a (doc_id, pr) frame; each round is one equi-join onto the edge
 * list and one partial-aggregated groupBy on the destination — the
 * shuffle carries (dst, contribution) pairs, never adjacency lists,
 * and the iteration count is fixed (power iteration converges
 * geometrically; 3 rounds is the gate's pinned depth so the oracle can
 * replay it as chained CTEs).
 *
 * Variant note: dangling mass is dropped, not redistributed —
 * (1−d)/N + d·Σ incoming — the formulation replayable in pure SQL;
 * with the id-derived 3-out-link graph there are no dangling nodes.
 */
object Graph {

  // Fixed damping 0.85 (Brin/Page convention). The teleport mass is
  // written as the LITERAL 0.15 in both engines: the compile-time
  // double 1.0 − 0.85 differs from the literal 0.15 in the last bit.
  private val D = 0.85
  private val Teleport = 0.15

  /**
   * Deterministic id-derived link graph: doc i links to
   * (7i+3) mod N, (13i+5) mod N, (31i+11) mod N (self-links dropped) —
   * the multimodal gating pattern: the oracle rebuilds the same edges
   * from doc_id arithmetic, so the gate checks the ITERATION, not the
   * synthesis.
   */
  private def edges(docs: DataFrame, n: Long): DataFrame = {
    val i = col("doc_id")
    val dsts = array(
      pmod(i * 7 + 3, lit(n)), pmod(i * 13 + 5, lit(n)),
      pmod(i * 31 + 11, lit(n)))
    docs.select(i.as("src"), explode(dsts).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** Symmetrized edge list, persisted: every iterative consumer joins
    * it once per round, and without the pin each round's plan re-scans
    * documents and re-distincts the union — the fixed-round loops
    * below reference their per-round frames 2× each, so the unpinned
    * lineage doubles per round (measured r18: q_hits' executed plan
    * carried 310 Exchange nodes at 2 iterations; planning time alone
    * was seconds). */
  private def undirected(e: DataFrame): DataFrame =
    e.select(col("src"), col("dst"))
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().tracked()

  /**
   * 3-iteration PageRank from the uniform vector, each iteration
   * rounded to 10 decimals in BOTH engines so cross-engine
   * float-summation order noise (≈1e-16 per in-degree) can never
   * compound across rounds.
   */
  def pageRankQuery(spark: SparkSession, sfDir: String,
      iters: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // tracked: joined once per iteration — the pin stops each round's
    // plan from re-scanning documents and re-deriving degrees
    val withDeg = e.join(outdeg, Seq("src")).tracked()
    var ranks = docs.select(col("doc_id"),
      (lit(1.0) / n.toDouble).as("pr"))
    (1 to iters).foreach { _ =>
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("doc_id"))
        .select(col("dst"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      // per-round pin truncates the unrolled lineage (values are
      // fr-rounded, so materialization cannot change them)
      ranks = docs
        .join(contrib, docs("doc_id") === contrib("dst"), "left")
        .select(docs("doc_id"),
          fr(lit(Teleport / n.toDouble) +
            lit(D) * coalesce(col("in_sum"), lit(0.0)), 10).as("pr"))
        .tracked()
    }
    ranks.select(col("doc_id"), fr(col("pr") * n.toDouble, 8)
      .as("pr_scaled"))
      .orderBy(col("doc_id"))
  }

  /**
   * Exact triangle counting with degree-ordered edge orientation
   * (Cohen 2009 / Suri–Vassilvitskii 2011 "MR triangle counting"):
   * every undirected edge is directed from its lower-(degree, id)
   * endpoint to the higher, wedges are enumerated only at each edge's
   * LOW endpoint, and a wedge (b, c) closes iff the directed edge
   * b→c exists. Orientation bounds each node's out-degree by
   * O(√m) regardless of raw degree, so the wedge fan-out — the step
   * that explodes on power-law graphs (a 10M-degree hub would
   * otherwise emit 10¹³ wedges) — stays bounded at 100 TB: total
   * wedges ≤ m^1.5 instead of Σ deg². Two self-joins on 16-byte
   * (src, dst) pairs; adjacency lists never materialize.
   *
   * Counts per node: a triangle (a, b, c) increments all three — the
   * local clustering numerator, the spam/bot-farm signal web-corpus
   * curation weighs next to PageRank.
   */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonicalize: undirected, u < v, distinct, no self-loops
    val canon = edges
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = canon.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    // direct low → high in the (deg, id) total order
    // tracked: dir feeds three branches (both wedge sides + the
    // closing semi-join) — unpinned, the canon/degree chain computes
    // three times
    val dir = withDeg.select(
      when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("src"), col("v").as("dst"),
          col("dv").as("ddst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst"),
          col("du").as("ddst"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.ddst"))
      .tracked()
    val e1 = dir.select(col("src"), col("dst").as("b"),
      col("ddst").as("db"))
    val e2 = dir.select(col("src"), col("dst").as("c"),
      col("ddst").as("dc"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val tris = wedges.join(
      dir.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"), "left_semi")
    tris.select(explode(array(col("src"), col("b"), col("c")))
        .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Correctness gate for [[triangleCounts]]: id-derived local-window
    * graph — doc i raises edges (i, i+1+(i mod 3)), (i, i+2+(i mod 5)),
    * (i, i+3+(i mod 7)); offsets ≤ 10 keep the neighborhood (and the
    * oracle's triple join) bounded while the varying strides make the
    * triangle set irregular. Per-node counts, id-ordered. */
  /**
   * Synchronous label-propagation community detection (Raghavan,
   * Albert & Kumara, Phys. Rev. E 2007) over the symmetrized
   * id-derived link graph: every node starts as its own label; each
   * round, every node adopts the most frequent label among its
   * neighbors (ties to the SMALLEST label — the determinism pin the
   * async original lacks), for a fixed `iters` rounds so the oracle
   * can replay the evolution as chained CTEs. The output witnesses
   * both the final membership and the community sizes.
   *
   * Shape at 100 TB: each round is one equi-join of the edge list
   * onto the (node, label) frame + one map-side-partial (node, label)
   * vote count + one argmax agg — shuffles carry (id, label, count)
   * triples only, never adjacency lists; the argmax is
   * max_by(label, (cnt, −label)), no window sort anywhere. Same
   * iteration economics as [[pageRankQuery]]: fixed rounds × two
   * narrow shuffles.
   */
  def labelPropQuery(spark: SparkSession, sfDir: String,
      iters: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    propagate(docs, undirected(e), iters)
  }

  /** The [[labelPropQuery]] iteration over an explicit node/edge pair
    * (edges must already be symmetric): exposed so the spec can drive
    * hand-computed graphs through the exact production rounds. */
  private[graft] def propagate(docs: DataFrame, und: DataFrame,
      iters: Int): DataFrame = {
    var labels = docs.select(col("doc_id"), col("doc_id").as("label"))
    (1 to iters).foreach { _ =>
      val votes = und.join(labels, und("dst") === labels("doc_id"))
        .select(und("src").as("src"), col("label"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
      val winners = votes.groupBy(col("src"))
        .agg(max_by(col("label"), struct(col("cnt"), -col("label")))
          .as("new_label"))
      // labels is referenced twice per round (vote join + carry-over
      // coalesce): unpinned, the lineage doubles every iteration
      labels = labels
        .join(winners, labels("doc_id") === winners("src"), "left")
        .select(labels("doc_id"),
          coalesce(col("new_label"), col("label")).as("label"))
        .tracked()
    }
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select(col("doc_id"), col("label"), col("community_size"))
      .orderBy(col("doc_id"))
  }

  /**
   * HITS hubs and authorities (Kleinberg, JACM 1999) over the
   * DIRECTED id-derived link graph — the query-independent half of
   * the classic ranking pair: authority(v) = Σ hub over in-links,
   * hub(v) = Σ authority over out-links, sum-normalized each half
   * round. Two rounds, pinned, so the oracle replays the evolution as
   * unrolled CTEs (the [[pageRankQuery]] discipline).
   *
   * Exactness: per-node in/out sums are small-fan-in float sums
   * rounded to 10 dp (the pagerank rule); the GLOBAL normalization
   * sums — where float order would actually bite at scale — cast the
   * rounded scores to DECIMAL(24,10) first, so the denominator is
   * order-free exact on any partitioning.
   */
  def hitsQuery(spark: SparkSession, sfDir: String,
      iters: Int = 2): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    // tracked: e is joined twice per iteration (authority and hub
    // halves) — without the pin every half-round re-scans documents
    val eP = e.tracked()
    var hub = docs.select(col("doc_id"), (lit(1.0) / n.toDouble).as("h"))
    var auth = docs.select(col("doc_id"), lit(0.0).as("a"))
    (1 to iters).foreach { _ =>
      // rawA/rawH feed two branches each (their normalization sum and
      // the score join); auth/hub feed the next half-round AND the
      // final readout — every one pins, or the unrolled plan doubles
      // per half-round (measured r18: 310 Exchange nodes at iters=2)
      val rawA = eP.join(hub, eP("src") === hub("doc_id"))
        .groupBy(col("dst")).agg(fr(sum(col("h")), 10).as("ra"))
        .tracked()
      val sumA = rawA.agg(
        sum(col("ra").cast("decimal(24,10)")).cast("double").as("sa"))
      auth = docs.join(rawA, docs("doc_id") === rawA("dst"), "left")
        .crossJoin(broadcast(sumA))
        .select(docs("doc_id"),
          fr(coalesce(col("ra"), lit(0.0)) / col("sa"), 10).as("a"))
        .tracked()
      val rawH = eP.join(auth, eP("dst") === auth("doc_id"))
        .groupBy(col("src")).agg(fr(sum(col("a")), 10).as("rh"))
        .tracked()
      val sumH = rawH.agg(
        sum(col("rh").cast("decimal(24,10)")).cast("double").as("sh"))
      hub = docs.join(rawH, docs("doc_id") === rawH("src"), "left")
        .crossJoin(broadcast(sumH))
        .select(docs("doc_id"),
          fr(coalesce(col("rh"), lit(0.0)) / col("sh"), 10).as("h"))
        .tracked()
    }
    auth.join(hub.withColumnRenamed("doc_id", "d2"),
        auth("doc_id") === col("d2"))
      .select(col("doc_id"),
        fr(col("a") * n.toDouble, 8).as("authority"),
        fr(col("h") * n.toDouble, 8).as("hub"))
      .orderBy(col("doc_id"))
  }

  /**
   * K-core peeling (Seidman 1983) over the symmetrized id-derived
   * graph: repeatedly drop nodes with fewer than `k` live neighbors —
   * the degeneracy screen webgraph pipelines run to separate
   * organically-linked pages from link-farm fringe. `iters` fixed
   * synchronous peel rounds (the [[labelPropQuery]] discipline: a
   * pinned round count makes the evolution oracle-replayable as
   * unrolled CTEs; peeling converges monotonically, so extra rounds
   * only ever remove more).
   *
   * Shape at 100 TB: each round is one semi-join of the edge list
   * against the live set + one (node, degree) count — shuffles carry
   * (id, count) pairs; the live set is a shrinking id column, never
   * adjacency. Output witnesses per-node survival and the live-degree
   * trajectory's end state.
   */
  def kCoreQuery(spark: SparkSession, sfDir: String,
      k: Int = 5, iters: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    peel(docs, undirected(e), k, iters)
  }

  /** The [[kCoreQuery]] peel over an explicit node/edge pair (edges
    * must already be symmetric) — spec entry point. */
  private[graft] def peel(docs: DataFrame, und: DataFrame,
      k: Int, iters: Int): DataFrame = {
    var alive = docs.select(col("doc_id"))
    (1 to iters).foreach { _ =>
      // alive is referenced twice per round (both endpoints) — the
      // per-round pin stops the 2^iters lineage blowup
      val deg = und
        .join(alive.withColumnRenamed("doc_id", "src"), Seq("src"))
        .join(alive.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
      alive = deg.select(col("src").as("doc_id")).tracked()
    }
    val finalDeg = und
      .join(alive.withColumnRenamed("doc_id", "src"), Seq("src"))
      .join(alive.withColumnRenamed("doc_id", "dst"), Seq("dst"))
      .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
    docs
      .join(alive.withColumn("in_core", lit(true)), Seq("doc_id"), "left")
      .join(finalDeg.withColumnRenamed("src", "doc_id"), Seq("doc_id"),
        "left")
      .select(col("doc_id"),
        coalesce(col("in_core"), lit(false)).as("in_core"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
      .orderBy(col("doc_id"))
  }

  /**
   * Multi-source BFS hop distance from a seed set — the TrustRank-style
   * "distance from trusted pages" signal (Gyöngyi et al., VLDB 2004
   * propagate trust along links; hop distance is its order-0 form) and
   * the reachability screen for crawl-frontier triage. Seeds are every
   * 97th doc; distances are computed over the symmetrized id-derived
   * link graph for a fixed `iters` rounds, so unreached-within-k nodes
   * report −1 and the oracle replays every relaxation round as
   * unrolled CTEs (the [[pageRankQuery]] discipline).
   *
   * Shape at 100 TB: each round is one equi-join of the edge list onto
   * the (node, dist) frame + one min-agg — shuffles carry (id, dist)
   * pairs only. This gate relaxes the FULL settled set each round
   * (replayable in SQL); the production refinement is delta-frontier
   * expansion (join only nodes whose dist changed last round), which
   * changes cost, not results — min() is idempotent over re-relaxed
   * nodes.
   */
  def bfsDistQuery(spark: SparkSession, sfDir: String,
      iters: Int = 3): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    val seeds = docs.filter(pmod(col("doc_id"), lit(97L)) === 0)
    bfsFrom(docs, undirected(e), seeds, iters)
  }

  /** The [[bfsDistQuery]] relaxation over explicit node/edge/seed
    * frames (edges must already be symmetric) — spec entry point. */
  private[graft] def bfsFrom(docs: DataFrame, und: DataFrame,
      seeds: DataFrame, iters: Int): DataFrame = {
    var dist = seeds.select(col("doc_id"), lit(0L).as("dist"))
    (1 to iters).foreach { _ =>
      // dist is referenced twice per round (relaxation join + carry
      // union) — per-round pin, the label-prop rule
      val relaxed = und.join(dist, und("src") === dist("doc_id"))
        .select(und("dst").as("doc_id"), (col("dist") + 1L).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy(col("doc_id")).agg(min(col("dist")).as("dist"))
        .tracked()
    }
    docs.join(dist, Seq("doc_id"), "left")
      .select(docs("doc_id"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
      .orderBy(col("doc_id"))
  }

  /**
   * Adamic–Adar link prediction (Adamic & Adar, Social Networks 2003):
   * for each non-adjacent pair (a, b) sharing ≥ 2 common neighbors,
   * score Σ_z 1/ln(deg(z)) over the common neighbors z — rare shared
   * neighbors count more than hubs. The "which links are missing"
   * complement to [[triangleCounts]]' "which links close triangles":
   * entity-graph completion and related-page suggestion at corpus
   * scale.
   *
   * Scale shape: wedges are enumerated at the CENTER node (one
   * self-join of the adjacency on z), so the fan-out is Σ deg(z)² —
   * the power-law hazard — and the degCap skew guard excludes
   * hub centers (deg > cap) from enumeration BEFORE the join, exactly
   * the hot-shingle df-cap discipline from the Jaccard dedup path
   * (a 10M-degree hub would otherwise emit 10¹³ pairs while carrying
   * ≈ 0 Adamic–Adar weight each). The cap is mirrored in the oracle;
   * on the bounded-degree gate graph nothing reaches it.
   *
   * Hashed-column discipline (round 12): NO engine evaluates ln.
   * Because the degCap bounds deg to [2, 64], the 63 possible
   * 1/ln(deg) weights are a FIXED LITERAL TABLE in micro-units
   * (⌊10⁶/ln(d) + ½⌋, precomputed once; the identical 63 constants
   * appear verbatim in the oracle SQL), and the pair score is a
   * plain BIGINT sum of table entries. The same precedent as the PQ
   * literal norm table: when a transcendental's domain is finite and
   * small, bake its values — both engines then do pure integer
   * arithmetic.
   */
  def adamicAdarQuery(spark: SparkSession, sfDir: String,
      degCap: Int = 64): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    adamicAdar(undirected(e), degCap)
  }

  /** The [[adamicAdarQuery]] scoring over an explicit symmetric edge
    * frame — spec entry point. */
  /** ⌊10⁶/ln(d) + ½⌋ for d in [2, 64] — the Adamic–Adar weight
    * domain under the degCap. MUST stay textually identical to the
    * VALUES table in the q_adamic_adar3 oracle SQL. */
  private[graft] val aaWeightMicro: Seq[(Int, Long)] = Seq(
    (2, 1442695L), (3, 910239L), (4, 721348L), (5, 621335L),
    (6, 558111L), (7, 513898L), (8, 480898L), (9, 455120L),
    (10, 434294L), (11, 417032L), (12, 402430L), (13, 389871L),
    (14, 378923L), (15, 369269L), (16, 360674L), (17, 352956L),
    (18, 345976L), (19, 339623L), (20, 333808L), (21, 328459L),
    (22, 323515L), (23, 318929L), (24, 314658L), (25, 310667L),
    (26, 306928L), (27, 303413L), (28, 300102L), (29, 296974L),
    (30, 294014L), (31, 291207L), (32, 288539L), (33, 286000L),
    (34, 283578L), (35, 281266L), (36, 279055L), (37, 276938L),
    (38, 274908L), (39, 272958L), (40, 271085L), (41, 269283L),
    (42, 267546L), (43, 265873L), (44, 264257L), (45, 262697L),
    (46, 261189L), (47, 259730L), (48, 258318L), (49, 256949L),
    (50, 255622L), (51, 254335L), (52, 253085L), (53, 251871L),
    (54, 250690L), (55, 249543L), (56, 248425L), (57, 247338L),
    (58, 246279L), (59, 245246L), (60, 244239L), (61, 243257L),
    (62, 242299L), (63, 241363L), (64, 240449L))

  private[graft] def adamicAdar(und: DataFrame, degCap: Int): DataFrame = {
    require(degCap <= 64, s"degCap $degCap exceeds the literal " +
      "1/ln(deg) weight table domain [2, 64]")
    val spark = und.sparkSession
    import spark.implicits._
    val wtab = aaWeightMicro.toDF("deg", "w_micro")
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // centers: deg ≥ 2 (a 1-neighbor center spans no pair) and below
    // the skew cap; weight fixed per center via the literal micro
    // table, so it rides the adjacency
    val centers = deg
      .filter(col("deg") >= 2 && col("deg") <= degCap)
      .join(broadcast(wtab), Seq("deg"))
      .select(col("src").as("z"), col("w_micro"))
    // tracked: adj self-joins (x ⨝ y) — unpinned, both sides re-derive
    // the adjacency (und itself is referenced 3×: deg, adj, anti-join)
    val adj = und.join(centers, und("src") === centers("z"))
      .select(col("z"), col("w_micro"), und("dst").as("nb"))
      .tracked()
    val pairs = adj.as("x").join(adj.as("y"),
        col("x.z") === col("y.z") && col("x.nb") < col("y.nb"))
      .select(col("x.nb").as("a"), col("y.nb").as("b"),
        col("x.w_micro").as("w_micro"))
    val scored = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"),
        sum(col("w_micro")).as("aa_micro"))
    // link PREDICTION: existing edges are excluded (und is symmetric,
    // so the a<b orientation is present directly)
    scored
      .join(und.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
      .filter(col("common") >= 2)
      .select(col("a"), col("b"), col("common"), col("aa_micro"))
      .orderBy(col("a"), col("b"))
  }

  def trianglesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val i = col("doc_id")
    val e = Tables.load(spark, sfDir, "documents")
      .select(i.as("u"), explode(array(
        i + lit(1) + pmod(i, lit(3L)),
        i + lit(2) + pmod(i, lit(5L)),
        i + lit(3) + pmod(i, lit(7L)))).as("v"))
    triangleCounts(e).orderBy(col("node"))
  }

  /**
   * Local clustering coefficient + global transitivity — the
   * community-density readout on top of [[triangleCounts]]: per node
   * cc = 2·T(v)/(deg(v)·(deg(v)−1)) (what fraction of a node's
   * neighbor pairs are themselves connected — the spam-farm/cohesion
   * signal), and the corpus-level transitivity 3·T/W = ΣT(v)/W with
   * W = Σ C(deg, 2) open wedges.
   *
   * Hashed-column discipline: both ratios are EXACT RATIONALS in
   * micro-units — cc_micro = ⌊2·10⁶·T(v)/(deg·(deg−1))⌋ and
   * transitivity_micro = ⌊10⁶·ΣT(v)/W⌋, pure integer divisions on
   * exact BIGINT counts (no doubles anywhere, the round-12 rule).
   *
   * Shape at 100 TB: everything is [[triangleCounts]]' degree-ordered
   * wedge enumeration plus one id-keyed groupBy for degrees; the
   * global row is a broadcast one-row fold.
   */
  def clusteringCoef(edges: DataFrame): DataFrame = {
    // tracked: canon feeds the degree count here AND the whole
    // triangleCounts chain (which canonicalizes again internally)
    val canon = edges
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .tracked()
    val deg = canon.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // tracked: read twice (global one-row fold + per-node readout)
    val joined = deg
      .join(triangleCounts(canon), Seq("node"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .tracked()
    val global = joined.agg(
      sum(col("n_tri")).as("sum_tri"),
      // integer div, not `/`: long/2 routes through DOUBLE in Spark,
      // which loses exactness past 2^53 wedges
      expr("sum(deg * (deg - 1)) div 2").as("w"))
    joined.crossJoin(broadcast(global))
      .select(col("node"), col("deg"), col("n_tri"),
        when(col("deg") >= 2,
          expr("CAST((n_tri * 2000000) div (deg * (deg - 1)) " +
            "AS BIGINT)")).as("cc_micro"),
        expr("CAST((CAST(sum_tri AS DECIMAL(19,0)) * 1000000) div w " +
          "AS BIGINT)").as("transitivity_micro"))
  }

  /** Correctness gate: [[clusteringCoef]] over the q_triangles
    * id-derived local-window graph. */
  def clusteringCoefQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val i = col("doc_id")
    val e = Tables.load(spark, sfDir, "documents")
      .select(i.as("u"), explode(array(
        i + lit(1) + pmod(i, lit(3L)),
        i + lit(2) + pmod(i, lit(5L)),
        i + lit(3) + pmod(i, lit(7L)))).as("v"))
    clusteringCoef(e).orderBy(col("node"))
  }

  /**
   * Hierarchical subtree rollup (the BOM-explosion / org-rollup OLAP
   * shape): every node's descendant count and descendant value sum
   * over the implicit binary-heap hierarchy (node v's children are
   * 2v and 2v+1; node = doc_id + 1). The scalable trick is that heap
   * subtrees are CONTIGUOUS ID RANGES per level — subtree(v) =
   * ∪_k [v·2^k, (v+1)·2^k) — so the rollup needs NO edge joins and
   * no per-level iteration: one global prefix sum over node order,
   * then each node reads 2·⌈log₂ n⌉ prefix probes via equi-joins.
   * A 20-level hierarchy rolls up in O(n log n) flat work where the
   * naive bottom-up pass is 20 sequential self-joins.
   *
   * Exactness: prefix sums and every range difference are exact
   * BIGINTs; depth = len(bin(node)) − 1 (integer, no float log).
   * The heap-range algebra requires DENSE node ids 1..n, but doc_ids
   * need not be dense (the sf1 ScaleUp corpus shifts them into a
   * 9e9+ range): the dense id is DERIVED as the running row count
   * over doc_id order, computed in the same [[Prefix.running]]
   * two-phase distributed scan (per-partition aggregates +
   * earlier-partition offsets, the q_token_budget device) that
   * yields the value prefix sum — one pass, no global window, no
   * row_number over the corpus. The numbered frame is persisted: it
   * is one (node, v, p) triple per document and feeds the range
   * expansion plus two prefix probes.
   */
  def hierarchyRollupQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val numbered = Prefix.running(
        Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), col("n_chars").as("v")),
        Seq(), Seq(col("doc_id")),
        Seq(Prefix.Running(lit(1L), "cnt", "node"),
          Prefix.Running(col("v"), "sum", "p")))
      .tracked()
    val n = numbered.count()
    val docs = numbered.select(col("node"), col("v"))
    val prefix = numbered.select(col("node").as("idx"), col("p"))
    val maxK = (63 - java.lang.Long.numberOfLeadingZeros(n)).toInt + 1
    val ranges = docs
      .crossJoin(broadcast(spark.range(0, maxK + 1)
        .select(col("id").as("k"))))
      .select(col("node"), col("v"),
        // 2^k via an integer shift — not pow(): libm exponentials
        // carry no exactness guarantee, shifts do
        (col("node") *
          expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))"))
          .as("lo0"),
        ((col("node") + 1) *
          expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))") - 1)
          .as("hi0"))
      .filter(col("lo0") <= n)
      .select(col("node"), col("v"), col("lo0"),
        least(col("hi0"), lit(n)).as("hi"))
    val withBounds = ranges
      .join(prefix.select(col("idx").as("hi"), col("p").as("p_hi")),
        Seq("hi"))
      .join(prefix.select((col("idx") + 1).as("lo0"),
        col("p").as("p_lo")), Seq("lo0"), "left")
      .select(col("node"), col("v"),
        (col("hi") - col("lo0") + 1).as("cnt"),
        (col("p_hi") - coalesce(col("p_lo"), lit(0L))).as("s"))
    withBounds.groupBy(col("node"), col("v"))
      .agg(sum(col("cnt")).as("subtree_n"),
        sum(col("s")).as("subtree_sum"))
      .withColumn("depth",
        (length(expr("bin(node)")) - 1).cast("long"))
      .select(col("node"), col("v"), col("depth"), col("subtree_n"),
        col("subtree_sum"))
      .orderBy(col("node"))
  }

  /**
   * Weighted single-source shortest paths by fixed-round synchronous
   * Bellman–Ford relaxation — the weighted upgrade of [[bfsDistQuery]]
   * (hop counts say "3 links away"; edge weights say "7 ms / $7 / 7
   * transformations away", the form routing and lineage-cost queries
   * need). Edge weights are deterministic small INTEGERS
   * (1 + (src·7 + dst·13) mod 5), so every tentative distance stays
   * an exact BIGINT — no float accumulation anywhere in the
   * iteration, and the oracle replays all rounds as unrolled CTEs.
   *
   * Each round is one edge⋈distance join + a min-groupBy: shuffles
   * carry (node, BIGINT) pairs only. Fixed `iters` bounds the
   * frontier exactly like the BFS/PageRank family: distances reported
   * are correct for paths of ≤ `iters` edges (-1 = unreached within
   * the horizon), the standard bounded-relaxation contract at scale.
   */
  def ssspQuery(spark: SparkSession, sfDir: String,
      iters: Int = 4): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val n = docs.count()
    val e = edges(docs, n)
    val und = undirected(e)
      .withColumn("w",
        pmod(col("src") * 7 + col("dst") * 13, lit(5L)) + 1L)
    val seeds = docs.filter(pmod(col("doc_id"), lit(97L)) === 0)
    var dist = seeds.select(col("doc_id"), lit(0L).as("dist"))
    (1 to iters).foreach { _ =>
      // per-round pin, the bfs rule (dist referenced twice per round)
      val relaxed = und.join(dist, und("src") === dist("doc_id"))
        .select(und("dst").as("doc_id"),
          (col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy(col("doc_id")).agg(min(col("dist")).as("dist"))
        .tracked()
    }
    docs.join(dist, Seq("doc_id"), "left")
      .select(docs("doc_id"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
      .orderBy(col("doc_id"))
  }
}
