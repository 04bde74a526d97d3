package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank invariants: probability-mass conservation (no dangling
  * nodes in the id-derived graph), the teleport floor, and run-to-run
  * determinism. */
class GraphSpec extends SparkSpec {

  test("pagerank: mass conserved, teleport floor holds, deterministic") {
    val rows = Graph.pageRankQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toDouble
    // pr_scaled = pr * N, so Σ pr = Σ pr_scaled / N ≈ 1
    val mass = rows.map(_.getDouble(1)).sum / n
    assert(math.abs(mass - 1.0) < 1e-6,
      s"rank mass $mass drifted from 1 (dangling leak?)")
    // every node keeps at least the teleport mass (scaled: 0.15)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.15 - 1e-9,
        s"doc ${r.get(0)}: rank ${r.getDouble(1)} below teleport floor")
    }
    val again = Graph.pageRankQuery(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("triangle counts: hand-computed K4 + pendant, dirty-input canon") {
    import SparkSpec.spark.implicits._
    // K4 on {1,2,3,4} has C(4,3)=4 triangles; every K4 node sits in
    // exactly 3 of them. Node 5 hangs off node 4 and closes nothing.
    // Dirty input: a reversed duplicate (3,1), an exact duplicate
    // (1,2), and a self-loop (2,2) must all be absorbed by
    // canonicalization — counted once, loop dropped.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (3L, 1L), (1L, 2L), (2L, 2L))
      .toDF("u", "v")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"per-node triangle counts wrong: $got")
    // corner sum = 3 x triangle count
    assert(got.values.sum == 3L * 4L)
  }

  test("label propagation: hand-computed 3-round trace on bridged " +
      "triangles — the bridge does not merge the communities") {
    import SparkSpec.spark.implicits._
    // Two triangles {0,1,2} and {3,4,5} joined by bridge 2-3.
    // r1: [1,0,0,2,3,3]  (min-label ties from the identity start)
    // r2: [0,0,0,3,2,2]
    // r3: [0,0,0,2,2,2]  -> communities 0 (size 3) and 2 (size 3)
    val docs = (0L to 5L).toDF("doc_id")
    val base = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val und = (base ++ base.map(_.swap)).toDF("src", "dst")
    val got = Graph.propagate(docs, und, 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      0L -> ((0L, 3L)), 1L -> ((0L, 3L)), 2L -> ((0L, 3L)),
      3L -> ((2L, 3L)), 4L -> ((2L, 3L)), 5L -> ((2L, 3L))),
      s"trace mismatch: $got")
    // determinism: same result on a repartitioned edge list
    val again = Graph.propagate(docs.repartition(5),
      und.repartition(3), 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(again == got)
  }

  test("k-core peel: hand-computed K4+pendant trace and the cascade " +
      "property on a path") {
    import SparkSpec.spark.implicits._
    def sym(edges: Seq[(Long, Long)]) =
      (edges ++ edges.map(_.swap)).toDF("src", "dst")
    // K4 on {1,2,3,4} + pendant 5-4, k=3: pendant peels round 1
    // (deg 1), K4 survives (each deg 3 in-core; node 4 loses the
    // pendant edge but keeps 3)
    val docs = (1L to 5L).toDF("doc_id")
    val und = sym(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L)))
    val got = Graph.peel(docs, und, k = 3, iters = 3).collect()
      .map(r => (r.getLong(0), (r.getBoolean(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((true, 3L)), 2L -> ((true, 3L)), 3L -> ((true, 3L)),
      4L -> ((true, 3L)), 5L -> ((false, 0L))), s"got $got")
    // cascade: path 1-2-3-4-5, k=2 — endpoints die r1, their
    // neighbors' live degree drops to 1 and they die r2, the center
    // dies r3: three rounds empty the whole path
    val pdocs = (1L to 5L).toDF("doc_id")
    val path = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val peeled = Graph.peel(pdocs, path, k = 2, iters = 3).collect()
    assert(peeled.forall(!_.getBoolean(1)),
      "the k=2 cascade must empty a 5-path within 3 rounds")
    // but only 2 rounds leaves the center alive (synchronous rounds
    // peel one hop per round — the fixed-depth semantics the oracle
    // replays)
    val partial = Graph.peel(pdocs, path, k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(partial(3L) && !partial(1L) && !partial(2L),
      s"2-round peel should leave only the center: $partial")
  }

  test("bfs distance: hand-computed hops on a path + unreached -1, " +
      "and min over two seeds") {
    import SparkSpec.spark.implicits._
    def sym(edges: Seq[(Long, Long)]) =
      (edges ++ edges.map(_.swap)).toDF("src", "dst")
    // path 0-1-2-3-4-5 with isolated node 9; seed {0}: dist = hop
    // index, 4-5 and 9 unreached within 3 rounds -> 4->-1? no: 4 is
    // 4 hops -> -1 after 3 rounds; 9 disconnected -> -1
    val docs = (Seq(0L, 1L, 2L, 3L, 4L, 5L, 9L)).toDF("doc_id")
    val path = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L)))
    val seeds0 = Seq(0L).toDF("doc_id")
    val got = Graph.bfsFrom(docs, path, seeds0, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> -1L, 5L -> -1L, 9L -> -1L), s"got $got")
    // two seeds {0, 5}: every node takes the MIN distance over seeds
    val seeds2 = Seq(0L, 5L).toDF("doc_id")
    val got2 = Graph.bfsFrom(docs, path, seeds2, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L,
      4L -> 1L, 5L -> 0L, 9L -> -1L), s"got $got2")
    // determinism across repartitioning
    val again = Graph.bfsFrom(docs.repartition(4), path.repartition(3),
      seeds2, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == got2)
  }

  test("adamic-adar: hand-computed wedge weights, edge exclusion, " +
      "and the degree skew cap") {
    import SparkSpec.spark.implicits._
    def sym(edges: Seq[(Long, Long)]) =
      (edges ++ edges.map(_.swap)).toDF("src", "dst")
    // graph: star center 0 over {1,2,3}, edge 1-2, and centers 7, 8
    // each adjacent to {1,3}. Degrees: 0:3, 1:4, 2:2, 3:3, 7:2, 8:2.
    // Pairs with >= 2 common neighbors and no existing edge:
    //   (1,3): commons {0,7,8} -> 1/ln3 + 2/ln2
    //   (0,7), (0,8): commons {1,3} -> 1/ln4 + 1/ln3
    //   (7,8): commons {1,3}       -> 1/ln4 + 1/ln3
    // (1,2) has common {0} but is an existing edge AND below the
    // floor; (2,3), (0,1) etc. have only 1 common neighbor.
    val und = sym(Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L),
      (7L, 1L), (7L, 3L), (8L, 1L), (8L, 3L)))
    val got = Graph.adamicAdar(und, degCap = 64).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // per-center weights come from the literal ⌊10⁶/ln(deg)+½⌋
    // table — mirror it here from the same constant seq
    val wtab = Graph.aaWeightMicro.toMap
    val w13 = wtab(3) + 2 * wtab(2)
    val wHub = wtab(4) + wtab(3)
    assert(got.keySet ==
      Set((1L, 3L), (0L, 7L), (0L, 8L), (7L, 8L)),
      s"pairs: ${got.keySet}")
    assert(got((1L, 3L))._1 == 3L)
    assert(got((1L, 3L))._2 == w13,
      s"score ${got((1L, 3L))._2} != $w13")
    Seq((0L, 7L), (0L, 8L), (7L, 8L)).foreach { p =>
      assert(got(p)._1 == 2L)
      assert(got(p)._2 == wHub, s"$p: ${got(p)._2}")
    }
    // the table itself is what it claims: ⌊10⁶/ln(deg)+½⌋ over [2,64]
    Graph.aaWeightMicro.foreach { case (d, w) =>
      assert(w == math.floor(1e6 / math.log(d.toDouble) + 0.5).toLong,
        s"weight table wrong at deg $d")
    }
    // skew cap: capping at deg <= 2 removes center 0 (deg 3) from
    // wedge enumeration; (1,3) keeps commons {7,8} only
    val capped = Graph.adamicAdar(und, degCap = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(capped.keySet == Set((1L, 3L)))
    assert(capped((1L, 3L))._1 == 2L)
    assert(capped((1L, 3L))._2 == 2 * wtab(2))
  }

  test("clustering coefficient: hand-computed K4 + pendant, exact " +
      "micro ratios, transitivity replays from the sums") {
    import SparkSpec.spark.implicits._
    // K4 over {1,2,3,4} plus pendant 5 attached to node 4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val got = Graph.clusteringCoef(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))))
      .toMap
    // K4 interior nodes: deg 3, 3 triangles -> cc = 1.0
    Seq(1L, 2L, 3L).foreach { v =>
      assert(got(v) == ((3L, 3L, 1000000L, got(v)._4)), got(v))
    }
    // node 4: deg 4, still 3 triangles -> cc = 6/12 = 0.5
    assert(got(4L)._1 == 4L && got(4L)._2 == 3L &&
      got(4L)._3 == 500000L)
    // pendant: deg 1 -> undefined cc (null)
    assert(got(5L) == ((1L, 0L, -1L, got(5L)._4)))
    // transitivity = sum_tri/W: sum_tri = 12, W = 3·C(2)... compute:
    // degs 3,3,3,4,1 -> Σdeg(deg−1)/2 = (6+6+6+12+0)/2 = 15
    assert(got.values.map(_._4).toSet == Set(12L * 1000000L / 15L))
  }

  test("hierarchy rollup: range arithmetic equals an explicit " +
      "recursive descent on the real corpus tree") {
    val rows = Graph.hierarchyRollupQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => (r.getLong(0) + 1) -> r.getLong(1)).toMap
    val n = docs.size.toLong
    assert(rows.size == docs.size)
    // brute force: walk every node's explicit descendant set
    def subtree(v: Long): Seq[Long] =
      if (v > n) Seq.empty
      else v +: (subtree(2 * v) ++ subtree(2 * v + 1))
    for (v <- Seq(1L, 2L, 3L, 7L, n / 2, n - 1, n)) {
      val want = subtree(v)
      val (_, depth, stN, stSum) = rows(v)
      assert(stN == want.length,
        s"node $v: subtree size $stN != ${want.length}")
      assert(stSum == want.map(docs).sum,
        s"node $v: subtree sum mismatch")
      assert(depth == 63 - java.lang.Long.numberOfLeadingZeros(v))
    }
    // leaves roll up to themselves; the root covers everything
    assert(rows(n)._3 == 1 && rows(n)._4 == docs(n))
    assert(rows(1L)._3 == n && rows(1L)._4 == docs.values.sum)
  }

  test("sssp: seeds at zero, weighted distances dominate hop counts " +
      "within the shared horizon, weights within round bounds") {
    val sssp = Graph.ssspQuery(spark, sfDir, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bfs = Graph.bfsDistQuery(spark, sfDir, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sssp.keySet == bfs.keySet)
    sssp.foreach { case (id, d) =>
      if (id % 97 == 0) assert(d == 0L, s"seed $id dist $d")
      val h = bfs(id)
      if (d >= 0 && h >= 0) {
        // same relaxation horizon: every edge weighs 1..5, so
        // hops <= weighted dist <= 5*hops
        assert(d >= h, s"node $id: weighted $d < hops $h")
        assert(d <= 5 * h || h == 0, s"node $id: weighted $d > 5*$h")
      }
      // reachability agrees at the same iteration horizon
      assert((d >= 0) == (h >= 0), s"node $id: $d vs $h")
    }
  }
}
