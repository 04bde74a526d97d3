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
}
