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
}
