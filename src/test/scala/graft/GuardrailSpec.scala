package graft

/** Pins the correctness-gate escape hatches so they cannot widen
  * silently.
  *
  * The declared-epsilon mechanism (`SparkEntry.oracleEpsilon`, honored
  * by tools/check.py and check_budget.py) exists for exactly one class
  * of divergence: values the ENGINE owns as IEEE doubles where only
  * summation order differs between Spark and the DuckDB oracle. Every
  * entry must be enumerated here with a justification; a new entry
  * fails this spec until it is reviewed and added — so a future
  * precision BUG can never hide behind a quietly added tolerance.
  */
class GuardrailSpec extends SparkSpec {

  /** The reviewed allowlist: (query, column) -> max tolerance.
    * q_stats_footer.sum_val: ORC stores the column sum as an IEEE
    * DOUBLE in the file footer (reference ColumnStatisticsImpl sums in
    * double), so cross-engine divergence is summation ORDER on the
    * engine-owned value — exact through sf1, ~3.5e-14 relative at
    * sf10. Everything else in the suite compares exact. */
  private val allowed: Map[(String, String), Double] = Map(
    ("q_stats_footer", "sum_val") -> 1e-12
  )

  test("oracleEpsilon registry contains exactly the reviewed entries") {
    val actual = for {
      (q, cols) <- SparkEntry.oracleEpsilon
      (c, tol) <- cols
    } yield ((q, c), tol)
    assert(actual.toMap == allowed,
      s"oracleEpsilon drifted from the reviewed allowlist: " +
        s"actual=${actual.toMap} allowed=$allowed — a new tolerance " +
        "needs a SURVEY-cited justification in GuardrailSpec FIRST")
  }

  test("every oracleEpsilon entry points at a registered gated query") {
    SparkEntry.oracleEpsilon.keys.foreach { q =>
      assert(SparkEntry.queries.contains(q),
        s"epsilon declared for unregistered query $q")
      assert(SparkEntry.oracleSql.contains(q),
        s"epsilon declared for oracle-less query $q — an epsilon on a " +
          "rows-only check is meaningless")
    }
  }

  test("epsilon tolerances stay in the float-noise regime") {
    // a tolerance above 1e-9 relative is no longer summation-order
    // noise — that's a value difference and must be fixed, not waived
    SparkEntry.oracleEpsilon.foreach { case (q, cols) =>
      cols.foreach { case (c, tol) =>
        assert(tol <= 1e-9, s"$q.$c tolerance $tol exceeds the " +
          "float-noise ceiling 1e-9")
      }
    }
  }

  test("awaitFits fails a hung fit instead of hanging Verify") {
    import scala.concurrent.{Future, Promise}
    val never = Promise[Int]().future // completes never
    val done = Future.successful(7)
    val ex = intercept[RuntimeException] {
      graft.operators.Similarity.awaitFits(
        Seq(done, never), "spec hung fit",
        scala.concurrent.duration.Duration(200, "ms"))
    }
    assert(ex.getMessage.contains("fit budget"))
    // the completed future still resolves under the same budget
    val ok = graft.operators.Similarity.awaitFits(
      Seq(done), "spec ok fit",
      scala.concurrent.duration.Duration(200, "ms"))
    assert(ok == Seq(7))
  }
}
