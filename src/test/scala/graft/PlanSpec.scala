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

  test("brute-force ANN broadcasts the query side, not the corpus") {
    val p = planString(Similarity.annBruteForceQuery(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"no broadcast in ANN plan:\n$p")
  }

  test("vector kernels run inside whole-stage codegen") {
    // AQE defers codegen until execution; disable it for a static view
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Similarity.annBruteForceQuery(spark, sfDir)
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      assert(codegen.contains("WholeStageCodegen"), codegen.take(2000))
      // the kernel call compiles into a generated-code unit (the
      // projection over the join output), not interpreted eval
      assert(codegen.contains("graft_cosine") ||
        codegen.contains("FloatVecCosine"), codegen.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
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
}
