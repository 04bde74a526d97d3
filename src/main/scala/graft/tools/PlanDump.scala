package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: join/exchange shape audit for a query list — flags
  * cartesian products and nested-loop joins (scale-killers) in the
  * executed plans of the newest SparkEntry queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.01"
    val qs = Seq("q_winsorize", "q_gap_fill", "q_interp_fill",
      "q_rolling_anomaly", "q_cdc_upsert", "q_entity_resolve",
      "q_k_anon", "q_compact_plan", "q_domain_filter", "q_pr_curve",
      "q_oov_rate", "q_dq_rules")
    for (q <- qs) {
      val plan = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
        "ShuffledHashJoin").map(j =>
          s"$j=${j.r.findAllIn(plan).length}").mkString(" ")
      val exch = "Exchange".r.findAllIn(plan).length
      println(s"[plan] $q  exchanges=$exch  $joins  " +
        (if (bad.nonEmpty) s"BAD=${bad.mkString(",")}" else "ok"))
    }
    spark.stop()
  }
}
