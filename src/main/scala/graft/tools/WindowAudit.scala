package graft.tools

import graft.{GraftSession, SparkEntry}

/** Suite-wide audit: report every query whose OPTIMIZED plan contains
  * an unpartitioned Window, with the window expressions — the
  * diagnostic behind PlanSpec.noGlobalWindow. Driver-sized frames
  * (top-k picks, manifest numbering) may legitimately appear here;
  * corpus-derived frames may not. */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder(s"local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, sfDir)
        val global = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty)
          println(s"[winaudit] $name ${global.size} " +
            global.map(_.windowExpressions.map(_.sql).mkString(","))
              .mkString("; ").take(200))
      } catch {
        case t: Throwable =>
          println(s"[winaudit] $name PLAN-ERROR ${t.getMessage}".take(200))
      }
    }
    spark.stop()
  }
}
