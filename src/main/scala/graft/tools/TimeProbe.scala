package graft.tools
import graft.{GraftSession, SparkEntry}
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // SPARK_GRAFT_CPUS so deep-scale probes run at the same thread
    // count as their Verify sweeps (default 32, the bench shape)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    run(SparkEntry.queries("q1_agg")(spark, sfDir)) // warm-up
    // GRAFT_PROBE_PASSES=1 for deep-scale sweeps where a second pass
    // doubles an hours-long probe for little information
    val passes = sys.env.getOrElse("GRAFT_PROBE_PASSES", "2").toInt
    for (q <- args.drop(1); pass <- 1 to passes) {
      val t0 = System.nanoTime()
      run(SparkEntry.queries(q)(spark, sfDir))
      println(f"[time] $q pass$pass ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
