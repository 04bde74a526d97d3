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
    // GRAFT_PROBE_SPILL=1 (r18, VERDICT r17 #3): per-pass shuffle and
    // spill accounting — the instrumentation the q_dedup_spans
    // warm-pass anomaly needed (a warm pass slower than cold is a
    // resource cliff, and these four counters say which one)
    val spill = sys.env.get("GRAFT_PROBE_SPILL").contains("1")
    val acc = new java.util.concurrent.atomic.AtomicLongArray(4)
    if (spill) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            acc.addAndGet(0, m.memoryBytesSpilled)
            acc.addAndGet(1, m.diskBytesSpilled)
            acc.addAndGet(2, m.shuffleWriteMetrics.bytesWritten)
            acc.addAndGet(3, m.shuffleReadMetrics.totalBytesRead)
            ()
          }
        }
      })
    for (q <- args.drop(1); pass <- 1 to passes) {
      val before = (0 until 4).map(acc.get)
      val t0 = System.nanoTime()
      run(SparkEntry.queries(q)(spark, sfDir))
      println(f"[time] $q pass$pass ${(System.nanoTime()-t0)/1e9}%.2f s")
      if (spill) {
        Thread.sleep(2000) // listener bus drain (async events)
        val d = (0 until 4).map(i => (acc.get(i) - before(i)) / 1e9)
        println(f"[spill] $q pass$pass memSpill=${d(0)}%.2fGB " +
          f"diskSpill=${d(1)}%.2fGB shufWrite=${d(2)}%.2fGB " +
          f"shufRead=${d(3)}%.2fGB")
      }
    }
    spark.stop()
  }
}
