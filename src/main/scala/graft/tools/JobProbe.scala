package graft.tools
import graft.{GraftSession, SparkEntry}

/** Per-Spark-job time breakdown for one query run — which jobs (by
  * callsite) a query's wall clock goes to. Dev instrument for the
  * fixture-heavy operators (ACID, streaming) whose cost is many small
  * jobs rather than one big stage. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    run(SparkEntry.queries("q1_agg")(spark, sfDir)) // warm-up
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, Double)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobs.put(e.jobId, (site, System.nanoTime())); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(e.jobId)).foreach { case (site, t0) =>
            done.add((e.jobId, site, (System.nanoTime() - t0) / 1e9))
          }
        }
      })
    for (q <- args.drop(1)) {
      done.clear()
      val t0 = System.nanoTime()
      run(SparkEntry.queries(q)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener drain
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1)
      println(f"[jobprobe] $q wall=$wall%.2f s, ${rows.size} jobs, " +
        f"job-sum=${rows.map(_._3).sum}%.2f s")
      rows.foreach { case (id, site, sec) =>
        println(f"[job] $q #$id%-4d $sec%6.2f s  $site")
      }
      graft.operators.CacheBin.releaseAll()
    }
    spark.stop()
  }
}
