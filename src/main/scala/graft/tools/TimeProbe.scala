package graft.tools
import graft.{GraftSession, SparkEntry}
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    run(SparkEntry.queries("q1_agg")(spark, sfDir)) // warm-up
    for (q <- args.drop(1); pass <- 1 to 2) {
      val t0 = System.nanoTime()
      run(SparkEntry.queries(q)(spark, sfDir))
      println(f"[time] $q pass$pass ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
