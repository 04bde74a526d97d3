package graft.tools

import graft.{GraftSession, SparkEntry}

/**
 * Scaling-evidence probe: time a named subset of `SparkEntry.queries`
 * against one sf directory (min of two interleaved passes, noop
 * materializer — same protocol as [[graft.Bench]]). Run it at two
 * scales and compare: a scale-sound plan's wall time grows ~linearly
 * with input size, not quadratically.
 *
 * Usage: runMain graft.tools.ScaleProbe <sfDir> <q1,q2,...>
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleProbe <sfDir> <q1,q2,...>")
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head) // warm-up
    // pass 1 is the COLD time (includes per-corpus artifact builds:
    // cluster labels, IVF centroids, feature stores); pass 2 is warm
    val pass1 = names.map(n => n -> run(n)).toMap
    val results = names.map(n => (n, pass1(n), run(n)))
    results.foreach { case (n, cold, warm) =>
      System.err.println(
        f"[scale] $sfDir $n%-20s cold $cold%8.2fs  warm $warm%8.2fs")
    }
    def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    val json = results.map { case (n, cold, warm) =>
      "\"" + n + "\":{\"cold\":" + d3(cold) + ",\"warm\":" + d3(warm) + "}"
    }.mkString(s"""{"sf":"$sfDir","queries":{""", ",", "}}")
    println(json)
    spark.stop()
  }
}
