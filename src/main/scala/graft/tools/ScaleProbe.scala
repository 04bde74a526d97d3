package graft.tools

import graft.{GraftSession, SparkEntry}

/**
 * Scaling-evidence probe: time a named subset of `SparkEntry.queries`
 * against one sf directory, two passes per query with the noop
 * materializer ([[graft.Bench]]'s sink). Unlike Bench's min-of-two,
 * BOTH passes are reported: pass 1 is the cold time (includes
 * per-corpus artifact builds — cluster labels, IVF fit, image/feature
 * stores), pass 2 the steady state. The JVM/codegen warm-up is a
 * neutral `spark.range` write, NOT a query from the list, so the
 * first query's cold time stays cold. Run at two scales and compare:
 * a scale-sound plan's wall time grows ~linearly with input size.
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
    // neutral warm-up (JVM + codegen + scan machinery) that executes
    // none of the probed queries
    spark.range(1000000).selectExpr("id", "id * 2 as v")
      .write.format("noop").mode("overwrite").save()
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
