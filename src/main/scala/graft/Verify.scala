package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg: comma-separated query-name filter (local
    // iteration on a subset; the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must surface in the driver's correctness
    // artifact as an error, never as silent absence (round 8 lost 9
    // broken queries this way): record every failure, write an _ERROR
    // marker file into the query's output dir (so a downstream read of
    // the dir fails loudly instead of finding nothing), and dump an
    // attempted/succeeded manifest plus _errors.json at the top level.
    //
    // Runs one batch of queries at the given concurrency; returns the
    // failures. Success on a retry pass deletes the pass-1 _ERROR
    // marker (overwrite mode replaces the parquet, not the marker).
    def runBatch(batch: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
                 inFlight: Int): Map[String, String] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(inFlight)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val errs = new java.util.concurrent.ConcurrentHashMap[String, String]()
      val futures = batch.map { case (name, fn) =>
        scala.concurrent.Future {
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            Files.deleteIfExists(Paths.get(s"$outDir/$name/_ERROR"))
          } catch { case e: Throwable =>
            val msg = s"${e.getClass.getName}: ${e.getMessage}"
            System.err.println(s"[verify] $name failed: $msg")
            errs.put(name, msg)
            val d = new java.io.File(s"$outDir/$name")
            d.mkdirs()
            Files.writeString(Paths.get(s"$outDir/$name/_ERROR"), msg)
          }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
      import scala.jdk.CollectionConverters._
      errs.asScala.toMap
    }
    val attempted = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Pass 1: 4 queries in flight — Spark schedules concurrent jobs
    // fine, and the small-SF correctness dump is scheduling-bound.
    // Pass 2: failures retry SEQUENTIALLY (1 in flight), so a retried
    // query gets the whole executor-memory pool to itself. At deep
    // scale (sf10) the r15 sweep showed pass-1 failures cluster as
    // SparkOutOfMemoryError from 4 heavy queries sharing one pool —
    // a concurrency artifact, not per-query capacity; all 28 such
    // queries ran green solo. At gate scale a genuine code bug fails
    // both passes quickly, so the retry costs nothing. The manifest
    // records both passes so a pass-2 recovery is visible, never
    // silently folded into a clean sweep.
    val pass1Errors = runBatch(attempted, 4)
    val retry = attempted.filter { case (n, _) => pass1Errors.contains(n) }
    val pass2Errors =
      if (retry.isEmpty) Map.empty[String, String]
      else {
        System.err.println(
          s"[verify] pass 2: retrying ${retry.size} failed queries " +
            "sequentially (full memory pool per query)")
        runBatch(retry, 1)
      }
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    pass2Errors.foreach { case (k, v) => errors.put(k, v) }
    // queries run 4-at-a-time above, so the cache drain waits for the
    // whole sweep (an early drain would pull blocks out from under an
    // in-flight sibling — safe but wasteful); one release here still
    // frees every spilled block before the DuckDB compare runs
    graft.operators.CacheBin.releaseAll()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // declared float tolerances for the replay tools (check.py /
    // check_budget.py) — see SparkEntry.oracleEpsilon's scaladoc
    val epsJson = SparkEntry.oracleEpsilon
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, cols) =>
        s"${q(k)}: ${cols.map { case (c, t) => s"${q(c)}: $t" }
          .mkString("{", ",", "}")}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_epsilon.json"), epsJson)
    import scala.jdk.CollectionConverters._
    val errJson = errors.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    val recovered = (pass1Errors.keySet -- pass2Errors.keySet).toSeq.sorted
    Files.writeString(Paths.get(s"$outDir/_manifest.json"),
      s"""{"attempted": ${attempted.size}, "succeeded": ${attempted.size - errors.size}, "failed": ${errors.size}, "failed_queries": ${errors.asScala.keys.toSeq.sorted.map(q).mkString("[", ",", "]")}, "pass1_failed": ${pass1Errors.keys.toSeq.sorted.map(q).mkString("[", ",", "]")}, "pass2_recovered": ${recovered.map(q).mkString("[", ",", "]")}}""")
    if (!errors.isEmpty)
      System.err.println(
        s"[verify] ${errors.size}/${attempted.size} queries FAILED: " +
          errors.asScala.keys.toSeq.sorted.mkString(", "))
    spark.stop()
  }
}
