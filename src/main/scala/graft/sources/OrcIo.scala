package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Typed columnar write/read surface (SURVEY.md §2.5 W1-W7, §2.1 S1-S5).
 *
 * The reference's writer (`WriterImpl.java:2812-2833`) exposes codec,
 * stripe size, row-index stride, bloom-filter columns and dictionary
 * threshold as options; its reader plans projected, predicate-pushed,
 * split-parallel scans. Spark's native ORC datasource implements the
 * format itself (codecs/RLE/tree readers are delegated per SURVEY.md
 * §7.1); this module is the engine-level API that exposes those
 * semantics with the reference's defaults, plus a round-trip used by the
 * correctness gate.
 *
 * Scale: `write` produces one file per task — on a 1000-executor job the
 * natural parallel layout; `read` split-plans by stripe ranges
 * (SURVEY.md S5) via Spark's FilePartition machinery, so a 100 TB
 * directory fans out without driver-side work.
 */
object OrcIo {

  /** Reference defaults, from `OrcConf.java` (see BASELINE.md). */
  val DefaultStripeSize: Long = 64L * 1024 * 1024 // orc.stripe.size
  val DefaultIndexStride: Int = 10000             // orc.row.index.stride
  val DefaultCompression: String = "zlib"         // orc.compress
  val DefaultBloomFpp: Double = 0.05              // orc.bloom.filter.fpp

  /**
   * Write with the reference writer's option surface:
   * codec ∈ {none,zlib,snappy,lzo,lz4,zstd}, stripe size, index stride,
   * bloom columns (W6), dictionary threshold (W2).
   */
  def write(df: DataFrame, path: String,
      compression: String = DefaultCompression,
      stripeSize: Long = DefaultStripeSize,
      indexStride: Int = DefaultIndexStride,
      bloomColumns: Seq[String] = Nil,
      bloomFpp: Double = DefaultBloomFpp,
      dictionaryThreshold: Double = 0.8,
      mode: String = "overwrite"): Unit = {
    var w = df.write.mode(mode)
      .option("compression", compression)
      .option("orc.stripe.size", stripeSize.toString)
      .option("orc.row.index.stride", indexStride.toString)
      .option("orc.dictionary.key.threshold", dictionaryThreshold.toString)
    if (bloomColumns.nonEmpty)
      w = w.option("orc.bloom.filter.columns", bloomColumns.mkString(","))
        .option("orc.bloom.filter.fpp", bloomFpp.toString)
    w.orc(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Typed row-oriented read (SURVEY.md S7): the `OrcMapredRecordReader`
    * analogue is `Dataset[T]` decode — Spark's encoder turns each
    * columnar batch row into the case class. */
  def readAs[T: org.apache.spark.sql.Encoder](spark: SparkSession,
      path: String): org.apache.spark.sql.Dataset[T] =
    spark.read.orc(path).as[T]

  /** Read with an explicit reader schema — schema-on-read evolution
    * (SURVEY.md §2.3): missing columns become nulls, matching columns
    * are cast by Spark's ORC reader. */
  def readEvolved(spark: SparkSession, path: String,
      readerSchema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(readerSchema).orc(path)

  /** Deterministic scratch dir for round-trip queries (content is
    * rewritten each run; path is per-process). */
  def scratchDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  /**
   * Correctness-gate round-trip (SURVEY.md §5.2): parquet source →
   * ORC write (zlib, bloom on l_orderkey) → ORC scan with projection +
   * pushed filter → aggregate. Oracle runs the same aggregate on the
   * parquet source, so any loss/corruption in the ORC write or scan
   * path breaks the hash match.
   */
  def roundTripQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = graft.Tables.load(spark, sfDir, "lineitem")
    val dir = scratchDir("orc_rt")
    write(src, s"$dir/lineitem_orc", compression = "zlib",
      bloomColumns = Seq("l_orderkey"))
    read(spark, s"$dir/lineitem_orc")
      .filter(col("l_quantity") >= 25.0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(min(col("l_quantity")), 2).as("min_qty"),
        round(max(col("l_quantity")), 2).as("max_qty"))
      .orderBy(col("l_returnflag"))
  }

  /**
   * File merge / compaction (SURVEY.md W9). The reference appends raw
   * pre-encoded stripes across files (`WriterImpl.appendStripe`);
   * the Spark-idiomatic equivalent is a distributed rewrite sized to
   * the stripe/block budget — same outcome (few large files, merged
   * stats), but parallel and codec-converting if asked. Raw
   * stripe-level concat without decode is a non-goal (single-writer,
   * driver-bound — the opposite of a 100 TB compaction).
   */
  def merge(spark: SparkSession, inPaths: Seq[String], outPath: String,
      targetFileBytes: Long = 256L * 1024 * 1024,
      compression: String = DefaultCompression): Unit = {
    val df = spark.read.orc(inPaths: _*)
    val totalBytes = inPaths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(hp).getLength
    }.sum
    val nFiles = math.max(1, (totalBytes / targetFileBytes).toInt)
    write(df.repartition(nFiles), outPath, compression = compression)
  }

  /**
   * Salvage read over a possibly-corrupted dataset — the engine-level
   * counterpart of the reference tool's `meta --recover` (`FileDump`
   * side-file-aware recovery): probe each file's tail, scan only the
   * readable ones, and report the rest. On a 100 TB lake one truncated
   * file must not fail the job; the probe is a footer-only IO per file.
   * Returns (readable DataFrame, list of unreadable file paths).
   */
  def readSalvage(spark: SparkSession, path: String)
      : (DataFrame, Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .filterNot(f => f.getName.startsWith("_") ||
            f.getName.startsWith("."))
          .map(_.toString).toSeq
      else Seq(path)
    val (good, bad) = files.partition { f =>
      try {
        val r = org.apache.orc.OrcFile.createReader(
          new org.apache.hadoop.fs.Path(f),
          org.apache.orc.OrcFile.readerOptions(
            spark.sparkContext.hadoopConfiguration))
        r.close(); true
      } catch { case _: Exception => false }
    }
    val df =
      if (good.nonEmpty) spark.read.orc(good: _*)
      else spark.emptyDataFrame
    (df, bad)
  }

  /** Same round-trip across every supported codec (W4): each codec's
    * file must decode to identical per-codec aggregates. */
  def codecMatrixQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = graft.Tables.load(spark, sfDir, "orders")
    val dir = scratchDir("orc_codec")
    val codecs = Seq("none", "zlib", "snappy", "lz4", "zstd")
    // the five writes are independent Spark jobs — run them concurrently
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.sequence(codecs.map(c =>
        Future(write(src, s"$dir/$c", compression = c)))),
      scala.concurrent.duration.Duration.Inf)
    codecs.map { c =>
      read(spark, s"$dir/$c")
        .agg(lit(c).as("codec"), count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .select(col("codec"), col("n_rows"), col("sum_price"))
    }.reduce(_.unionAll(_)).orderBy(col("codec"))
  }
}
