package graft.operators

import graft.Tables
import graft.sources.{OrcIo, OrcMeta}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Statistics engine (SURVEY.md §2.6, M2): COUNT/MIN/MAX/SUM answered
 * from file-footer statistics *without scanning data*, with a scan
 * fallback — the query-side use of the reference's write-side stats
 * (`Reader.getStatistics`, `ColumnStatisticsImpl.java:92-1164`).
 *
 * Scale: a stats-only aggregate over 100 TB touches only footers
 * (O(#files) metadata IOs, distributed via [[OrcMeta.columnStats]])
 * instead of the data itself — the same reason the reference keeps
 * three stat granularities. The merge across files is a tiny
 * DataFrame agg over #files×#columns rows.
 */
object Stats {

  /**
   * Answer per-column count / min / max / sum for an ORC dataset purely
   * from footer statistics. Null-count derives as fileRows − colCount
   * (ORC counts only non-null values, `ColumnStatisticsImpl`).
   */
  def statsOnlyColumnStats(spark: SparkSession, orcPath: String): DataFrame = {
    val per = OrcMeta.columnStats(spark, orcPath)
    per.filter(col("columnId") > 0)
      .groupBy(col("column"))
      .agg(
        sum(col("count")).as("n_values"),
        max(col("hasNull").cast("int")).cast("boolean").as("has_null"),
        min(col("min")).as("min_str"),
        max(col("max")).as("max_str"),
        sum(col("sum").cast("double")).as("sum_val"))
  }

  /**
   * Correctness-gate query: write 3 lineitem columns to ORC, answer
   * MIN/MAX/SUM/COUNT from footers only, and emit one row per column.
   * The oracle computes the same from a full scan of the parquet
   * source — footer answers must be scan-exact.
   *
   * Note min/max of numeric columns are re-cast from the stat strings;
   * string-typed min()/max() over numeric renderings would be wrong
   * lexicographically, so the per-file numeric cast happens before the
   * cross-file merge.
   */
  def statsOnlyQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val dir = OrcIo.scratchDir("orc_stats")
    // Multiple files: repartition(4) so the merge across footers is real.
    OrcIo.write(src.repartition(4), s"$dir/li", compression = "snappy")
    val per = OrcMeta.columnStats(spark, s"$dir/li")
      .filter(col("columnId") > 0)
      .withColumn("min_d", col("min").cast("double"))
      .withColumn("max_d", col("max").cast("double"))
      .withColumn("sum_d", col("sum").cast("double"))
    per.groupBy(col("column").as("col_name"))
      .agg(
        sum(col("count")).as("n_values"),
        round(min(col("min_d")), 2).as("min_val"),
        round(max(col("max_d")), 2).as("max_val"),
        round(sum(col("sum_d")), 2).as("sum_val"))
      .orderBy(col("col_name"))
  }

  /** COUNT(*) from footers alone (`Reader.getNumberOfRows`). */
  def statsOnlyCount(spark: SparkSession, orcPath: String): Long = {
    import spark.implicits._
    OrcMeta.fileMeta(spark, orcPath).agg(sum($"rows")).as[Long].head()
  }

  /**
   * Scan-side per-column statistics profile of a parquet table — the
   * engine's `orc-statistics` for arbitrary sources, SQL-oracle-able.
   * One output row per profiled column.
   */
  def columnProfileQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    def profile(c: String): DataFrame =
      li.agg(
        lit(c).as("col_name"),
        count(col(c)).as("n_values"),
        sum(when(col(c).isNull, 1).otherwise(0)).as("n_nulls"),
        round(min(col(c)).cast("double"), 2).as("min_val"),
        round(max(col(c)).cast("double"), 2).as("max_val"),
        round(sum(col(c)).cast("double"), 2).as("sum_val"))
        .select(col("col_name"), col("n_values"), col("n_nulls"),
          col("min_val"), col("max_val"), col("sum_val"))
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(profile).reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  /**
   * rawDataSize estimator (`ReaderImpl.getRawDataSize`,
   * `WriterImpl.java:2686-2734`): the CBO sizeInBytes analogue, from
   * footers only.
   */
  def rawDataSize(spark: SparkSession, orcPath: String): Long = {
    import spark.implicits._
    OrcMeta.fileMeta(spark, orcPath).agg(sum($"rawDataSize")).as[Long].head()
  }
}
