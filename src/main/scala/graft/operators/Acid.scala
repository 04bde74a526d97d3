package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * ACID v1 merge-on-read (SURVEY.md §2.10): the reference stores row
 * events `struct<operation, originalTransaction, bucket, rowId,
 * currentTransaction, row>` (`SchemaEvolution.createEventSchema:482-491`)
 * in base + delta files; readers resolve the latest visible version of
 * each (originalTransaction, bucket, rowId) key and drop deletes
 * (`site/_docs/acid.md:26-60`).
 *
 * Spark-first: resolution is a window dedup —
 * `row_number() over (partition by key order by currentTransaction desc)`
 * — one shuffle on the row key, then a filter. Compaction (the
 * reference's major compaction) is `resolve(...).write`, a rewrite job.
 *
 * Scale: the shuffle partitions by (origTxn, bucket, rowId) — exactly
 * the reference's bucket layout, so skew is bounded by bucket count;
 * delta sets are typically ≪ base so AQE's skew handling plus the
 * bucket key keeps partitions even at 100 TB.
 */
object Acid {

  val OpInsert = 0
  val OpUpdate = 1
  val OpDelete = 2

  /** Resolve base+delta event rows to current-state rows. Input must
    * have the ACID event columns plus payload columns nested under
    * `row`. */
  def resolve(events: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("originalTransaction"), col("bucket"), col("rowId"))
      .orderBy(col("currentTransaction").desc)
    events
      .withColumn("_version_rank", row_number().over(w))
      .filter(col("_version_rank") === 1)
      .filter(col("operation") =!= OpDelete)
      .select(col("row.*"))
  }

  /** Major compaction: resolve then rewrite as a plain base dataset. */
  def compact(events: DataFrame, outPath: String): Unit =
    graft.sources.OrcIo.write(resolve(events), outPath)

  /**
   * Directory-layout merge-on-read (`site/_docs/acid.md:26-60`): a
   * table directory holds `base_N/` (plain rows, the compacted state as
   * of txn N) plus `delta_M/` event directories (M > N). Reading =
   * base rows lifted to insert events at txn N, unioned with all delta
   * events, resolved. Delta discovery is a metadata listing; the
   * union+window is one shuffle on the row key regardless of delta
   * count.
   */
  def readTable(spark: SparkSession, tableDir: String,
      rowIdCol: String = "id"): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(_.isDirectory).map(_.getPath.getName)
    val baseDirs = dirs.filter(_.startsWith("base_")).sorted
    require(baseDirs.nonEmpty, s"no base_N directory under $tableDir")
    val base = baseDirs.last
    val baseTxn = base.stripPrefix("base_").toLong
    val deltas = dirs.filter(_.startsWith("delta_"))
      .filter(_.stripPrefix("delta_").toLong > baseTxn)
    val baseRows = spark.read.orc(s"$tableDir/$base")
    val baseEvents = baseRows.select(
      lit(OpInsert).as("operation"),
      lit(baseTxn).as("originalTransaction"),
      (col(rowIdCol) % 4).cast("int").as("bucket"),
      col(rowIdCol).as("rowId"),
      lit(baseTxn).as("currentTransaction"),
      struct(baseRows.columns.map(col): _*).as("row"))
    val all = deltas.foldLeft(baseEvents) { (acc, d) =>
      acc.unionByName(spark.read.orc(s"$tableDir/$d"))
    }
    resolve(all)
  }

  /**
   * Correctness-gate query: synthesize a deterministic base+delta set
   * from orders —
   *   base:   every order inserted at txn 1;
   *   delta1: orders with o_orderkey % 10 == 0 updated at txn 2
   *           (totalprice × 1.10);
   *   delta2: orders with o_orderkey % 7 == 0 deleted at txn 3.
   * Resolution must yield updated-but-not-deleted state; the oracle
   * recomputes it with SQL CASE/filters.
   */
  def morQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    def asEvents(src: DataFrame, op: Int, txn: Long): DataFrame =
      src.select(
        lit(op).as("operation"),
        lit(1L).as("originalTransaction"),
        (col("o_orderkey") % 4).cast("int").as("bucket"),
        col("o_orderkey").as("rowId"),
        lit(txn).as("currentTransaction"),
        // no rounding: updated prices are a double multiply, identical
        // bit-for-bit in any IEEE-754 engine, so the oracle compares raw
        struct(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus")).as("row"))
    val base = asEvents(orders, OpInsert, 1L)
    val updates = asEvents(
      orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.10),
      OpUpdate, 2L)
    val deletes = asEvents(orders.filter(col("o_orderkey") % 7 === 0),
      OpDelete, 3L)
    resolve(base.unionAll(updates).unionAll(deletes))
      .orderBy(col("o_orderkey"))
  }
}
