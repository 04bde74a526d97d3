package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix (running) aggregates — the two-phase scan
 * primitive that replaces every `Window.orderBy(...)` with NO
 * partition key. A global window drags the entire frame into ONE
 * task (Spark itself warns "No Partition Defined for Window
 * operation"); at 100 TB that task is the job. The associative
 * alternative is the classic parallel-scan layout:
 *
 *   1. range-partition on the sort key (so partition p holds a
 *      contiguous run of the global order),
 *   2. run the running aggregate LOCALLY inside each partition
 *      (a window partitioned by `spark_partition_id()` — thousands
 *      of co-located per-partition scans, never a global sort),
 *   3. combine each partition's total with every EARLIER partition's
 *      total via a tiny triangular self-join on the nParts-row
 *      totals frame (join-based, so the offset table itself needs
 *      no global window either — the plan contains zero
 *      unpartitioned Window operators, which `PlanSpec.noGlobalWindow`
 *      pins suite-wide),
 *   4. broadcast-join offsets back and merge (sum/count: add;
 *      max/min: fold with the earlier-partitions extremum).
 *
 * Correctness never depends on where the sampled range boundaries
 * fall: local-prefix + earlier-partition-total is the same global
 * prefix for ANY split of the sorted stream, because the aggregates
 * are associative. Callers must supply a TOTAL order (ties that
 * straddle a boundary would otherwise make per-row prefixes
 * order-dependent — the same rule a plain window has).
 */
object Prefix {

  /** One running aggregate to compute: `agg` ∈ sum | max | min | cnt
    * (cnt ignores `value` and yields the 1-based running row number
    * when the order is total). */
  final case class Running(value: Column, agg: String, out: String)

  /** ntile(t) evaluated from a 1-based DISTRIBUTED rank (a `cnt`
    * running aggregate) over n rows — the closed form of SQL ntile:
    * the first n mod t buckets take ⌈n/t⌉ rows, the rest ⌊n/t⌋.
    * All operands are row counts (far under 2^53), so the integer
    * arithmetic is exact and no single-task global window is ever
    * needed to place a quantile boundary. */
  def ntileFromRank(rn: Column, n: Column, t: Int): Column = {
    def ceilDiv(a: Column, b: Column): Column =
      floor((a + b - lit(1L)) / b).cast("long")
    val q = floor(n / t).cast("long")
    val rem = n % t
    val fat = rem * (q + 1)
    when(rn <= fat, ceilDiv(rn, q + 1))
      .otherwise(rem + ceilDiv(rn - fat, q))
  }

  /** Append running-aggregate columns over the global order
    * (`partBy` group columns first, then `order` within each group)
    * without any unpartitioned window. Output row set and all input
    * columns are preserved; one `out` column is added per spec.
    *
    * The range-partitioned frame (with `_pid` attached) is ALWAYS
    * materialized, never recomputed per branch: the local-prefix
    * branch and the partition-totals branch both read it, and every
    * row's `_pid` must be the SAME value in both. Exchange reuse
    * usually guarantees that for two identical range exchanges — but
    * reuse is an optimization, not a contract: range boundaries are
    * SAMPLED per exchange instance (seeded from the instance's RDD
    * id), and under AQE the two branches can end up on separate
    * exchanges whose boundaries and coalesced partition counts
    * disagree, silently corrupting every offset (observed 2026-08-14
    * as ntile ranks EXCEEDING the row count in q_layout_advisor; the
    * inverse — a cached child defeating reuse canonicalization — was
    * caught earlier the same round on grouped prefixes). Persisting
    * makes `_pid` a fact rather than a coincidence. Callers should
    * project to the minimal columns first; the materialized frame is
    * then narrow, and on a 1000-executor cluster MEMORY_AND_DISK
    * spills rather than fails. The cache is registered with
    * [[CacheBin]] — drain it after the consuming action.
    *
    * `nParts` ≤ 0 (the default) derives the scan width from
    * `spark.sql.shuffle.partitions`, CAPPED at 4096, so the prefix
    * family's parallelism follows the session's scale knob (32
    * locally, thousands on a 100 TB cluster) instead of a hardcoded
    * width; pass an explicit positive width to override. The cap
    * bounds the triangular offset join, which is QUADRATIC in the
    * width: 4096² ≈ 1.7·10⁷ pairs of one-row totals is genuinely
    * broadcast-sized, while an uncapped 10⁵-partition session would
    * put 10¹⁰ pairs (hundreds of GB) through a "broadcast" and fall
    * over. 4096 prefix partitions keep ≥ 25 GB of scan per partition
    * even at 100 TB, so the cap costs nothing real. */
  def running(df: DataFrame, partBy: Seq[String], order: Seq[Column],
      specs: Seq[Running], nParts: Int = 0): DataFrame = {
    require(specs.nonEmpty, "at least one running spec")
    val width =
      if (nParts > 0) nParts
      else math.min(
        df.sparkSession.sessionState.conf.numShufflePartitions, 4096)
    val keyCols = partBy.map(col)
    val parted = CacheBin.track(df
      .repartitionByRange(width, (keyCols ++ order): _*)
      .withColumn("_pid", spark_partition_id()))
    val wLocal = Window
      .partitionBy((keyCols :+ col("_pid")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def aggFn(agg: String, value: Column): Column = agg match {
      case "sum" => sum(value)
      case "max" => max(value)
      case "min" => min(value)
      case "cnt" => count(lit(1))
      case other => throw new IllegalArgumentException(
        s"unsupported running aggregate: $other")
    }

    // per-partition totals, then each partition's offset = the fold of
    // all EARLIER partitions' totals (triangular join on a frame of
    // ≤ nParts rows per group — broadcast-sized by construction)
    val totals = parted
      .groupBy((keyCols :+ col("_pid")): _*)
      .agg(aggFn(specs.head.agg, specs.head.value)
          .as(s"_t_${specs.head.out}"),
        specs.tail.map(s => aggFn(s.agg, s.value).as(s"_t_${s.out}")): _*)
    val earlier = col("b._pid") < col("a._pid")
    val joinCond = partBy
      .map(k => col(s"a.$k") === col(s"b.$k"))
      .foldLeft(earlier)(_ && _)
    def offFn(agg: String, t: Column): Column = agg match {
      case "sum" | "cnt" => sum(t)
      case "max"         => max(t)
      case "min"         => min(t)
    }
    val offs = totals.as("a")
      .join(totals.as("b"), joinCond, "left")
      .groupBy((partBy.map(k => col(s"a.$k")) :+ col("a._pid")): _*)
      .agg(offFn(specs.head.agg, col(s"b._t_${specs.head.out}"))
          .as(s"_off_${specs.head.out}"),
        specs.tail.map(s => offFn(s.agg, col(s"b._t_${s.out}"))
          .as(s"_off_${s.out}")): _*)

    val local = specs.foldLeft(parted) { (acc, s) =>
      acc.withColumn(s"_l_${s.out}", aggFn(s.agg, s.value).over(wLocal))
    }
    val merged = specs.foldLeft(
      local.join(broadcast(offs), partBy :+ "_pid")) { (acc, s) =>
      val l = col(s"_l_${s.out}")
      val o = col(s"_off_${s.out}")
      val v = s.agg match {
        case "sum" | "cnt" => l + coalesce(o, lit(0L))
        case "max"         => when(o.isNull, l).otherwise(greatest(l, o))
        case "min"         => when(o.isNull, l).otherwise(least(l, o))
      }
      acc.withColumn(s.out, v)
    }
    val drop = Seq("_pid") ++
      specs.flatMap(s => Seq(s"_l_${s.out}", s"_off_${s.out}"))
    merged.drop(drop: _*)
  }
}
