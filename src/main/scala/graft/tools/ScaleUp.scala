package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-factor multiplier for the benchmark tables: builds an N×
 * corpus from a base sf directory by replicating each table with
 * id-space remapping, so scaling evidence (does a plan's wall time
 * grow linearly with data?) can be measured beyond the largest
 * driver-provided sf.
 *
 * Replication preserves WORKLOAD SHAPE, not just row count:
 *  - fact-table id columns (orderkeys, doc/vec/event/user ids) shift
 *    by `copy × 10^9` so keys stay unique and join/group
 *    cardinalities scale linearly; `orders.o_orderkey` shifts in
 *    lock-step with `lineitem.l_orderkey` so the order⋈lineitem join
 *    stays 1:N;
 *  - dimension tables (region/nation/customer/supplier/part) are
 *    copied verbatim — dims grow far slower than facts, and foreign
 *    keys into them (o_custkey, l_partkey…) stay resolvable. Event
 *    `user_id` DOES scale (sessionization state is per-user), so
 *    stream-static enrichment against the fixed customer dim matches
 *    only copy 0 — acceptable for an outer-join enrich;
 *  - document text is token-suffixed per copy (`regexp_replace` of
 *    the token separator), so shingle sets of different copies are
 *    DISJOINT — near-dup/cluster structure replicates per copy
 *    instead of every doc gaining factor−1 cross-copy near-dups
 *    (which would quadratically inflate the pair graph and measure a
 *    different problem). Known shape drift: suffixed tokens leave the
 *    stopword set and lengthen short tokens, so quality-gate pass
 *    rates shift slightly in copies ≥ 1 (measured sf0.1→sf1:
 *    clean-pipeline survivor rate 47.4% → 46.9%) — second-order for
 *    timing, disclosed for exactness;
 *  - embeddings circular-shift by the copy index (an index-space
 *    rotation: norms and same-copy pairwise distances are preserved
 *    exactly, cross-copy vectors decorrelate) instead of cloning
 *    vectors factor× at distance 0;
 *  - copy 0 is byte-identical to the base corpus, and every table in
 *    [[Tables.all]] exists in the output, so ANY engine query runs
 *    against the scaled directory.
 *
 * Usage: runMain graft.tools.ScaleUp <baseSfDir> <outDir> <factor>
 */
object ScaleUp {

  private val CopyStride = 1000000000L

  private def replicate(base: DataFrame, factor: Int)(
      remap: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => remap(base, i)).reduce(_.unionAll(_))

  def scaleUp(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    def shift(c: String, i: Int) = col(c) + lit(i.toLong * CopyStride)
    // Guard against DOUBLE application: a base corpus whose ids were
    // already stride-shifted (an sf1 built by this tool) would collide
    // copy i of one run with copy i+k of the other, silently
    // duplicating keys — observed 2026-08-14 as exploding joins and
    // dedup-halved ACID row counts in a ×10-of-sf1 corpus. Always
    // scale from the ORIGINAL driver corpus.
    for ((t, c) <- Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
        "documents" -> "doc_id", "embeddings" -> "vec_id",
        "events" -> "event_id", "events" -> "user_id")) {
      val mx = spark.read.parquet(Tables.path(baseDir, t))
        .agg(max(col(c))).head().getLong(0)
      require(mx < CopyStride,
        s"$t.$c max id $mx >= stride $CopyStride: base corpus looks " +
          "already scaled — scale from the original sf directory")
    }

    val lineitem = replicate(
      spark.read.parquet(Tables.path(baseDir, "lineitem")), factor) {
      (df, i) => df.withColumn("l_orderkey", shift("l_orderkey", i))
    }
    val documents = replicate(
      spark.read.parquet(Tables.path(baseDir, "documents")), factor) {
      (df, i) =>
        val mutated =
          if (i == 0) df
          // suffix every non-final token with the copy tag: all 3-gram
          // shingles differ across copies → no cross-copy dup edges
          else df.withColumn("text",
            regexp_replace(col("text"), lit(" "), lit(s"~$i ")))
        mutated.withColumn("doc_id", shift("doc_id", i))
    }
    val embeddings = replicate(
      spark.read.parquet(Tables.path(baseDir, "embeddings")), factor) {
      (df, i) =>
        val rotated =
          if (i == 0) df
          else df.withColumn("embedding", concat(
            expr(s"slice(embedding, ${i % 64 + 1}, ${64 - i % 64})"),
            expr(s"slice(embedding, 1, ${i % 64})")))
        rotated.withColumn("vec_id", shift("vec_id", i))
    }
    val orders = replicate(
      spark.read.parquet(Tables.path(baseDir, "orders")), factor) {
      (df, i) => df.withColumn("o_orderkey", shift("o_orderkey", i))
    }
    // via Tables.load, NOT a raw read: the base events.ts is
    // TIMESTAMP(NANOS), which Spark surfaces as a bare nanos long
    // (nanosAsLong) — writing that back as BIGINT would break every
    // oracle's CAST(ts AS TIMESTAMP). load converts to a true
    // microsecond timestamp, the precision both engines compute in.
    val events = replicate(Tables.load(spark, baseDir, "events"), factor) {
      (df, i) => df
        .withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))
    }

    Seq("lineitem" -> lineitem, "documents" -> documents,
      "embeddings" -> embeddings, "events" -> events,
      "orders" -> orders).foreach {
      case (name, df) =>
        df.write.mode("overwrite").parquet(Tables.path(outDir, name))
    }
    // dimensions: verbatim copies so every foreign key resolves
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(Tables.path(baseDir, t))
        .write.mode("overwrite").parquet(Tables.path(outDir, t))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <baseSfDir> <outDir> <factor>")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleUp(spark, args(0), args(1), args(2).toInt)
    println(s"scaled ${args(0)} ×${args(2)} → ${args(1)}")
    spark.stop()
  }
}
