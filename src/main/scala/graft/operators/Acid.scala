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

  /** Run independent Spark actions from a small driver pool (guide
    * §2.6 "overlap independent jobs"): the ACID gates are chains of
    * many SMALL jobs (fixture delta writes, per-delta tallies, as-of
    * scans) whose wall cost is half driver-side gaps — planning, ORC
    * sidecar IO, FS renames — that sequential execution serializes
    * (measured r18: q_acid_purge wall 13.9 s vs job-sum 7.1 s). Each
    * thunk must touch an independent output; results keep submission
    * order, so downstream logic is deterministic. 3 in flight fills
    * the gaps without starving any single job's stages. */
  private[graft] def inParallel[T](work: Seq[() => T]): Seq[T] =
    if (work.lengthCompare(1) <= 0) work.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(3, work.size))
      try {
        work.map(w => pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = w()
        })).map(_.get())
      } finally { pool.shutdown() }
    }

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

  /** The reference's ACID stats user-metadata key and its
    * "inserts,updates,deletes" serialization
    * (`OrcAcidUtils.java:27-33`, `AcidStats.java:24-60`). */
  val AcidStatsKey = "hive.acid.stats"

  case class AcidStats(inserts: Long, updates: Long, deletes: Long) {
    def serialize: String = s"$inserts,$updates,$deletes"
  }

  object AcidStats {
    def parse(s: String): AcidStats = {
      val p = s.split(",")
      AcidStats(p(0).toLong, p(1).toLong, p(2).toLong)
    }
  }

  /**
   * Event-type counts of an event frame — what the reference tallies
   * per delta file while writing.
   *
   * Deliberately tallied over FULL rows (`.rdd`), not a pruned
   * aggregate: files carrying the exact ACID event schema are genuine
   * ACID deltas to the format, and the ORC reader's acid detection
   * (`SchemaEvolution.checkAcidSchema:468-476` in the reference; same
   * logic in the bundled ORC jars) remaps column ids on such files,
   * which breaks column-pruned plain scans (AIOOBE in the vectorized
   * reader). Full-width reads are unaffected — and every other engine
   * path (resolve / readTable / compaction) reads full events anyway.
   */
  def acidStatsOf(events: DataFrame): AcidStats = {
    val opIdx = events.schema.fieldIndex("operation")
    val (i, u, d) = events.rdd
      .map(r => r.getInt(opIdx) match {
        case OpInsert => (1L, 0L, 0L)
        case OpUpdate => (0L, 1L, 0L)
        case OpDelete => (0L, 0L, 1L)
        case _ => (0L, 0L, 0L)
      })
      .fold((0L, 0L, 0L)) { case ((a1, b1, c1), (a2, b2, c2)) =>
        (a1 + a2, b1 + b2, c1 + c2)
      }
    AcidStats(i, u, d)
  }

  private def writeStatsSidecar(outPath: String, stats: AcidStats): Unit =
    graft.sources.OrcMeta.writeMetadataFile(
      s"$outPath/_acid_stats.orc",
      Map(AcidStatsKey -> stats.serialize))

  /** Read back the `hive.acid.stats` entry of a dataset directory. */
  def readAcidStats(spark: SparkSession, path: String): Option[AcidStats] = {
    val rows = graft.sources.OrcMeta.userMetadata(spark, path)
      .filter(col("key") === AcidStatsKey).select(col("value")).collect()
    rows.headOption.map(r => AcidStats.parse(r.getString(0)))
  }

  /** Major compaction: resolve then rewrite as a plain base dataset,
    * recording the event tallies under `hive.acid.stats` like the
    * reference's writer (a compacted base carries only inserts). */
  /** Output file count for a compaction rewrite: track the INPUT byte
    * volume against a target file size ([[graft.sources.OrcIo.merge]]'s
    * rule), never the shuffle-partition count — compaction exists to
    * produce fewer, larger files, and a compactor that fans a few MB
    * of deltas into 32 shards re-creates the small-file problem it is
    * meant to fix. At gate scale this is one file; at 100 TB it is
    * thousands, each near the target size. */
  private def sizedFileCount(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: String, dirs: Seq[String],
      targetFileBytes: Long = 256L * 1024 * 1024): Int = {
    val bytes = dirs.map(d => fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$tableDir/$d")).getLength).sum
    math.max(1L, bytes / targetFileBytes).toInt
  }

  def compact(events: DataFrame, outPath: String): Unit = {
    val resolved = resolve(events)
    graft.sources.OrcIo.write(resolved, outPath)
    // count the written output: counting the resolve plan would
    // column-prune the event scan, which AIOOBEs on ACID-schema ORC
    writeStatsSidecar(outPath, AcidStats(
      resolved.sparkSession.read.orc(outPath).count(), 0L, 0L))
  }

  /** Write a delta directory of raw events plus its ACID stats.
    *
    * The tally here runs as ONE codegen aggregate over the PRE-WRITE
    * frame: every caller passes events derived from parquet tables or
    * an RDD — never an ACID-schema ORC readback — so the vectorized
    * path is safe (the [[acidStatsOf]] row-reader constraint applies
    * only to frames that SCAN acid-schema ORC files). Replaces a full
    * row-oriented `.rdd` pass per delta write (r18). */
  def writeDelta(events: DataFrame, outPath: String): Unit = {
    graft.sources.OrcIo.write(events, outPath)
    val r = events.agg(
      coalesce(sum(when(col("operation") === OpInsert, 1L)
        .otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("operation") === OpUpdate, 1L)
        .otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("operation") === OpDelete, 1L)
        .otherwise(0L)), lit(0L))).collect()(0)
    writeStatsSidecar(outPath,
      AcidStats(r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  /** Orders rows lifted to ACID event form — the ONE fixture shape
    * every MOR gate writes (bucket = key % 4, the writer-assigned
    * layout; origTxn 1). Payload prices stay unrounded: updated
    * prices are a double multiply, bit-identical in any IEEE-754
    * engine, so oracles compare raw. Was previously copied per gate —
    * nine drift-prone definitions. */
  private[graft] def ordersAsEvents(src: DataFrame, op: Int,
      txn: Long): DataFrame =
    src.select(
      lit(op).as("operation"),
      lit(1L).as("originalTransaction"),
      (col("o_orderkey") % 4).cast("int").as("bucket"),
      col("o_orderkey").as("rowId"),
      lit(txn).as("currentTransaction"),
      struct(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus")).as("row"))

  /**
   * Minor compaction (`site/_docs/acid.md:26-60`): merge several delta
   * directories into one without touching the base. Unlike major
   * compaction this KEEPS event form — the latest event per
   * (origTxn, bucket, rowId) survives, including deletes, which must
   * continue to mask base rows. Output directory is named
   * `delta_<minTxn>_<maxTxn>` like the reference's compactor.
   * Returns the merged directory path.
   */
  def minorCompact(spark: SparkSession, tableDir: String,
      subset: Option[Seq[String]] = None): String = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = subset.map(_.toArray).getOrElse(
      fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("delta_")))
    require(dirs.nonEmpty, s"no delta_* directories under $tableDir")
    val txns = dirs.flatMap(_.stripPrefix("delta_").split("_")
      .map(_.toLong))
    val events = dirs.map(d => spark.read.orc(s"$tableDir/$d"))
      .reduce(_.unionByName(_))
    val w = Window
      .partitionBy(col("originalTransaction"), col("bucket"), col("rowId"))
      .orderBy(col("currentTransaction").desc)
    val merged = events
      .withColumn("_version_rank", row_number().over(w))
      .filter(col("_version_rank") === 1)
      .drop("_version_rank")
    val out = s"$tableDir/delta_${txns.min}_${txns.max}"
    graft.sources.OrcIo.write(
      merged.repartition(sizedFileCount(fs, tableDir, dirs)), out)
    // tally from the written output: one cheap scan instead of
    // re-running the window, and the counts describe exactly the files
    // the stats ride with
    writeStatsSidecar(out, acidStatsOf(spark.read.orc(out)))
    dirs.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$d"), true))
    out
  }

  /**
   * Directory-layout merge-on-read (`site/_docs/acid.md:26-60`): a
   * table directory holds `base_N/` (plain rows, the compacted state as
   * of txn N) plus `delta_M/` event directories (M > N). Reading =
   * base rows lifted to insert events at txn N, unioned with all delta
   * events, resolved. Delta discovery is a metadata listing; the
   * union+window is one shuffle on the row key regardless of delta
   * count.
   */
  /** [[readTable]] with snapshot isolation: resolve the table AS OF
    * transaction `asOfTxn` — deltas beyond the snapshot are skipped at
    * the METADATA level (directory-name txn ranges, nothing read), and
    * any straggler events inside a kept minor-compacted range are
    * filtered on `currentTransaction`. This is the time-travel read
    * every versioned lake offers; on the reference's layout it is pure
    * delta-list pruning, so the snapshot read costs no more than the
    * current-state read. */
  def readTableAsOf(spark: SparkSession, tableDir: String, asOfTxn: Long,
      rowIdCol: String = "id", buckets: Int = 4): DataFrame =
    readTable(spark, tableDir, rowIdCol, buckets, Some(asOfTxn))

  def readTable(spark: SparkSession, tableDir: String,
      rowIdCol: String = "id", buckets: Int = 4,
      asOf: Option[Long] = None): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(_.isDirectory).map(_.getPath.getName)
    // NUMERIC max, not string sort: "base_10" < "base_2" lexically, and
    // a compaction crash can legitimately leave two bases behind
    val baseDirs = dirs.filter(_.startsWith("base_"))
    require(baseDirs.nonEmpty, s"no base_N directory under $tableDir")
    val base = baseDirs.maxBy(_.stripPrefix("base_").toLong)
    val baseTxn = base.stripPrefix("base_").toLong
    // a snapshot OLDER than the newest base is unanswerable: the base
    // folded every event ≤ baseTxn, so lifting it and filtering to the
    // snapshot would fabricate an empty/partial before-state (every
    // update would classify as an insert downstream) — fail loudly
    asOf.foreach(t => require(t >= baseTxn,
      s"history before base_$baseTxn has been compacted away " +
        s"(requested snapshot txn=$t under $tableDir)"))
    // `delta_M` single-txn dirs and `delta_A_B` minor-compacted ranges
    val deltas = dirs.filter(_.startsWith("delta_"))
      .filter(_.stripPrefix("delta_").split("_").last.toLong > baseTxn)
      // snapshot pruning: a delta whose LOW txn exceeds the snapshot
      // is invisible wholesale (metadata-only skip)
      .filter(d => asOf.forall(
        _ >= d.stripPrefix("delta_").split("_").head.toLong))
    val baseRows = spark.read.orc(s"$tableDir/$base")
    val baseEvents = baseRows.select(
      lit(OpInsert).as("operation"),
      lit(baseTxn).as("originalTransaction"),
      // bucket derivation must match the writer's layout; the engine's
      // convention is rowId % buckets (the reference's bucket field is
      // likewise writer-assigned, `acid.md:26-60`)
      (col(rowIdCol) % buckets).cast("int").as("bucket"),
      col(rowIdCol).as("rowId"),
      lit(baseTxn).as("currentTransaction"),
      struct(baseRows.columns.map(col): _*).as("row"))
    // drop delta events already folded into the base: a straddling
    // minor-compacted range (delta_A_B with A ≤ baseTxn < B) is kept
    // as a directory, but its events ≤ baseTxn are the base's own
    // history — replaying them would tie with the base row at
    // currentTransaction == baseTxn (nondeterministic resolve order)
    // or resurrect pre-base states. This also makes [[restoreTo]]'s
    // crash window safe: straddling deltas survive until after the
    // base rename, and the new base shadows their folded prefix here.
    val all = deltas.foldLeft(baseEvents) { (acc, d) =>
      acc.unionByName(spark.read.orc(s"$tableDir/$d")
        .filter(col("currentTransaction") > baseTxn))
    }
    // stragglers above the snapshot inside kept ranges filter out here
    resolve(asOf.map(t =>
      all.filter(col("currentTransaction") <= t)).getOrElse(all))
  }

  /**
   * Correctness-gate query for minor compaction: the same deterministic
   * base/update/delete set as [[morQuery]], but materialized as a
   * base_1 + delta_2 + delta_3 directory layout, minor-compacted into
   * one delta_2_3 range, then resolved via [[readTable]]. The oracle is
   * identical to q_acid_mor — minor compaction must not change
   * resolution.
   */
  def minorCompactQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_minor_q")
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.10),
        OpUpdate, 2L), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 7 === 0),
        OpDelete, 3L), s"$dir/t/delta_3")))
    minorCompact(spark, s"$dir/t")
    readTable(spark, s"$dir/t", rowIdCol = "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  /**
   * Major compaction over a table directory (`site/_docs/acid.md:26-60`):
   * resolve base+deltas to current state, rewrite as a new `base_N`
   * (N = highest delta txn), drop the old base and deltas. After it,
   * reads touch a single plain directory — the "every N deltas" rewrite
   * that keeps 100 TB MOR read amplification bounded. Returns the new
   * base path.
   */
  def majorCompact(spark: SparkSession, tableDir: String,
      rowIdCol: String = "id", buckets: Int = 4): String = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(d => d.startsWith("base_") || d.startsWith("delta_"))
    val maxTxn = dirs.flatMap(_.split("_").tail.map(_.toLong)).max
    val resolved = readTable(spark, tableDir, rowIdCol, buckets)
    // crash-safe swap: stage under a name [[readTable]] IGNORES (no
    // base_/delta_ prefix), rename into place FIRST, delete old
    // directories LAST — a crash at any point leaves the table
    // readable (old layout before the rename; new base after it, old
    // deltas all ≤ maxTxn so the reader skips them). The one edge is
    // an already-compacted table (base_maxTxn is the input), where the
    // colliding base must be dropped just before the rename.
    val out = s"$tableDir/_tmp_base_$maxTxn"
    graft.sources.OrcIo.write(
      resolved.repartition(sizedFileCount(fs, tableDir, dirs)), out)
    // count the WRITTEN base, not `resolved`: counting the resolve plan
    // would column-prune the delta scans, and the ORC jars AIOOBE on
    // pruned reads of ACID-schema files (checkAcidSchema detection)
    writeStatsSidecar(out,
      AcidStats(spark.read.orc(out).count(), 0L, 0L))
    val newBase = s"base_$maxTxn"
    if (dirs.contains(newBase))
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$newBase"), true)
    val dst = new org.apache.hadoop.fs.Path(s"$tableDir/$newBase")
    // Hadoop rename reports failure by RETURNING FALSE, not throwing;
    // proceeding to the deletes below would strand the only current
    // state in the ignored _tmp_ dir — fail loudly before any delete
    require(fs.rename(new org.apache.hadoop.fs.Path(out), dst),
      s"rename $out -> $dst failed; aborting compaction before deletes")
    dirs.filter(_ != newBase).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$d"), true))
    dst.toString
  }

  /**
   * Correctness-gate query for major compaction: the same deterministic
   * layout as [[minorCompactQuery]], major-compacted into a single
   * plain `base_3`, then read back through [[readTable]] (now a pure
   * base passthrough). Oracle identical to q_acid_mor — compaction must
   * not change state, and the new base must carry `hive.acid.stats`.
   */
  /**
   * Delta-compaction TRIGGER — the push-side twin of
   * [[graft.operators.Scale.compactionPlan]]: q_compact_plan bins a
   * file inventory toward a target size; this walks a live MOR
   * table's DELTA LAYOUT and proposes the minor compactions that
   * keep read amplification bounded. Policy: deltas in TRANSACTION
   * order are binned by an event quota — group g holds the deltas
   * whose preceding cumulative event count lands in
   * [g·quota, (g+1)·quota) — and every group with ≥ 2 deltas becomes
   * one proposed `delta_low_high` minor compaction. Quota binning
   * rides txn order, NOT size order (the [[graft.operators.Scale]]
   * sorted-fill), because a merged delta must span a CONSECUTIVE txn
   * range to remain a valid delta_A_B directory.
   *
   * Scale shape: the planning path is METADATA-scale — one directory
   * listing plus one count per delta (thousands of deltas at 100 TB,
   * never corpus rows); the plan frame is delta-count-sized and the
   * grouping walk runs driver-side like every other model-sized
   * artifact (Holt series, k-means centroids).
   */
  def compactionTrigger(spark: SparkSession, tableDir: String,
      quota: Long): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(_.isDirectory).map(_.getPath.getName)
    val baseTxn = dirs.filter(_.startsWith("base_"))
      .map(_.stripPrefix("base_").toLong)
      .reduceOption(_ max _).getOrElse(Long.MinValue)
    val deltas = inParallel(dirs.filter(_.startsWith("delta_"))
      .filter(_.stripPrefix("delta_").split("_").last.toLong > baseTxn)
      .toSeq.map { d => () =>
        val ts = d.stripPrefix("delta_").split("_").map(_.toLong)
        // full-width .rdd count: a pruned COUNT(*) scan of
        // ACID-schema ORC trips the vectorized reader's
        // checkAcidSchema column-id remap (the acidStatsOf gotcha);
        // the per-delta count jobs are independent — overlapped
        val df = spark.read.orc(s"$tableDir/$d")
        val ctIdx = df.schema.fieldIndex("currentTransaction")
        (ts.head, ts.last,
          df.rdd.filter(_.getLong(ctIdx) > baseTxn).count())
      })
      .sortBy(_._1)
    var cum = 0L
    val planned = deltas.map { case (lo, hi, ne) =>
      val grp = cum / quota
      cum += ne
      (lo, hi, ne, grp)
    }
    val byGrp = planned.groupBy(_._4)
    val out = planned.map { case (lo, hi, ne, grp) =>
      val g = byGrp(grp)
      (lo, hi, ne, grp, g.map(_._1).min, g.map(_._2).max,
        g.length.toLong, g.map(_._3).sum, g.length >= 2)
    }
    import spark.implicits._
    out.toSeq.toDF("low_txn", "high_txn", "n_events", "grp",
      "grp_low", "grp_high", "grp_deltas", "grp_events", "do_merge")
      .orderBy(col("low_txn"))
  }

  /** Correctness gate for [[compactionTrigger]]: four deterministic
    * single-txn deltas over an orders base (update %11 at txn 2,
    * update %13 at txn 3, delete %17 at txn 4, insert key+2e12 %19
    * at txn 5), quota = |orders|/12 so the modular masses form
    * non-trivial groups at every sf. The oracle replays the counts
    * from the same modular rules and the quota binning as a prefix
    * window. */
  def compactionTriggerQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_trigger_q")
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.05),
        OpUpdate, 2L), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.07),
        OpUpdate, 3L), s"$dir/t/delta_3"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 17 === 0),
        OpDelete, 4L), s"$dir/t/delta_4"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 19 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 2000000000000L),
        OpInsert, 5L), s"$dir/t/delta_5")))
    val quota = math.max(1L, orders.count() / 12)
    compactionTrigger(spark, s"$dir/t", quota)
  }

  /**
   * Execute a [[compactionTrigger]] plan — the other half of the
   * trigger's planner/executor pair (the trigger decides WHICH delta
   * groups have accumulated enough events to merge; this runs each
   * `do_merge` group as ONE subset minor compaction into its
   * `delta_<grpLow>_<grpHigh>` range). Groups below the quota are
   * left untouched — merging singletons would churn files for no
   * read-amplification win. Returns (grp, mergedDir) for the
   * executed groups.
   *
   * Scale shape: group count is metadata-sized (one row per delta
   * dir); each group's merge is the standard one-shuffle event-form
   * window, cost ∝ the group's events — exactly the work the trigger
   * quota bounded.
   */
  def executeTriggerPlan(spark: SparkSession, tableDir: String,
      plan: DataFrame): Seq[(Long, String)] =
    executeTriggerPlanRows(spark, tableDir,
      plan.select(col("grp").cast("long"), col("low_txn").cast("long"),
          col("high_txn").cast("long"), col("do_merge"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))))

  /** Core of [[executeTriggerPlan]] on already-collected plan rows
    * (grp, low_txn, high_txn, do_merge) — callers that hold the plan
    * driver-side pass it once instead of re-collecting. */
  private[graft] def executeTriggerPlanRows(spark: SparkSession,
      tableDir: String, rows: Seq[(Long, Long, Long, Boolean)])
      : Seq[(Long, String)] = {
    def dirName(lo: Long, hi: Long) =
      if (lo == hi) s"delta_$lo" else s"delta_${lo}_$hi"
    // each group's merge touches a DISJOINT set of delta directories —
    // independent jobs, overlapped (results keep group order)
    inParallel(rows.groupBy(_._1).toSeq.sortBy(_._1)
      .filter(_._2.head._4)
      .map { case (grp, members) => () =>
        val dirs = members.map(m => dirName(m._2, m._3))
        grp -> minorCompact(spark, tableDir, Some(dirs))
      })
  }

  /** Correctness gate for [[executeTriggerPlan]]: the trigger fixture
    * (four modular deltas, quota = |orders|/12), planned then
    * EXECUTED. Hashes one row per planned group — the group's shape
    * (replayed by the oracle's prefix-quota binning), whether it
    * merged, the number of delta directories now covering its range
    * (1 if merged, its original count otherwise — layout = plan), and
    * the post-execution resolved row count (modular replay —
    * execution must not change resolution). */
  def triggerExecQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_trigexec_q")
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.05),
        OpUpdate, 2L), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.07),
        OpUpdate, 3L), s"$dir/t/delta_3"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 17 === 0),
        OpDelete, 4L), s"$dir/t/delta_4"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 19 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 2000000000000L),
        OpInsert, 5L), s"$dir/t/delta_5")))
    val quota = math.max(1L, orders.count() / 12)
    // ONE collect serves both the executor and the gate columns
    // (compactionTrigger's frame is driver-local, but a second
    // collect after execution would be a latent re-evaluation hazard
    // if it ever became lazy)
    val planDf = compactionTrigger(spark, s"$dir/t", quota)
      .select(col("grp"), col("low_txn"), col("high_txn"),
        col("grp_low"), col("grp_high"), col("grp_deltas"),
        col("grp_events"), col("do_merge"))
    val planRows = planDf.collect()
    val plan = planRows.map(r => (r.getLong(0), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    executeTriggerPlanRows(spark, s"$dir/t",
      planRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(7))))
    val fs = new org.apache.hadoop.fs.Path(s"$dir/t")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val post = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/t"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("delta_"))
      .map { d =>
        val ts = d.stripPrefix("delta_").split("_").map(_.toLong)
        (ts.head, ts.last)
      }
    val resolvedRows = readTable(spark, s"$dir/t",
      rowIdCol = "o_orderkey").rdd.count()
    val groups = plan.distinct.sortBy(_._1)
    groups.map { case (grp, lo, hi, nd, ne, merged) =>
      val covering = post
        .count(p => p._1 >= lo && p._2 <= hi).toLong
      (grp, lo, hi, nd, ne, merged, covering, resolvedRows)
    }.toSeq.toDF("grp", "grp_low", "grp_high", "grp_deltas",
      "grp_events", "merged", "post_dirs", "resolved_rows")
      .orderBy(col("grp"))
  }

  def majorCompactQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_major_q")
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.10),
        OpUpdate, 2L), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 7 === 0),
        OpDelete, 3L), s"$dir/t/delta_3")))
    val newBase = majorCompact(spark, s"$dir/t", rowIdCol = "o_orderkey")
    require(readAcidStats(spark, newBase).exists(_.inserts > 0),
      s"major compaction must carry $AcidStatsKey")
    readTable(spark, s"$dir/t", rowIdCol = "o_orderkey")
      .orderBy(col("o_orderkey"))
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
    val base = ordersAsEvents(orders, OpInsert, 1L)
    val updates = ordersAsEvents(
      orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.10),
      OpUpdate, 2L)
    val deletes = ordersAsEvents(
      orders.filter(col("o_orderkey") % 7 === 0), OpDelete, 3L)
    resolve(base.unionAll(updates).unionAll(deletes))
      .orderBy(col("o_orderkey"))
  }

  /**
   * Correctness-gate query for snapshot time travel: the
   * [[minorCompactQuery]] base_1/delta_2/delta_3 layout read AS OF
   * txn 2 — the txn-2 updates are visible, the txn-3 deletes are not
   * (delta_3 pruned at the metadata level, never read). The oracle is
   * the mor oracle WITHOUT the delete filter: time travel must equal
   * the state the table had at the snapshot.
   */
  def timeTravelQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_asof_q")
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.10),
        OpUpdate, 2L), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 7 === 0),
        OpDelete, 3L), s"$dir/t/delta_3")))
    readTableAsOf(spark, s"$dir/t", asOfTxn = 2L,
      rowIdCol = "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  /**
   * Change-data capture between two snapshots of a MOR table
   * directory: every logical row touched in (fromTxn, toTxn], with
   * its change class (`insert` / `update` / `delete`), its old row
   * (state as of `fromTxn`) and its new row (last event at or before
   * `toTxn`). This is the read every incremental downstream consumer
   * of a versioned lake wants — "give me what changed since my last
   * sync" — and on the reference's directory layout (`acid.md:26-60`)
   * it is DELTA-DRIVEN: only delta directories whose txn range
   * intersects the window are read at all (directory-name pruning,
   * the [[readTableAsOf]] device), so the cost scales with the CHANGE
   * volume plus one key-pruned old-value lookup — never with table
   * size, and never as a diff of two full snapshots.
   *
   * Shape at 100 TB: the window deltas reduce per (bucket, rowId) to
   * the LAST event (a per-key window, thousands of partitions); the
   * old values come from the `fromTxn` snapshot via one join on the
   * touched keys. Classification: last event is a delete → `delete`
   * (rows never present at `fromTxn` and deleted inside the window
   * collapse to nothing and are dropped); otherwise an old row exists
   * → `update`, else `insert`.
   *
   * `fromTxn` must be at or after the newest base's txn: a compaction
   * folded all earlier history into the base, so an older before-
   * snapshot cannot be reconstructed — [[readTableAsOf]] raises
   * "history before base_N has been compacted away" rather than
   * silently classifying every update as an insert and dropping
   * deletes against an empty before-state.
   */
  def changesBetween(spark: SparkSession, tableDir: String,
      fromTxn: Long, toTxn: Long, rowIdCol: String = "id",
      buckets: Int = 4): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val winDirs = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("delta_"))
      // metadata pruning: keep a delta only if its txn RANGE
      // intersects (fromTxn, toTxn]
      .filter { d =>
        val ts = d.stripPrefix("delta_").split("_").map(_.toLong)
        ts.last > fromTxn && ts.head <= toTxn
      }
    require(winDirs.nonEmpty,
      s"no delta directories intersect ($fromTxn, $toTxn] under $tableDir")
    val win = winDirs.map(d => spark.read.orc(s"$tableDir/$d"))
      .reduce(_.unionByName(_))
      .filter(col("currentTransaction") > fromTxn &&
        col("currentTransaction") <= toTxn)
    // the full ACID key triple, as in [[resolve]] — which also keeps
    // every event column referenced: ACID-schema ORC files remap
    // column ids (checkAcidSchema), so a column-pruned scan of a
    // delta AIOOBEs in the vectorized reader (see [[acidStatsOf]])
    val w = Window.partitionBy(col("originalTransaction"), col("bucket"),
        col("rowId"))
      .orderBy(col("currentTransaction").desc)
    val last = win.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("bucket"), col("rowId"), col("operation"),
        col("currentTransaction").as("change_txn"), col("row"))
    val before = readTableAsOf(spark, tableDir, fromTxn, rowIdCol, buckets)
    val old = before.select(
      (col(rowIdCol) % buckets).cast("int").as("bucket"),
      col(rowIdCol).as("rowId"),
      struct(before.columns.map(col): _*).as("old_row"))
    last.join(old, Seq("bucket", "rowId"), "left")
      .withColumn("change_type",
        when(col("operation") === OpDelete, lit("delete"))
          .when(col("old_row").isNotNull, lit("update"))
          .otherwise(lit("insert")))
      // a row born and deleted entirely inside the window was never
      // visible at either snapshot — not a change between them
      .filter(!(col("change_type") === "delete" && col("old_row").isNull))
      .select(col("rowId"), col("change_type"), col("change_txn"),
        col("old_row"),
        when(col("operation") === OpDelete, lit(null)).otherwise(col("row"))
          .as("new_row"))
  }

  /**
   * Correctness-gate query for [[changesBetween]]: the deterministic
   * [[morQuery]] layout plus an insert population —
   *   base_1:  every order at txn 1;
   *   delta_2: %10 keys updated (price × 1.10) AND %13 keys
   *            re-inserted as NEW rows at key + 10^12 with
   *            price + 1000 (the offset keeps synthesized keys
   *            disjoint from every ScaleUp id domain);
   *   delta_3: %7 keys deleted.
   * CDC over (1, 3] must classify each touched key once: deletes win
   * over earlier updates (%70 keys), inserts have no old row, and the
   * old/new prices witness the actual payloads. The oracle replays
   * the classification as CASE logic over `orders`.
   */
  /**
   * Roll a MOR table back to snapshot `txn` — the recovery path after
   * a bad write lands: the `txn` state ([[readTableAsOf]], future
   * deltas pruned at the metadata level) is rewritten as a fresh
   * `base_txn` (size-targeted files, the compaction rule), and ALL
   * prior directories are dropped — the rolled-back future because it
   * is exactly what restore erases, and the pre-snapshot past because
   * a delta without its base is unreadable anyway (this is
   * [[majorCompact]] pinned at a snapshot rather than at the head).
   * Time travel restarts from the restore point, the usual lake
   * RESTORE contract. Returns the new base path.
   */
  def restoreTo(spark: SparkSession, tableDir: String, txn: Long,
      rowIdCol: String = "id", buckets: Int = 4): String = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(d => d.startsWith("base_") || d.startsWith("delta_"))
    val restored = readTableAsOf(spark, tableDir, txn, rowIdCol, buckets)
    // crash-safe swap, ordered so every intermediate state is readable
    // and at-or-between the two snapshots:
    //   1. stage the restored state under a name [[readTable]] ignores
    //      (crash → table untouched, stray _tmp_ dir inert);
    //   2. erase only the FULLY-future (low txn > txn) deltas and a
    //      colliding base_txn — crash mid-way reads as a partial
    //      rollback, re-runnable. A STRADDLING minor-compacted range
    //      (delta_A_B with A ≤ txn < B) must survive until after the
    //      rename: its (A, txn] events are part of the snapshot, and
    //      deleting it pre-rename would lose them forever if the
    //      rename never happens;
    //   3. rename the staged base into place (readTable's numeric max
    //      now picks it; straddling deltas' folded prefix ≤ txn is
    //      shadowed by readTable's currentTransaction > baseTxn
    //      filter, and a re-run of restoreTo(txn) after a crash here
    //      reconstructs the identical snapshot);
    //   4. drop the subsumed past (old bases, remaining deltas) last —
    //      they are invisible behind the new base already.
    val tmp = s"$tableDir/_tmp_base_$txn"
    graft.sources.OrcIo.write(
      restored.repartition(sizedFileCount(fs, tableDir, dirs)), tmp)
    writeStatsSidecar(tmp,
      AcidStats(spark.read.orc(tmp).count(), 0L, 0L))
    val newBase = s"base_$txn"
    dirs.filter(d => d == newBase || (d.startsWith("delta_") &&
        d.stripPrefix("delta_").split("_").head.toLong > txn))
      .foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$d"), true))
    val dst = new org.apache.hadoop.fs.Path(s"$tableDir/$newBase")
    // rename failure returns false (no throw); deleting history below
    // without a readable base_txn in place would corrupt the table
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"rename $tmp -> $dst failed; aborting restore before deletes")
    dirs.filter(_ != newBase).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$d"), true))
    dst.toString
  }

  /** The deterministic CDC fixture layout (base_1 + delta_2 updates
    * %10 / inserts %13 at key + 1e12 / delta_3 deletes %7), shared by
    * [[cdcQuery]] and the streaming delta tail gate. Returns the
    * table directory. */
  private[graft] def cdcFixture(spark: SparkSession, sfDir: String)
      : String = {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_cdc_q")
    val updates = ordersAsEvents(
      orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.10),
      OpUpdate, 2L)
    val inserts = ordersAsEvents(
      orders.filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey",
          col("o_orderkey") + lit(1000000000000L))
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("o_orderstatus", lit("I")),
      OpInsert, 2L)
    // the three fixture directories are independent — overlap them
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(updates.unionByName(inserts), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 7 === 0),
        OpDelete, 3L), s"$dir/t/delta_3")))
    s"$dir/t"
  }

  /** Correctness-gate query for [[restoreTo]]: build the CDC fixture
    * (updates + inserts at txn 2, deletes at txn 3), roll back to
    * txn 2, and read the restored table — the txn-3 deletes must be
    * gone, the txn-2 updates and inserts present, the layout a single
    * stats-carrying base. The oracle is the txn-2 state from orders
    * math. */
  def restoreQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val tableDir = cdcFixture(spark, sfDir)
    val newBase = restoreTo(spark, tableDir, txn = 2L,
      rowIdCol = "o_orderkey")
    require(readAcidStats(spark, newBase).exists(_.inserts > 0),
      s"restored base must carry $AcidStatsKey")
    readTable(spark, tableDir, rowIdCol = "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  def cdcQuery(spark: SparkSession, sfDir: String): DataFrame = {
    changesBetween(spark, cdcFixture(spark, sfDir), fromTxn = 1L,
      toTxn = 3L, rowIdCol = "o_orderkey")
      .select(col("rowId").as("o_orderkey"), col("change_type"),
        col("change_txn"),
        col("old_row.o_totalprice").as("old_price"),
        col("new_row.o_totalprice").as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  /**
   * Metadata-path COUNT(*) on a MOR table — the lakehouse fast path
   * (Delta/Iceberg answer COUNT from manifests; Hive ACID from ORC
   * footers): under the writer discipline this layout enforces
   * (every delete names a live rowId exactly once, every insert a
   * fresh one, updates replace in place), the live-row count is
   * base_rows + inserts − deletes — NO resolve window, no payload
   * comparison, no per-row merge. Straddling minor-compacted deltas
   * follow [[readTable]]'s rule: events ≤ baseTxn are the base's own
   * folded history and are excluded from the tallies.
   *
   * CONTRACT BOUNDARY: the ledger is exact as long as no
   * delta-inserted row is later deleted AND the pair minor-compacted
   * away — [[minorCompact]] folds an insert→delete chain to the lone
   * delete (latest event per key), which drops the insert from the
   * tally while the delete still subtracts. That is why the gate
   * carries the resolve-path count and a `consistent` witness rather
   * than trusting the fast path blind; the spec pins the annihilation
   * case flipping the witness false. (Major compaction resets the
   * ledger entirely — a fresh base — and is always safe.)
   *
   * Cost shape: the base contributes a count-only scan (ORC answers
   * it from stripe footers); each delta contributes a 3-counter
   * map-side partial over its `operation` column. (The reader reads
   * delta files full-width — the ACID-schema column-pruning quirk —
   * but nothing beyond `operation`/`currentTransaction` is
   * aggregated and nothing resolves.) The gate ALSO runs the full
   * resolve-path count and hashes the equality — the invariant the
   * fast path rests on.
   */
  def fastCount(spark: SparkSession, tableDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .filter(_.isDirectory).map(_.getPath.getName)
    val base = dirs.filter(_.startsWith("base_"))
      .maxBy(_.stripPrefix("base_").toLong)
    val baseTxn = base.stripPrefix("base_").toLong
    val deltas = dirs.filter(_.startsWith("delta_"))
      .filter(_.stripPrefix("delta_").split("_").last.toLong > baseTxn)
    val baseCnt = spark.read.orc(s"$tableDir/$base")
      .agg(count(lit(1)).as("n_base"))
    val tallies =
      if (deltas.isEmpty)
        spark.range(1).select(lit(0L).as("n_ins"),
          lit(0L).as("n_upd"), lit(0L).as("n_del"))
      else {
        // full-width .rdd tallies, one delta dir at a time. NEGATIVE
        // RESULT (r13, VERDICT r12 #6 experiment, graft.tools
        // .AcidReadProbe): NO vectorized formulation reads these
        // files — not schema-forced full width, not count(struct(*))
        // pinned against ColumnPruning, not even a fully-pruned
        // count(). The AIOOBE index tracks the REQUESTED width
        // (0/0, 1/1, 2/2), proving Spark's OrcColumnarBatchReader
        // detects the Hive-ACID pattern in the FILE schema
        // (OrcUtils checkAcidSchema) and remaps requested top-level
        // ids into the inner `row` struct's children regardless of
        // what was asked; the ACID metadata columns this tally needs
        // (operation, currentTransaction) are exactly what the remap
        // hides, so the row-oriented reader is the only path to
        // them. Cost stays delta-bound, not base-bound.
        val (ins, upd, del) = inParallel(deltas.toSeq.map { d => () =>
          val df = spark.read.orc(s"$tableDir/$d")
          val opIdx = df.schema.fieldIndex("operation")
          val ctIdx = df.schema.fieldIndex("currentTransaction")
          df.rdd
            .filter(_.getLong(ctIdx) > baseTxn)
            .map { r =>
              r.getInt(opIdx) match {
                case OpInsert => (1L, 0L, 0L)
                case OpUpdate => (0L, 1L, 0L)
                case _ => (0L, 0L, 1L)
              }
            }
            .fold((0L, 0L, 0L)) { (a, b) =>
              (a._1 + b._1, a._2 + b._2, a._3 + b._3)
            }
        }).fold((0L, 0L, 0L)) { (a, b) =>
          (a._1 + b._1, a._2 + b._2, a._3 + b._3)
        }
        spark.range(1).select(lit(ins).as("n_ins"),
          lit(upd).as("n_upd"), lit(del).as("n_del"))
      }
    baseCnt.crossJoin(broadcast(tallies))
      .withColumn("meta_count",
        col("n_base") + col("n_ins") - col("n_del"))
  }

  /** Correctness gate: the [[morQuery]]-style layout plus a fresh
    * insert delta (keys + 2·10¹² at txn 4, o_orderkey % 19), so all
    * three operations shape the count; the fast-path count must equal
    * the resolve-path count, and the oracle replays both from the
    * modular rules. */
  def fastCountQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_fastcount_q")
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.10),
        OpUpdate, 2L), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 7 === 0),
        OpDelete, 3L), s"$dir/t/delta_3"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 19 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 2000000000000L),
        OpInsert, 4L), s"$dir/t/delta_4")))
    // .rdd.count(), NOT .agg(count): a count() over the resolve plan
    // prunes the delta read schema (even `row` drops out) and the
    // pruned ACID-schema scan AIOOBEs in the vectorized reader — the
    // same quirk the tally path above works around
    val scanCount = readTable(spark, s"$dir/t",
      rowIdCol = "o_orderkey").rdd.count()
    fastCount(spark, s"$dir/t")
      .select(col("n_base"), col("n_ins"), col("n_upd"), col("n_del"),
        col("meta_count"), lit(scanCount).as("scan_count"),
        (col("meta_count") === lit(scanCount)).as("consistent"))
  }

  /**
   * GDPR right-to-be-forgotten purge across HISTORY: physically
   * rewrite every file of the MOR layout — the base and every delta —
   * dropping all events whose rowId is in the subject key set, while
   * PRESERVING the directory/txn structure so time travel keeps
   * working for everything else. This is the compliance operation a
   * versioned lake must support that a takedown DELETE delta cannot
   * provide: a delete only hides keys from the PRESENT, while every
   * historical snapshot (and RESTORE) would resurrect them. Erasure
   * wins over time travel, by construction.
   *
   * Mechanics: the base is plain ORC — a vectorized filtered rewrite
   * through a temp dir + atomic-ish swap. Deltas are ACID-schema ORC,
   * which the vectorized reader cannot read at all (see [[fastCount]]
   * / AcidReadProbe) — each rewrites through the row reader
   * (`.rdd.filter` + createDataFrame on the original schema), and its
   * ACID-stats sidecar is recomputed. Cost ∝ table + history size —
   * inherent to physical erasure — parallel per file split like any
   * scan; the subject key set broadcasts (erasure requests are small).
   */
  def purgeKeys(spark: SparkSession, tableDir: String,
      keys: Set[Long], rowIdCol: String): Unit = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(conf)
    // Crash self-heal (ADVICE r13): a crash inside swapIn's two-rename
    // window leaves the live base_/delta_ dir ABSENT, with the only
    // complete copy at dot-prefixed .purged_old_<d> — which readTable
    // ignores, so without healing a delta's history silently vanishes
    // from every subsequent read and a purge re-run cannot restore it
    // (it only lists visible dirs). On entry: restore any stranded
    // aside copy whose live dir is missing, drop post-swap aside
    // debris, and drop half-written tmp dirs. Re-purging a restored
    // dir is idempotent, so the heal is always safe.
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .foreach { n =>
        val p = new org.apache.hadoop.fs.Path(root, n)
        if (n.startsWith(".purged_old_")) {
          val live = new org.apache.hadoop.fs.Path(
            root, n.stripPrefix(".purged_old_"))
          if (!fs.exists(live))
            require(fs.rename(p, live),
              s"purge crash-heal restore failed for $n")
          else fs.delete(p, true)
        } else if (n.startsWith(".purge_tmp_")) {
          fs.delete(p, true)
        }
      }
    val dirs = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
    val bcast = spark.sparkContext.broadcast(keys)
    // the subject keys as a BROADCAST dimension for the base anti-join
    // (ADVICE r13): isInCollection(keys) embeds the whole set in the
    // plan as an In/InSet literal, which for a purge request scaling
    // with table size grows the serialized plan unboundedly; a
    // broadcast left_anti ships the set once as a hashed relation
    val keysDf = broadcast(keys.toSeq.toDF(rowIdCol))
    // rename-aside swap: every intermediate state keeps one complete
    // copy of the directory (a delete-before-rename window would lose
    // the whole base/delta — data loss far beyond the erasure
    // request — if the rename failed or the process died between the
    // two calls)
    def swapIn(tmp: String, dst: String): Unit = {
      val tmpP = new org.apache.hadoop.fs.Path(tmp)
      val dstP = new org.apache.hadoop.fs.Path(dst)
      // dot-prefixed so a crash leftover never matches readTable's
      // base_/delta_ directory listing (base_1.purged_old would)
      val oldP = new org.apache.hadoop.fs.Path(
        dstP.getParent, s".purged_old_${dstP.getName}")
      fs.delete(oldP, true) // clear any debris from a prior crash
      require(fs.rename(dstP, oldP), s"purge aside-rename failed for $dst")
      require(fs.rename(tmpP, dstP), s"purge swap failed for $dst")
      fs.delete(oldP, true)
    }
    // each directory's rewrite touches only its own files and swap
    // names — independent jobs, overlapped (the sequential loop was
    // half driver-side gaps: per-dir planning + sidecars + renames)
    inParallel(dirs.toSeq.map { d => () =>
      val path = s"$tableDir/$d"
      val tmp = s"$tableDir/.purge_tmp_$d"
      if (d.startsWith("base_")) {
        val kept = spark.read.orc(path)
          .join(keysDf, Seq(rowIdCol), "left_anti")
        graft.sources.OrcIo.write(kept, tmp)
        swapIn(tmp, path)
      } else if (d.startsWith("delta_")) {
        val df = spark.read.orc(path)
        val schema = df.schema
        val idIdx = schema.fieldIndex("rowId")
        val keptRdd = df.rdd
          .filter(r => !bcast.value.contains(r.getLong(idIdx)))
        // the RDD-backed frame reads the ORIGINAL files lazily while
        // writing to the temp dir — no read-while-overwrite hazard;
        // writeDelta recomputes the ACID-stats sidecar from the
        // surviving events (no ORC vectorized path involved)
        val kept = spark.createDataFrame(keptRdd, schema)
        writeDelta(kept, tmp)
        swapIn(tmp, path)
      }
    })
    ()
  }

  /** Correctness gate for [[purgeKeys]]: the fastCount layout
    * (base_1 + update delta_2 + delete delta_3 + insert delta_4 at
    * +2·10¹²), then purge of every rowId ≡ 0 (mod 23) across history.
    * The gate reads the table AS OF txn 2, 3, and 4 and hashes, per
    * snapshot: the row count, the count of purged keys still visible
    * (MUST be 0 — the erasure-beats-time-travel witness), and a
    * control class count (mod 5) proving untargeted history is
    * untouched. All counts replay from modular arithmetic on orders. */
  def purgeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the mod-3 third of orders: erasure semantics are fixture-size-
    // independent and this is the costliest fixture gate (4 dirs
    // written + all rewritten + 3 as-of row-reader scans) — the sf1
    // re-gate still exercises scale
    val orders = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("acid_purge_q")
    inParallel(Seq(
      () => graft.sources.OrcIo.write(orders, s"$dir/t/base_1"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 1.10),
        OpUpdate, 2L), s"$dir/t/delta_2"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 7 === 0),
        OpDelete, 3L), s"$dir/t/delta_3"),
      () => writeDelta(ordersAsEvents(
        orders.filter(col("o_orderkey") % 19 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 2000000000000L),
        OpInsert, 4L), s"$dir/t/delta_4")))
    val subjects = orders
      .select(col("o_orderkey"))
      .unionByName(orders.filter(col("o_orderkey") % 19 === 0)
        .select((col("o_orderkey") + 2000000000000L)
          .as("o_orderkey")))
      .filter(col("o_orderkey") % 23 === 0)
      .collect().map(_.getLong(0)).toSet
    purgeKeys(spark, s"$dir/t", subjects, rowIdCol = "o_orderkey")
    // the three as-of snapshot scans are independent — overlapped
    val out = inParallel(Seq(2L, 3L, 4L).map { asOf => () =>
      val counts = readTableAsOf(spark, s"$dir/t", asOf,
          rowIdCol = "o_orderkey")
        .rdd.map { r =>
          val k = r.getLong(0)
          (1L, if (k % 23 == 0) 1L else 0L,
            if (k % 5 == 0) 1L else 0L)
        }
        .fold((0L, 0L, 0L)) { (a, b) =>
          (a._1 + b._1, a._2 + b._2, a._3 + b._3)
        }
      (asOf, counts._1, counts._2, counts._3)
    })
    out.toDF("asof_txn", "n_rows", "n_purged_visible", "n_mod5")
      .orderBy("asof_txn")
  }
}
