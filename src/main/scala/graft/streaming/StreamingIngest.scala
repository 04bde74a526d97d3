package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/**
 * Streaming ingest (SURVEY.md §2.10 / W8).
 *
 * The reference supports readers consuming a file while a writer is
 * still appending: `writeIntermediateFooter` flushes a valid footer
 * mid-file and a `_flush_length` side file advertises the readable
 * prefix (`WriterImpl.java:2867-2880`, `OrcAcidUtils.java:40-60`).
 * The idiomatic Spark replacement is Structured Streaming's
 * file-per-micro-batch sink with the `_spark_metadata` commit log:
 * readers see exactly the committed batches — same contract
 * (readable-prefix visibility), engine-managed.
 *
 * Scale: each micro-batch writes partition-parallel files; the commit
 * log bounds driver state. Watermarks bound the windowed-agg state
 * store, so unbounded streams run in bounded memory per executor.
 */
object StreamingIngest {

  /** Micro-batch ORC ingest: append `df`-shaped streaming rows to
    * `outDir` as ORC files with a commit log (the W8 analogue). */
  def orcSink(events: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .format("orc")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .option("compression", "zlib")
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .start()

  /** Watermarked hourly rollup of an event stream — the engine-side
    * continuous analogue of q_events_hourly. 10-minute watermark bounds
    * state; late rows beyond it are dropped deterministically. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /**
   * Streaming exact dedup: drop events whose dedup key was already seen
   * within the watermark horizon — the streaming face of
   * [[graft.operators.Dedup.exactQuery]]. State is bounded by the
   * watermark (keys older than the horizon are evicted), so unbounded
   * streams dedup in bounded memory — the reason a 100 TB/day ingest
   * can dedup at all.
   */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  case class SessionInput(user_id: Long, ts: java.sql.Timestamp,
      value: Double)
  case class SessionState(nEvents: Long, sumValue: Double,
      startMs: Long, lastMs: Long)
  case class SessionOut(user_id: Long, n_events: Long, sum_value: Double,
      duration_sec: Double)

  /**
   * Custom stateful sessionization via mapGroupsWithState: a session
   * closes after `gapSec` of inactivity (processing-time timeout).
   * Demonstrates the KeyValueGroupedDataset state API the engine offers
   * for stream logic the built-in windows can't express.
   */
  def sessionize(events: Dataset[SessionInput], gapSec: Int = 1800,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](timeout) {
        (userId: Long, rows: Iterator[SessionInput],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(userId, s.nEvents, s.sumValue,
              (s.lastMs - s.startMs) / 1000.0)
          } else {
            val evs = rows.toSeq
            val prev = state.getOption.getOrElse(
              SessionState(0L, 0.0, Long.MaxValue, Long.MinValue))
            val ms = evs.map(_.ts.getTime)
            val next = SessionState(
              prev.nEvents + evs.size,
              prev.sumValue + evs.map(_.value).sum,
              math.min(prev.startMs, ms.min),
              math.max(prev.lastMs, ms.max))
            state.update(next)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(gapSec * 1000L)
            SessionOut(userId, next.nEvents, next.sumValue,
              (next.lastMs - next.startMs) / 1000.0)
          }
      }
  }

  /**
   * Batch-replay harness: runs the streaming pipeline over the static
   * events table via a file stream with AvailableNow, writes ORC, and
   * returns the re-read result. Exercises the full W8 path (stream
   * source → transform → ORC sink → commit-log read-back) in one call.
   */
  def replayIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val src = graft.Tables.load(spark, sfDir, "events")
    val stage = graft.sources.OrcIo.scratchDir("stream_src")
    // stage the table as a handful of parquet files for the file stream
    // to discover (few large files: file-listing and per-file batch
    // overheads dominate at replay scale, not row decode)
    src.coalesce(4).write.mode("overwrite").parquet(s"$stage/in")
    val out = s"$stage/out"
    // size streaming state to the stream volume: each micro-batch
    // commits one state-store dir per shuffle partition, and a few
    // thousand windows need 4, not 32 (at production volume this is
    // sized to the cluster like any shuffle). The override lives in a
    // cloned session so concurrently-planning batch queries (Verify
    // runs 4 at a time) never see it.
    val streamSession = spark.newSession()
    streamSession.conf.set("spark.sql.shuffle.partitions", "4")
    val stream2 = streamSession.readStream
      .schema(src.schema)
      .parquet(s"$stage/in")
    val q = orcSink(hourlyRollup(stream2), out, s"$stage/ckpt")
    q.awaitTermination()
    spark.read.orc(out)
  }
}
