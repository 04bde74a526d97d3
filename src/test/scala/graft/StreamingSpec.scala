package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourlyRollup emits finalized windows under watermark (append)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamingIngest.hourlyRollup(events)
      .writeStream.format("memory").queryName("rollup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2026-01-01 10:05:00"), "click", 1.0),
        (ts("2026-01-01 10:45:00"), "click", 2.0),
        (ts("2026-01-01 11:10:00"), "view", 3.0))
      q.processAllAvailable()
      // advance watermark past the 10:00 window (11:20 - 10min > 11:00)
      mem.addData((ts("2026-01-01 12:30:00"), "view", 4.0))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 14:00:00"), "view", 5.0))
      q.processAllAvailable()
      val got = spark.table("rollup_test")
        .select(col("hour_start"), col("event_type"), col("n_events"),
          col("sum_value"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(got.contains(("2026-01-01 10:00:00.0", "click", 2L, 3.0)),
        s"finalized 10:00 click window missing from $got")
      assert(got.contains(("2026-01-01 11:00:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionize accumulates per-user state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingIngest.SessionInput]
    // NoTimeout in the test: with the default 0ms trigger, processing-
    // time timeouts schedule continuous empty micro-batches and
    // processAllAvailable never settles
    val q = StreamingIngest.sessionize(mem.toDS(),
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("session_test")
      .outputMode("update").start()
    try {
      mem.addData(
        StreamingIngest.SessionInput(1L, ts("2026-01-01 10:00:00"), 1.0),
        StreamingIngest.SessionInput(1L, ts("2026-01-01 10:10:00"), 2.0),
        StreamingIngest.SessionInput(2L, ts("2026-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      mem.addData(
        StreamingIngest.SessionInput(1L, ts("2026-01-01 10:20:00"), 3.0))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), max(col("sum_value")).as("s"),
          max(col("duration_sec")).as("d"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
          r.getDouble(3)))).toMap
      assert(rows(1L) == ((3L, 6.0, 1200.0)))
      assert(rows(2L) == ((1L, 5.0, 0.0)))
    } finally q.stop()
  }

  test("dedupStream drops repeated keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val events = mem.toDF().toDF("ts", "k", "payload")
    val q = StreamingIngest.dedupStream(events, Seq("k"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2026-01-01 10:00:00"), 1L, "first"),
        (ts("2026-01-01 10:00:30"), 1L, "dup"),
        (ts("2026-01-01 10:01:00"), 2L, "other"))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 10:02:00"), 1L, "dup-next-batch"))
      q.processAllAvailable()
      val got = spark.table("dedup_test")
        .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      assert(got == Map(1L -> "first", 2L -> "other"), got)
    } finally q.stop()
  }

  test("sessionizeEventTime: gap-close emits, watermark timeout closes finals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingIngest.SessEvent]
    val q = StreamingIngest.sessionizeEventTime(mem.toDS())
      .writeStream.format("memory").queryName("sess_et_test")
      .outputMode("append").start()
    try {
      // u1 session 1: two events 10 min apart
      mem.addData(
        StreamingIngest.SessEvent(1L, 1L, ts("2026-01-01 10:00:00"), 1.0),
        StreamingIngest.SessEvent(1L, 2L, ts("2026-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // u1 session 2 opens (gap > 30 min ⇒ session 1 closes); u2's lone
      // event pushes the watermark to 17:50, far past session 2's
      // end + gap (12:30), so the event-time timeout closes it too
      mem.addData(
        StreamingIngest.SessEvent(1L, 3L, ts("2026-01-01 12:00:00"), 4.0),
        StreamingIngest.SessEvent(2L, 4L, ts("2026-01-01 18:00:00"), 8.0))
      q.processAllAvailable()
      val got = spark.table("sess_et_test")
        .select(col("user_id"), col("session_no"), col("n_events"),
          col("sum_value"), col("session_start"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getTimestamp(4).toString)))
        .toMap
      // the 17:50 watermark passed both u1 sessions' end + gap
      // (10:40, 12:30), so both finalized; u2's session is still open
      // (18:00 + 30 min is past the watermark)
      assert(got == Map(
        (1L, 1L) -> ((2L, 3.0, "2026-01-01 10:00:00.0")),
        (1L, 2L) -> ((1L, 4.0, "2026-01-01 12:00:00.0"))), got)
    } finally q.stop()
  }

  test("sessionizeEventTime merges late events and keeps numbering across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingIngest.SessEvent]
    val q = StreamingIngest.sessionizeEventTime(mem.toDS())
      .writeStream.format("memory").queryName("sess_mb_test")
      .outputMode("append").start()
    def e(u: Long, id: Long, t: String, v: Double) =
      StreamingIngest.SessEvent(u, id, ts(s"2026-01-01 $t"), v)
    try {
      mem.addData(e(1, 1, "10:00:00", 1.0), e(1, 2, "10:10:00", 2.0))
      q.processAllAvailable() // wm -> 10:00
      // 10:05 is late but within watermark: must merge into session 1;
      // 09:00 is beyond the watermark: dropped deterministically
      mem.addData(e(1, 3, "10:05:00", 4.0), e(1, 7, "09:00:00", 99.0),
        e(2, 4, "13:00:00", 8.0))
      q.processAllAvailable() // wm -> 12:50; u1 session 1 finalizes
      // u1 returns within the numbering horizon: session_no continues
      mem.addData(e(1, 5, "13:30:00", 16.0))
      q.processAllAvailable() // wm -> 13:20
      mem.addData(e(2, 6, "15:00:00", 32.0))
      q.processAllAvailable() // wm -> 14:50; u1 session 2 finalizes
      val u1 = spark.table("sess_mb_test")
        .filter(col("user_id") === 1L)
        .collect().map(r => r.getLong(1) ->
          ((r.getLong(2), r.getDouble(3), r.getTimestamp(4).toString)))
        .toMap
      assert(u1 == Map(
        1L -> ((3L, 7.0, "2026-01-01 10:00:00.0")),
        2L -> ((1L, 16.0, "2026-01-01 13:30:00.0"))), u1)
    } finally q.stop()
  }

  test("replaySessions matches the batch session query on closed sessions") {
    val res = StreamingIngest.replaySessions(spark, sfDir)
      .withColumn("sum_value", round(col("sum_value"), 2))
    val batch = graft.operators.Scale.sessionWindowQuery(spark, sfDir)
    // the replay emits a watermark-determined subset of batch sessions;
    // every emitted session must match its batch twin exactly
    val joined = res.alias("s").join(batch.alias("b"),
      col("s.user_id") === col("b.user_id") &&
        col("s.session_no") === col("b.session_no"))
    assert(joined.count() == res.count(),
      "every streamed session must exist in the batch result")
    val mismatched = joined.filter(
      col("s.n_events") =!= col("b.n_events") ||
        col("s.sum_value") =!= col("b.sum_value") ||
        col("s.session_start") =!= col("b.session_start")).count()
    assert(mismatched == 0)
    assert(res.count() > 0)
  }

  test("streamAttribution joins clicks to purchases within the hour") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double, String)]
    val events = mem.toDF()
      .toDF("user_id", "event_id", "ts", "value", "event_type")
    val q = StreamingIngest.streamAttribution(events)
      .writeStream.format("memory").queryName("attrib_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 1L, ts("2026-01-01 10:00:00"), 0.0, "click"),
        (1L, 2L, ts("2026-01-01 10:30:00"), 9.5, "purchase"), // match
        (1L, 3L, ts("2026-01-01 11:30:00"), 3.0, "purchase"), // > 1h: no
        (2L, 4L, ts("2026-01-01 10:15:00"), 7.0, "purchase"), // other user
        (1L, 5L, ts("2026-01-01 09:00:00"), 2.0, "purchase")) // before: no
      q.processAllAvailable()
      val got = spark.table("attrib_test")
        .select(col("click_id"), col("purchase_id"), col("purchase_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, 2L, 9.5)), got)
    } finally q.stop()
  }

  test("streamAttributionOuter: matches emit immediately; unmatched " +
      "clicks emit null-extended only once the watermark closes their " +
      "window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double, String)]
    val events = mem.toDF()
      .toDF("user_id", "event_id", "ts", "value", "event_type")
    val q = StreamingIngest.streamAttributionOuter(events)
      .writeStream.format("memory").queryName("attrib_outer_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 1L, ts("2026-01-01 10:00:00"), 0.0, "click"),
        (1L, 2L, ts("2026-01-01 10:30:00"), 9.5, "purchase"), // match
        (2L, 3L, ts("2026-01-01 10:05:00"), 0.0, "click"))    // no match
      q.processAllAvailable()
      def rows() = spark.table("attrib_outer_test")
        .select(col("click_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      // before the watermark passes 10:05 + 1h, only the match shows
      assert(rows() == Set((1L, Some(2L))), rows())
      // advance both sides' event time past 11:05 + 10 min delay →
      // click 3's window provably closed → null-extended row emits
      mem.addData(
        (9L, 8L, ts("2026-01-01 11:30:00"), 0.0, "click"),
        (9L, 9L, ts("2026-01-01 11:30:00"), 1.0, "purchase"))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows().contains((3L, None)),
        s"expired click must emit null-extended: ${rows()}")
      // the matched click never re-emits as unmatched
      assert(!rows().contains((1L, None)), rows())
    } finally q.stop()
  }

  test("replayIngest: stream -> ORC sink -> read-back round trip") {
    val res = StreamingIngest.replayIngest(spark, sfDir)
    assert(res.columns.toSeq == Seq(
      "hour_start", "event_type", "n_events", "sum_value"))
    // append-mode emits only windows finalized by the watermark; the
    // replay must produce a sane prefix of the batch rollup
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val n = res.count()
    assert(n > 0, "no finalized windows emitted by replay")
    assert(n <= batch.count())
  }

  test("replayFunnel: emits exactly the watermark-quiet users, each " +
      "with their batch-funnel stage") {
    val res = StreamingIngest.replayFunnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res.nonEmpty)
    val batch = graft.operators.Relational.funnelQuery(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val events = Tables.load(spark, sfDir, "events")
    val maxTs = events.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val wmMs = maxTs.getTime - 10 * 60 * 1000L
    val lastPer = events.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).getTime)
      .toMap
    val eligible = lastPer.filter { case (_, l) =>
      l + 30 * 60 * 1000L < wmMs }.keySet
    assert(res.keySet == eligible,
      s"emitted ${res.keySet.size} != eligible ${eligible.size}")
    res.foreach { case (u, stage) =>
      assert(stage == batch(u), s"user $u: stream $stage != batch")
    }
  }

  test("replayWindowedCms: per-window estimates equal a batch-side " +
      "sketch replay; sketch never under-counts") {
    val res = StreamingIngest.replayWindowedCms(spark, sfDir).collect()
    assert(res.nonEmpty, "no closed windows emitted")
    // batch reference: per-(window, type) exact counts over the SAME
    // window-close rule, estimates replayed from md5 bytes in Scala
    val events = Tables.load(spark, sfDir, "events")
    val maxTs = events.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val wmMs = maxTs.getTime - 10 * 60 * 1000L
    val counts = events
      .select(window(col("ts"), "1 hour").getField("start").as("hs"),
        col("event_type"))
      .groupBy(col("hs"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
      .filter { case ((hs, _), _) => hs.getTime + 3600 * 1000L <= wmMs }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bytes(s: String) = { md.reset(); md.digest(s.getBytes("UTF-8")) }
    res.foreach { r =>
      val hs = r.getTimestamp(0)
      val ty = r.getString(1)
      val est = r.getLong(2)
      val pb = bytes(ty)
      val ref = (0 until 4).map { j =>
        counts.collect { case ((h, t), n)
          if h == hs && bytes(t)(j) == pb(j) => n }.sum
      }.min
      assert(est == ref, s"($hs, $ty): est $est != replay $ref")
      val exact = counts.getOrElse((hs, ty), 0L)
      assert(est >= exact, s"($hs, $ty): under-count")
    }
    // every closed window probed for every type
    val nWindows = counts.keySet.map(_._1).size
    val nTypes = events.select(col("event_type")).distinct().count()
    assert(res.length == nWindows * nTypes)
  }

  test("replayRateLimit matches a batch sliding-window recount on " +
      "closed windows; every event spans exactly two slide phases") {
    val res = StreamingIngest.replayRateLimit(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(res.nonEmpty, "no burst flags emitted")
    // batch reference: explode each event into its two 6h/3h-slide
    // windows, recount, apply the same close rule and threshold
    val events = Tables.load(spark, sfDir, "events")
    val maxTs = events.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val wmMs = maxTs.getTime - 10 * 60 * 1000L
    val slideMs = 3 * 3600 * 1000L
    val ref = events.select(col("user_id"), col("ts")).collect()
      .flatMap { r =>
        val ts = r.getTimestamp(1).getTime
        val b = math.floorDiv(ts, slideMs) * slideMs
        Seq((b, r.getLong(0)), (b - slideMs, r.getLong(0)))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter { case ((ws, _), n) =>
        n > 3 && ws + 2 * slideMs <= wmMs }
      .map { case ((ws, u), n) =>
        (new java.sql.Timestamp(ws), u) -> n }
    assert(res == ref,
      s"stream flags != batch recount: stream=${res.size} ref=${ref.size}")
  }

  test("replayWindowedDistinct: chained window-on-window counts " +
      "equal a batch DISTINCT on every closed window") {
    import org.apache.spark.sql.functions._
    val res = graft.streaming.StreamingIngest
      .replayWindowedDistinct(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val ev = Tables.load(spark, sfDir, "events")
    val wmMs = ev.agg(max(unix_millis(col("ts")))).collect()(0)
      .getLong(0) - 10 * 60 * 1000L
    val ref = ev
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"),
        col("user_id"))
      .distinct()
      .groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .filter { case ((h, _), _) =>
        h.getTime + 3600 * 1000L <= wmMs }
      .toMap
    assert(res == ref,
      s"stream=${res.size} windows, batch=${ref.size}; " +
        s"diff=${(res.toSet diff ref.toSet).take(3)}")
    assert(res.nonEmpty)
  }

  test("restart idempotence: re-opening the same checkpoint over an " +
      "unchanged source adds zero rows (exactly-once sink)") {
    val (n1, n2) = graft.streaming.StreamingIngest
      .restartDelta(spark, sfDir)
    assert(n1 > 0, "first drain produced nothing")
    assert(n2 == n1,
      s"restart re-emitted rows: $n1 -> $n2 (exactly-once broken)")
  }

  test("streamDeltas tail: a delta landed AFTER the first drain " +
      "arrives exactly once on the next drain, nothing re-emits") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = graft.sources.OrcIo.scratchDir("stream_tail")
    // a tiny MOR table: base + one delta before the stream starts
    Seq((1L, 10.0), (2L, 30.0)).toDF("id", "v").write.orc(s"$dir/t/base_1")
    def ev(op: Int, rowId: Long, txn: Long, v: Double) =
      (op, 1L, (rowId % 4).toInt, rowId, txn, v)
    def writeDelta(name: String, rows: Seq[(Int, Long, Int, Long, Long, Double)]): Unit =
      rows.toDF("operation", "originalTransaction", "bucket", "rowId",
          "currentTransaction", "v")
        .withColumn("row", struct(col("rowId").as("id"), col("v")))
        .drop("v")
        .write.orc(s"$dir/t/$name")
    writeDelta("delta_2", Seq(ev(1, 1L, 2L, 11.0)))
    def drain(): Unit = {
      val q = StreamingIngest.streamDeltas(spark, s"$dir/t")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .outputMode(OutputMode.Append())
        .start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(s"$dir/out")
      .select("rowId", "currentTransaction").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(first == Seq((1L, 2L)), s"first drain: $first")
    // a new delta lands; the SAME checkpoint must deliver exactly it
    writeDelta("delta_3", Seq(ev(2, 2L, 3L, 0.0), ev(0, 3L, 3L, 50.0)))
    drain()
    val second = spark.read.parquet(s"$dir/out")
      .select("rowId", "currentTransaction").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(second == Set((1L, 2L), (2L, 3L), (3L, 3L)),
      s"after the tail drain: $second")
  }

  test("cusumStream: incremental arrival finalizes days in order, " +
      "the scaled recursion replays by hand, a spike alarms, and " +
      "beyond-watermark stragglers are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val events = mem.toDF().toDF("event_type", "ts")
      .as[StreamingIngest.CusumEv]
    // burn-in 2 days, watermark 10 min; scaled units: W = 2
    val out = StreamingIngest.cusumStream(events, burnDays = 2)
    val q = out.toDF().writeStream.format("memory")
      .queryName("cusum_test").outputMode("append").start()
    def rows(): Seq[(String, Long, Long, String, Option[Long],
        Option[Boolean])] =
      spark.table("cusum_test")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getString(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
        .toSeq.sortBy(x => (x._1, x._2))
    def day(d: Int, hm: String) =
      Timestamp.valueOf(f"2026-01-${d + 1}%02d $hm:00")
    val epochDay0 = day(0, "00:00").getTime / 86400000L
    try {
      // day 0: x=3, day 1: x=5 (the burn-in pair, M = 8)
      mem.addData(Seq.fill(3)(("a", day(0, "10:00"))) ++
        Seq.fill(5)(("a", day(1, "11:00"))): _*)
      q.processAllAvailable()
      // the watermark (day-1 11:00 − 10 min) already passed day 0's
      // end, so day 0 finalizes; day 1 is still open
      assert(rows() == Seq(("a", epochDay0, 3L, "burnin", None, None)),
        "only day 0 may finalize before day 1 ends")
      // day 3 traffic pushes the watermark past days 1-2; day 1
      // finalizes as the second burn-in day
      mem.addData(Seq.fill(4)(("a", day(3, "12:00"))): _*)
      q.processAllAvailable()
      assert(rows() == Seq(
        ("a", epochDay0, 3L, "burnin", None, None),
        ("a", epochDay0 + 1, 5L, "burnin", None, None)))
      // day 4 closes day 3: first monitored day, x=4,
      // c = 4*2 - 8 = 0 -> s = 0, alarm line M*W/2 = 8 -> quiet
      mem.addData(("a", day(4, "09:00")))
      q.processAllAvailable()
      assert(rows().last == ("a", epochDay0 + 3, 4L, "monitor",
        Some(0L), Some(false)))
      // a 50-event spike on day 4, then day 6 closes it:
      // c = 0 + (51*2 - 8) = 94 -> s = 94 > 8 -> ALARM
      mem.addData(Seq.fill(50)(("a", day(4, "18:00"))): _*)
      mem.addData(("a", day(6, "08:00")))
      q.processAllAvailable()
      assert(rows().last == ("a", epochDay0 + 4, 51L, "monitor",
        Some(94L), Some(true)))
      val before = rows()
      // a straggler for long-finalized day 0 is beyond the watermark:
      // dropped, nothing re-emits, no count changes
      mem.addData(("a", day(0, "23:00")))
      q.processAllAvailable()
      assert(rows() == before, "beyond-watermark event must drop")
    } finally q.stop()
  }

  test("replayScd2: drained stream equals the batch interval join, " +
      "and every event matched exactly one version") {
    val out = graft.streaming.StreamingIngest
      .replayScd2(spark, sfDir).collect()
    val batch = graft.operators.Versioning
      .scd2LookupQuery(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      "streaming point-in-time enrichment diverged from batch")
    val total = Tables.load(spark, sfDir, "events").count()
    assert(out.map(_.getLong(2)).sum == total)
  }

  test("replayCompliance: event-time rule versioning — the lifted " +
      "host ban blocks only era 1, the re-allow lands only in era 3, " +
      "ties go to allow, mass conserved") {
    val rows = graft.streaming.StreamingIngest
      .replayCompliance(spark, sfDir).collect()
    val total = Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_.getLong(4)).sum == total,
      "every event must classify exactly once")
    def slice(era: Int, host: String) =
      rows.filter(r => r.getInt(0) == era && r.getString(1) == host)
    // site3.com: the "/" ban is valid in era 1 ONLY — a late
    // correction must not rewrite what era-1 fetches saw
    assert(slice(1, "site3.com").forall(r =>
      r.getString(2) == "/" && !r.getBoolean(3)),
      "era-1 site3.com fetches must stay blocked")
    (2 to 3).foreach { e =>
      assert(slice(e, "site3.com").forall(r =>
        r.getString(2) == "-" && r.getBoolean(3)),
        s"era-$e site3.com must be rule-free and allowed")
    }
    // site1.com /private/blog: blocked by /private/ until the era-3
    // longest-match re-allow
    def pb(era: Int) = slice(era, "site1.com")
      .filter(_.getString(2) == "/private/blog")
    assert(pb(1).isEmpty && pb(2).isEmpty && pb(3).nonEmpty &&
      pb(3).forall(_.getBoolean(3)),
      "the /private/blog re-allow must win only in era 3")
    // site4.com: the standing exact tie resolves to allow in every
    // era (paths under /blog/ match no rule and default-allow; the
    // /private|/public paths hit the tie pair and must carry '/p')
    (1 to 3).foreach { e =>
      val s4 = slice(e, "site4.com")
      assert(s4.nonEmpty && s4.forall(_.getBoolean(3)),
        s"era-$e site4.com must be fully allowed")
      assert(s4.exists(_.getString(2) == "/p"),
        s"era-$e site4.com tie rule never matched")
    }
  }

  test("streaming near-dup ingest: drained candidate set equals the " +
      "batch frozen-banding incremental set") {
    val r = StreamingIngest.replayNearDup(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) > 0, "batch slice must be non-empty")
    assert(row.getBoolean(1), "found_any: near-dup clusters must " +
      "straddle the mod-4 cut (fixture assumption)")
    assert(row.getBoolean(2), "no_old_old: every streamed candidate " +
      "pair must touch a batch doc")
    assert(row.getBoolean(3), "stream_eq_batch: the drained stream " +
      "pair set must equal the batch incremental candidate set")
  }

  test("streaming near-dup state is bounded: cap-1 buckets force " +
      "eviction through the compaction store, pair set unchanged") {
    // maxPerBucket = 1 caps hot state at ONE member per bucket — the
    // harshest eviction pressure possible: every cross-batch pair is
    // forced through the evict→compaction-store→stream-static path
    // (state can never hold a prior-batch member alongside a new
    // arrival). The drained set must STILL equal the batch reference,
    // proving evicted members keep pairing via the standing postings
    // store; total state ≤ active buckets × 1 by construction.
    val r = StreamingIngest.replayNearDup(spark, sfDir,
      maxPerBucket = 1).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getBoolean(1), "found_any under cap-1")
    assert(row.getBoolean(2), "no_old_old under cap-1")
    assert(row.getBoolean(3), "stream_eq_batch must hold under " +
      "maximal eviction pressure — a lost eviction loses pairs")
  }

  test("index stream: micro-batches land as real appended segments " +
      "and the serve equals the batch-built index") {
    import graft.operators.Retrieval
    import graft.streaming.StreamingIngest
    val terms = Seq("scan", "filter", "agg")
    val streamed = StreamingIngest
      .indexStreamQuery(spark, sfDir, terms, 20).collect().toSeq
    val batch = Retrieval.indexServeOver(spark,
      Retrieval.buildInvIndex(spark, sfDir), terms, 20).collect().toSeq
    assert(streamed == batch,
      "stream-appended index serves differently from the batch index")
    // the stream genuinely appended: stats carries one row per
    // segment (base + >= 2 non-empty micro-batches on this corpus)
    val nSegs = spark.read.parquet(
      StreamingIngest.indexStreamDir(spark, sfDir) + "/stats").count()
    assert(nSegs >= 3, s"expected base + >=2 delta segments, got $nSegs")
  }
}
