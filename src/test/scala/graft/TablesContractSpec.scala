package graft

import org.apache.spark.sql.types._

/**
 * Pins the contract between the driver-generated testdata and
 * [[Tables.load]]'s repair layer, against the REAL parquet at every
 * scale factor. The testdata's on-disk encoding has already changed
 * once mid-build (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) without the UTC
 * flag, i.e. Spark-side TIMESTAMP_NTZ); that re-encode silently broke
 * nine queries. This suite makes the next re-encode fail one named
 * test instead.
 */
class TablesContractSpec extends SparkSpec {
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").filter(d => new java.io.File(d).exists())

  test("events.ts loads as session-tz TimestampType at every sf") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    for (dir <- sfDirs) {
      val t = Tables.load(spark, dir, "events").schema("ts").dataType
      assert(t == TimestampType,
        s"$dir/events.parquet: ts loaded as $t — Tables.load repair " +
          "branch is missing the on-disk encoding")
    }
  }

  test("events.ts values survive the repair (UTC wall-clock unchanged)") {
    // The raw file (however encoded) and the repaired column must agree
    // on epoch micros under the UTC session: compare against DuckDB-style
    // naive reading by round-tripping through a string in UTC.
    val df = Tables.load(spark, sfDir, "events")
    val r = df.selectExpr(
      "min(ts) as lo", "max(ts) as hi", "count(*) as n").head()
    assert(r.getLong(2) > 0)
    // sanity: event times are modern dates, not 1970 (a div/cast slip
    // by 1000 would land decades away)
    val lo = r.getTimestamp(0).toInstant.toString
    assert(lo >= "1990-01-01" && lo <= "2100-01-01", s"min ts = $lo")
  }

  test("legacy nanos-as-long encoding repairs to the same micros") {
    // The r1-r7 testdata shipped ts as TIMESTAMP(NANOS), which Spark
    // surfaces as a raw long under nanosAsLong=true — the same LongType
    // shape this synthetic file produces. The repair branch must
    // truncate (integer division, not double math) to microseconds.
    val s = spark
    import s.implicits._
    val dir = graft.sources.OrcIo.scratchDir("ntz_contract")
    val nanos = Seq(
      1700000000123456789L,  // sub-micro digits must truncate, not round
      123456789L, 0L, -1L)   // epoch edge + negative (pre-1970)
    nanos.toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val repaired = Tables.load(spark, dir, "events")
    assert(repaired.schema("ts").dataType == TimestampType)
    val got = repaired.select(
      org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts")))
      .collect().map(_.getLong(0)).sorted
    // Spark's `div` truncates toward zero, same as JVM long division —
    // pinned here so a rewrite that changes rounding semantics fails.
    val want = nanos.map(n => n / 1000L).sorted.toArray
    assert(got.sameElements(want), s"${got.toSeq} vs ${want.toSeq}")
  }

  test("all tables load with nonzero rows at sf0.001") {
    for (name <- Tables.all) {
      assert(Tables.load(spark, sfDir, name).limit(1).count() == 1L,
        s"table $name empty or unreadable")
    }
  }
}
