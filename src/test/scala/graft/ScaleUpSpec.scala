package graft

import org.apache.spark.sql.functions._

/** Pins the scaling-evidence generator's shape-preservation contract
  * (graft.tools.ScaleUp): linear row growth, copy-disjoint text,
  * distance-preserving embedding rotation, intact dimensions. */
class ScaleUpSpec extends SparkSpec {

  private lazy val outDir: String = {
    val dir = graft.sources.OrcIo.scratchDir("scaleup_spec")
    graft.tools.ScaleUp.scaleUp(spark, sfDir, dir, factor = 2)
    dir
  }

  test("facts scale by the factor, dimensions stay verbatim") {
    Seq("lineitem", "documents", "embeddings", "events", "orders")
      .foreach { t =>
        val base = Tables.load(spark, sfDir, t).count()
        val scaled = Tables.load(spark, outDir, t).count()
        assert(scaled == 2 * base, s"$t: $scaled != 2×$base")
      }
    Seq("region", "nation", "customer").foreach { t =>
      assert(Tables.load(spark, outDir, t).count() ==
        Tables.load(spark, sfDir, t).count(), s"$t must be verbatim")
    }
  }

  test("copy 0 is byte-identical; copies have disjoint text (no " +
      "cross-copy exact or shingle dups)") {
    val docs = Tables.load(spark, outDir, "documents")
    val base = Tables.load(spark, sfDir, "documents")
    // copy 0 = base
    assert(docs.filter(col("doc_id") < 1000000000L)
      .select(col("doc_id"), col("text"))
      .except(base.select(col("doc_id"), col("text"))).count() == 0)
    // no text collides across copies: every text maps to one copy
    val cross = docs
      .select(md5(col("text")).as("d"),
        (col("doc_id") / 1000000000L).cast("long").as("copy"))
      .groupBy(col("d")).agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(cross == 0, s"$cross texts appear in more than one copy")
  }

  test("embedding rotation preserves norms exactly") {
    val emb = Tables.load(spark, outDir, "embeddings")
      .select(col("vec_id"),
        aggregate(col("embedding"), lit(0.0d),
          (acc, v) => acc + v * v).as("sq"))
    val copy0 = emb.filter(col("vec_id") < 1000000000L)
      .select(col("vec_id").as("base_id"), col("sq").as("sq0"))
    val copy1 = emb.filter(col("vec_id") >= 1000000000L)
      .select((col("vec_id") - 1000000000L).as("base_id"),
        col("sq").as("sq1"))
    val drift = copy0.join(copy1, "base_id")
      .filter(abs(col("sq0") - col("sq1")) > 1e-6).count()
    assert(drift == 0, "rotation must preserve squared norms")
  }

  test("orders shift in lock-step with lineitem (join stays 1:N)") {
    val li = Tables.load(spark, outDir, "lineitem")
    val ord = Tables.load(spark, outDir, "orders")
    val orphans = li.join(ord,
      li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
    assert(orphans == 0, s"$orphans lineitems lost their order")
  }

  test("events keep true timestamps (not raw nanos longs)") {
    val ts = Tables.load(spark, outDir, "events").schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType, s"ts is $ts")
  }
}
