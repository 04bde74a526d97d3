package graft

import graft.operators.Stats
import graft.sources.OrcIo
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = OrcIo.scratchDir("stats_spec")
    OrcIo.write(Tables.load(spark, sfDir, "orders").repartition(3),
      s"$d/orders")
    d
  }

  test("statsOnlyCount answers COUNT(*) from footers, scan-exact") {
    val expected = Tables.load(spark, sfDir, "orders").count()
    assert(Stats.statsOnlyCount(spark, s"$dir/orders") == expected)
  }

  test("footer min/max/sum merge across files matches a full scan") {
    val scan = Tables.load(spark, sfDir, "orders")
      .agg(min(col("o_totalprice")), max(col("o_totalprice")),
        sum(col("o_totalprice"))).head()
    val footer = Stats.statsOnlyColumnStats(spark, s"$dir/orders")
      .filter(col("column") === "o_totalprice").head()
    assert(footer.getAs[String]("min_str").toDouble == scan.getDouble(0))
    assert(footer.getAs[String]("max_str").toDouble == scan.getDouble(1))
    assert(math.abs(footer.getAs[Double]("sum_val") - scan.getDouble(2))
      < 1e-6 * math.abs(scan.getDouble(2)))
  }

  test("rawDataSize estimator is positive and scales with rows") {
    val size = Stats.rawDataSize(spark, s"$dir/orders")
    assert(size > 0L)
    val d2 = OrcIo.scratchDir("stats_half")
    OrcIo.write(Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 2 === 0), s"$d2/orders")
    assert(Stats.rawDataSize(spark, s"$d2/orders") < size)
  }
}
