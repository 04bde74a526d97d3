package graft

import graft.operators.DataQuality
import org.apache.spark.sql.functions._

/** Crafted-corpus ground truth for the DQ constraint suite: null
  * three-valued logic, uniqueness counting, FK orphan counting, and
  * the one-pass plan shape for row rules. */
class DataQualitySpec extends SparkSpec {

  test("dependency profile: PK FDs and FK INDs hold, planted " +
      "violations are nonzero, and one FD magnitude replays") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.DataQuality
      .dependencyProfileQuery(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getString(0), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(rows.size == 9)
    // PK-style FDs hold exactly
    assert(rows(("orders.o_orderkey", "orders.o_custkey"))._4)
    assert(rows(("events.event_id", "events.user_id"))._4)
    // planted violations are real and measured
    val (_, _, vio, holds) =
      rows(("lineitem.l_orderkey", "lineitem.l_suppkey"))
    assert(!holds && vio > 0)
    // all four FK INDs hold; the deliberately false one does not
    for ((l, r) <- Seq(
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("orders.o_custkey", "customer.c_custkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"),
      ("lineitem.l_partkey", "part.p_partkey")))
      assert(rows((l, r))._4, s"IND $l ⊆ $r should hold")
    assert(!rows(("orders.o_orderkey", "customer.c_custkey"))._4)
    // magnitude replay for the violated FD
    val li = Tables.load(spark, sfDir, "lineitem")
    val d1 = li.select(col("l_orderkey")).distinct().count()
    val d2 = li.select(col("l_orderkey"), col("l_suppkey"))
      .distinct().count()
    assert(vio == d2 - d1)
  }
  import SparkSpec.spark.implicits._

  test("checkRows: null predicate counts as violation") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, 60.0), (3L, null)).toDF("id", "qty")
    val out = DataQuality.checkRows(df, Seq(
      "range" -> (col("qty") >= 1.0 && col("qty") <= 50.0),
      "complete" -> col("qty").isNotNull))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("range") == ((3L, 2L)), "60.0 and NULL both violate")
    assert(out("complete") == ((3L, 1L)))
  }

  test("checkUnique counts every row of an over-represented group") {
    val df = Seq((1L, 1), (1L, 1), (1L, 2), (2L, 1)).toDF("k", "sub")
    val byPair = DataQuality.checkUnique(df, "pair", Seq("k", "sub"))
      .collect()(0)
    assert(byPair.getLong(1) == 4L && byPair.getLong(2) == 2L)
    val byK = DataQuality.checkUnique(df, "k", Seq("k")).collect()(0)
    assert(byK.getLong(2) == 3L, "all three k=1 rows violate")
  }

  test("checkForeignKey counts orphans with multiplicity") {
    val child = Seq(1L, 1L, 2L, 9L, 9L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = DataQuality.checkForeignKey(child, "ck", parent, "pk",
      "fk").collect()(0)
    assert(out.getLong(1) == 6L && out.getLong(2) == 3L)
  }

  test("row rules evaluate in one pass (single scan, no extra shuffle)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val plan = DataQuality.checkRows(li, Seq(
      "a" -> (col("l_quantity") <= 10.0),
      "b" -> col("l_returnflag").isin("A", "N", "R"),
      "c" -> col("l_shipdate").isNotNull))
      .queryExecution.executedPlan.toString
    val scans = "Scan ".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan for all row rules:\n$plan")
  }

  test("report: rates and pass flags derive from the counts") {
    val out = DataQuality.dqRulesQuery(spark, sfDir).collect()
    assert(out.length == 8)
    out.foreach { r =>
      val (n, v, rate, passed) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(v >= 0 && v <= n)
      assert(math.abs(rate - (v.toDouble / n * 1e6).round / 1e6) < 1e-12)
      assert(passed == (v == 0))
    }
    val m = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    // the deliberately tight rule must actually fire; the structural
    // ones must hold on the generated data
    assert(m("li_quantity_max10") > 0L)
    assert(m("li_orderkey_fk") == 0L)
    assert(m("o_orderkey_unique") == 0L)
  }

  test("benford audit: digits partition the rows, frequencies sum to " +
      "one, expectations follow log10(1+1/d)") {
    val rows = DataQuality.benfordQuery(spark, sfDir).collect()
    val digits = rows.map(_.getInt(0))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(digits.distinct.length == digits.length)
    val n = Tables.load(spark, sfDir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_totalprice") > 0)
      .count()
    assert(rows.map(_.getLong(1)).sum == n,
      "digit counts must partition the positive prices")
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val want = BigDecimal(math.log(1.0 + 1.0 / r.getInt(0)) /
        math.log(10.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(r.getDouble(3) == want, s"exp_freq digit ${r.getInt(0)}")
    }
    // Benford expectations themselves sum to 1 over 1..9
    val full = (1 to 9).map(d => math.log(1.0 + 1.0 / d) / math.log(10.0))
    assert(math.abs(full.sum - 1.0) < 1e-12)
  }
}
