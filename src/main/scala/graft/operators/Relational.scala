package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.CacheBin.TrackOps

/**
 * Relational query surface over the engine's columnar scans.
 *
 * The reference is a storage engine with no join/agg/window machinery
 * (SURVEY.md §2.6–2.7): its only aggregation is write-side column statistics
 * (`ColumnStatisticsImpl.java:92-1164`), and ordering exists only for
 * dictionary keys and MapReduce shuffle. In the Spark-native engine these
 * operations come from Catalyst built-ins over our scans; this module is the
 * canonical, scale-aware expression of each one.
 *
 * Scale notes (100 TB):
 *  - Aggregations use partial (map-side) aggregation automatically; group
 *    keys here are low-cardinality so the shuffle is tiny regardless of
 *    input size.
 *  - Joins against the small dimension tables (region/nation/supplier/
 *    customer at dimension scale) are explicitly `broadcast()` so no shuffle
 *    of the fact table occurs; fact-fact joins (orders ⋈ lineitem) shuffle
 *    on the join key, which AQE can further skew-split.
 *  - Top-N uses sort+limit, which Spark executes as a per-partition
 *    TakeOrdered (no global sort materialization).
 */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /**
   * Pricing-summary aggregation over lineitem (TPC-H Q1 shape): the
   * canonical scan → filter → partial agg → final agg pipeline.
   */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      // money/quantity sums in DECIMAL (the q5 rule): at 100× scale a
      // group's Σ price reaches ~3e11 where double ulp is ~6e-5, and
      // the engines' different accumulation orders land on opposite
      // sides of a half-cent boundary (caught by the sf10 gate).
      // Per-term double→decimal cast is order-free, the sum exact.
      .agg(
        round(sum(col("l_quantity").cast("decimal(28,8)")), 2)
          .cast("double").as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(28,8)")), 2)
          .cast("double").as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,8)")), 2).cast("double").as("sum_disc_price"),
        fr(avg(col("l_quantity")), 4).as("avg_qty"),
        fr(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /**
   * Projected + filtered scan (SURVEY.md S3/S4): both the projection and the
   * predicate must reach the file scan (`PushedFilters`, pruned
   * `ReadSchema`) — asserted in ScanSpec.
   */
  def scanFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_discount") >= 0.05 && col("l_quantity") < 10.0)
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_discount"))

  /** COUNT(*) — answerable from footer row counts in the reference
    * (`Reader.getNumberOfRows`, SURVEY.md §2.6); Spark answers it from
    * parquet/ORC metadata via its aggregate pushdown. */
  def scanCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /**
   * Shipping-priority join (TPC-H Q3 shape): fact-fact shuffle join
   * (orders ⋈ lineitem) with a broadcast dimension (customer at small SF;
   * at real scale customer shuffles too — Spark picks by size).
   */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      // sum in DECIMAL (the q1/q5 rule): order-free and the round exact
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,8)")), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /**
   * Multi-way star join (TPC-H Q5 shape): every dimension broadcast, single
   * shuffle for the orders⋈lineitem fact join, one agg shuffle.
   */
  def q5Join(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region")
    val nation = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup),
        li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      // sum in DECIMAL, not double: a double accumulation is
      // order-dependent, and at sf1 (~240k terms per group) the
      // engine's and the oracle's different summation orders land on
      // opposite sides of a half-cent rounding boundary. The per-term
      // double→decimal cast is order-free, the decimal sum exact.
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,8)")), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /**
   * TPC-H Q7 shape (volume shipping): bilateral revenue between a
   * nation pair, by supplier nation × customer nation × ship year —
   * the five-table star join whose PLAN is the point: every dimension
   * broadcasts, the single shuffle is the final small groupBy, and
   * the nation-pair predicate prunes before the fact-fact join fans
   * out. Money sums follow the q5_join DECIMAL rule.
   */
  def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nkey"),
        col("n_name").as("cust_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), cust("c_nationkey") === col("c_nkey"))
      .filter((col("s_nkey") === 1 && col("c_nkey") === 2) ||
        (col("s_nkey") === 2 && col("c_nkey") === 1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,8)")), 2).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /**
   * TPC-H Q10 shape (returned items): revenue lost to returns per
   * customer in one quarter, top 20 — fact filtered FIRST
   * (returnflag + date window both reach the scans), dimensions
   * broadcast, final ranking a bounded TakeOrdered.
   */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    val cust = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation),
        cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"), col("c_mktsegment"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,8)")), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /**
   * TPC-H Q18 shape (large-volume orders): orders whose line
   * quantities sum past a threshold, with customer context, top-100
   * by value. The interesting plan element is the IN-subquery on a
   * GROUPED fact: Catalyst rewrites it to a semi-join against the
   * aggregated frame, so the big fact is scanned twice but never
   * joined to itself row-to-row. Quantities sum as exact BIGINTs so
   * the HAVING threshold is an integer comparison.
   */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    ord.join(big, ord("o_orderkey") === big("l_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"),
        col("o_orderkey"))
      .limit(100)
  }

  /**
   * TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
   * join customers to their non-urgent orders, count per customer
   * (zero for the orderless — the rows an inner join would silently
   * drop), then the distribution of those counts. The two-level
   * "aggregate of an outer-join aggregate" is the shape that
   * separates engines with correct outer-join cardinality from ones
   * that conflate missing with zero.
   */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
    val perCust = cust.join(ord,
        cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /**
   * TPC-H Q6 shape (forecasting revenue change): the pure
   * filter-aggregate — every predicate (date range, discount band,
   * quantity cap) must reach the parquet scan as a pushed filter, and
   * the answer is one exact DECIMAL sum. The canonical "how much
   * revenue would a discount policy change move" one-pass audit.
   */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(
        round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(28,8)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /**
   * TPC-H Q4 shape (order-priority checking): orders in one quarter
   * that had at least one RETURNED line item, counted per priority
   * class — the decorrelated-EXISTS pattern. (The reduced test schema
   * carries no commit/receipt dates, so the Q4 "late delivery"
   * predicate becomes `l_returnflag = 'R'`; the plan shape — a
   * distinct-projected semi join that never duplicates orders — is
   * the thing under test.) The semi side reduces to DISTINCT order
   * keys before the join, so a returned-many-times order still counts
   * once.
   */
  def q4Priority(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val returned = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
    ord.join(returned, ord("o_orderkey") === returned("l_orderkey"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /**
   * TPC-H Q14 shape (promotion effect): one month's lineitem revenue
   * joined to `part`, split into promo vs total, with the share as an
   * exact integer micro-ratio — DECIMAL sums per the q5 rule, then
   * the share defined on the CENT-ROUNDED revenues as pure BIGINT
   * cents before one integer division. (A direct `div` on the
   * scale-8 DECIMAL sums is NOT cross-engine safe: Spark's decimal
   * IntegralDivide takes the precision-loss multiply path and lands
   * one off at floor boundaries — caught by this gate at sf0.001.)
   */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(28,8)")
    li.join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast("decimal(28,8)"))).as("promo_rev_d"),
        sum(rev).as("total_rev_d"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_cents", expr(
        "CAST(CAST(round(promo_rev_d, 2) AS DECIMAL(20,2)) * 100 " +
        "AS BIGINT)"))
      .withColumn("total_cents", expr(
        "CAST(CAST(round(total_rev_d, 2) AS DECIMAL(20,2)) * 100 " +
        "AS BIGINT)"))
      .select(
        round(col("promo_rev_d"), 2).cast("double").as("promo_rev"),
        round(col("total_rev_d"), 2).cast("double").as("total_rev"),
        col("n_items"),
        expr("CAST(CAST(promo_cents AS DECIMAL(38,0)) * 1000000 " +
          "div total_cents AS BIGINT)").as("promo_micro"))
  }

  /**
   * TPC-H Q19 shape (discounted revenue by branded quantity bands):
   * a three-branch disjunction over (brand, size band, quantity
   * band) — the predicate-pushdown stress case where the OR must
   * still prune at the scan — reported PER BRANCH (brands are
   * disjoint, so the branches partition the matches).
   */
  def q19Disjunct(s: SparkSession, dir: String): DataFrame = {
    val branch =
      when(col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 11.0), 1)
      .when(col("p_brand") === "Brand#13" &&
        col("p_size").between(10, 30) &&
        col("l_quantity").between(10.0, 20.0), 2)
      .when(col("p_brand") === "Brand#22" &&
        col("p_size").between(20, 50) &&
        col("l_quantity").between(20.0, 30.0), 3)
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("branch", branch)
      .filter(col("branch").isNotNull)
      .groupBy(col("branch"))
      .agg(count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,8)")), 2).cast("double").as("revenue"))
      .orderBy(col("branch"))
  }

  /**
   * NULL-semantics parity gate: per customer, aggregates over a LEFT
   * join to their 1995 orders, exercising exactly the three-valued-
   * logic rules engines most often get subtly wrong — COUNT(*) vs
   * COUNT(col) (rows vs non-null values), SUM/AVG over an empty group
   * (NULL, never 0), bool aggregates over all-NULL input, and a
   * NULL-propagating comparison inside a conditional count. Both
   * engines must agree cell-for-cell on every NULL.
   */
  def nullSemanticsQuery(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(lit(1)).as("cnt_star"),
        count(col("o_orderkey")).as("cnt_col"),
        sum(fr(col("o_totalprice") * 100, 0).cast("long"))
          .as("sum_cents"),
        max(col("o_orderdate")).as("last_order"),
        // TRUE > comparison inside a count: NULL rows must not count
        sum(when(col("o_totalprice") > 150000.0, 1L).otherwise(0L))
          .as("n_big"),
        // min over booleans = bool_and: TRUE iff every joined row is
        // the outer-join NULL row, i.e. the customer had no orders
        min(col("o_orderkey").isNull).as("no_orders"))
      // mean from the EXACT cent sum, not avg(double): a float AVG is
      // summation-order-dependent and the sf1 probe caught the two
      // engines a half-ulp apart on an 80-order customer; NULL-over-
      // empty still propagates (NULL sum ⇒ NULL mean)
      .withColumn("avg_price",
        fr(col("sum_cents").cast("double") / lit(100.0) /
          col("cnt_col").cast("double"), 4))
      .select(col("c_custkey"), col("cnt_star"), col("cnt_col"),
        col("sum_cents"), col("avg_price"), col("last_order"),
        col("n_big"), col("no_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Global top-N: sort+limit → TakeOrderedAndProject, no full sort. */
  def topN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Per-group top-K via window row_number — one shuffle on the partition
    * key; rank filter applied before any further join. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Running aggregate per key (ordered prefix sum) over events. */
  def runningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("running_value", fr(sum(col("value")).over(w), 2))
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Anti join: customers with no orders (NOT EXISTS). Broadcast-able when
    * the right side is small; otherwise a shuffled left-anti hash join. */
  def antiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Semi join: parts that appear in some lineitem (EXISTS). */
  def semiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .join(t(s, dir, "lineitem"),
        col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** Set operations: nations having suppliers EXCEPT nations having
    * customers, plus the intersection count — exercises union/intersect/
    * except over scans. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val supNations = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
    val custNations = t(s, dir, "customer")
      .select(col("c_nationkey").cast("int").as("nk"))
    supNations.intersect(custNations)
      .union(supNations.except(custNations))
      .orderBy(col("nk"))
  }

  /** Distinct aggregation: exact distinct counts per group. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Hierarchical rollup: per (returnflag, linestatus) subtotals plus
    * per-returnflag and grand totals in one pass — Catalyst expands the
    * grouping sets map-side, still one shuffle. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        fr(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Hourly tumbling-window aggregation over the events stream table —
    * batch twin of the Structured Streaming pipeline in
    * [[graft.streaming.StreamingIngest]]. */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        fr(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /**
   * Ordered conversion funnel (view → click → purchase): each stage's
   * first event must STRICTLY follow the previous stage's first event
   * — the product-analytics query every event warehouse runs.
   *
   * Shape at 100 TB: three stage aggregations, each a map-side-partial
   * groupBy on user_id over a type-filtered scan (the filter prunes at
   * the source), joined on the same key — no window sort, no
   * per-event shuffle beyond the keyed partials. Stage tables shrink
   * monotonically, so joins 2 and 3 are against strictly smaller
   * sides.
   */
  def funnelQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    val users = ev.select(col("user_id")).distinct()
    users
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0)).as("funnel_stage"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy(col("user_id"))
  }

  /**
   * Cohort retention: users grouped by first-activity day; per cohort,
   * how many were active again exactly 1 and 7 days later. Two keyed
   * aggregations (first-day per user, distinct user-days) and one
   * broadcast-scale join — the (cohort × offset) matrix is tiny at any
   * corpus size, and nothing wider than (user_id, day) ever shuffles.
   */
  def cohortQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val userDays = ev
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val joined = userDays.join(cohorts, Seq("user_id"))
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
    joined.groupBy(col("cohort_day"))
      .agg(count_distinct(col("user_id")).as("n_cohort"),
        count_distinct(when(col("offset") === 1, col("user_id")))
          .as("d1_retained"),
        count_distinct(when(col("offset") === 7, col("user_id")))
          .as("d7_retained"))
      .orderBy(col("cohort_day"))
  }

  /** Full cube over (returnflag, linestatus): all 4 grouping sets in one
    * pass — like rollup, Catalyst expands map-side, one shuffle. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      // price sum in DECIMAL (the q1/q5 rule): the grand-total cell
      // reaches ~1e12 at 100×, past double half-cent stability
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice").cast("decimal(28,8)")), 2)
          .cast("double").as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /**
   * Analytic-function suite over one window (SURVEY.md §2.7): lag, lead,
   * ntile, percent_rank, cume_dist, first_value share a single
   * per-customer sort — Spark evaluates all six in one Window operator,
   * one shuffle. percent_rank/cume_dist are exact rationals
   * ((rank-1)/(n-1), peers/n) so the oracle compares bit-for-bit.
   */
  def windowFuncsQuery(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"), col("next_price"), col("quartile"),
        col("pct_rank"), col("cume"), col("first_key"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Pivot (long → wide): per-user event-type totals as columns. The
    * value list is explicit, so no extra distinct-collection job runs
    * and the plan is a single partial-agg shuffle — at 100 TB the
    * implicit-values form would add a full pass just to learn columns. */
  def pivotQuery(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(fr(sum(col("value")), 2))
      .select(col("user_id") +: types.map(tp =>
        coalesce(col(tp), lit(0.0)).as(s"${tp}_value")): _*)
      .orderBy(col("user_id"))
  }

  /**
   * Exact percentiles (quantile_cont semantics: linear interpolation at
   * rank p·(n-1)) per group — ONE `percentile(col, array(...))` call:
   * four separate percentile aggregates each buffer the full group
   * independently (4× the memory and merge work — measured 6.0 s vs
   * ~1.5 s at sf0.1). At 100 TB prefer approx_percentile sketches;
   * this is the exact gate the sketch is verified against.
   */
  def percentileQuery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))")
          .as("_ps"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        fr(element_at(col("_ps"), 1), 2).as("p25"),
        fr(element_at(col("_ps"), 2), 2).as("p50"),
        fr(element_at(col("_ps"), 3), 2).as("p75"),
        fr(element_at(col("_ps"), 4), 2).as("p95"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))

  /**
   * Robust outlier detection (median/MAD): per group, the median,
   * the median absolute deviation, and how many rows sit beyond the
   * 3σ-equivalent robust fence (3·1.4826·MAD) — the data-quality
   * anomaly gate that, unlike mean/stddev z-scores, is not itself
   * dragged by the outliers it hunts. Three aggregation passes by
   * necessity (exact nested medians); the streaming-scale twin is the
   * GK-sketch percentile path (q_approx_percentiles).
   *
   * Cross-engine exactness: both medians are ROUNDED to 2 dp before
   * any downstream arithmetic (absorbing the ≤1-ulp interpolation
   * difference, the q_percentiles precedent), and the fence constant
   * is the literal product 3.0·1.4826 inline in both expression
   * trees — every comparison then runs on identical doubles.
   */
  def outlierQuery(s: SparkSession, dir: String): DataFrame = {
    // exact-percentile partials buffer every value — fan the map side
    // out when the scan is under-split (no-op on multi-file corpora)
    val d = Scale.fanOut(t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("x")))
    // med/mad are 3-row frames referenced from multiple joins — pin
    // them so the exact-percentile pass runs once per statistic, not
    // once per plan instance
    val med = d.groupBy(col("flag"))
      .agg(fr(expr("percentile(x, 0.5D)"), 2).as("med"))
      .tracked()
    val dev = d.join(broadcast(med), Seq("flag"))
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev.groupBy(col("flag"))
      .agg(fr(expr("percentile(adev, 0.5D)"), 2).as("mad"))
      .tracked()
    val o = dev.join(broadcast(mad), Seq("flag"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
    o.join(med, Seq("flag")).join(mad, Seq("flag"))
      .select(col("flag").as("l_returnflag"), col("n_rows"),
        col("med"), col("mad"), col("n_outliers"),
        fr(col("n_outliers").cast("double") /
          col("n_rows").cast("double"), 6).as("outlier_frac"))
      .orderBy(col("l_returnflag"))
  }

  /**
   * Winsorization (quantile clipping): per-group p05/p95 bounds, every
   * value clamped into [lo, hi] — the robust-statistics answer to
   * heavy-tailed value columns (price outliers, runaway token counts)
   * that would otherwise dominate a mean or a training-loss weight.
   *
   * The bounds are RANK-based, not interpolated: the boundary value is
   * the row at `row_number = floor(p·(n−1)) + 1` in (value, key)
   * order — an actual data element, identically defined in both
   * engines, so the gate dodges the engine-specific interpolation
   * arithmetic of `percentile_cont`. Clipping and the clipped sum are
   * then exact (DECIMAL rule for the money sum).
   *
   * Shape at 100 TB: one per-group sort (the same shuffle the exact
   * percentile family pays — the GK-sketch twin `q_approx_percentiles`
   * is the cheap path when rank exactness can relax), bounds reduce to
   * one row per group and broadcast back onto the scan.
   */
  def winsorizeQuery(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"),
        col("o_totalprice").as("x"), col("o_orderkey").as("k"))
    val ranked = o.withColumn("rn",
      row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("x"), col("k"))))
    val n = o.groupBy(col("grp")).agg(count(lit(1)).as("n_rows"))
      .withColumn("k_lo",
        (floor(lit(0.05) * (col("n_rows") - 1).cast("double")) + 1L))
      .withColumn("k_hi",
        (floor(lit(0.95) * (col("n_rows") - 1).cast("double")) + 1L))
    val bounds = ranked.join(broadcast(n), Seq("grp"))
      .filter(col("rn") === col("k_lo") || col("rn") === col("k_hi"))
      .groupBy(col("grp"), col("n_rows"))
      .agg(max(when(col("rn") === col("k_lo"), col("x"))).as("p_lo"),
        max(when(col("rn") === col("k_hi"), col("x"))).as("p_hi"))
    o.join(broadcast(bounds), Seq("grp"))
      .withColumn("cx", least(greatest(col("x"), col("p_lo")),
        col("p_hi")))
      .groupBy(col("grp"), col("n_rows"), col("p_lo"), col("p_hi"))
      .agg(sum(when(col("x") < col("p_lo"), 1L).otherwise(0L))
          .as("n_clip_lo"),
        sum(when(col("x") > col("p_hi"), 1L).otherwise(0L))
          .as("n_clip_hi"),
        round(sum(col("cx").cast("decimal(28,8)")), 2)
          .cast("double").as("sum_clipped"))
      .select(col("grp").as("o_orderpriority"), col("n_rows"),
        col("p_lo"), col("p_hi"), col("n_clip_lo"), col("n_clip_hi"),
        col("sum_clipped"))
      .orderBy(col("o_orderpriority"))
  }

  /** Arbitrary GROUPING SETS (beyond rollup's prefix lattice):
    * (flag, status), (status), () — exercised through Spark SQL since
    * the DataFrame API only exposes cube/rollup shorthands. */
  /**
   * Skyline (Pareto-frontier / maximal-vectors) query (Börzsönyi,
   * Kossmann & Stocker, ICDE 2001): the orders no other order beats
   * on BOTH price and recency — "biggest AND freshest", the
   * multi-objective answer a single ORDER BY can't express. Dominance:
   * q ≥ p on both dims with at least one strict; identical pairs tie
   * and both stay.
   *
   * Scale shape (the reason this isn't the oracle's quadratic
   * NOT EXISTS): a two-phase grid prune. Phase 1 buckets the date
   * axis by month and broadcasts the bucket-count-sized
   * "max price in any STRICTLY LATER bucket" table; a row whose
   * price ≤ that suffix-max is dominated (later bucket ⇒ strictly
   * later date) and dies at the scan — at 100 TB this is a narrow
   * broadcast-join + filter that kills ≈ all of the corpus, and
   * every true skyline point provably survives it. Phase 2 runs the
   * classic 2D sweep on the SURVIVORS only (per-date max price +
   * suffix max over strictly later dates — survivor-sized windows):
   * p is skyline iff its price equals its date's max AND beats every
   * strictly-later date's max. Dominators can WLOG be taken from the
   * skyline itself (dominance composes), so survivor-vs-survivor
   * checking is exact, not approximate.
   */
  def skylineQuery(s: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")))

  /** The [[skylineQuery]] prune + sweep over an explicit
    * (o_orderkey, o_totalprice, o_orderdate) frame — spec entry point
    * for brute-force comparison on adversarial tie/duplicate
    * corpora. */
  private[graft] def skylineOf(o: DataFrame): DataFrame = {
    val bucketed = o.withColumn("bucket",
      date_trunc("month", col("o_orderdate")))
    val bmax = bucketed.groupBy(col("bucket"))
      .agg(max(col("o_totalprice")).as("bm"))
    val laterBucketMax = bmax.withColumn("m_later",
      max(col("bm")).over(Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("m_later"))
    val survivors = bucketed
      .join(broadcast(laterBucketMax), Seq("bucket"))
      .filter(col("m_later").isNull ||
        col("o_totalprice") > col("m_later"))
    val dateMax = survivors.groupBy(col("o_orderdate"))
      .agg(max(col("o_totalprice")).as("dm"))
    val laterDateMax = dateMax.withColumn("a_later",
      max(col("dm")).over(Window.orderBy(col("o_orderdate").desc)
        .rowsBetween(Window.unboundedPreceding, -1)))
    survivors.join(broadcast(laterDateMax), Seq("o_orderdate"))
      .filter(col("o_totalprice") === col("dm") &&
        (col("a_later").isNull || col("o_totalprice") > col("a_later")))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))
  }

  def groupingSetsQuery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  floor(sum(l_quantity) * 1e2 + 0.5) / 1e2 AS sum_qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /**
   * WEIGHTED percentiles: quantity-weighted price quantiles per
   * return flag — "what price level covers q% of the shipped UNITS"
   * (the unit-weighted complement to [[percentileQuery]]'s
   * row-weighted quantiles; revenue/inventory analyses are almost
   * always weighted, and a row-quantile silently over-weights
   * small orders).
   *
   * Definition: p_q = min{v : cumWeight(v) ≥ q · totalWeight} — the
   * comparison is EXACT integer arithmetic (100·cum ≥ qPct·total over
   * BIGINT unit counts), so no float threshold ever decides a
   * quantile. Shape at 100 TB: groupBy(flag, price) folds to the
   * price grid map-side — but that grid is NEAR-UNIQUE (583k distinct
   * prices in 600k rows at sf0.1), so the cumulative weight rides
   * [[Prefix.running]]'s two-phase distributed prefix sum, not a
   * per-flag window (which would sort each flag's whole grid in one
   * task); the GK sketch remains the documented approximate path.
   */
  def weightedPercentilesQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("qty"))
    val grid = li.groupBy(col("flag"), col("price"))
      .agg(sum(col("qty")).as("w"))
    val walked0 = Prefix.running(grid, Seq("flag"), Seq(col("price")),
      Seq(Prefix.Running(col("w"), "sum", "cum")))
    // per-flag totals are the LAST running value — read them off the
    // cached prefix frame (max(cum): w ≥ 1 so cum is increasing)
    // instead of re-running the corpus-sized grid groupBy
    val tot = walked0.groupBy(col("flag"))
      .agg(max(col("cum")).as("wtot"))
    val walked = walked0.join(broadcast(tot), Seq("flag"))
    def pick(qPct: Int) =
      min(when(col("cum") * 100 >= col("wtot") * qPct, col("price")))
        .as(s"p$qPct")
    walked.groupBy(col("flag"))
      .agg(first(col("wtot")).as("units"),
        pick(25), pick(50), pick(75), pick(90), pick(99))
      .orderBy(col("flag"))
  }
}
