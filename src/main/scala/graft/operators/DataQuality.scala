package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality constraint suite (Deequ-style): a rule set
 * — row predicates, key uniqueness, referential integrity — evaluated
 * into one violations report per rule. This is the CI gate a
 * production table runs before a partition is published; a training
 * pipeline points it at every ingest batch.
 *
 * Scale shape (100 TB):
 *  - ALL row predicates fold into ONE map-side-partial aggregation
 *    over a single scan — adding a rule adds a conditional sum, never
 *    a pass.
 *  - Uniqueness shuffles only the key columns (count per key, sum the
 *    over-represented groups).
 *  - Referential integrity is a key-only anti join — both sides
 *    project to their key before the join, so the shuffle carries
 *    8-byte keys, not rows.
 * A row with a NULL predicate result counts as a violation (unknown
 * is not proof of quality), matching SQL's three-valued logic via
 * `NOT coalesce(pred, false)` in both engines.
 */
object DataQuality {

  /** Evaluate row-predicate rules in one aggregation pass.
    * @return one row per rule: (rule, n_rows, n_violations) */
  def checkRows(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val stackArgs = rules
      .map { case (name, _) => s"'$name', `$name`" }.mkString(", ")
    one.select(
      expr(s"stack(${rules.size}, $stackArgs) as (rule, n_violations)"),
      col("_n").as("n_rows"))
      .select(col("rule"), col("n_rows"), col("n_violations"))
  }

  /** Uniqueness rule: every row whose key group holds more than one
    * row is a violation (Deequ's uniqueness complement). */
  def checkUnique(df: DataFrame, name: String,
      keys: Seq[String]): DataFrame = {
    val g = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
    g.agg(sum(col("_c")).as("n_rows"),
        coalesce(sum(when(col("_c") > 1L, col("_c"))), lit(0L))
          .as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))
  }

  /** Referential-integrity rule: child keys with no matching parent.
    * Both sides reduce to their key column before ONE left join whose
    * null-extension marks the orphans — total and violation counts
    * fall out of a single aggregation (no second pass, no 1×1 cross
    * join in the plan). */
  def checkForeignKey(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as("_pk")).distinct(),
        col(childKey) === col("_pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_pk").isNull, 1L).otherwise(0L))
          .as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))

  /** Finalize a union of rule rows into the report shape. */
  def report(rules: DataFrame): DataFrame =
    rules
      .select(col("rule"), col("n_rows"), col("n_violations"),
        fr(col("n_violations").cast("double") /
          col("n_rows").cast("double"), 6).as("violation_rate"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy(col("rule"))

  /** Correctness gate: an eight-rule suite over lineitem/orders —
    * five row predicates (one deliberately tight so nonzero rates are
    * exercised), composite-key and primary-key uniqueness, and the
    * lineitem→orders foreign key. The oracle recomputes every count
    * with the same null semantics. */
  def dqRulesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val rowRules = checkRows(li, Seq(
      "li_quantity_range" ->
        (col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0),
      "li_quantity_max10" -> (col("l_quantity") <= 10.0),
      "li_discount_range" ->
        (col("l_discount") >= 0.0 && col("l_discount") <= 0.1),
      "li_returnflag_domain" ->
        col("l_returnflag").isin("A", "N", "R"),
      "li_shipdate_complete" -> col("l_shipdate").isNotNull))
    val uniq = checkUnique(li, "li_line_unique",
      Seq("l_orderkey", "l_linenumber"))
    val pk = checkUnique(o, "o_orderkey_unique", Seq("o_orderkey"))
    val fk = checkForeignKey(li, "l_orderkey", o, "o_orderkey",
      "li_orderkey_fk")
    report(rowRules.unionByName(uniq).unionByName(pk).unionByName(fk))
  }

  /**
   * Benford's-law first-digit audit (Newcomb 1881 / Benford 1938) over
   * order totals — the classic anomaly screen for fabricated or
   * truncated numeric columns: natural multi-scale amounts follow
   * P(d) = log10(1 + 1/d); a synthetic or clipped column does not
   * (TPC-H prices are famously uniform-ish, which is exactly what the
   * audit should SHOW — the operator reports, thresholds are policy).
   *
   * Digit extraction avoids float log/formatting ambiguity: price →
   * exact integer cents → first character of the integer's decimal
   * string (integer-to-string is unambiguous in both engines). One
   * narrow projection + a 9-key groupBy; the observed/expected
   * frequencies and per-digit chi-square contributions are single
   * double expressions.
   */
  def benfordQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val cents = fr(col("o_totalprice") * 100, 0).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val digits = o.filter(col("o_totalprice") > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("tot"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        fr(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("obs_freq"),
        fr(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)), 6).as("exp_freq"))
      .orderBy(col("digit"))
  }

  /**
   * Dependency profiling (the Metanome/HoloClean discovery layer):
   * functional dependencies — does lhs determine rhs? — and inclusion
   * dependencies — is every fact key present in its dimension? — over
   * a fixed candidate set, with EXACT violation counts rather than a
   * boolean verdict (a profiler that says "fails" without "by how
   * much" can't rank repair work). FDs measure violations as
   * distinct(lhs, rhs) − distinct(lhs): zero iff each lhs value maps
   * to one rhs value. INDs measure the distinct lhs values absent
   * from the rhs side (a left-anti on the key-distinct frames).
   *
   * Shape at 100 TB: every candidate is one or two map-side-partial
   * distinct aggregations on its key columns — no candidate ever
   * touches more than its two columns, and the anti joins run on
   * key-distinct frames. Candidates here span held PK-style FDs,
   * genuinely violated FDs (multi-supplier orders), all four
   * fact→dimension INDs (held), and one deliberately false IND.
   */
  def dependencyProfileQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    // every candidate is a LAZY 1-row aggregate; the final union runs
    // them all in ONE action (14 driver-side .count() round-trips
    // benched at 5.3 s of pure job-scheduling overhead — collect-free
    // composition is both the house style and 4x faster here)
    def fd(table: String, lhs: String, rhs: String): DataFrame = {
      val t = Tables.load(spark, sfDir, table)
      // two-level distinct instead of two countDistincts in one agg:
      // the latter plans an Expand that doubles the scanned rows
      t.select(col(lhs).as("_l"), col(rhs).as("_r")).distinct()
        .groupBy(col("_l")).agg(count(lit(1)).as("_nr"))
        .agg(count(lit(1)).as("lhs_distinct"),
          (sum(col("_nr")) - count(lit(1))).as("violations"))
        .select(lit("fd").as("kind"), lit(s"$table.$lhs").as("lhs"),
          lit(s"$table.$rhs").as("rhs"), col("lhs_distinct"),
          col("violations"))
    }
    def ind(lt: String, lc: String, rt: String, rc: String)
        : DataFrame = {
      val l = Tables.load(spark, sfDir, lt).select(col(lc).as("k"))
        .distinct()
      val r = Tables.load(spark, sfDir, rt)
        .select(col(rc).as("k")).distinct()
        .withColumn("_hit", lit(1L))
      l.join(r, Seq("k"), "left")
        .agg(count(lit(1)).as("lhs_distinct"),
          sum(when(col("_hit").isNull, 1L).otherwise(0L))
            .as("violations"))
        .select(lit("ind").as("kind"), lit(s"$lt.$lc").as("lhs"),
          lit(s"$rt.$rc").as("rhs"), col("lhs_distinct"),
          col("violations"))
    }
    Seq(
      fd("orders", "o_orderkey", "o_custkey"),      // PK: holds
      fd("orders", "o_custkey", "o_orderpriority"), // violated
      fd("lineitem", "l_orderkey", "l_suppkey"),    // violated
      fd("events", "event_id", "user_id"),          // PK: holds
      ind("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ind("orders", "o_custkey", "customer", "c_custkey"),
      ind("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ind("lineitem", "l_partkey", "part", "p_partkey"),
      ind("orders", "o_orderkey", "customer", "c_custkey")) // false
      .reduce(_ unionAll _)
      .withColumn("holds", col("violations") === 0)
      .orderBy(col("kind"), col("lhs"), col("rhs"))
  }
}
