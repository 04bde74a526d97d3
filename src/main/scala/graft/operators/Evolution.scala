package graft.operators

import graft.Tables
import graft.functions.VectorOps.{foldRound => fr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Schema-on-read evolution: the reference's cast matrix
 * (`ConvertTreeReaderFactory.java:401-2100`, 48 converters among
 * integer/float/double/decimal/string-group/timestamp/date/binary) and
 * its null-on-overflow semantics (SURVEY.md §2.3).
 *
 * Spark-first mapping: Catalyst `Cast` covers the matrix; ORC's
 * out-of-range→null behavior (`ConvertTreeReaderFactory` downcast
 * checks) maps to `try_cast`, not plain ANSI cast (which throws) nor
 * non-ANSI cast (which wraps bits). All codegen'd — no UDFs.
 */
object Evolution {

  /**
   * One row per lineitem row exercising the evolution matrix:
   *  - long → string (AnyInteger→StringGroup)
   *  - long → int downcast with overflow→null (try_cast semantics;
   *    value scaled to force some overflows)
   *  - double → long (Double→AnyInteger, truncation toward zero)
   *  - double → decimal(18,2) (Double→Decimal, after explicit round —
   *    ORC and Spark both round-half-up here)
   *  - timestamp → date and timestamp → string (Timestamp→Date/String)
   *  - string → timestamp (StringGroup→Timestamp)
   *  - string ↔ varchar-style truncation (Char/Varchar maxLength,
   *    `TypeDescription.java:459-466`) via substring
   *  - TIMESTAMP_NTZ ↔ TIMESTAMP(LTZ) both directions — the reference's
   *    local/UTC timestamp conversion pair
   *    (`ConvertTreeReaderFactory.java:1601-2059`, instant vs wall-clock
   *    reinterpretation); the testdata itself ships NTZ parquet, so this
   *    is a live evolution case, not a synthetic one. Session tz is
   *    pinned UTC, so both directions are value-preserving and the
   *    oracle (naive timestamps throughout) agrees.
   */
  def castMatrixQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        col("l_orderkey").cast("string").as("okey_str"),
        expr("try_cast(l_orderkey * 1000000 AS INT)").as("okey_int_overflow"),
        floor(col("l_quantity")).cast("long").as("qty_long"),
        // Double→Decimal matrix entry stays in the plan; the emitted
        // column is DOUBLE so the gate compares one physical type
        // (DuckDB DECIMAL and Spark decimal hash differently upstream).
        fr(col("l_extendedprice"), 2).cast("decimal(18,2)")
          .cast("double").as("price_dec"),
        col("l_shipdate").cast("date").as("ship_date"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ship_str"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
          .cast("timestamp").as("ship_rt"),
        // NTZ → LTZ: l_shipdate reads as TIMESTAMP_NTZ from the parquet;
        // one cast reinterprets the wall-clock in the (UTC) session tz.
        col("l_shipdate").cast("timestamp").as("ship_ntz2ltz"),
        // LTZ → NTZ: back through timestamp_ntz, emitted via an explicit
        // second-precision format so both engines render identically.
        date_format(
          date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
            .cast("timestamp").cast("timestamp_ntz"),
          "yyyy-MM-dd HH:mm:ss").as("ship_ltz2ntz"),
        substring(col("l_returnflag"), 1, 1).as("flag_char1"))
      .orderBy(col("l_orderkey"))

  /**
   * Struct-field evolution over an ORC round-trip: write with schema A,
   * read with schema B that (a) drops a column, (b) adds a missing
   * column (→ nulls, `NullTreeReader`), (c) widens int→long and
   * double→string. Mirrors `SchemaEvolution.buildConversion:335`
   * by-name matching.
   */
  def readerSchemaQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val src = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey").cast("int").as("o_custkey"),
        col("o_totalprice"), col("o_orderstatus"))
    val dir = graft.sources.OrcIo.scratchDir("orc_evo")
    graft.sources.OrcIo.write(src, s"$dir/orders")
    val readerSchema = StructType(Seq(
      StructField("o_orderkey", LongType),       // unchanged
      StructField("o_custkey", LongType),        // widened int → long
      StructField("o_totalprice", StringType),   // double → string group
      StructField("o_missing", IntegerType)))    // absent → nulls
    graft.sources.OrcIo.readEvolved(spark, s"$dir/orders", readerSchema)
      // double→string rendering differs between engines; normalize to a
      // rounded numeric for the oracle compare.
      .withColumn("o_totalprice",
        fr(col("o_totalprice").cast("double"), 2))
      .orderBy(col("o_orderkey"))
  }

  /**
   * CHAR(n) read semantics (`TreeReaderFactory.java:1657`,
   * `TypeDescription.java:459-466`): values longer than maxLength are
   * truncated, shorter ones padded with spaces to exactly n characters
   * (character counts, not bytes — same as the reference's UTF-8-aware
   * length handling).
   */
  def charRead(c: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    rpad(substring(c, 1, n), n, " ")

  /** VARCHAR(n) read semantics (`TreeReaderFactory.java:1713`):
    * truncate to maxLength, no padding. */
  def varcharRead(c: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    substring(c, 1, n)

  /**
   * Correctness-gate query for CHAR/VARCHAR maxLength semantics over
   * the documents corpus: CHAR(8) pad/truncate on lang, VARCHAR(20)
   * truncate on text (character counts, both engines).
   */
  def charVarcharQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        charRead(col("lang"), 8).as("lang_char8"),
        varcharRead(col("text"), 20).as("text_vc20"))
      .orderBy(col("doc_id"))

  /**
   * Correctness-gate query for positional evolution: ORC round-trip of
   * three orders columns read back under a fully renamed (and widened)
   * reader schema — by-name matching would null every column; the
   * values must come through positionally.
   */
  def positionalQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val src = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey").cast("int").as("o_custkey"),
        col("o_totalprice"))
    val dir = graft.sources.OrcIo.scratchDir("orc_pos")
    graft.sources.OrcIo.write(src, s"$dir/orders")
    val renamed = StructType(Seq(
      StructField("k", LongType),      // o_orderkey, unchanged type
      StructField("c", LongType),      // o_custkey, widened int → long
      StructField("p", DoubleType)))   // o_totalprice
    graft.sources.OrcIo.readPositional(spark, s"$dir/orders", renamed)
      .orderBy(col("k"))
  }

  /**
   * UNION type encoding (SURVEY.md §1.2): Spark has no union; the
   * engine models `uniontype<int,string>` as
   * `struct<tag:tinyint, field0:int, field1:string>` — exactly the
   * encoding Spark's own ORC reader produces. Here: events whose type
   * is "click" carry an int payload (value as int), others a string
   * payload (event_type), flattened for the oracle.
   */
  def unionTypeQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .select(
        col("event_id"),
        when(col("event_type") === "click", lit(0).cast("tinyint"))
          .otherwise(lit(1).cast("tinyint")).as("tag"),
        when(col("event_type") === "click", floor(col("value")).cast("int"))
          .otherwise(lit(null).cast("int")).as("field0"),
        when(col("event_type") =!= "click", col("event_type"))
          .otherwise(lit(null).cast("string")).as("field1"))
      .orderBy(col("event_id"))
}
