package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * JSON schema inference + conversion — the `orc-tools json-schema` /
 * `convert` analogue (SURVEY.md §2.9; `JsonSchemaFinder.java:73-252`,
 * `ConvertTool.java`).
 *
 * The reference infers a merged typed schema from a JSON corpus via a
 * type lattice (bool < byte < … < decimal < float < double; string ⊔
 * timestamp; struct field union) and then converts row-by-row. Spark's
 * JSON datasource implements the same inference distributed
 * (sampling + schema merge across partitions), so the engine delegates
 * and exposes the results.
 *
 * Scale: `spark.read.json` schema inference is a distributed pass; for
 * 100 TB corpora use `samplingRatio` < 1 or an explicit schema after a
 * first inference run — both exposed here.
 */
object JsonTools {

  /** Infer the merged schema of a JSON string column (the in-engine
    * `json-schema` tool). */
  def inferSchema(spark: SparkSession, json: Dataset[String],
      samplingRatio: Double = 1.0,
      inferTimestamp: Boolean = true): StructType =
    spark.read.option("samplingRatio", samplingRatio.toString)
      // the reference's lattice includes TIMESTAMP for datetime-shaped
      // strings (JsonSchemaFinder DATE_PATTERN); Spark gates that
      // behind inferTimestamp. It costs attempted datetime parses on
      // every string value — callers that know their corpus carries no
      // datetimes can opt out.
      .option("inferTimestamp", inferTimestamp.toString)
      .json(json).schema

  /** Convert a JSON string column into typed nested columns using an
    * inferred or supplied schema (the `convert` tool, minus the file
    * rewrite — callers compose with [[OrcIo.write]]). */
  def convert(df: DataFrame, jsonCol: String,
      schema: StructType): DataFrame =
    df.withColumn(jsonCol + "_typed", from_json(col(jsonCol), schema))

  /**
   * Correctness-gate query: infer the schema of events.props
   * ({"k": <int>}), convert, and project the typed field. Oracle
   * extracts the same value with a regexp over the raw string —
   * identical only if inference + conversion typed it correctly.
   */
  def jsonConvertQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sfDir, "events")
    // props is {"k": <int>} — no datetime strings, so skip the
    // per-string timestamp parse attempts (10x on this inference pass)
    val schema = inferSchema(spark, ev.select($"props").as[String],
      inferTimestamp = false)
    convert(ev, "props", schema)
      .select(col("event_id"),
        col("props_typed.k").cast("long").as("k"))
      .orderBy(col("event_id"))
  }

  /**
   * Malformed-record quarantine — the error-handling half of
   * schema-on-read ingestion (the reference's `ConvertTool` simply
   * aborts on bad JSON; a 100 TB crawl cannot). Valid records parse to
   * typed columns; malformed records null out and carry a content
   * digest for the quarantine sink. The gate corpus is id-derived
   * (every 7th line truncated mid-object), so the oracle predicts both
   * the parse outcomes and the typed values — a hash match proves the
   * parser accepts/rejects EXACTLY the right lines and extracts the
   * right fields. Pure projection, zero shuffle.
   */
  def jsonQuarantineQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    val validLine = concat(lit("{\"id\":"), id.cast("string"),
      lit(",\"lang\":\""), col("lang"), lit("\",\"score\":"),
      (id % 100).cast("string"), lit("}"))
    // malformed from the first token: the opening brace is missing, so
    // the parse fails outright (a tail truncation can yield PARTIAL
    // results under PERMISSIVE mode — that would make the quarantine
    // decision parser-version-dependent)
    val rawLine = when(id % 7 === 0,
      regexp_replace(validLine, "^\\{", "")).otherwise(validLine)
    val schema = "id BIGINT, lang STRING, score BIGINT"
    graft.Tables.load(spark, sfDir, "documents")
      .select(id, rawLine.as("raw"))
      .withColumn("parsed", from_json(col("raw"), StructType.fromDDL(schema)))
      .select(
        col("doc_id"),
        col("parsed.id").isNotNull.as("is_valid"),
        col("parsed.id").as("id_parsed"),
        col("parsed.lang").as("lang_parsed"),
        col("parsed.score").as("score_parsed"),
        when(col("parsed.id").isNull, md5(col("raw"))).as("quarantine_md5"))
      .orderBy(col("doc_id"))
  }

  /** File-based inference (the CLI `json-schema` surface). */
  def inferSchemaPath(spark: SparkSession, path: String,
      samplingRatio: Double = 1.0): StructType =
    spark.read.option("samplingRatio", samplingRatio.toString)
      .option("inferTimestamp", "true")
      .json(path).schema

  /** JSON files → ORC files (the CLI `convert` surface). */
  def jsonToOrc(spark: SparkSession, jsonPath: String,
      outPath: String): Unit =
    OrcIo.write(spark.read.json(jsonPath), outPath)

  /** JSON → ORC conversion round-trip (`ConvertTool`): typed convert,
    * write ORC, read back. */
  def convertToOrc(spark: SparkSession, json: Dataset[String],
      outPath: String): DataFrame = {
    val schema = inferSchema(spark, json)
    val typed = spark.read.schema(schema).json(json)
    OrcIo.write(typed, outPath)
    OrcIo.read(spark, outPath)
  }
}
