package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing (north star): image/audio/video as opaque
 * `binary` columns with typed metadata, flowing through decode /
 * feature-extract / sample stages.
 *
 * The container has no image/audio codecs, so the *decode kernel* is a
 * clearly-marked deterministic fake ([[fakeDecodeHeader]]); everything
 * around it — schema, batch shape, partition-preserving mapPartitions,
 * metadata extraction — is real and tested. Swapping in a real codec
 * means replacing the one marked function.
 *
 * Scale: rows carry payload bytes; all stages are narrow (no shuffle),
 * so 100 TB of media flows one partition at a time. Byte-level ops
 * (length/slice/hash) are codegen'd column expressions; only the
 * decode kernel drops to mapPartitions (preference (d) of the build
 * rules, justified: a codec is genuinely imperative per-record work).
 */
object Multimodal {

  /** Typed media record: payload + metadata, the schema a 100 TB media
    * lake would store (payload possibly externalized to object-store
    * keys at the extreme — same schema shape). */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  case class DecodedMeta(media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int)

  /**
   * STUB — deterministic fake decode standing in for an image/audio
   * codec (none installed in this container). Derives "dimensions"
   * from payload bytes so outputs are stable and testable. Replace the
   * body with a real codec call (e.g. javax.imageio / ffmpeg) to go
   * live; the signature and surrounding plumbing do not change.
   */
  def fakeDecodeHeader(payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length
    val b0 = if (len > 0) payload(0) & 0xFF else 0
    val b1 = if (len > 1) payload(1) & 0xFF else 0
    (64 + b0 % 64, 64 + b1 % 64, 1 + len % 16)
  }

  /** Decode stage: batched per-partition iteration (the Scala analogue
    * of a vectorized decode UDF — one partition in, one partition out,
    * no shuffle). */
  def decode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, f) = fakeDecodeHeader(r.payload)
          DecodedMeta(r.media_id, r.kind, r.payload.length, w, h, f)
        }
      }.toDF()
  }

  /** Synthesize a deterministic binary corpus from documents (UTF-8
    * payloads): the test stand-in for real media files. */
  def syntheticMedia(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"))

  /**
   * Correctness-gate query (SQL-expressible subset): byte length,
   * 4-byte header hex, payload md5, and an 8-byte "frame sample" slice
   * — the column-expression stages of the pipeline, verified against
   * DuckDB BLOB functions.
   */
  def mediaMetaQuery(spark: SparkSession, sfDir: String): DataFrame =
    syntheticMedia(spark, sfDir)
      .select(
        col("media_id"), col("kind"),
        length(col("payload")).as("byte_len"),
        lower(hex(expr("substring(payload, 1, 4)"))).as("header_hex"),
        md5(col("payload")).as("payload_md5"),
        lower(hex(expr("substring(payload, 9, 8)"))).as("frame_sample"))
      .orderBy(col("media_id"))

  /** Full pipeline demo: synthesize → decode (stub kernel) →
    * feature aggregate per kind. Spec-verified (stub outputs aren't
    * SQL-replayable). */
  def decodePipelineQuery(spark: SparkSession, sfDir: String): DataFrame =
    decode(spark, syntheticMedia(spark, sfDir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        avg(col("width")).as("avg_width"),
        avg(col("n_frames")).as("avg_frames"))
      .orderBy(col("kind"))
}
