package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("fakeDecodeHeader is deterministic and in range") {
    val payload = "some synthetic bytes".getBytes("UTF-8")
    val (w, h, f) = Multimodal.fakeDecodeHeader(payload)
    assert((w, h, f) == Multimodal.fakeDecodeHeader(payload))
    assert(w >= 64 && w < 128 && h >= 64 && h < 128 && f >= 1 && f <= 16)
    assert(Multimodal.fakeDecodeHeader(Array.emptyByteArray) == (64, 64, 1))
  }

  test("decode preserves row count and derives byte_len from payload") {
    val media = Multimodal.syntheticMedia(spark, sfDir)
    val decoded = Multimodal.decode(spark, media)
    assert(decoded.count() == media.count())
    assert(decoded.columns.toSeq == Seq(
      "media_id", "kind", "byte_len", "width", "height", "n_frames"))
    // byte_len equals the original payload length, joined back by id
    val joined = decoded.join(
      media.select(col("media_id"), length(col("payload")).as("plen")),
      "media_id")
    assert(joined.filter(col("byte_len") =!= col("plen")).count() == 0)
  }

  test("decode pipeline aggregates per kind over the full corpus") {
    val res = Multimodal.decodePipelineQuery(spark, sfDir).collect()
    val kinds = res.map(_.getString(0)).toSet
    assert(kinds == Set("audio", "image", "video"))
    val total = res.map(_.getLong(1)).sum
    assert(total == Tables.load(spark, sfDir, "documents").count())
  }
}
