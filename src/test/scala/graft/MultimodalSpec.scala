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

  test("image kind decodes through the real codec: PNG encode → " +
      "javax.imageio decode round-trips dimensions") {
    val imgs = Multimodal.syntheticImages(spark, sfDir).limit(50).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val id = r.getLong(0)
      val payload = r.getAs[Array[Byte]]("payload")
      assert(Multimodal.isPng(payload), s"media $id must be a real PNG")
      val (w, h, f) = Multimodal.decodeHeader(payload)
      assert(w == 4 + (id % 13).toInt, s"media $id width")
      assert(h == 4 + (id % 11).toInt, s"media $id height")
      assert(f == 1)
    }
    // non-PNG payloads route to the audio/video stub, not the codec
    val textBytes = "not a png".getBytes("UTF-8")
    assert(!Multimodal.isPng(textBytes))
    assert(Multimodal.decodeHeader(textBytes) ==
      Multimodal.fakeDecodeHeader(textBytes))
    // a truncated PNG (valid signature + IHDR, body cut) is rejected,
    // not silently emitted with header dims
    val whole = imgs.head.getAs[Array[Byte]]("payload")
    val truncated = java.util.Arrays.copyOf(whole, whole.length - 6)
    assert(Multimodal.isPng(truncated))
    intercept[IllegalArgumentException] {
      Multimodal.decodeHeader(truncated)
    }
  }

  test("resizeImages: real raster scale-to-fit, no-op when it fits, " +
      "pass-through for non-PNG") {
    val imgs = Multimodal.syntheticImages(spark, sfDir).limit(60)
    val resized = Multimodal.resizeImages(spark, imgs, maxDim = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload"))
      .toMap
    val orig = imgs.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    orig.foreach { case (id, payload) =>
      val (w, h, _) = Multimodal.decodeHeader(payload)
      val out = resized(id)
      assert(Multimodal.isPng(out))
      val (ow, oh, _) = Multimodal.decodeHeader(out)
      if (math.max(w, h) <= 8) {
        assert(out.sameElements(payload), s"media $id must pass unchanged")
      } else {
        assert(ow == math.max(1, w * 8 / math.max(w, h)), s"media $id width")
        assert(oh == math.max(1, h * 8 / math.max(w, h)), s"media $id height")
      }
    }
    // non-PNG payloads pass through byte-identical
    import SparkSpec.spark.implicits._
    val raw = Seq((1L, "audio", "not a png".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val through = Multimodal.resizeImages(spark, raw, maxDim = 8).head()
    assert(through.getAs[Array[Byte]]("payload")
      .sameElements("not a png".getBytes("UTF-8")))
  }

  test("readMediaDir ingests image files via the binaryFile source " +
      "and the payloads decode") {
    val dir = graft.sources.OrcIo.scratchDir("media_ingest")
    val imgs = Multimodal.syntheticImages(spark, sfDir).limit(5).collect()
    imgs.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"img_${r.getLong(0)}.png"),
        r.getAs[Array[Byte]]("payload"))
    }
    val ingested = Multimodal.readMediaDir(spark, dir, "image", "*.png")
    assert(ingested.count() == 5)
    val decoded = Multimodal.decode(spark, ingested).collect()
    assert(decoded.length == 5)
    assert(decoded.forall(_.getInt(4) >= 4), "height from a real decode")
    // media_id is stable across re-ingests (path hash)
    val again = Multimodal.readMediaDir(spark, dir, "image", "*.png")
      .select(col("media_id")).collect().map(_.getLong(0)).toSet
    assert(again == ingested.select(col("media_id")).collect()
      .map(_.getLong(0)).toSet)
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

  test("frameSample emits every Nth frame with payload-derived bytes") {
    val media = Multimodal.syntheticMedia(spark, sfDir).limit(20)
    val frames = Multimodal.frameSample(spark, media, everyN = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    val byMedia = frames.collect().groupBy(_.getLong(0))
    assert(byMedia.nonEmpty)
    byMedia.values.foreach { fs =>
      val nos = fs.map(_.getInt(1)).sorted
      assert(nos.head == 0 && nos.forall(_ % 4 == 0),
        s"frame numbers not sampled every 4: ${nos.toSeq}")
    }
  }

  test("extractFeatures yields unit-norm 64-dim embeddings") {
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.syntheticMedia(spark, sfDir).limit(10)).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val emb = r.getSeq[Float](2)
      assert(emb.length == 64)
      val norm = math.sqrt(emb.map(v => v.toDouble * v).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    }
  }

  test("media near-dup matches kind-blocked brute force exactly") {
    val res = Multimodal.mediaNearDupQuery(spark, sfDir)
    res.collect().foreach(r => assert(r.getDouble(2) >= 0.999))
    // IVF-cell blocking with 2-cell probing must not lose pairs vs the
    // exact kind-blocked join at this threshold (precision is exact by
    // construction: every candidate is cosine-verified). Exact recall
    // is a property of THIS fixed corpus + deterministic k-means fit
    // (pinned on purpose — it cannot flake run-to-run); 2-probe recall
    // is not structurally guaranteed for arbitrary data, where a pair
    // straddling a 3-cell corner can miss.
    val feats = spark.read.parquet(
      Multimodal.buildFeatureStore(spark, sfDir))
    val a = feats.select(col("media_id").as("media_a"), col("kind"),
      col("embedding").as("emb_a"))
    val b = feats.select(col("media_id").as("media_b"), col("kind"),
      col("embedding").as("emb_b"))
    val brute = a.join(b, Seq("kind"))
      .filter(col("media_a") < col("media_b"))
      .withColumn("cos_sim", round(graft.functions.VectorOps
        .cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos_sim") >= 0.999)
      .select(col("media_a"), col("media_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = res.select(col("media_a"), col("media_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("audio kind decodes through the real codec: WAVE encode → " +
      "javax.sound.sampled decode round-trips metadata and samples") {
    val wavs = Multimodal.syntheticAudio(spark, sfDir).limit(50).collect()
    assert(wavs.nonEmpty)
    wavs.foreach { r =>
      val id = r.getLong(0)
      val payload = r.getAs[Array[Byte]]("payload")
      assert(Multimodal.isWav(payload), s"media $id must be a real WAVE")
      val (rate, ch, frames) = Multimodal.decodeAudioHeader(payload)
      assert(rate == Multimodal.audioRate(id), s"media $id rate")
      assert(ch == 1, s"media $id channels")
      assert(frames == Multimodal.audioFrames(id), s"media $id frames")
      // the decoded PCM stream is bit-for-bit what the encoder was fed
      val samples = Multimodal.decodeAudioSamples(payload)
      assert(samples.length == frames)
      samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == Multimodal.pcmSample(id, i), s"media $id sample $i")
      }
    }
    // non-WAVE payloads are rejected loudly, not mis-parsed
    intercept[IllegalArgumentException] {
      Multimodal.decodeAudioHeader("not a wav".getBytes("UTF-8"))
    }
  }

  test("audioEnergy computes peak and floor-scaled RMS from decoded " +
      "samples") {
    val res = Multimodal.audioEnergyQuery(spark, sfDir).limit(20).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val id = r.getLong(0)
      val n = Multimodal.audioFrames(id)
      assert(r.getLong(1) == n, s"media $id n_frames")
      var sumSq = 0L
      var peak = 0
      (0 until n).foreach { i =>
        val v = Multimodal.pcmSample(id, i).toInt
        sumSq += v.toLong * v
        peak = math.max(peak, math.abs(v))
      }
      assert(r.getInt(2) == peak, s"media $id peak")
      assert(r.getLong(3) ==
        math.floor(math.sqrt(sumSq.toDouble / n) * 10000).toLong,
        s"media $id rms_e4")
    }
  }

  test("decode pipeline aggregates per kind over the full corpus") {
    val res = Multimodal.decodePipelineQuery(spark, sfDir).collect()
    val kinds = res.map(_.getString(0)).toSet
    assert(kinds == Set("audio", "image", "video"))
    val total = res.map(_.getLong(1)).sum
    assert(total == Tables.load(spark, sfDir, "documents").count())
  }
}
