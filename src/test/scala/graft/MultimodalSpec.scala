package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("video kind round-trips through the real container path: AVI " +
      "mux → RIFF walk header parse → movi demux") {
    Seq(0L, 1L, 7L, 42L, 313L).foreach { id =>
      val payload = Multimodal.encodeAvi(id)
      assert(Multimodal.isAvi(payload), s"media $id must be a real AVI")
      assert(!Multimodal.isWav(payload) && !Multimodal.isPng(payload))
      val (w, h, f) = Multimodal.decodeVideoHeader(payload)
      assert(w == Multimodal.videoWidth(id), s"media $id width")
      assert(h == Multimodal.videoHeight(id), s"media $id height")
      assert(f == Multimodal.videoFrames(id), s"media $id frames")
      // decodeHeader dispatches AVI to the same parse
      assert(Multimodal.decodeHeader(payload) == (w, h, f))
      // the demux walks every frame chunk back out, bytes intact
      val frames = Multimodal.demuxFrames(payload)
      assert(frames.length == f, s"media $id demuxed frame count")
      frames.zipWithIndex.foreach { case (b, fr) =>
        assert(b.length == w * h * 3, s"media $id frame $fr length")
        b.indices.foreach { i =>
          assert(b(i) == Multimodal.videoFrameByte(id, fr, i),
            s"media $id frame $fr byte $i")
        }
      }
    }
    // truncated AVI (movi list cut) still header-parses but demux of a
    // payload with no movi is rejected loudly
    val whole = Multimodal.encodeAvi(5L)
    intercept[IllegalArgumentException] {
      Multimodal.demuxFrames("RIFF1234AVI not really".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideoHeader("not an avi".getBytes("UTF-8"))
    }
    assert(Multimodal.decodeVideoHeader(whole) ==
      (Multimodal.videoWidth(5L), Multimodal.videoHeight(5L),
        Multimodal.videoFrames(5L)))
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
    // unknown containers are rejected loudly — no fake fallback
    val textBytes = "not a png".getBytes("UTF-8")
    assert(!Multimodal.isPng(textBytes))
    intercept[IllegalArgumentException] {
      Multimodal.decodeHeader(textBytes)
    }
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
    val media = Multimodal.syntheticMediaReal(spark, sfDir)
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

  test("frameSample demuxes every Nth movi frame chunk") {
    val media = spark.read.parquet(
      Multimodal.buildVideoStore(spark, sfDir)).limit(20)
    val frames = Multimodal.frameSample(spark, media, everyN = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    val byMedia = frames.collect().groupBy(_.getLong(0))
    assert(byMedia.nonEmpty)
    byMedia.foreach { case (id, fs) =>
      val nos = fs.map(_.getInt(1)).sorted
      assert(nos.head == 0 && nos.forall(_ % 4 == 0),
        s"frame numbers not sampled every 4: ${nos.toSeq}")
      assert(nos.length == (Multimodal.videoFrames(id) + 3) / 4,
        s"media $id sampled count")
      // sampled bytes are the real chunk payloads
      fs.foreach { r =>
        val b = r.getAs[Array[Byte]]("frame_bytes")
        assert(b.length ==
          Multimodal.videoWidth(id) * Multimodal.videoHeight(id) * 3)
        assert(b(0) == Multimodal.videoFrameByte(id, r.getInt(1), 0))
      }
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

  test("dhash: hand-computed gradient trace, flat-image zero, and " +
      "the near-dup locality property") {
    def img(w: Int, h: Int)(px: (Int, Int) => Int) = {
      val b = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) b.setRGB(x, y, px(x, y))
      b
    }
    // strictly left-to-right brightening 9x8 grayscale ramp: every
    // adjacent comparison is "brighter" -> all 64 bits set
    val ramp = img(9, 8)((x, _) => { val v = x * 28; (v << 16) | (v << 8) | v })
    assert(Multimodal.dhashOf(ramp) == ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    // flat image: no comparison fires -> zero hash
    val flat = img(9, 8)((_, _) => 0x808080)
    assert(Multimodal.dhashOf(flat) == ((0L, 0L)))
    // locality: brightening ONE sampled pixel changes at most its two
    // adjacent comparisons -> Hamming distance <= 2 (the property that
    // makes dHash a NEAR-dup key rather than an exact one)
    val base = img(9, 8)((x, y) =>
      { val v = (x * 37 + y * 11) % 200; (v << 16) | (v << 8) | v })
    // (4,3) base gray 181 sits above its left neighbor (144) and
    // above its right one (18): darkening it to 0 flips both
    // comparisons, the worst case
    val tweaked = img(9, 8)((x, y) =>
      if (x == 4 && y == 3) 0x000000
      else { val v = (x * 37 + y * 11) % 200; (v << 16) | (v << 8) | v })
    val (h1, l1) = Multimodal.dhashOf(base)
    val (h2, l2) = Multimodal.dhashOf(tweaked)
    val dist = java.lang.Long.bitCount(h1 ^ h2) +
      java.lang.Long.bitCount(l1 ^ l2)
    assert(dist <= 2 && dist >= 1, s"one-pixel tweak moved $dist bits")
  }

  test("audio fingerprint: hand-computed contour traces") {
    // 32 samples -> 16 windows of 2. Rising amplitude staircase:
    // window w holds samples of amplitude w -> every adjacent energy
    // comparison fires -> all 15 bits set.
    val rising = Array.tabulate[Short](32)(i => (i / 2 * 100).toShort)
    assert(Multimodal.audioFprintOf(rising) == 0x7FFF)
    // constant amplitude -> zero fingerprint
    val flat = Array.fill[Short](32)(1000)
    assert(Multimodal.audioFprintOf(flat) == 0)
    // single loud window (w=3 of 16): exactly two comparisons fire —
    // into the window (bit w=2, weight 1<<12) and none rising after,
    // so fprint = 1<<12 and popcount 1
    val spike = Array.tabulate[Short](32)(i =>
      if (i / 2 == 3) 5000 else 0)
    assert(Multimodal.audioFprintOf(spike) == (1 << 12))
    // sign invariance: energy is squared, so negated samples match
    val neg = rising.map(s => (-s).toShort)
    assert(Multimodal.audioFprintOf(neg) ==
      Multimodal.audioFprintOf(rising))
  }

  test("video fingerprint: hand-computed brightness-contour traces") {
    def frame(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    // brightness sums 10, 30, 20, 20: bits = (30>10)=1, (20>30)=0,
    // (20>20)=0 -> MSB-first over 3 bits -> 0b100 = 4
    val frames = Array(frame(10), frame(10, 20), frame(5, 15), frame(20))
    assert(Multimodal.videoFprintOf(frames) == 4)
    // monotone brightening n=5 -> all 4 bits -> 0b1111
    val rising = Array.tabulate(5)(f => frame(f * 10))
    assert(Multimodal.videoFprintOf(rising) == 0xF)
    // bytes are unsigned: 0xFF counts as 255, not -1
    val unsigned = Array(frame(1), frame(0xFF))
    assert(Multimodal.videoFprintOf(unsigned) == 1)
  }

  test("audio VAD: hand-traced segments, partial tail window, and " +
      "corpus invariants") {
    def win(v: Int) = Array.fill[Short](16)(v.toShort)
    // loud window energy = 16*32000^2 = 1.6384e10 >= 5.728e9; silent 0
    val samples = (win(32000) ++ win(32000) ++ win(0) ++ win(32000))
    val segs = Multimodal.audioVadOf(7L, samples)
    assert(segs.map(s => (s.seg_no, s.start_win, s.end_win, s.n_win)) ==
      Seq((1, 0L, 1L, 2L), (2, 3L, 3L, 1L)))
    assert(segs.head.energy == 2L * 16L * 32000L * 32000L)
    // a partial tail window still gates on its exact energy: 8 loud
    // samples = 8*32000^2 = 8.192e9 >= threshold -> active
    val tail = win(0) ++ Array.fill[Short](8)(32000.toShort)
    assert(Multimodal.audioVadOf(1L, tail)
      .map(s => (s.start_win, s.end_win)) == Seq((1L, 1L)))
    // all-silent emits nothing
    assert(Multimodal.audioVadOf(2L, win(0)).isEmpty)
    // corpus invariants: ordered, disjoint, dense ordinals
    val rows = Multimodal.audioVadQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getInt(1))
      assert(ordered.map(_.getInt(1)).toSeq == (1 to rs.length))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) + 1 < b.getLong(2),
            "adjacent segments must be separated by a silent window")
        case _ =>
      }
      ordered.foreach { s =>
        assert(s.getLong(3) >= s.getLong(2))
        assert(s.getLong(4) == s.getLong(3) - s.getLong(2) + 1)
      }
    }
  }

  test("mediaTextAlign: independent pair-score recompute, shard-local " +
      "candidates, top-1 maximality, admission consistency") {
    import graft.Tables
    val rows = Multimodal.mediaTextAlignQuery(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap
    assert(rows.length == docs.size, "one row per stored image")
    // independent driver-side recompute of both encoders + the score
    def imgFeat(id: Long): Array[Long] =
      Multimodal.gridGray16(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodePng(id))))
    def txtFeat(id: Long): Array[Long] = {
      val pref = docs(id).take(96)
      val f = new Array[Long](16)
      if (pref.length >= 3)
        (0 to pref.length - 3).foreach { i =>
          val g = pref.substring(i, i + 3)
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8"))
          val hex = md.map("%02x".format(_)).mkString.substring(0, 6)
          f((java.lang.Long.parseLong(hex, 16) % 16).toInt) += 1L
        }
      f
    }
    def score(m: Array[Long], t: Array[Long]): Double = {
      val ms = m.sum; val ts = t.sum
      val mc = m.map(_ * 16 - ms); val tc = t.map(_ * 16 - ts)
      val dot = mc.zip(tc).map { case (a, b) => a * b }.sum
      val fn2 = mc.map(x => x * x).sum; val gn2 = tc.map(x => x * x).sum
      if (fn2 == 0 || gn2 == 0) 0.0
      else math.floor(dot.toDouble /
        (math.sqrt(fn2.toDouble) * math.sqrt(gn2.toDouble)) * 1e4 + 0.5) / 1e4
    }
    val byShard = docs.keys.toSeq.groupBy(_ / 64)
    rows.foreach { r =>
      val mediaId = r.getLong(0); val capId = r.getLong(1)
      val s = r.getDouble(2)
      val cands = byShard(mediaId / 64)
      assert(capId / 64 == mediaId / 64, "candidates are shard-local")
      assert(r.getLong(4) == cands.size, "n_cand = shard occupancy")
      assert(r.getBoolean(5) == (s >= 0.55), "admission bar")
      assert(r.getBoolean(3) == (capId == mediaId))
      val mf = imgFeat(mediaId)
      val all = cands.map(c => c -> score(mf, txtFeat(c)))
      val best = all.minBy { case (c, sc) => (-sc, c) }
      assert(best._1 == capId && best._2 == s,
        s"media $mediaId: engine ($capId,$s) vs recompute $best")
    }
    // the bar must genuinely split the corpus (a filter, not a rubber
    // stamp): both admitted and rejected pairs exist at gate scale
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("audio-text alignment: VAD gate genuinely drops unvoiced " +
      "clips, survivors align shard-locally") {
    val rows = Multimodal.audioTextAlignQuery(spark, sfDir).collect()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    // the minimum-speech-duration rule (≥ 3 active windows) must be a
    // real filter on this corpus, not a rubber stamp
    assert(rows.length < nDocs,
      s"VAD gate dropped nothing (${rows.length} of $nDocs)")
    assert(rows.length > nDocs / 2, "VAD gate dropped most of the corpus")
    // every surviving clip is genuinely voiced under the same rule,
    // recomputed from the real decode
    val store = spark.read.parquet(
      Multimodal.buildAudioStore(spark, sfDir))
      .select(org.apache.spark.sql.functions.col("media_id"),
        org.apache.spark.sql.functions.col("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val active = Multimodal.audioVadOf(id,
        Multimodal.decodeAudioSamples(store(id))).map(_.n_win).sum
      assert(active >= 3L, s"unvoiced clip $id passed the gate")
      assert(r.getLong(1) / 64 == id / 64, "candidates are shard-local")
      assert(r.getBoolean(5) == (r.getDouble(2) >= 0.55), "admission bar")
    }
    // both admitted and rejected alignments exist
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("second-level re-blocking: oversized cells split, near-identical " +
      "pairs keep a shared key, small cells key plainly") {
    import SparkSpec.spark.implicits._
    val dims = 8
    val r = new scala.util.Random(97)
    def noisy(base: Array[Float]): Array[Float] =
      base.map(x => x + (r.nextFloat() - 0.5f) * 0.01f)
    val baseA = Array.fill(dims)(r.nextFloat())
    val baseB = Array.fill(dims)(2f + r.nextFloat())
    // cell 5 is HOT: 500 exploded rows over two tight clusters; cells
    // 1..20 hold 5 rows each (under any oversize bar). Pair (i, i+250)
    // inside cluster A is engineered near-identical.
    val hot = (0 until 250).flatMap { i =>
      val v = noisy(baseA)
      Seq((i.toLong, "img", v.toSeq, Seq(5)),
        ((i + 250).toLong, "img", v.map(x => x + 1e-4f).toSeq, Seq(5)))
    }
    val hotB = (0 until 0).map(_ => null) // (cluster B folded below)
    val bRows = (0 until 100).map { i =>
      ((1000 + i).toLong, "img", noisy(baseB).toSeq, Seq(5))
    }
    val cold = (0 until 100).map { i =>
      ((2000 + i).toLong, "img", noisy(baseA).toSeq, Seq(10 + i % 20))
    }
    val feats = (hot ++ bRows ++ cold)
      .toDF("media_id", "kind", "embedding", "cells")
      .select(col("media_id"), col("kind"),
        col("embedding").cast("array<float>").as("embedding"),
        col("cells"))
    val dir = graft.sources.OrcIo.scratchDir("reblock_spec")
    feats.write.mode("overwrite").parquet(s"$dir/feats")
    // k > ivfKBase forces the dynamic path; nMedia/probe sized so the
    // oversize bar is 2·(700·3/300) = 14 exploded rows
    graft.operators.Multimodal.writeBlockKeys(
      spark, s"$dir/feats", s"$dir/keys", nMedia = 700, k = 300)
    val keys = spark.read.parquet(s"$dir/keys")
      .select(col("media_id"), col("ckey")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val refinedSpace = 1L << 24
    // cold cells keep their plain key, nothing else
    (0 until 100).foreach { i =>
      assert(keys((2000 + i).toLong) == Set((10 + i % 20).toLong))
    }
    // hot-cell rows all moved into the refined key space and split
    // into more than one sub-cell
    val hotKeys = (hot.map(_._1) ++ bRows.map(_._1))
      .flatMap(id => keys(id)).toSet
    assert(hotKeys.forall(_ >= refinedSpace), "hot rows re-keyed")
    assert(hotKeys.size > 1, "oversized cell actually split")
    // near-identical pairs (the property the completeness gate needs)
    // still share at least one sub key
    (0 until 250).foreach { i =>
      assert(keys(i.toLong).intersect(keys((i + 250).toLong)).nonEmpty,
        s"near-dup pair $i lost its shared key")
    }
    // the two engineered clusters separate: no sub-cell holds both an
    // A-row and a B-row (they are far apart by construction)
    val aKeys = (0 until 250).flatMap(i => keys(i.toLong)).toSet
    val bKeys = bRows.map(_._1).flatMap(id => keys(id)).toSet
    assert(aKeys.intersect(bKeys).isEmpty, "clusters share a sub-cell")
  }
}
