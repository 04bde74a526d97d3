package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing (north star): image/audio/video as opaque
 * `binary` columns with typed metadata, flowing through decode /
 * feature-extract / sample stages.
 *
 * The image kind decodes through a REAL codec (`javax.imageio`, in the
 * JDK): [[syntheticImages]] encodes genuine PNGs and [[decodeHeader]]
 * parses them back, oracle-gated end-to-end (q_image_decode predicts
 * the encoded dimensions in SQL). The audio kind likewise runs a REAL
 * codec (`javax.sound.sampled`, also in the JDK): [[syntheticAudio]]
 * encodes genuine RIFF/WAVE files and [[decodeAudioHeader]] /
 * [[decodeAudioSamples]] parse them back — the energy gate
 * (q_audio_energy) proves bit-exact PCM recovery, because its oracle
 * replays the sample-generation math and any decode divergence breaks
 * the hash. Video has no codec in this container, so its kernel is a
 * clearly-marked deterministic fake ([[fakeDecodeHeader]]); everything
 * around it — schema, batch shape, partition-preserving mapPartitions,
 * metadata extraction — is real and tested. Swapping in a real video
 * codec means replacing the one marked function, exactly as the image
 * and audio kinds already do.
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
   * STUB — deterministic fake decode standing in for an audio/video
   * codec (none installed in this container; images go through the
   * real path in [[decodeHeader]]). Derives "dimensions" from payload
   * bytes so outputs are stable and testable. Replace the body with a
   * real codec call (e.g. ffmpeg) to go live; the signature and
   * surrounding plumbing do not change.
   */
  def fakeDecodeHeader(payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length
    val b0 = if (len > 0) payload(0) & 0xFF else 0
    val b1 = if (len > 1) payload(1) & 0xFF else 0
    (64 + b0 % 64, 64 + b1 % 64, 1 + len % 16)
  }

  private val PngMagic =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  // every complete PNG ends with the constant IEND chunk (zero length,
  // type, fixed CRC) — an O(1) truncation witness
  private val PngIend = Array(0x00, 0x00, 0x00, 0x00, 'I', 'E', 'N', 'D',
    0xAE, 0x42, 0x60, 0x82).map(_.toByte)

  def isPng(payload: Array[Byte]): Boolean =
    payload.length > PngMagic.length &&
      PngMagic.indices.forall(i => payload(i) == PngMagic(i))

  /**
   * Decode kernel: PNG payloads decode through the REAL codec
   * (`javax.imageio` — container-independent, ships in the JDK);
   * anything else falls to the marked audio/video stub. Returns
   * (width, height, frameCount).
   *
   * Header-only parse: `ImageReader.getWidth/getHeight` read the
   * IHDR chunk without rasterizing pixels — the metadata pass a 100 TB
   * media sweep runs (full rasterization stays where pixels are
   * needed, [[resizeImages]]).
   */
  def decodeHeader(payload: Array[Byte]): (Int, Int, Int) =
    if (isPng(payload)) {
      // a header parse alone would accept a truncated body (the full
      // rasterize this replaced rejected it); the constant IEND
      // trailer restores the completeness check at O(1)
      require(payload.length >= PngIend.length &&
        PngIend.indices.forall(i =>
          payload(payload.length - PngIend.length + i) == PngIend(i)),
        "truncated PNG payload (missing IEND)")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no PNG reader")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          (reader.getWidth(0), reader.getHeight(0), 1)
        } finally reader.dispose()
      } finally iis.close()
    } else fakeDecodeHeader(payload)

  /** Decode stage: batched per-partition iteration (the Scala analogue
    * of a vectorized decode UDF — one partition in, one partition out,
    * no shuffle). */
  def decode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, f) = decodeHeader(r.payload)
          DecodedMeta(r.media_id, r.kind, r.payload.length, w, h, f)
        }
      }.toDF()
  }

  /**
   * Ingest a directory tree of media files through Spark's
   * `binaryFile` source — how a production pipeline actually acquires
   * images (object-store prefixes of image files → binary column +
   * file metadata). `media_id` is the 64-bit hash of the file path:
   * stable across re-ingests, shardable, no driver-side numbering.
   * Scale: binaryFile splits by file across the cluster;
   * `pathGlobFilter` prunes at listing time, before any byte is read.
   */
  def readMediaDir(spark: SparkSession, dir: String, kind: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        lit(kind).as("kind"),
        col("content").as("payload"),
        col("path"), col("length"))

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
   * Real-codec image corpus: one genuine PNG per document, encoded via
   * `javax.imageio`. Dimensions are a fixed function of `doc_id`
   * (width = 4 + id mod 13, height = 4 + id mod 11) so an SQL oracle
   * can predict what a real decode must recover; pixels are a
   * deterministic hash of (id, x, y) so payload bytes are stable.
   * Narrow per-partition encode, no shuffle — the write-side twin of
   * the decode stage.
   */
  def syntheticImages(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 4 + (id % 13).toInt
          val h = 4 + (id % 11).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val m = java.lang.Long
                .hashCode(id * 1000003L + y * 1009L + x * 31L)
              img.setRGB(x, y, m & 0xFFFFFF)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, "image", bos.toByteArray)
        }
      }.toDF()
  }

  // ---------------------------------------------------------------- audio

  private val RiffMagic = "RIFF".getBytes("US-ASCII")
  private val WaveMagic = "WAVE".getBytes("US-ASCII")

  /** RIFF/WAVE magic check: `RIFF` at offset 0, `WAVE` at offset 8. */
  def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      RiffMagic.indices.forall(i => payload(i) == RiffMagic(i)) &&
      WaveMagic.indices.forall(i => payload(8 + i) == WaveMagic(i))

  /** The deterministic 16-bit PCM waveform for the synthetic audio
    * corpus: sample i of media `id`. Pure integer math so the SQL
    * oracle replays it exactly — a decoded stream that matches proves
    * the REAL codec recovered every sample bit-for-bit. */
  def pcmSample(id: Long, i: Int): Short =
    ((id * 7919L + i * 104729L) % 65536L - 32768L).toShort

  /** Frame count / sample rate as fixed functions of `media_id`, so the
    * oracle can predict what a real decode must recover (the audio twin
    * of [[syntheticImages]]'s id-derived dimensions). */
  def audioFrames(id: Long): Int = 64 + (id % 192).toInt
  def audioRate(id: Long): Int = 8000 * (1 + (id % 3).toInt)

  /**
   * Real-codec audio corpus: one genuine RIFF/WAVE file per document,
   * encoded via `javax.sound.sampled` (16-bit PCM, mono,
   * little-endian). Narrow per-partition encode, no shuffle — the
   * write-side twin of the audio decode stage.
   */
  def syntheticAudio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = audioFrames(id)
          val rate = audioRate(id)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = pcmSample(id, i)
            pcm(2 * i) = (s & 0xFF).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            rate.toFloat, 16, 1, 2, rate.toFloat, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          try javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          finally ais.close()
          MediaRecord(id, "audio", bos.toByteArray)
        }
      }.toDF()
  }

  case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, duration_ms: Long)

  /**
   * Header-only audio metadata decode through the REAL codec:
   * `AudioSystem.getAudioFileFormat` parses the WAVE `fmt ` chunk
   * without reading sample data — the metadata pass a 100 TB audio
   * sweep runs (sample decode stays where samples are needed,
   * [[decodeAudioSamples]]).
   */
  def decodeAudioHeader(payload: Array[Byte]): (Int, Int, Long) = {
    require(isWav(payload), "not a RIFF/WAVE payload")
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(payload))
    val fmt = aff.getFormat
    (fmt.getSampleRate.toInt, fmt.getChannels, aff.getFrameLength.toLong)
  }

  /** Full PCM sample decode through the real codec: WAVE bytes →
    * 16-bit signed samples (mono). The returned array is what the
    * encoder was fed — any codec divergence shows up bit-for-bit. */
  def decodeAudioSamples(payload: Array[Byte]): Array[Short] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Short](n)
      var i = 0
      if (fmt.isBigEndian)
        while (i < n) {
          out(i) = (((bytes(2 * i) & 0xFF) << 8) |
            (bytes(2 * i + 1) & 0xFF)).toShort
          i += 1
        }
      else
        while (i < n) {
          out(i) = (((bytes(2 * i + 1) & 0xFF) << 8) |
            (bytes(2 * i) & 0xFF)).toShort
          i += 1
        }
      out
    } finally ais.close()
  }

  /** Audio metadata stage: per-partition header decode, no shuffle. */
  def decodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val (rate, ch, frames) = decodeAudioHeader(r.payload)
          AudioMeta(r.media_id, rate, ch, frames, frames * 1000L / rate)
        }
      }.toDF()
  }

  /** Materialized WAVE corpus per sf dir (the audio twin of
    * [[buildImageStore]]): encoding is fixture creation, not the
    * measured operator; built once, shared by the decode and energy
    * queries. */
  private val audioStore =
    scala.collection.concurrent.TrieMap[String, String]()

  def buildAudioStore(spark: SparkSession, sfDir: String): String =
    audioStore.getOrElseUpdate(sfDir, {
      val store = graft.sources.OrcIo.scratchDir("media_audio")
      syntheticAudio(spark, sfDir)
        .write.mode("overwrite").parquet(s"$store/audio")
      s"$store/audio"
    })

  /** Correctness-gate query for the REAL audio header decode: encode
    * WAVE files with id-derived rate/frame-count, decode them back via
    * `javax.sound.sampled`, and let the DuckDB oracle predict the
    * recovered metadata from `doc_id` alone. */
  def audioDecodeQuery(spark: SparkSession, sfDir: String): DataFrame =
    decodeAudio(spark, spark.read.parquet(buildAudioStore(spark, sfDir)))
      .select(col("media_id"), col("sample_rate"), col("channels"),
        col("n_frames"), col("duration_ms"))
      .orderBy(col("media_id"))

  case class AudioEnergy(media_id: Long, n_frames: Long, peak: Int,
      rms_e4: Long)

  /**
   * Real DSP over really-decoded samples: peak amplitude and RMS
   * energy per file — the loudness screen an audio-curation pipeline
   * runs (silence / clipping gates). Samples come out of the REAL
   * WAVE decode; the oracle replays the generation math, so a hash
   * match proves the codec round-tripped every 16-bit sample exactly.
   * Integer sum-of-squares (exact, order-free) feeds one double sqrt;
   * the RMS is reported floor-scaled to 1e-4 (`rms_e4`) — floor of an
   * IEEE-identical double is engine-independent, where `round` tie
   * semantics (half-even vs half-up) are not.
   */
  def audioEnergy(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val samples = decodeAudioSamples(r.payload)
          var sumSq = 0L
          var peak = 0
          samples.foreach { s =>
            val v = s.toInt
            sumSq += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
          }
          val n = samples.length
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
          AudioEnergy(r.media_id, n.toLong, peak,
            math.floor(rms * 10000).toLong)
        }
      }.toDF()
  }

  def audioEnergyQuery(spark: SparkSession, sfDir: String): DataFrame =
    audioEnergy(spark, spark.read.parquet(buildAudioStore(spark, sfDir)))
      .orderBy(col("media_id"))

  // ---------------------------------------------------------------- images

  case class ResizedImage(media_id: Long, payload: Array[Byte])

  /**
   * Resize stage: decode PNG → scale to fit `maxDim` on the longest
   * side (aspect preserved, integer math: `out = dim × maxDim ÷
   * longest`, floor, min 1; no-op when it already fits) → re-encode
   * PNG. Real codec + real raster op (`java.awt.Graphics2D`), narrow
   * per-partition work, no shuffle — the standard pre-training image
   * normalization pass. Non-PNG payloads pass through untouched.
   */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int)
      : DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          if (!isPng(r.payload)) ResizedImage(r.media_id, r.payload)
          else {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            require(img != null, s"corrupt PNG payload (media ${r.media_id})")
            val (w, h) = (img.getWidth, img.getHeight)
            val longest = math.max(w, h)
            if (longest <= maxDim) ResizedImage(r.media_id, r.payload)
            else {
              val ow = math.max(1, w * maxDim / longest)
              val oh = math.max(1, h * maxDim / longest)
              val out = new java.awt.image.BufferedImage(ow, oh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try g.drawImage(img, 0, 0, ow, oh, null) finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedImage(r.media_id, bos.toByteArray)
            }
          }
        }
      }.toDF()
  }

  /** Materialized PNG corpus per sf dir — the synthetic stand-in for
    * the image lake a real pipeline READS (encoding it is fixture
    * creation, not the measured operator); built once, shared by the
    * decode and resize queries, same pattern as [[buildFeatureStore]]. */
  private val imageStore =
    scala.collection.concurrent.TrieMap[String, String]()

  def buildImageStore(spark: SparkSession, sfDir: String): String =
    imageStore.getOrElseUpdate(sfDir, {
      val store = graft.sources.OrcIo.scratchDir("media_images")
      syntheticImages(spark, sfDir)
        .write.mode("overwrite").parquet(s"$store/images")
      s"$store/images"
    })

  /** Correctness-gate query for the full raster chain: encode PNGs
    * (id-derived dims) → resize to fit 8 px → re-encode → DECODE THE
    * RESIZED BYTES BACK — the reported dimensions come out of the
    * second real decode, and the oracle predicts them from `doc_id`
    * with the same integer math. */
  def imageResizeQuery(spark: SparkSession, sfDir: String): DataFrame =
    decode(spark,
      resizeImages(spark,
        spark.read.parquet(buildImageStore(spark, sfDir)), maxDim = 8)
        .withColumn("kind", lit("image")))
      .select(col("media_id"), col("width"), col("height"))
      .orderBy(col("media_id"))

  /** Correctness-gate query for the REAL image decode: encode PNGs with
    * id-derived dimensions, decode them back with `javax.imageio`, and
    * let the DuckDB oracle predict the recovered dimensions from
    * `doc_id` alone — a full codec round-trip behind a hash gate. */
  def imageDecodeQuery(spark: SparkSession, sfDir: String): DataFrame =
    decode(spark, spark.read.parquet(buildImageStore(spark, sfDir)))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("media_id"))

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

  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /**
   * Frame sampling: decode frame count (stub), emit every `everyN`-th
   * frame as its own row. The explode is real Spark plumbing (one
   * media row → k frame rows, narrow, no shuffle); the frame "pixels"
   * are a deterministic payload slice standing in for a real decoder.
   */
  def frameSample(spark: SparkSession, media: DataFrame, everyN: Int = 4)
      : DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
      .flatMap { r =>
        val (_, _, nFrames) = fakeDecodeHeader(r.payload)
        (0 until nFrames by everyN).map { f =>
          // STUB frame extraction: slice of payload bytes per frame
          val start = math.min(f * 8, math.max(r.payload.length - 8, 0))
          val end = math.min(start + 8, r.payload.length)
          Frame(r.media_id, f, java.util.Arrays.copyOfRange(
            r.payload, start, end))
        }
      }.toDF()
  }

  /**
   * Feature extraction: a deterministic 64-dim float "embedding" from
   * payload bytes (byte histogram over 64 buckets, L2-normalized) —
   * the stub stand-in for a real vision/audio encoder. Output plugs
   * straight into [[Similarity]] / [[Dedup.embeddingNearDupQuery]]
   * (same `array<float>` column shape as the embeddings table).
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRecord]
      .map { r =>
        val hist = new Array[Float](64)
        r.payload.foreach(b => hist((b & 0xFF) % 64) += 1f)
        val n = math.sqrt(hist.map(v => v.toDouble * v).sum)
        val emb = if (n == 0) hist else hist.map(v => (v / n).toFloat)
        (r.media_id, r.kind, emb)
      }.toDF("media_id", "kind", "embedding")
  }

  /** Media near-dup candidate blocking: IVF cells (k-means coarse
    * quantizer, [[Similarity.fitCentroidMatrix]]), each vector keyed by
    * its `ivfProbe` nearest cells; candidate iff any cell is shared.
    * Histogram embeddings cluster so tightly that data-INDEPENDENT
    * blocking fails both ways (measured at sf0.1, 5000 docs, 71 true
    * pairs: 12 raw hyperplanes → 79 buckets → 1.8M candidate pairs;
    * 4×15-plane banding → perfect recall but 3.2M pairs) — k-means
    * splits the dense regions by construction, and 2-cell probing
    * covers boundary pairs. */
  private val ivfK = 256
  private val ivfProbe = 2
  /** Feature-store cache: decode+embed is the offline half of the
    * pipeline (like the IVF fit) — built once per corpus, reused by
    * every serving query against it. */
  private val featureStore =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Build (or reuse) the materialized feature store for a corpus;
    * returns its path. */
  def buildFeatureStore(spark: SparkSession, sfDir: String): String =
    featureStore.getOrElseUpdate(sfDir, {
      val store = graft.sources.OrcIo.scratchDir("media_feats")
      // materialize the decode+embed pass ONCE before the k-means fit —
      // each fit iteration runs several jobs, and without this the
      // typed decode map re-executes in every one of them
      val feats = extractFeatures(spark, syntheticMedia(spark, sfDir))
        .localCheckpoint()
      val cents = Similarity.fitCentroidMatrix(
        feats.select(col("media_id").as("vec_id"), col("embedding")),
        k = ivfK)
      feats
        .withColumn("cells", call_function("graft_nearest_cells",
          col("embedding"), Similarity.centroidLit(cents), lit(ivfProbe)))
        .write.mode("overwrite").parquet(s"$store/feats")
      s"$store/feats"
    })

  def mediaNearDupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{round => rnd}
    // both sides of the self-join read the materialized store — the
    // decode+embed pass never runs twice
    val feats = spark.read.parquet(buildFeatureStore(spark, sfDir))
    val celled = feats.select(col("media_id"), col("kind"),
      col("embedding"), explode(col("cells")).as("cell"))
    val a = celled.select(col("media_id").as("media_a"), col("kind"),
      col("cell"), col("embedding").as("emb_a"))
    val b = celled.select(col("media_id").as("media_b"), col("kind"),
      col("cell"), col("embedding").as("emb_b"))
    a.join(b, Seq("kind", "cell"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"), col("emb_a"), col("emb_b"))
      .distinct()
      .withColumn("cos_sim", rnd(
        graft.functions.VectorOps.cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos_sim") >= 0.999)
      .select(col("media_a"), col("media_b"), col("cos_sim"))
      .orderBy(col("media_a"), col("media_b"))
  }

  /** Full pipeline demo: synthesize → decode (stub kernel) →
    * feature aggregate per kind. The stub decode is deterministic byte
    * math, so the DuckDB oracle replays it exactly (hash-gated). */
  def decodePipelineQuery(spark: SparkSession, sfDir: String): DataFrame =
    decode(spark, syntheticMedia(spark, sfDir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        avg(col("width")).as("avg_width"),
        avg(col("n_frames")).as("avg_frames"))
      .orderBy(col("kind"))
}
