package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star pillar): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * Codec reality: image decode (PNG/JPEG via the JDK's own ImageIO —
  * [[decodeImages]]) and audio decode (PCM WAV — [[audioFrames]]) are
  * REAL, end to end, and ORACLED on analytically-constructed fixtures.
  * Only the generic [[decodeFeatures]] operator keeps a deterministic
  * byte-hash fallback (`FakeDecoder`) standing in for a model-style
  * embedding of payloads no shipped codec parses — the declared boundary
  * where an external model would plug in. Everything around the codec —
  * the schema contract, the per-partition batch iteration, the
  * repartitioning for decode parallelism, the flatMap frame explosion — is
  * the real 100 TB plumbing: decode is CPU-bound, so the operator
  * repartitions to spread payloads across executors and streams each
  * partition without materializing it.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  case class MediaMeta(
      modality: String, // image | audio | video
      width: Int,
      height: Int,
      sampleRate: Int,
      durationMs: Long
  )

  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      decode_ok: Boolean,
      features: Array[Float]
  )

  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, frame: Array[Byte])

  /** STUB decoder: a real build would call an image/audio codec here
    * (payload -> pixels/samples -> model features). This fake is
    * deterministic in the payload bytes so tests/pipelines are stable.
    */
  private[multimodal] object FakeDecoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L // large prime seed
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % dim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      // fold the running hash in so equal-length payloads still differ
      out((((h % dim) + dim) % dim).toInt) += (h & 0xFF) / 255.0f
      out
    }
  }

  /** Fabricate a deterministic media table from `documents` (payload =
    * UTF-8 bytes, metadata derived from doc fields) — the test stand-in for
    * a real binary ingest.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10).cast("long").as("durationMs")
      ).as("meta"),
      encode(col("text"), "UTF-8").as("payload")
    ).as[MediaRow]
  }

  /** Decode + feature-extract: repartition for decode parallelism, then a
    * streaming per-partition pass (mapPartitions — the decode boundary is
    * genuine imperative per-row work, SURVEY §7.4 preference (d)).
    */
  def decodeFeatures(
      media: Dataset[MediaRow],
      dim: Int = 16,
      parallelism: Option[Int] = None
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val repart = parallelism.map(media.repartition(_)).getOrElse(media)
    repart.mapPartitions { rows =>
      rows.map { r =>
        val ok = r.payload != null && r.payload.nonEmpty
        MediaFeatures(
          media_id = r.media_id,
          modality = r.meta.modality,
          n_bytes = if (r.payload == null) 0L else r.payload.length.toLong,
          decode_ok = ok,
          features =
            if (ok) FakeDecoder.features(r.payload, dim) else new Array[Float](dim)
        )
      }
    }
  }

  /** Frame sampling: one row per sampled frame (video/audio). STUB: frames
    * are fixed-size payload slices; the flatMap row-explosion shape is the
    * real operator.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = math.max(1, (r.meta.durationMs / math.max(everyMs, 1L)).toInt)
      val chunk = math.max(1, r.payload.length / n)
      (0 until math.min(n, r.payload.length)).map { i =>
        Frame(
          media_id = r.media_id,
          frame_idx = i,
          offset_ms = i * everyMs,
          frame = r.payload.slice(i * chunk, math.min((i + 1) * chunk, r.payload.length))
        )
      }
    }
  }

  /** Media featurization with REAL decodes end-to-end (this query was
    * the declared FakeDecoder stub until the codec layer caught up):
    * image payloads — gradient PNGs and constant-gray JPEGs written by
    * the JDK's own encoder — decode through ImageIO into the 64-d
    * block-mean thumbnail embedding; audio payloads (PCM sine tones)
    * decode into a per-frame RMS energy vector. The per-modality profile
    * is ORACLED on analytic expectations, each collapsed to a tolerance
    * boolean the oracle states as `true`:
    *   - PNG gradient (pixel = x mod 256) is y-invariant, so the top and
    *     bottom thumbnail rows must agree entry-wise, and the FIRST block
    *     mean is closed-form: (ceil(w/8) - 1) / 2;
    *   - constant-gray JPEG thumbnails must sit within DC-quantization
    *     distance (±3) of the source constant in EVERY entry;
    *   - tone frame RMS must sit within truncation tolerance of the
    *     analytic amplitude/√2 in every frame.
    * Row counts and feature dims are exact (a failed decode drops its
    * row and breaks the count). Shape at scale: map-only decode, one
    * per-media aggregate for audio frames, a modality-sized rollup.
    */
  def featureProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sfDir).documents
    val imgMedia = docs
      .where(col("doc_id") % 3 =!= 1)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 320 + 16).toInt
        val h = (id % 240 + 16).toInt
        BinaryMediaRow(id,
          if (id % 3 == 0) MediaCodec.makePng(w, h)
          else MediaCodec.makeJpegReal(w, h, gray = (id % 200 + 28).toInt))
      }
    val img = decodeImages(imgMedia)
      .where(col("decode_ok"))
      .select(col("media_id"),
        when(pmod(col("media_id"), lit(3)) === 0, lit("image_png"))
          .otherwise(lit("image_jpeg")).as("modality"),
        col("thumb").cast("array<double>").as("features"))
    val tones = docs
      .where(col("doc_id") % 3 === 1 && (col("n_chars") % 20) =!= 0)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nChars) =>
        BinaryMediaRow(id, MediaCodec.makeWavTone(
          16000, (nChars % 20) * 10, freqHz = 400.0 + (id % 5) * 200.0))
      }
    val aud = audioFrames(tones, everyMs = 50L, windowMs = 50L)
      .groupBy(col("media_id"))
      .agg(array_sort(collect_list(struct(col("frame_idx"), col("rms")))).as("fr"))
      .select(col("media_id"), lit("audio").as("modality"),
        expr("transform(fr, f -> f.rms)").as("features"))
    val toneRms = 0.5 / math.sqrt(2.0)
    val perMedia = img.unionByName(aud).withColumn("ok",
      when(col("modality") === "audio",
        expr(s"forall(features, v -> abs(v - $toneRms) < 0.02)"))
        .when(col("modality") === "image_jpeg",
          expr("forall(features, v -> abs(v - (media_id % 200 + 28)) < 3.0)"))
        .otherwise(
          expr("forall(sequence(0, 7), t -> " +
            "abs(element_at(features, t + 1) - element_at(features, 57 + t)) < 0.01)") &&
            abs(element_at(col("features"), 1) -
              (ceil((pmod(col("media_id"), lit(320)) + 16) / 8.0) - 1) / 2.0) < 0.01))
    perMedia.groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n"),
        min(size(col("features"))).as("dim_min"),
        max(size(col("features"))).as("dim_max"),
        min(col("ok")).as("features_ok"))
      .orderBy(col("modality"))
  }

  case class BinaryMediaRow(media_id: Long, payload: Array[Byte])

  /** Fabricate REAL container binaries (valid PNG / PCM WAV / JPEG header
    * streams — see [[MediaCodec]]) deterministically from document fields:
    * the test stand-in for a binary ingest whose payloads an engine can
    * actually parse. Dimension/duration arithmetic is mirrored verbatim by
    * the q_multimodal_probe oracle, which is what makes the PARSERS
    * oracle-checkable: Spark recovers the metadata from the bytes, DuckDB
    * recomputes it from the source integers, and the hashes must meet.
    */
  def mediaBinariesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[BinaryMediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nChars) =>
      val w = (id % 320 + 16).toInt
      val h = (id % 240 + 16).toInt
      val payload = (id % 3) match {
        case 0 => MediaCodec.makePng(w, h)
        case 1 => MediaCodec.makeWav(16000, (nChars % 20) * 10)
        case _ => MediaCodec.makeJpeg(w, h)
      }
      BinaryMediaRow(id, payload)
    }
  }

  case class AudioFrame(
      media_id: Long, frame_idx: Int, offset_ms: Long, n_samples: Int, rms: Double)

  /** REAL audio frame sampling: slice mono 16-bit PCM WAV payloads into
    * `windowMs` windows every `everyMs`, computing each window's RMS
    * energy from the actual samples — no stub anywhere on this path (PCM
    * is raw samples behind the RIFF header; [[MediaCodec.wavPcm16]] is a
    * genuine decode). flatMap at the codec boundary (SURVEY §7.4 (d)):
    * map-only, corpus never shuffles, frames explode ~duration/everyMs
    * rows per clip. Undecodable payloads yield no frames.
    */
  def audioFrames(
      media: Dataset[BinaryMediaRow],
      everyMs: Long,
      windowMs: Long): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val pcm = MediaCodec.wavPcm16(r.payload)
      if (pcm == null) Iterator.empty
      else {
        // sample rate from the header drives ms -> sample-index math
        val probe = MediaCodec.probeRow(r.payload)
        val rate = probe.getInt(3)
        val durMs = pcm.length.toLong * 1000 / rate
        Iterator.range(0, math.max(0, ((durMs + everyMs - 1) / everyMs)).toInt)
          .map { i =>
            val offMs = i * everyMs
            val from = (offMs * rate / 1000).toInt
            val until = ((offMs + windowMs) * rate / 1000).toInt
            AudioFrame(r.media_id, i, offMs,
              math.min(until, pcm.length) - from,
              MediaCodec.rmsEnergy(pcm, from, until))
          }
      }
    }
  }

  case class ImageFeatures(
      media_id: Long,
      decode_ok: Boolean,
      width: Int,
      height: Int,
      mean_luma: Double,
      thumb: Array[Float])

  /** REAL image decode via the JDK's own ImageIO (PNG/GIF/BMP decoders
    * ship with the JVM — no external codec library): pixels out, mean
    * luminance, and a deterministic 8×8 block-mean thumbnail (a real
    * 64-d image embedding, ANN-compatible — block means, not Graphics2D
    * scaling, because platform scalers aren't bit-stable). mapPartitions
    * at the codec boundary; undecodable payloads (e.g. a JPEG header
    * stream with no scan data) surface `decode_ok = false` instead of
    * failing the job — corrupt media is data at corpus scale.
    */
  def decodeImages(media: Dataset[BinaryMediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // memory-cached ImageIO streams: the default disk cache serializes
      // concurrent decodes through synchronized temp files (MediaCodec
      // doc) — once per task, before the first decode
      MediaCodec.imageIoMemoryCache
      rows.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null)
            ImageFeatures(r.media_id, decode_ok = false, -1, -1, -1.0,
              new Array[Float](64))
          else {
            val w = img.getWidth; val h = img.getHeight
            val raster = img.getRaster
            var sum = 0.0
            val thumb = new Array[Float](64)
            val counts = new Array[Int](64)
            var y = 0
            while (y < h) {
              val ty = y * 8 / h
              var x = 0
              while (x < w) {
                val v = raster.getSample(x, y, 0)
                sum += v
                val t = ty * 8 + (x * 8 / w)
                thumb(t) += v.toFloat; counts(t) += 1
                x += 1
              }
              y += 1
            }
            var t = 0
            while (t < 64) {
              if (counts(t) > 0) thumb(t) /= counts(t)
              t += 1
            }
            ImageFeatures(r.media_id, decode_ok = true, w, h,
              sum / (w.toLong * h), thumb)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            ImageFeatures(r.media_id, decode_ok = false, -1, -1, -1.0,
              new Array[Float](64))
        }
      }
    }
  }

  /** Oracled image pipeline over all three decode classes: PNGs carry
    * the analytic gradient (pixel = x mod 256), so the DECODED mean
    * luminance is recomputable by the oracle from dimension arithmetic
    * alone; two of every three JPEG rows are REAL JPEGs
    * ([[MediaCodec.makeJpegReal]] — the JDK's own encoder) whose
    * constant gray survives the lossy round-trip within ±1, checked as
    * a tolerance boolean; the remaining JPEG rows keep the undecodable
    * path hot (header stream, no scan data — corrupt media is data at
    * corpus scale). Decoded width/height — not the header's — prove
    * pixels actually came out.
    */
  def imageDecodeProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sfDir).documents
    // spread the synth+decode across cores: the generate/decode work is
    // per-row CPU (ImageIO encode + decode), and the single parquet
    // split upstream would otherwise run every image on one task.
    // Adaptive (Tables.spreadScan), not an unconditional repartition: on
    // a real cluster where the scan already has >= cores partitions this
    // must no-op rather than add a shuffle that DOWN-partitions the
    // decode stage.
    val media = graft.core.Tables.spreadScan(docs
      .where(col("doc_id") % 3 =!= 1)
      .select(col("doc_id")))
      .as[Long]
      .map { id =>
        val w = (id % 320 + 16).toInt
        val h = (id % 240 + 16).toInt
        BinaryMediaRow(id,
          if (id % 3 == 0) MediaCodec.makePng(w, h)
          else if (id % 9 == 8) MediaCodec.makeJpeg(w, h) // header-only
          else MediaCodec.makeJpegReal(w, h, gray = (id % 200 + 28).toInt))
      }
    decodeImages(media)
      .select(col("media_id"), col("decode_ok"), col("width"), col("height"),
        // exact only where the codec is lossless; JPEG means are checked
        // via the tolerance boolean below
        when(col("media_id") % 3 === 0, round(col("mean_luma"), 4))
          .as("mean_luma"),
        when(col("media_id") % 3 === 0 || !col("decode_ok"),
          lit(null).cast("boolean"))
          .otherwise(
            abs(col("mean_luma") - (col("media_id") % 200 + 28).cast("double")) < 3.0)
          .as("luma_ok"))
      .orderBy(col("media_id"))
  }

  /** Oracled audio pipeline: fabricate real sine-tone WAVs for the
    * audio-modality documents, frame-sample the real PCM, and check every
    * frame's measured RMS against the analytic sine RMS (amplitude/√2).
    * Frame counts are pure arithmetic over document fields (the oracle
    * recomputes them); the energy check collapses to a boolean with a
    * tolerance covering partial-cycle truncation.
    */
  def audioFrameProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sfDir).documents
    val tones = docs
      .where(col("doc_id") % 3 === 1 && (col("n_chars") % 20) =!= 0)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nChars) =>
        BinaryMediaRow(id, MediaCodec.makeWavTone(
          16000, (nChars % 20) * 10, freqHz = 400.0 + (id % 5) * 200.0))
      }
    val frames = audioFrames(tones, everyMs = 50L, windowMs = 50L)
    frames.groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        min((abs(col("rms") - lit(0.5 / math.sqrt(2.0))) < 0.02))
          .as("all_frames_tone_energy"))
      .orderBy(col("media_id"))
  }

  /** Oracled probe query: build real binaries, PARSE their headers back
    * with the codegen [[MediaProbe]] expression, emit per-row metadata.
    * Map-only end to end (no shuffle: fabricate -> probe -> project);
    * nullable metadata fields are sentinel-filled (-1) because the oracle
    * compare pivots through pandas, where nullable-int columns lose their
    * dtype.
    */
  def probeMetadata(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.core.Tables(spark, sfDir).documents
    mediaBinariesFromDocuments(spark, docs)
      .select(col("media_id"), MediaCodec.probe(col("payload")).as("m"))
      .select(
        col("media_id"),
        col("m.format").as("format"),
        coalesce(col("m.width"), lit(-1)).as("width"),
        coalesce(col("m.height"), lit(-1)).as("height"),
        coalesce(col("m.sample_rate"), lit(-1)).as("sample_rate"),
        coalesce(col("m.bits"), lit(-1)).as("bits"),
        coalesce(col("m.duration_ms"), lit(-1L)).as("duration_ms"))
      .orderBy(col("media_id"))
  }

  /** Oracled VIDEO-container probe (the fourth MediaProbe arm): fabricate
    * structurally valid ISO-BMFF/MP4 header streams ([[MediaCodec.makeMp4]]
    * — ftyp brand, version-0 mvhd timescale/duration, per-track tkhd with
    * 16.16 fixed-point dimensions) deterministically from document ints,
    * parse them back with the codegen [[MediaProbe]] box walk, and emit
    * the recovered metadata. Same contract as q_multimodal_probe: Spark
    * recovers the values from BYTES, DuckDB recomputes them from the
    * source integers, hashes must meet — so the box walk, the largesize/
    * to-EOF size rules, the fixed-point decode, and the timescale
    * arithmetic are all content-checked. Map-only end to end; durations
    * are chosen so ticks*1000/timescale is exact integer math in both
    * engines.
    */
  def videoProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sfDir).documents
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nChars) =>
        BinaryMediaRow(id, MediaCodec.makeMp4(
          width = (id % 640 + 32).toInt,
          height = (id % 360 + 32).toInt,
          timescale = 600,
          durationTicks = (nChars % 100) * 60,
          nTracks = (id % 3 + 1).toInt))
      }
      .select(col("media_id"), MediaCodec.probe(col("payload")).as("m"))
      .select(
        col("media_id"),
        col("m.format").as("format"),
        coalesce(col("m.width"), lit(-1)).as("width"),
        coalesce(col("m.height"), lit(-1)).as("height"),
        coalesce(col("m.tracks"), lit(-1)).as("tracks"),
        coalesce(col("m.duration_ms"), lit(-1L)).as("duration_ms"))
      .orderBy(col("media_id"))
  }

  /** Oracle-matched slice of the multimodal surface: byte-length profile of
    * the binary payloads (encode/octet_length agree across engines).
    */
  def payloadBytesProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.core.Tables(spark, sfDir).documents
    mediaFromDocuments(spark, docs)
      .select(col("media_id"), col("meta.modality").as("modality"),
        length(col("payload")).cast("bigint").as("n_bytes"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("modality"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> (featureProfile _),
    "q_multimodal_bytes" -> (payloadBytesProfile _),
    "q_multimodal_probe" -> (probeMetadata _),
    "q_video_probe" -> (videoProbe _),
    "q_audio_frames" -> (audioFrameProfile _),
    "q_image_decode" -> (imageDecodeProfile _)
  )

  def oracles: Map[String, String] = Map(
    "q_image_decode" ->
      """SELECT doc_id AS media_id,
        |  (doc_id % 3 = 0 OR doc_id % 9 IN (2, 5)) AS decode_ok,
        |  CAST(CASE WHEN doc_id % 3 = 0 OR doc_id % 9 IN (2, 5)
        |       THEN doc_id % 320 + 16 ELSE -1 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0 OR doc_id % 9 IN (2, 5)
        |       THEN doc_id % 240 + 16 ELSE -1 END AS INT) AS height,
        |  CASE WHEN doc_id % 3 != 0 THEN NULL
        |    -- closed-form mean of (x % 256) over x in [0, w): one full
        |    -- 0..255 ramp contributes 32640, the remainder is triangular
        |    WHEN doc_id % 320 + 16 <= 256 THEN
        |      round((doc_id % 320 + 16 - 1) / 2.0, 4)
        |    ELSE round(
        |      (32640 + (doc_id % 320 + 16 - 257) * (doc_id % 320 + 16 - 256) / 2.0)
        |        / (doc_id % 320 + 16), 4)
        |  END AS mean_luma,
        |  CASE WHEN doc_id % 9 IN (2, 5) THEN true ELSE NULL END AS luma_ok
        |FROM documents WHERE doc_id % 3 != 1 ORDER BY media_id""".stripMargin,
    "q_audio_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(((n_chars % 20) * 10 + 49) // 50 AS BIGINT) AS n_frames,
        |  true AS all_frames_tone_energy
        |FROM documents
        |WHERE doc_id % 3 = 1 AND (n_chars % 20) != 0
        |ORDER BY media_id""".stripMargin,
    "q_multimodal_probe" ->
      """SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS format,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN -1 ELSE doc_id % 320 + 16 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN -1 ELSE doc_id % 240 + 16 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE -1 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 16 ELSE 8 END AS INT) AS bits,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN (n_chars % 20) * 10 ELSE -1 END AS BIGINT) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
    // the writer fabricates from (doc_id, n_chars); the oracle replays
    // the same integer arithmetic, so the parser's box walk and the
    // 16.16 / timescale decodes are content-checked
    "q_video_probe" ->
      """SELECT doc_id AS media_id, 'mp4' AS format,
        |  CAST(doc_id % 640 + 32 AS INT) AS width,
        |  CAST(doc_id % 360 + 32 AS INT) AS height,
        |  CAST(doc_id % 3 + 1 AS INT) AS tracks,
        |  CAST((n_chars % 100) * 100 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_multimodal_bytes" ->
      """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        | count(*) AS n, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_multimodal_features" ->
      """WITH m AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image_png'
        |              WHEN doc_id % 3 = 2 THEN 'image_jpeg'
        |              ELSE 'audio' END AS modality,
        |         CASE WHEN doc_id % 3 = 1
        |              THEN CAST(((n_chars % 20) * 10 + 49) // 50 AS INT)
        |              ELSE 64 END AS dim
        |  FROM documents
        |  WHERE doc_id % 3 != 1 OR (n_chars % 20) != 0)
        |SELECT modality, count(*) AS n,
        |  CAST(min(dim) AS INT) AS dim_min, CAST(max(dim) AS INT) AS dim_max,
        |  true AS features_ok
        |FROM m GROUP BY modality ORDER BY modality""".stripMargin
  )
}
