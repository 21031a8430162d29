package graft.multimodal

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  private def probeOne(payload: Array[Byte]) =
    Seq(Tuple1(payload)).toDF("p")
      .select(MediaCodec.probe(col("p")).as("m")).select("m.*").head

  test("png round-trip: write(w,h) parses back exactly") {
    for ((w, h) <- Seq((1, 1), (16, 240), (320, 16), (335, 255))) {
      val r = probeOne(MediaCodec.makePng(w, h))
      assert(r.getString(0) === "png")
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getInt(5) === 8) // bit depth
      assert(r.isNullAt(3) && r.isNullAt(6)) // no sample rate / duration
    }
  }

  test("generated png is a fully valid image (independent decoder agrees)") {
    // ImageIO ships with the JDK — an independent decode proves the writer
    // emits a REAL container (CRCs, deflate stream), not just magic bytes
    val img = ImageIO.read(new java.io.ByteArrayInputStream(MediaCodec.makePng(37, 23)))
    assert(img != null, "JDK ImageIO failed to decode the generated PNG")
    assert(img.getWidth === 37 && img.getHeight === 23)
  }

  test("real jpeg round-trip: ImageIO encode -> decode recovers dims and constant gray within DC tolerance") {
    val bytes = MediaCodec.makeJpegReal(41, 29, gray = 137)
    // the probe's own marker walk sees a genuine JFIF stream
    val r = probeOne(bytes)
    assert(r.getString(0) === "jpeg")
    assert(r.getInt(1) === 41 && r.getInt(2) === 29)
    // and a full pixel decode comes back: constant image is DC-only, so
    // the decoded values sit within IDCT rounding of the source constant
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO failed to decode its own JPEG")
    assert(img.getWidth === 41 && img.getHeight === 29)
    var sum = 0.0
    for (y <- 0 until 29; x <- 0 until 41) sum += img.getRaster.getSample(x, y, 0)
    val mean = sum / (41 * 29)
    assert(math.abs(mean - 137.0) < 2.0, s"decoded mean $mean drifted from 137")
  }

  test("jpeg round-trip: SOF dims and precision parse back") {
    val r = probeOne(MediaCodec.makeJpeg(640, 480))
    assert(r.getString(0) === "jpeg")
    assert(r.getInt(1) === 640 && r.getInt(2) === 480)
    assert(r.getInt(4) === 3 && r.getInt(5) === 8) // channels, precision
  }

  test("jpeg parser skips unrelated segments and fill bytes before SOF") {
    val base = MediaCodec.makeJpeg(100, 50)
    // splice a COM segment and a fill byte after SOI (offset 2)
    val com = Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFE.toByte, 0, 5, 'h', 'i', '!')
    val spliced = base.take(2) ++ com ++ base.drop(2)
    val r = probeOne(spliced)
    assert(r.getString(0) === "jpeg")
    assert(r.getInt(1) === 100 && r.getInt(2) === 50)
  }

  test("wav round-trip: rate, channels, bits, duration from data size") {
    val r = probeOne(MediaCodec.makeWav(44100, 250L, channels = 2, bits = 16))
    assert(r.getString(0) === "wav")
    assert(r.getInt(3) === 44100 && r.getInt(4) === 2 && r.getInt(5) === 16)
    assert(r.getLong(6) === 250L)
    assert(r.isNullAt(1) && r.isNullAt(2)) // no dims
  }

  test("wav parser walks odd-sized chunks with pad bytes") {
    // insert a LIST chunk of odd size 3 (padded to 4) before fmt
    val wav = MediaCodec.makeWav(8000, 10L)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('x', 'y', 'z', 0)
    val spliced = wav.take(12) ++ list ++ wav.drop(12)
    val r = probeOne(spliced)
    assert(r.getString(0) === "wav" && r.getInt(3) === 8000 && r.getLong(6) === 10L)
  }

  test("gif round-trip") {
    val r = probeOne(MediaCodec.makeGif(12, 34))
    assert(r.getString(0) === "gif" && r.getInt(1) === 12 && r.getInt(2) === 34)
  }

  test("mp4 round-trip: ftyp + mvhd timescale/duration + tkhd dims + track count") {
    val r = probeOne(MediaCodec.makeMp4(
      width = 640, height = 360, timescale = 600, durationTicks = 3000, nTracks = 2))
    assert(r.getString(0) === "mp4")
    assert(r.getInt(1) === 640 && r.getInt(2) === 360)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)) // no audio fields
    assert(r.getLong(6) === 5000L) // 3000 ticks / 600 tps = 5 s
    assert(r.getInt(7) === 2)
    // a zero-length movie and a single track parse too
    val r2 = probeOne(MediaCodec.makeMp4(16, 16, 1000, 0L))
    assert(r2.getString(0) === "mp4" && r2.getLong(6) === 0L && r2.getInt(7) === 1)
  }

  test("mp4 parser handles largesize and to-end-of-file box sizes") {
    val normal = MediaCodec.makeMp4(100, 50, 600, 1200L, nTracks = 1)
    // rewrite the leading ftyp box to use size==1 + 64-bit largesize
    val ftypLen = ((normal(0) & 0xFF) << 24) | ((normal(1) & 0xFF) << 16) |
      ((normal(2) & 0xFF) << 8) | (normal(3) & 0xFF)
    val ftypBody = normal.slice(8, ftypLen)
    val large = Array[Byte](0, 0, 0, 1) ++ "ftyp".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, (16 + ftypBody.length).toByte) ++
      ftypBody ++ normal.drop(ftypLen)
    val r = probeOne(large)
    assert(r.getString(0) === "mp4" && r.getInt(1) === 100 && r.getLong(6) === 2000L)
    // size==0 (to EOF) on the LAST top-level box (moov)
    val zeroLast = normal.clone()
    zeroLast(ftypLen) = 0; zeroLast(ftypLen + 1) = 0
    zeroLast(ftypLen + 2) = 0; zeroLast(ftypLen + 3) = 0
    val r2 = probeOne(zeroLast)
    assert(r2.getString(0) === "mp4" && r2.getInt(7) === 1)
  }

  test("malformed payloads degrade to unknown, never throw") {
    val cases = Seq[Array[Byte]](
      Array.empty,
      Array[Byte](1, 2, 3),
      "not media at all, just text bytes".getBytes("UTF-8"),
      MediaCodec.makePng(5, 5).take(20), // truncated inside IHDR
      MediaCodec.makeWav(8000, 10L).take(16), // truncated before fmt body
      MediaCodec.makeJpeg(9, 9).take(3), // SOI + half marker
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte), // SOI+EOI only
      MediaCodec.makeMp4(8, 8, 600, 600L).take(30), // truncated inside moov
      // ftyp with a size lying past EOF
      Array[Byte](0, 0, 0x40, 0) ++ "ftyp".getBytes("US-ASCII") ++ new Array[Byte](8)
    )
    cases.foreach { p =>
      val r = probeOne(p)
      assert(r.getString(0) === "unknown", s"payload len ${p.length}")
      (1 to 7).foreach(i => assert(r.isNullAt(i)))
    }
    val nullRow = Seq(Tuple1(null: Array[Byte])).toDF("p")
      .select(MediaCodec.probe(col("p")).as("m")).head
    assert(nullRow.isNullAt(0)) // null payload -> null struct (null-safe expr)
  }

  test("wavPcm16 is a real decode: tone samples match the analytic sine") {
    val rate = 8000
    val wav = MediaCodec.makeWavTone(rate, 100L, freqHz = 440.0, amplitude = 0.5)
    val pcm = MediaCodec.wavPcm16(wav)
    assert(pcm != null && pcm.length === rate / 10)
    // spot-check a few samples against the generator formula
    Seq(0, 17, 399).foreach { i =>
      val expect = (0.5 * Short.MaxValue * math.sin(2 * math.Pi * 440 * i / rate)).toInt
      assert(pcm(i) === expect.toShort, s"sample $i")
    }
    // sine RMS = amplitude / sqrt(2), within partial-cycle tolerance
    val rms = MediaCodec.rmsEnergy(pcm, 0, pcm.length)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms $rms")
    // silence decodes to zero energy
    val silent = MediaCodec.wavPcm16(MediaCodec.makeWav(8000, 50L))
    assert(MediaCodec.rmsEnergy(silent, 0, silent.length) === 0.0)
    // stereo / non-16-bit / non-wav refuse instead of mis-decoding
    assert(MediaCodec.wavPcm16(MediaCodec.makeWav(8000, 10L, channels = 2)) === null)
    assert(MediaCodec.wavPcm16(MediaCodec.makePng(4, 4)) === null)
  }

  test("audio frame sampling slices real PCM at the right offsets") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    // 130ms tone -> frames at 0/50/100ms; last frame holds 30ms of samples
    val media = Seq(Multimodal.BinaryMediaRow(
      7L, MediaCodec.makeWavTone(16000, 130L, 500.0))).toDS()
    val frames = Multimodal.audioFrames(media, everyMs = 50L, windowMs = 50L)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.offset_ms, f.n_samples)).toSeq ===
      Seq((0, 0L, 800), (1, 50L, 800), (2, 100L, 480)))
    frames.foreach(f =>
      assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.02, s"frame $f"))
    // a non-audio payload yields no frames
    val none = Multimodal.audioFrames(
      Seq(Multimodal.BinaryMediaRow(8L, MediaCodec.makePng(5, 5))).toDS(), 50L, 50L)
    assert(none.count() === 0)
  }

  test("interpreted and codegen paths agree") {
    val payloads = Seq(
      MediaCodec.makePng(31, 17), MediaCodec.makeWav(16000, 40L),
      MediaCodec.makeJpeg(20, 10), MediaCodec.makeGif(3, 4),
      Array[Byte](9, 9, 9, 9, 9))
    val df = payloads.map(Tuple1(_)).toDF("p")
      .select(MediaCodec.probe(col("p")).as("m")).select("m.*")
    val codegen = df.collect().map(_.toSeq)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.collect().map(_.toSeq)
      assert(codegen.toSeq === interp.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("probe query plan is map-only (no Exchange) and rows look right") {
    val df = Multimodal.probeMetadata(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      (id % 3) match {
        case 0 =>
          assert(r.getString(1) === "png")
          assert(r.getInt(2) === (id % 320 + 16).toInt)
        case 1 =>
          assert(r.getString(1) === "wav" && r.getInt(4) === 16000)
        case _ =>
          assert(r.getString(1) === "jpeg")
          assert(r.getInt(3) === (id % 240 + 16).toInt)
      }
    }
    // fabricate -> probe -> project sorts once for output determinism but
    // must not shuffle for the probe itself: strip the final orderBy and
    // assert the remaining plan is Exchange-free
    val unordered = Multimodal.mediaBinariesFromDocuments(
      spark, graft.core.Tables(spark, sf0001).documents)
      .select(MediaCodec.probe(col("payload")).as("m"))
    unordered.collect()
    val plan = unordered.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe path must be map-only:\n$plan")
  }
}
