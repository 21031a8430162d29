package graft.multimodal

import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media-container header parsing over opaque `binary` columns — the
  * part of the multimodal pillar that needs no codec library, done from the
  * published container specs (PNG RFC 2083, JFIF/ISO 10918, RIFF/WAVE,
  * GIF89a, ISO/IEC 14496-12):
  *
  *   - PNG: 8-byte signature, IHDR width/height (big-endian)
  *   - JPEG: marker walk to the first SOF0/1/2 frame header
  *   - WAV: RIFF/WAVE chunk walk — `fmt ` (rate/channels/bits) + `data`
  *     size, duration derived from byte rate
  *   - GIF: GIF87a/89a logical-screen descriptor (little-endian)
  *   - MP4/ISO-BMFF: box walk (size/type, largesize + to-EOF rules) —
  *     ftyp brand, moov/mvhd timescale+duration, trak count, first
  *     tkhd's 16.16 fixed-point presentation dimensions
  *
  * Exposed as a Catalyst expression ([[MediaProbe]]) whose codegen is one
  * static call — pixel/sample DECODE (which genuinely needs a codec
  * library) stays behind the declared stub in [[Multimodal.FakeDecoder]],
  * but metadata extraction is production code: at 100 TB, probing headers
  * is a map-only scan that never shuffles and reads only the leading bytes
  * of each payload.
  *
  * The same object carries byte-exact WRITERS for each container (valid
  * CRCs, real deflate streams, real PCM bodies) used by tests and the
  * fabricated testdata table: parse(write(meta)) == meta is the pinned
  * contract, and the DuckDB oracle recomputes the metadata arithmetic
  * independently.
  */
object MediaCodec {

  // ---------- parsed-metadata row layout (see MediaProbe.dataType) ----------

  val probeSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    // ISO-BMFF only: number of trak boxes (appended last so positional
    // struct readers of the older fields stay valid)
    StructField("tracks", IntegerType, nullable = true)))

  private def row(
      format: String,
      width: java.lang.Integer = null,
      height: java.lang.Integer = null,
      sampleRate: java.lang.Integer = null,
      channels: java.lang.Integer = null,
      bits: java.lang.Integer = null,
      durationMs: java.lang.Long = null,
      tracks: java.lang.Integer = null): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), width, height, sampleRate, channels, bits,
      durationMs, tracks))

  // ---------- byte helpers ----------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  // ---------- parsers ----------

  /** Parse whatever container the payload starts with; `format = unknown`
    * (all metadata null) when no signature matches or the header is
    * truncated/corrupt. Never throws — malformed bytes are DATA at corpus
    * scale, not exceptions.
    */
  def probeRow(payload: Array[Byte]): InternalRow = {
    if (payload == null || payload.length < 4) return row("unknown")
    if (payload.length >= 8 && payload.take(8).sameElements(PngSig)) parsePng(payload)
    else if (u8(payload, 0) == 0xFF && u8(payload, 1) == 0xD8) parseJpeg(payload)
    else if (tag(payload, 0, "RIFF") && tag(payload, 8, "WAVE")) parseWav(payload)
    else if (tag(payload, 0, "GIF87a") || tag(payload, 0, "GIF89a")) parseGif(payload)
    else if (payload.length >= 12 && tag(payload, 4, "ftyp")) parseMp4(payload)
    else row("unknown")
  }

  /** ISO-BMFF / MP4 (ISO/IEC 14496-12): the file is a sequence of boxes
    * `size(4 BE) type(4) body`, with `size == 1` escaping to a 64-bit
    * largesize and `size == 0` meaning "to end of file". Identified by
    * the `ftyp` box leading the stream; the movie header (`moov/mvhd`,
    * version 0 or 1) carries timescale + duration, each `moov/trak`
    * counts a track, and the first track header (`tkhd`) with nonzero
    * dimensions supplies presentation width/height (16.16 fixed point).
    * Same never-throw contract as the other parsers.
    */
  private def parseMp4(b: Array[Byte]): InternalRow = {
    // generic box walk over [from, until): invokes f(type, bodyFrom,
    // bodyUntil) per box; returns false on a malformed size
    def walk(from: Long, until: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val size0 = be32(b, i.toInt)
        val typ = new String(b, i.toInt + 4, 4, "US-ASCII")
        var header = 8L
        val size =
          if (size0 == 1) {
            if (i + 16 > until) return false
            header = 16L
            (be32(b, i.toInt + 8) << 32) | be32(b, i.toInt + 12)
          } else if (size0 == 0) until - i
          else size0
        if (size < header || i + size > until) return false
        f(typ, i + header, i + size)
        i += size
      }
      true
    }
    var brand: String = null
    var timescale = -1L; var duration = -1L
    var tracks = 0
    var width = -1; var height = -1
    def parseMvhd(from: Long, until: Long): Unit = {
      if (until - from < 4) return
      val v = u8(b, from.toInt)
      // v0: creation(4) modification(4) timescale(4) duration(4)
      // v1: creation(8) modification(8) timescale(4) duration(8)
      if (v == 0 && until - from >= 20) {
        timescale = be32(b, from.toInt + 12)
        duration = be32(b, from.toInt + 16)
      } else if (v == 1 && until - from >= 32) {
        timescale = be32(b, from.toInt + 20)
        duration = (be32(b, from.toInt + 24) << 32) | be32(b, from.toInt + 28)
      }
    }
    def parseTkhd(from: Long, until: Long): Unit = {
      if (until - from < 4 || width > 0) return
      val v = u8(b, from.toInt)
      // width/height are the LAST 8 bytes of the tkhd body (16.16 fixed)
      val need = if (v == 1) 96L else 84L
      if (until - from >= need) {
        val w = (be32(b, (until - 8).toInt) >> 16).toInt
        val h = (be32(b, (until - 4).toInt) >> 16).toInt
        if (w > 0 && h > 0) { width = w; height = h }
      }
    }
    val ok = walk(0, b.length.toLong) {
      case ("ftyp", from, until) =>
        if (brand == null && until - from >= 4)
          brand = new String(b, from.toInt, 4, "US-ASCII")
      case ("moov", mFrom, mUntil) =>
        walk(mFrom, mUntil) {
          case ("mvhd", from, until) => parseMvhd(from, until)
          case ("trak", tFrom, tUntil) =>
            tracks += 1
            walk(tFrom, tUntil) {
              case ("tkhd", from, until) => parseTkhd(from, until)
              case _ => ()
            }: Unit
          case _ => ()
        }: Unit
      case _ => ()
    }
    if (!ok || brand == null || timescale <= 0) row("unknown")
    else {
      // ISO/IEC 14496-12 8.2.2.3: an all-ones duration means "duration
      // unknown" — v0's 0xFFFFFFFF and v1's 64-bit all-ones (-1 here)
      // are sentinels, not tick counts; degrade to null like the other
      // unknown fields instead of emitting a bogus (or negative) ms
      val unknownDuration = duration == 0xFFFFFFFFL || duration == -1L
      row("mp4",
        width = if (width > 0) Int.box(width) else null,
        height = if (height > 0) Int.box(height) else null,
        durationMs =
          if (unknownDuration) null else Long.box(duration * 1000L / timescale),
        tracks = tracks)
    }
  }

  private def parsePng(b: Array[Byte]): InternalRow = {
    // signature(8) | len(4) type(4)=IHDR | width(4) height(4) depth(1) color(1)
    if (b.length < 26 || !tag(b, 12, "IHDR")) row("unknown")
    else {
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) row("unknown")
      else row("png", width = w.toInt, height = h.toInt, bits = u8(b, 24))
    }
  }

  private def parseJpeg(b: Array[Byte]): InternalRow = {
    // SOI, then marker segments: 0xFF <type> <len16 incl itself>; dims live
    // in the first start-of-frame (SOF0 baseline / SOF1 / SOF2 progressive)
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return row("unknown") // lost marker sync
      var m = u8(b, i + 1)
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = u8(b, i + 1) } // fill bytes
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone markers
      else if (m == 0xD9) return row("unknown") // EOI before any SOF
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return row("unknown")
        if (m == 0xC0 || m == 0xC1 || m == 0xC2) {
          // precision(1) height(2) width(2) components(1)
          if (len < 8) return row("unknown")
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val comps = u8(b, i + 9)
          return row("jpeg", width = w, height = h, channels = comps,
            bits = u8(b, i + 4))
        }
        i += 2 + len
      }
    }
    row("unknown")
  }

  private def parseWav(b: Array[Byte]): InternalRow = {
    // RIFF(4) size(4) WAVE(4), then chunks: id(4) size(4 LE) body — walk to
    // collect fmt (rate/channels/bits) and data (payload size); chunk order
    // is unspecified by the RIFF spec, so don't assume fmt-then-data
    var i = 12
    var rate = -1; var channels = -1; var bits = -1; var dataSize = -1L
    while (i + 8 <= b.length && (rate < 0 || dataSize < 0)) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue) return row("unknown")
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return row("unknown")
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        bits = le16(b, i + 22)
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even offsets
    }
    if (rate <= 0 || channels <= 0 || bits <= 0) row("unknown")
    else {
      val byteRate = rate.toLong * channels * bits / 8
      val dur: java.lang.Long =
        if (dataSize >= 0 && byteRate > 0) dataSize * 1000L / byteRate else null
      row("wav", sampleRate = rate, channels = channels, bits = bits,
        durationMs = dur)
    }
  }

  private def parseGif(b: Array[Byte]): InternalRow =
    if (b.length < 10) row("unknown")
    else row("gif", width = le16(b, 6), height = le16(b, 8))

  // ---------- writers (valid containers, used by tests + fabricated data) ----------

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new CRC32
    parts.foreach(p => c.update(p))
    c.getValue
  }

  private def be32b(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le32b(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    be32b(data.length.toLong) ++ t ++ data ++ be32b(crc32(t, data))
  }

  /** A fully valid 8-bit grayscale PNG of the given dimensions (real
    * deflate stream, correct chunk CRCs) carrying a deterministic
    * horizontal gradient — pixel(x, y) = x mod 256 — so DECODED content
    * is analytically checkable, not just the header.
    */
  def makePng(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "png dims must be positive")
    val ihdr = be32b(width.toLong) ++ be32b(height.toLong) ++
      Array[Byte](8, 0, 0, 0, 0) // depth=8, color=grayscale, std methods
    // raw scanlines: filter byte 0 + the gradient row, deflated
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      val base = y * (width + 1) + 1 // skip the filter byte
      var x = 0
      while (x < width) { raw(base + x) = (x % 256).toByte; x += 1 }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf)
    d.end()
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", buf.take(n)) ++
      pngChunk("IEND", Array.empty)
  }

  /** A structurally valid JPEG header stream: SOI + JFIF APP0 + SOF0 with
    * the given dimensions + EOI. (No entropy-coded scan — dimensions and
    * marker syntax are real; pixel decode would need the full codec.)
    */
  def makeJpeg(width: Int, height: Int, channels: Int = 3): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF)
    val app0 = Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 16) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val comps = (1 to channels).flatMap(c =>
      Seq(c.toByte, 0x11.toByte, 0.toByte)).toArray
    val sofLen = 8 + 3 * channels
    val sof = Array[Byte](0xFF.toByte, 0xC0.toByte,
      ((sofLen >> 8) & 0xFF).toByte, (sofLen & 0xFF).toByte, 8) ++
      Array(((height >> 8) & 0xFF).toByte, (height & 0xFF).toByte,
        ((width >> 8) & 0xFF).toByte, (width & 0xFF).toByte,
        channels.toByte) ++ comps
    Array[Byte](0xFF.toByte, 0xD8.toByte) ++ app0 ++ sof ++
      Array[Byte](0xFF.toByte, 0xD9.toByte)
  }

  /** A REAL JPEG encoded by the JDK's own ImageIO writer (the JPEG codec
    * ships with the JVM, like the PNG one [[makePng]] hand-rolls): a
    * constant-gray image, which is DC-only after the DCT — at the
    * default quality the DC quantization step divides the level-shifted
    * coefficient exactly, so the decoded mean luminance stays within
    * IDCT-rounding distance (±1) of the source constant. That is the
    * analytic hook the decode oracle checks with tolerance; dimensions
    * survive the lossy round-trip exactly.
    */
  def makeJpegReal(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray >= 0 && gray <= 255)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    MediaCodec.imageIoMemoryCache
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "no JPEG ImageIO writer available")
    bos.toByteArray
  }

  /** ImageIO defaults to a DISK-backed stream cache: every
    * read/write-from-stream spools through a synchronized temp FILE,
    * which serializes (and thrashes) concurrent codec tasks — measured:
    * parallelizing q_image_decode across 32 cores made it SLOWER
    * (2.6 → 4.2 s) until this. Memory-cached streams are lock-free per
    * task and these payloads are small by contract (media cells, not
    * whole videos). JVM-global, applied lazily from every codec task so
    * each executor JVM gets it.
    *
    * CAVEAT (public contract): `ImageIO.setUseCache` is a JVM-wide
    * switch — every other ImageIO user in the same executor JVM
    * (including user UDFs decoding large images from streams) switches
    * to fully memory-buffered stream caches too. That is the right
    * default for an analytics executor; a deployment decoding huge
    * images elsewhere in the same JVM can opt out with
    * `-Dgraft.imageio.memoryCache=false` (the codec then runs with the
    * platform default disk cache, correct but slower under concurrency).
    */
  lazy val imageIoMemoryCache: Unit =
    if (java.lang.Boolean.parseBoolean(
        System.getProperty("graft.imageio.memoryCache", "true")))
      javax.imageio.ImageIO.setUseCache(false)

  /** A fully valid PCM WAV: RIFF/WAVE + fmt + data of silence sized to the
    * requested duration.
    */
  def makeWav(
      sampleRate: Int,
      durationMs: Long,
      channels: Int = 1,
      bits: Int = 16): Array[Byte] = {
    require(sampleRate > 0 && durationMs >= 0 && channels > 0 && bits % 8 == 0)
    val byteRate = sampleRate.toLong * channels * bits / 8
    val dataSize = (durationMs * byteRate / 1000L).toInt
    val fmt = le16b(1) ++ le16b(channels) ++ le32b(sampleRate.toLong) ++
      le32b(byteRate) ++ le16b(channels * bits / 8) ++ le16b(bits)
    val riffSize = 4 + (8 + fmt.length) + (8 + dataSize)
    "RIFF".getBytes("US-ASCII") ++ le32b(riffSize.toLong) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32b(fmt.length.toLong) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32b(dataSize.toLong) ++
      new Array[Byte](dataSize)
  }

  /** A fully valid PCM WAV carrying a REAL sine tone (not silence) — the
    * fixture for genuine audio feature extraction: PCM is uncompressed,
    * so slicing and energy math need no codec library.
    */
  def makeWavTone(
      sampleRate: Int,
      durationMs: Long,
      freqHz: Double,
      amplitude: Double = 0.5): Array[Byte] = {
    require(amplitude >= 0 && amplitude <= 1.0)
    val silent = makeWav(sampleRate, durationMs, channels = 1, bits = 16)
    // find the data chunk and overwrite its silence with the tone
    val dataOff = {
      var i = 12
      while (!tag(silent, i, "data")) i += 8 + le32(silent, i + 4).toInt +
        (le32(silent, i + 4).toInt & 1)
      i + 8
    }
    val nSamples = (silent.length - dataOff) / 2
    var s = 0
    while (s < nSamples) {
      val v = (amplitude * Short.MaxValue *
        math.sin(2 * math.Pi * freqHz * s / sampleRate)).toInt
      silent(dataOff + 2 * s) = (v & 0xFF).toByte
      silent(dataOff + 2 * s + 1) = ((v >> 8) & 0xFF).toByte
      s += 1
    }
    silent
  }

  /** Decode a mono 16-bit PCM WAV payload into samples — a REAL decode
    * (PCM is raw samples behind the RIFF header), scoped to the one
    * format this container parses without codec libraries. Returns null
    * for anything else; callers treat that as an undecodable payload.
    */
  def wavPcm16(payload: Array[Byte]): Array[Short] = {
    if (payload == null || payload.length < 44 ||
      !tag(payload, 0, "RIFF") || !tag(payload, 8, "WAVE")) return null
    var i = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= payload.length && (rate < 0 || dataOff < 0)) {
      val size = le32(payload, i + 4).toInt
      if (size < 0) return null
      if (tag(payload, i, "fmt ")) {
        if (size < 16 || i + 24 > payload.length) return null
        channels = le16(payload, i + 10)
        rate = le32(payload, i + 12).toInt
        bits = le16(payload, i + 22)
      } else if (tag(payload, i, "data")) {
        dataOff = i + 8
        dataLen = math.min(size, payload.length - dataOff)
      }
      i += 8 + size + (size & 1)
    }
    if (rate <= 0 || channels != 1 || bits != 16 || dataOff < 0) return null
    val n = dataLen / 2
    val out = new Array[Short](n)
    var s = 0
    while (s < n) {
      out(s) = ((payload(dataOff + 2 * s) & 0xFF) |
        (payload(dataOff + 2 * s + 1) << 8)).toShort
      s += 1
    }
    out
  }

  /** Root-mean-square energy of a PCM slice, normalized to [0, 1]. */
  def rmsEnergy(samples: Array[Short], from: Int, until: Int): Double = {
    val lo = math.max(0, from); val hi = math.min(samples.length, until)
    if (hi <= lo) return 0.0
    var acc = 0.0
    var i = lo
    while (i < hi) { val v = samples(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc / (hi - lo)) / Short.MaxValue
  }

  /** A minimal valid GIF89a (logical screen only + trailer). */
  def makeGif(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF)
    "GIF89a".getBytes("US-ASCII") ++ le16b(width) ++ le16b(height) ++
      Array[Byte](0, 0, 0, 0x3B.toByte)
  }

  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    be32b((8 + body.length).toLong) ++ typ.getBytes("US-ASCII") ++ body

  /** A structurally valid ISO-BMFF / MP4 header stream: `ftyp` (isom) +
    * `moov` holding a version-0 `mvhd` (given timescale/duration) and
    * `nTracks` `trak` boxes, the first carrying a `tkhd` with the given
    * 16.16 fixed-point presentation dimensions. Standard full boxes with
    * unity matrix and zeroed reserved fields — spec-shaped bytes, no
    * media data (`mdat` needs a codec; metadata is the probe's job).
    */
  def makeMp4(
      width: Int, height: Int, timescale: Int, durationTicks: Long,
      nTracks: Int = 1): Array[Byte] = {
    require(width > 0 && height > 0 && timescale > 0 && durationTicks >= 0 &&
      nTracks >= 1)
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32b(0x200L) ++
        "isom".getBytes("US-ASCII") ++ "mp42".getBytes("US-ASCII"))
    val matrix = // unity transform: 0x00010000, 0, 0 / 0, 0x00010000, 0 / 0, 0, 0x40000000
      be32b(0x10000L) ++ be32b(0) ++ be32b(0) ++
        be32b(0) ++ be32b(0x10000L) ++ be32b(0) ++
        be32b(0) ++ be32b(0) ++ be32b(0x40000000L)
    val mvhd = box("mvhd",
      be32b(0) ++                       // version 0 + flags
        be32b(0) ++ be32b(0) ++         // creation, modification
        be32b(timescale.toLong) ++ be32b(durationTicks) ++
        be32b(0x10000L) ++              // rate 1.0
        Array[Byte](1, 0) ++            // volume 1.0
        new Array[Byte](2 + 8) ++       // reserved
        matrix ++ new Array[Byte](24) ++ // pre_defined
        be32b((nTracks + 1).toLong))    // next_track_ID
    def tkhd(id: Int, w: Int, h: Int) = box("tkhd",
      be32b(7L) ++                      // version 0 + flags (enabled|in movie|in preview)
        be32b(0) ++ be32b(0) ++         // creation, modification
        be32b(id.toLong) ++ be32b(0) ++ // track_ID, reserved
        be32b(durationTicks) ++
        new Array[Byte](8 + 2 + 2 + 2 + 2) ++ // reserved, layer, group, volume, reserved
        matrix ++
        be32b(w.toLong << 16) ++ be32b(h.toLong << 16)) // 16.16 fixed
    val traks = (1 to nTracks).map { i =>
      box("trak", tkhd(i, if (i == 1) width else 0, if (i == 1) height else 0))
    }
    ftyp ++ box("moov", mvhd ++ traks.reduce(_ ++ _))
  }

  // ---------- column surface ----------

  /** `media_probe(payload)`: parsed container metadata struct. */
  def probe(payload: Column): Column =
    GraftBridge.column(MediaProbe(GraftBridge.expression(payload)))
}

/** Catalyst expression wrapping [[MediaCodec.probeRow]]: map-only, null-safe,
  * codegen = one static call (the parser is branchy imperative byte work —
  * inlining it into generated Java would bloat the method past the JIT
  * threshold for zero gain).
  */
case class MediaProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaCodec.probeSchema
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"media_probe needs BINARY input, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(payload: Any): Any =
    MediaCodec.probeRow(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.multimodal.MediaCodec.probeRow($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaProbe =
    copy(child = newChild)
}
