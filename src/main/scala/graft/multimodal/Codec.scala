package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM media codecs — no external libraries, stdlib byte-twiddling
  * only. Formats chosen because they are fully decodable without native
  * codec dependencies:
  *
  *   - PPM (P6, binary, maxval 255): images,
  *   - BMP (24-bit uncompressed BI_RGB): video keyframes,
  *   - WAV (RIFF, PCM 16-bit): audio.
  *
  * Decoders parse the real container bytes (magic, headers, padding,
  * bottom-up row order, chunk walks) and fail loudly on malformed input —
  * a corrupt blob must surface, not produce garbage features. Encoders
  * exist for the synthetic corpus and test fixtures.
  *
  * Feature extraction is deliberately EXACT integer arithmetic ending in a
  * k/1000 rational (engine-reproducible to fixed decimal precision):
  *   - images: `bins`-lane luminance histogram, lane = count*1000/npix,
  *   - audio: `segments`-lane mean-|amplitude| profile,
  *     lane = sumAbs*1000/(count*32768).
  */
object Codec {

  /** Decoded raster: packed RGB, row-major, top-down. */
  final case class ImagePixels(width: Int, height: Int, rgb: Array[Byte]) {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"pixel buffer ${rgb.length} != 3*$width*$height")
  }

  /** Decoded PCM audio (interleaved if multi-channel). */
  final case class AudioPcm(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(sampleRate > 0, s"bad sampleRate $sampleRate")
    require(channels > 0, s"bad channels $channels")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"codec: $msg")

  // ---- PPM (P6) -----------------------------------------------------------

  /** Encode as binary PPM: `P6\n<w> <h>\n255\n` + raw RGB. */
  def encodePpm(img: ImagePixels): Array[Byte] = {
    val header =
      s"P6\n${img.width} ${img.height}\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Decode binary PPM: tolerant of `#` comments and any whitespace runs in
    * the header (the format allows both); maxval must be 255 (8-bit).
    */
  def decodePpm(bytes: Array[Byte]): ImagePixels = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("not a P6 PPM")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#'-to-EOL comments
      var done = false
      while (!done) {
        while (pos < bytes.length && Character.isWhitespace(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else done = true
      }
      if (pos >= bytes.length) fail("truncated PPM header")
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
        if (v > (1 << 24)) fail("absurd PPM header value")
      }
      if (!any) fail(s"expected integer at offset $pos")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (maxval != 255) fail(s"unsupported PPM maxval $maxval (want 255)")
    // exactly ONE whitespace byte separates header from raster
    if (pos >= bytes.length || !Character.isWhitespace(bytes(pos))) fail("missing raster separator")
    pos += 1
    val need = 3 * w * h
    if (bytes.length - pos < need) fail(s"PPM raster short: ${bytes.length - pos} < $need")
    val rgb = java.util.Arrays.copyOfRange(bytes, pos, pos + need)
    ImagePixels(w, h, rgb)
  }

  // ---- BMP (24-bit BI_RGB) ------------------------------------------------

  private def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode as 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
    * BGR byte order, rows padded to 4 bytes).
    */
  def encodeBmp(img: ImagePixels): Array[Byte] = {
    val rs = rowSize(img.width)
    val dataSize = rs * img.height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(img.width).putInt(img.height)
    buf.putShort(1).putShort(24).putInt(0).putInt(dataSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < img.width) {
        val p = 3 * (y * img.width + x)
        buf.put(img.rgb(p + 2)).put(img.rgb(p + 1)).put(img.rgb(p)) // BGR
        x += 1
      }
      var pad = rs - 3 * img.width
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode 24-bit uncompressed BMP; honors the header's pixel-data offset,
    * row padding, and both bottom-up (h>0) and top-down (h<0) row orders.
    */
  def decodeBmp(bytes: Array[Byte]): ImagePixels = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') fail("not a BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (bpp != 24) fail(s"unsupported BMP bpp $bpp (want 24)")
    if (compression != 0) fail(s"unsupported BMP compression $compression (want BI_RGB)")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) fail(s"bad BMP dims ${w}x$hRaw")
    val rs = rowSize(w)
    if (bytes.length - dataOffset < rs * h)
      fail(s"BMP raster short: ${bytes.length - dataOffset} < ${rs * h}")
    val rgb = new Array[Byte](3 * w * h)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val src = dataOffset + srcRow * rs
      var x = 0
      while (x < w) {
        val d = 3 * (row * w + x)
        rgb(d) = bytes(src + 3 * x + 2)     // R
        rgb(d + 1) = bytes(src + 3 * x + 1) // G
        rgb(d + 2) = bytes(src + 3 * x)     // B
        x += 1
      }
      row += 1
    }
    ImagePixels(w, h, rgb)
  }

  // ---- WAV (RIFF PCM16) ---------------------------------------------------

  /** Encode as canonical 44-byte-header RIFF/WAVE, PCM 16-bit LE. */
  def encodeWav(a: AudioPcm): Array[Byte] = {
    val dataSize = 2 * a.samples.length
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataSize)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    buf.putShort(1).putShort(a.channels.toShort).putInt(a.sampleRate)
    buf.putInt(a.sampleRate * 2 * a.channels).putShort((2 * a.channels).toShort).putShort(16)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize)
    var i = 0
    while (i < a.samples.length) { buf.putShort(a.samples(i)); i += 1 }
    buf.array()
  }

  /** Decode RIFF/WAVE by walking chunks to `fmt ` and `data` (extra chunks
    * like LIST are skipped, as a real reader must); PCM 16-bit only.
    */
  def decodeWav(bytes: Array[Byte]): AudioPcm = {
    def ascii(off: Int, n: Int) = new String(bytes, off, n, StandardCharsets.US_ASCII)
    if (bytes.length < 44 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      fail("not a RIFF/WAVE file")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = ascii(pos, 4)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) fail(s"bad WAV chunk '$id' size $size")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small: $size")
          val fmt = buf.getShort(pos + 8)
          if (fmt != 1) fail(s"unsupported WAV format $fmt (want PCM)")
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
          if (bits != 16) fail(s"unsupported WAV bit depth $bits (want 16)")
        case "data" =>
          dataOff = pos + 8; dataLen = size
        case _ => () // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate < 0) fail("WAV missing fmt chunk")
    if (dataOff < 0) fail("WAV missing data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(dataOff + 2 * i); i += 1 }
    AudioPcm(sampleRate, channels, samples)
  }

  // ---- features (exact integer arithmetic -> k/1000 rationals) ------------

  /** `bins`-lane luminance histogram: lum = (r+g+b)/3 in 0..255, lane
    * j = lum*bins/256, value = count_j*1000/npix / 1000 — each lane an
    * exact per-mille fraction of pixels.
    */
  def lumaHistogram(img: ImagePixels, bins: Int): Array[Float] = {
    val counts = new Array[Long](bins)
    val npix = img.width * img.height
    var p = 0
    while (p < img.rgb.length) {
      val r = img.rgb(p) & 0xff; val g = img.rgb(p + 1) & 0xff; val b = img.rgb(p + 2) & 0xff
      val lum = (r + g + b) / 3
      counts(lum * bins / 256) += 1
      p += 3
    }
    val out = new Array[Float](bins)
    var j = 0
    while (j < bins) { out(j) = (counts(j) * 1000L / npix) / 1000.0f; j += 1 }
    out
  }

  /** `segments`-lane mean-|amplitude| profile: sample i lands in segment
    * i*segments/n, value = sumAbs_j*1000/(count_j*32768) / 1000 — exact
    * per-mille of full scale; empty segments are 0.
    */
  def energyProfile(a: AudioPcm, segments: Int): Array[Float] = {
    val sums = new Array[Long](segments)
    val counts = new Array[Long](segments)
    val n = a.samples.length
    var i = 0
    while (i < n) {
      val seg = (i.toLong * segments / n).toInt
      sums(seg) += math.abs(a.samples(i).toLong)
      counts(seg) += 1
      i += 1
    }
    val out = new Array[Float](segments)
    var j = 0
    while (j < segments) {
      out(j) = if (counts(j) == 0) 0.0f
      else (sums(j) * 1000L / (counts(j) * 32768L)) / 1000.0f
      j += 1
    }
    out
  }

  /** Sniff the container by magic bytes — the decode dispatch trusts the
    * BYTES, not the declared `kind` (a mislabelled blob must decode as what
    * it is or fail, never be misparsed).
    */
  /** A decoded multi-frame video: monochrome luma planes on a fixed
    * raster (one byte per pixel, row-major), one plane per keyframe.
    */
  final case class VideoFrames(width: Int, height: Int, frames: Array[Array[Byte]])

  /** Encode mono keyframes as YUV4MPEG2 (`Cmono`) — the uncompressed
    * video container (header line, then `FRAME\n` + one w*h luma plane
    * per frame). Real format, trivially seekable, and mono planes ARE
    * the luminance the perceptual hashes sample — no colorspace matrix
    * between container bytes and hash bits.
    */
  def encodeY4mMono(v: VideoFrames): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F25:1 Ip A1:1 Cmono\n"
        .getBytes(StandardCharsets.US_ASCII)
    val frameMarker = "FRAME\n".getBytes(StandardCharsets.US_ASCII)
    val planeSize = v.width * v.height
    val out = new Array[Byte](
      header.length + v.frames.length * (frameMarker.length + planeSize))
    var off = 0
    System.arraycopy(header, 0, out, off, header.length); off += header.length
    v.frames.foreach { f =>
      require(f.length == planeSize,
        s"y4m encode: frame plane ${f.length} != $planeSize")
      System.arraycopy(frameMarker, 0, out, off, frameMarker.length)
      off += frameMarker.length
      System.arraycopy(f, 0, out, off, planeSize); off += planeSize
    }
    out
  }

  def decodeY4mMono(bytes: Array[Byte]): VideoFrames = {
    var off = 0
    def line(): String = {
      val start = off
      while (off < bytes.length && bytes(off) != '\n') off += 1
      if (off >= bytes.length) fail("y4m: unterminated header line")
      off += 1
      new String(bytes, start, off - 1 - start, StandardCharsets.US_ASCII)
    }
    val header = line()
    val tokens = header.split(" ")
    if (tokens.isEmpty || tokens(0) != "YUV4MPEG2") fail("y4m: bad magic")
    var w = -1
    var h = -1
    var cs = "C420jpeg" // the y4m default when no C token is present
    tokens.tail.foreach { t =>
      if (t.startsWith("W")) w = t.drop(1).toInt
      else if (t.startsWith("H")) h = t.drop(1).toInt
      else if (t.startsWith("C")) cs = t
    }
    if (w <= 0 || h <= 0) fail(s"y4m: bad dims ${w}x$h")
    if (cs != "Cmono") fail(s"y4m: only Cmono is supported, got $cs")
    val planeSize = w * h
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (off < bytes.length) {
      val marker = line()
      if (marker != "FRAME" && !marker.startsWith("FRAME "))
        fail(s"y4m: expected FRAME marker, got '$marker'")
      if (off + planeSize > bytes.length) fail("y4m: truncated frame plane")
      frames += java.util.Arrays.copyOfRange(bytes, off, off + planeSize)
      off += planeSize
    }
    if (frames.isEmpty) fail("y4m: zero frames")
    VideoFrames(w, h, frames.toArray)
  }

  /** Expand a mono luma plane to the [[ImagePixels]] RGB layout
    * (r = g = b = Y), so the perceptual hashes' (r+g+b)/3 luminance
    * recovers the plane byte EXACTLY.
    */
  def monoFrame(v: VideoFrames, idx: Int): ImagePixels = {
    val plane = v.frames(idx)
    val rgb = new Array[Byte](3 * plane.length)
    var i = 0
    while (i < plane.length) {
      rgb(3 * i) = plane(i); rgb(3 * i + 1) = plane(i); rgb(3 * i + 2) = plane(i)
      i += 1
    }
    ImagePixels(v.width, v.height, rgb)
  }

  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') "ppm"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') "wav"
    else if (bytes.length >= 9 &&
      new String(bytes, 0, 9, StandardCharsets.US_ASCII) == "YUV4MPEG2") "y4m"
    else fail(s"unrecognized media container (first bytes: ${bytes.take(4).mkString(",")})")
}
