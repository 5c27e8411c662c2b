package graft.sources

/** Real pure-JVM media codecs for the multimodal column pipeline — the
  * [[graft.ops.Multimodal.MediaDecoder]] seam made concrete for the two
  * formats a JVM can parse byte-exactly with no native libraries:
  * RIFF/WAVE PCM audio and uncompressed 24-bpp BMP images. The
  * [[PdfCodec]] treatment for media: committed fixtures
  * (`fixtures/media`, regenerated deterministically by
  * `Test/runMain graft.GenMediaFixtures`) are parsed by these codecs and
  * the driver oracle pins the expected probe values as literals the
  * engine must extract from the bytes.
  *
  * Both parsers are per-FILE work inside a binaryFile scan — the decode
  * distributes with the files, exactly like [[PdfCodec]].
  */
object WavCodec {

  /** Probe result of one RIFF/WAVE PCM payload. Amplitudes are
    * normalized to [-1, 1] (16-bit: s/32768; 8-bit unsigned:
    * (s-128)/128), peak = max |amplitude| over every channel sample,
    * rms over every channel sample.
    */
  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                           nFrames: Long, durationMs: Long,
                           peak: Double, rms: Double)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def s16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort.toInt

  /** Locate the fmt and data chunks (RIFF chunk walk — chunks are
    * (tag, size, payload) with 2-byte alignment padding).
    */
  private def chunks(bytes: Array[Byte]): Map[String, (Int, Int)] = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "not a RIFF/WAVE payload")
    val out = scala.collection.mutable.Map[String, (Int, Int)]()
    var o = 12
    while (o + 8 <= bytes.length) {
      val tag = new String(bytes, o, 4, "US-ASCII")
      // Size stays a Long until clamped: a u32 >= 2^31 would wrap
      // negative as Int and walk the offset backwards (infinite loop on
      // a malformed/adversarial payload inside an executor). An
      // OVERSTATED size (truncated download, recorder cut mid-write) is
      // clamped to the remaining bytes, not rejected — the decoder's
      // documented tolerance: available samples still decode.
      val szL = u32(bytes, o + 4)
      val sz = math.min(szL, (bytes.length - o - 8).toLong).toInt
      out.getOrElseUpdate(tag, (o + 8, sz))
      o += 8 + sz + (sz & 1) // sz >= 0, so the walk always advances
    }
    out.toMap
  }

  /** Decode every normalized sample (channel-interleaved). */
  def samples(bytes: Array[Byte]): (WavInfo, Array[Double]) = {
    val ch = chunks(bytes)
    val (fmtOff, _) = ch.getOrElse("fmt ",
      throw new IllegalArgumentException("WAVE payload lacks a fmt chunk"))
    val audioFormat = u16(bytes, fmtOff)
    require(audioFormat == 1, s"only PCM (format 1) supported, got $audioFormat")
    val channels = u16(bytes, fmtOff + 2)
    val sampleRate = u32(bytes, fmtOff + 4).toInt
    val bits = u16(bytes, fmtOff + 14)
    require(bits == 8 || bits == 16, s"only 8/16-bit PCM supported, got $bits")
    require(channels >= 1 && sampleRate >= 1, "malformed fmt chunk")
    val (dataOff, dataSz) = ch.getOrElse("data",
      throw new IllegalArgumentException("WAVE payload lacks a data chunk"))
    val bytesPerSample = bits / 8
    val n = math.min(dataSz, bytes.length - dataOff) / bytesPerSample
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (bits == 16) s16(bytes, dataOff + 2 * i) / 32768.0
        else ((bytes(dataOff + i) & 0xff) - 128) / 128.0
      i += 1
    }
    val nFrames = n.toLong / channels
    var peak = 0.0
    var sq = 0.0
    i = 0
    while (i < n) {
      val a = math.abs(out(i)); if (a > peak) peak = a
      sq += out(i) * out(i); i += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sq / n)
    (WavInfo(channels, sampleRate, bits, nFrames,
      nFrames * 1000L / sampleRate, peak, rms), out)
  }

  def probe(bytes: Array[Byte]): WavInfo = samples(bytes)._1

  /** Fixed-length audio feature: RMS energy of `windows` equal time
    * slices (all channels pooled) — the deterministic spectral-envelope
    * stand-in a real pipeline would replace with a filterbank, with the
    * same shape and partitioning.
    */
  def windowRms(bytes: Array[Byte], windows: Int): Array[Double] = {
    require(windows >= 1)
    val (_, s) = samples(bytes)
    val out = new Array[Double](windows)
    if (s.isEmpty) return out
    var w = 0
    while (w < windows) {
      val from = (s.length.toLong * w / windows).toInt
      val until = (s.length.toLong * (w + 1) / windows).toInt
      var sq = 0.0
      var i = from
      while (i < until) { sq += s(i) * s(i); i += 1 }
      out(w) = if (until > from) math.sqrt(sq / (until - from)) else 0.0
      w += 1
    }
    out
  }

  /** 64-bit binary audio fingerprint in the Haitsma–Kalker shape
    * ("A Highly Robust Audio Fingerprint System", ISMIR 2002): a
    * windows × bands band-energy grid (Goertzel energy at `bands`
    * equispaced frequencies per equal time slice, all channels
    * pooled), then each bit is the sign of the time-delta of the
    * band-delta —
    * `bit(w,b) = (E(w,b)−E(w,b+1)) − (E(w−1,b)−E(w−1,b+1)) > 0` —
    * which is EXACTLY volume-invariant (a gain c scales every energy
    * by c², preserving every sign; sign(0) pins to false), the
    * property that makes it a perceptual dedup key where a byte hash
    * is useless. The published system uses overlapping frames and a
    * mel-ish band layout; this grid keeps non-overlapping equal
    * slices and linear bands so the whole computation is a pinned
    * double-arithmetic contract (the fixture-oracle discipline) — the
    * robustness/recall trade is measured, not silently shipped.
    * Defaults 5×17 → exactly 4×16 = 64 bits, spectral-resolution-heavy
    * (more bands than windows): on the planted fixtures it separates a
    * half-frequency square (Hamming 25 from tone) and a DC constant
    * (38) while keeping a half-SILENCED copy near (5) — a time-heavy
    * grid collapsed those onto the same sparse pattern.
    */
  def fingerprint64(bytes: Array[Byte], windows: Int = 5, bands: Int = 17): Long = {
    require(windows >= 2 && bands >= 2 && (windows - 1) * (bands - 1) == 64,
      s"(windows-1)*(bands-1) must be 64 (got $windows x $bands)")
    val (_, s) = samples(bytes)
    val e = Array.ofDim[Double](windows, bands)
    var w = 0
    while (w < windows) {
      val from = (s.length.toLong * w / windows).toInt
      val until = (s.length.toLong * (w + 1) / windows).toInt
      var b = 0
      while (b < bands) {
        // Goertzel power at normalized angular frequency in (0, π)
        val omega = math.Pi * (b + 1).toDouble / (bands + 1).toDouble
        val coeff = 2.0 * math.cos(omega)
        var s1 = 0.0
        var s2 = 0.0
        var i = from
        while (i < until) {
          val s0 = s(i) + coeff * s1 - s2
          s2 = s1; s1 = s0
          i += 1
        }
        e(w)(b) = s1 * s1 + s2 * s2 - coeff * s1 * s2
        b += 1
      }
      w += 1
    }
    var h = 0L
    var bit = 0
    w = 1
    while (w < windows) {
      var b = 0
      while (b < bands - 1) {
        val d = (e(w)(b) - e(w)(b + 1)) - (e(w - 1)(b) - e(w - 1)(b + 1))
        if (d > 0) h |= 1L << bit
        bit += 1
        b += 1
      }
      w += 1
    }
    h
  }

  /** Voice/tone-activity segmentation over the [[windowRms]] envelope:
    * a window is active when its RMS exceeds `threshold` (amplitude in
    * [0,1] — the silence-trimming gate an audio-corpus pipeline runs
    * before feature extraction). Returns `(nWindows, nActive,
    * longestRun, firstActive)`; `firstActive` is −1 when fully silent.
    */
  def activity(bytes: Array[Byte], windows: Int,
               threshold: Double): (Int, Int, Int, Int) = {
    val rms = windowRms(bytes, windows)
    var nActive = 0
    var longest = 0
    var run = 0
    var first = -1
    var i = 0
    while (i < rms.length) {
      if (rms(i) > threshold) {
        nActive += 1
        run += 1
        if (run > longest) longest = run
        if (first < 0) first = i
      } else run = 0
      i += 1
    }
    (windows, nActive, longest, first)
  }
}

/** Uncompressed 24-bpp BMP (BITMAPINFOHEADER, bottom-up) parser. */
object BmpCodec {

  final case class BmpInfo(width: Int, height: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Decode to a row-major (top-down) `(r, g, b)` pixel array. */
  def pixels(bytes: Array[Byte]): (BmpInfo, Array[(Int, Int, Int)]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOff = i32(bytes, 10)
    val hdrSize = i32(bytes, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = i32(bytes, 18)
    val height = i32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"only uncompressed 24-bpp BMP supported (got bpp=$bpp compression=$compression)")
    require(width >= 1 && height >= 1, "malformed BMP dimensions")
    val rowBytes = (width * 3 + 3) & ~3 // rows pad to 4 bytes
    val px = new Array[(Int, Int, Int)](width * height)
    var y = 0
    while (y < height) {
      val srcRow = dataOff + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val o = srcRow + 3 * x
        px(y * width + x) = ((bytes(o + 2) & 0xff), (bytes(o + 1) & 0xff), (bytes(o) & 0xff))
        x += 1
      }
      y += 1
    }
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    px.foreach { case (r, g, b) => sr += r; sg += g; sb += b }
    val n = px.length.toDouble
    (BmpInfo(width, height, sr / n, sg / n, sb / n), px)
  }

  def probe(bytes: Array[Byte]): BmpInfo = pixels(bytes)._1

  /** Top-down row-major per-pixel luma `(r+g+b)/3.0` — the single
    * definition both [[BmpCodec]] and [[ImageCodec]] accumulate, so the
    * cross-format Hamming-0 contract can never drift between copies.
    */
  private[sources] def lumaOf(px: Array[(Int, Int, Int)]): Array[Double] = {
    val out = new Array[Double](px.length)
    var i = 0
    while (i < px.length) {
      val (r, g, b) = px(i); out(i) = (r + g + b) / 3.0; i += 1
    }
    out
  }

  /** Fixed-length image feature: mean luma `(r+g+b)/3` over a
    * `grid × grid` partition of the image (the thumbnail-pool a real
    * pipeline would replace with an encoder, same shape).
    */
  def gridLuma(bytes: Array[Byte], grid: Int): Array[Double] =
    gridLumaRect(bytes, grid, grid)

  /** [[gridLuma]] over a rectangular `gw × gh` grid (row-major), for
    * the 9×8 difference-hash layout.
    */
  def gridLumaRect(bytes: Array[Byte], gw: Int, gh: Int): Array[Double] = {
    val (info, px) = pixels(bytes)
    LumaGrid.accumulate(info.width, info.height, lumaOf(px), gw, gh)
  }

  /** 64-bit difference hash (dHash): mean luma over a 9×8 grid; bit
    * `r·8 + c` is set iff `luma(r,c) > luma(r,c+1)` — the standard
    * perceptual fingerprint (gradient directions survive resizing,
    * re-encoding, and brightness shifts that change every raw byte).
    * Near-duplicate images land within a small Hamming distance.
    */
  def dHash64(bytes: Array[Byte]): Long =
    LumaGrid.dHashFromGrid(gridLumaRect(bytes, 9, 8))
}

/** The ONE copy of the grid-mean accumulation and the dHash bit rule —
  * [[BmpCodec]] and [[ImageCodec]] both delegate here, which is what
  * makes a lossless cross-format re-encode land on the identical hash
  * by construction rather than by parallel maintenance of two loops.
  */
private[sources] object LumaGrid {

  /** Mean luma over a `gw × gh` grid (row-major) of a `w × h` top-down
    * luma array; cells accumulate in pixel order.
    */
  def accumulate(w: Int, h: Int, lum: Array[Double],
                 gw: Int, gh: Int): Array[Double] = {
    require(gw >= 1 && gh >= 1)
    val out = new Array[Double](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val gy = (y.toLong * gh / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * gw / w).toInt
        out(gy * gw + gx) += lum(y * w + x)
        cnt(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < out.length) {
      if (cnt(i) > 0) out(i) /= cnt(i)
      i += 1
    }
    out
  }

  /** Bit `r·8 + c` set iff `g(r,c) > g(r,c+1)` over a 9×8 grid. */
  def dHashFromGrid(g: Array[Double]): Long = {
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c) > g(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }
}

/** Format-dispatching image decode for the multimodal pipeline: BMP goes
  * through the byte-exact pure-JVM [[BmpCodec]]; PNG and JPEG decode via
  * the in-JDK `javax.imageio` readers (no native libraries — both codecs
  * ship with every Java 17 runtime, headless-safe). The grid-luma
  * accumulation and the dHash bit rule are the SAME arithmetic in the
  * same pixel order as [[BmpCodec]], so a lossless re-encode of a BMP
  * (e.g. as PNG) lands on the IDENTICAL 64-bit dHash — cross-format
  * perceptual dedup needs no per-format calibration. JPEG decode is
  * lossy, so fixtures planted for it keep ≥ 50-luma gaps between
  * adjacent dHash cells (decode noise is ±2-3) — gradient DIRECTIONS,
  * which is all dHash keeps, are unaffected.
  */
object ImageCodec {

  final case class ImageInfo(format: String, width: Int, height: Int)

  /** Magic-byte sniff — the payload, not the filename, decides the
    * decoder (crawl corpora routinely mislabel extensions).
    */
  def format(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) "bmp"
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte) "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else if (bytes.length >= 6 && bytes(0) == 'G'.toByte &&
      bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte &&
      bytes(3) == '8'.toByte &&
      (bytes(4) == '7'.toByte || bytes(4) == '9'.toByte) &&
      bytes(5) == 'a'.toByte) "gif"
    else if (bytes.length >= 4 &&
      ((bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 42 && bytes(3) == 0) ||
       (bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte &&
        bytes(2) == 0 && bytes(3) == 42))) "tiff"
    else "unknown"

  /** Decode to top-down row-major per-pixel luma `(r+g+b)/3.0` — the
    * exact per-pixel value [[BmpCodec]] accumulates ([[BmpCodec.lumaOf]]
    * for BMP payloads; the identical formula over `getRGB` for the
    * imageio decodes).
    */
  private def lumaPixels(fmt: String, bytes: Array[Byte]): (Int, Int, Array[Double]) =
    fmt match {
      case "bmp" =>
        val (info, px) = BmpCodec.pixels(bytes)
        (info.width, info.height, BmpCodec.lumaOf(px))
      case "png" | "jpeg" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, "javax.imageio could not decode the image payload")
        val w = img.getWidth; val h = img.getHeight
        require(w > 0 && h > 0, s"degenerate image ${w}x$h")
        val out = new Array[Double](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(y * w + x) =
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        (w, h, out)
      case other => throw new IllegalArgumentException(
        s"unsupported image payload (sniffed '$other') — BMP/PNG/JPEG decode in-JVM; " +
          "plug a codec for anything else")
    }

  /** Dimensions + format from the HEADERS alone — no pixel decode.
    * A media scan probes every payload; paying a full JPEG decode just
    * to read two ints would double the per-row decode cost
    * ([[graft.ops.Multimodal.CodecDecoder]] calls probe next to
    * features).
    */
  def probe(bytes: Array[Byte]): ImageInfo = format(bytes) match {
    case "bmp" =>
      require(bytes.length >= 54, "truncated BMP header")
      (ImageInfo("bmp", le32(bytes, 18), le32(bytes, 22)))
    case "png" =>
      // IHDR is mandated first: width/height big-endian at 16/20
      require(bytes.length >= 24, "truncated PNG header")
      ImageInfo("png", be32(bytes, 16), be32(bytes, 20))
    case "jpeg" =>
      // scan markers for the first SOFn (0xC0-0xCF minus C4/C8/CC):
      // length(2) precision(1) height(2) width(2)
      var o = 2
      while (o + 9 <= bytes.length) {
        require((bytes(o) & 0xff) == 0xff, s"JPEG marker desync at $o")
        val m = bytes(o + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          return ImageInfo("jpeg",
            ((bytes(o + 7) & 0xff) << 8) | (bytes(o + 8) & 0xff),
            ((bytes(o + 5) & 0xff) << 8) | (bytes(o + 6) & 0xff))
        }
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) o += 2
        else o += 2 + (((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff))
      }
      throw new IllegalArgumentException("JPEG payload has no SOF frame header")
    case "gif" =>
      val g = GifCodec.probe(bytes)
      ImageInfo("gif", g.width, g.height)
    case "tiff" =>
      val t = TiffCodec.probe(bytes)
      ImageInfo("tiff", t.width, t.height)
    case other => throw new IllegalArgumentException(
      s"unsupported image payload (sniffed '$other') — BMP/PNG/JPEG decode in-JVM")
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Mean luma over a `gw × gh` grid (row-major) — [[LumaGrid]]'s ONE
    * accumulation over the dispatched decode.
    */
  def gridLumaRect(bytes: Array[Byte], gw: Int, gh: Int): Array[Double] = {
    val (w, h, lum) = lumaPixels(format(bytes), bytes)
    LumaGrid.accumulate(w, h, lum, gw, gh)
  }

  def gridLuma(bytes: Array[Byte], grid: Int): Array[Double] =
    gridLumaRect(bytes, grid, grid)

  /** 64-bit difference hash over the dispatched decode — [[LumaGrid]]'s
    * ONE bit rule on the shared 9×8 grid; equal to [[BmpCodec.dHash64]]
    * bit-for-bit on BMP payloads and on any lossless re-encode.
    */
  def dHash64(bytes: Array[Byte]): Long =
    LumaGrid.dHashFromGrid(gridLumaRect(bytes, 9, 8))
}

/** GIF (87a/89a) block walker — STRUCTURAL metadata without an LZW
  * pixel decode (the [[Mp3Codec]]/[[Mp4Codec]] treatment for the
  * remaining ubiquitous crawl image format): logical-screen size,
  * frame count (image descriptors), animation flag (≥2 frames) and the
  * NETSCAPE 2.0 loop count. The walk honors the real wire grammar —
  * global/local color tables, extension sub-block chains, data
  * sub-block chains — so a frame count is exact, not a magic-byte
  * guess. Malformed payloads fail loudly; the caller's decode contract
  * handles quarantine.
  */
object GifCodec {

  final case class GifInfo(width: Int, height: Int, nFrames: Int,
                           animated: Boolean, loopCount: Int)

  def probe(bytes: Array[Byte]): GifInfo = {
    require(bytes.length >= 13 && ImageCodec.format(bytes) == "gif",
      "not a GIF payload")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    val packed = bytes(10) & 0xff
    var o = 13
    if ((packed & 0x80) != 0) o += 3 * (1 << ((packed & 7) + 1)) // GCT
    var frames = 0
    var loop = -1 // -1 = no NETSCAPE loop extension
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < bytes.length && (bytes(p) & 0xff) != 0)
        p += 1 + (bytes(p) & 0xff)
      require(p < bytes.length, "GIF sub-block chain runs off the payload")
      p + 1 // the 0x00 terminator
    }
    var done = false
    while (!done) {
      require(o < bytes.length, "GIF block stream runs off the payload")
      (bytes(o) & 0xff) match {
        case 0x2c => // image descriptor
          require(o + 10 <= bytes.length, "truncated GIF image descriptor")
          frames += 1
          val lpacked = bytes(o + 9) & 0xff
          var p = o + 10
          if ((lpacked & 0x80) != 0) p += 3 * (1 << ((lpacked & 7) + 1)) // LCT
          p += 1 // LZW minimum code size
          o = skipSubBlocks(p)
        case 0x21 => // extension: label + sub-blocks
          require(o + 2 <= bytes.length, "truncated GIF extension")
          val label = bytes(o + 1) & 0xff
          if (label == 0xff && o + 14 <= bytes.length &&
              (bytes(o + 2) & 0xff) == 11 &&
              new String(bytes, o + 3, 11, "US-ASCII") == "NETSCAPE2.0") {
            // app sub-block: 0x03 0x01 loop_lo loop_hi
            val p = o + 14
            if (p + 4 <= bytes.length && (bytes(p) & 0xff) == 3 &&
                (bytes(p + 1) & 0xff) == 1)
              loop = u16(p + 2)
          }
          o = skipSubBlocks(o + 2)
        case 0x3b => done = true // trailer
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02x at offset $o")
      }
    }
    GifInfo(w, h, frames, frames >= 2, loop)
  }
}

/** Baseline TIFF 6.0 IFD pager — STRUCTURAL metadata without a strip
  * decode: byte order, IFD0 image dimensions, and the page count from
  * the next-IFD chain (multi-page TIFFs are the scanned-document norm).
  * Shares the EXIF walk's discipline (bounded entries, loud on
  * malformed offsets) but pages through the top-level chain, which the
  * APP1-embedded [[ExifCodec]] never does. Cycle-guarded.
  */
object TiffCodec {

  final case class TiffInfo(byteOrder: String, width: Int, height: Int,
                            nPages: Int)

  def probe(bytes: Array[Byte]): TiffInfo = {
    require(bytes.length >= 8 && ImageCodec.format(bytes) == "tiff",
      "not a TIFF payload")
    val le = bytes(0) == 'I'.toByte
    def u16(o: Int): Int =
      if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    var ifd = u32(4)
    var pages = 0
    var w = -1; var h = -1
    val seen = scala.collection.mutable.HashSet.empty[Long]
    while (ifd != 0) {
      require(seen.add(ifd), s"cycle in TIFF IFD chain at $ifd")
      require(ifd + 2 <= bytes.length, "TIFF IFD offset beyond payload")
      val o = ifd.toInt
      val n = u16(o)
      require(o + 2 + 12 * n + 4 <= bytes.length, "truncated TIFF IFD")
      if (pages == 0) { // dimensions from IFD0 only
        var i = 0
        while (i < n) {
          val e = o + 2 + 12 * i
          val tag = u16(e)
          val typ = u16(e + 2)
          // SHORT inline values sit in the first 2 value bytes; LONG in 4
          val v = if (typ == 3) u16(e + 8) else u32(e + 8).toInt
          if (tag == 0x0100) w = v
          else if (tag == 0x0101) h = v
          i += 1
        }
      }
      pages += 1
      ifd = u32(o + 2 + 12 * n)
    }
    require(pages > 0 && w > 0 && h > 0, "TIFF payload has no sized IFD0")
    TiffInfo(if (le) "II" else "MM", w, h, pages)
  }
}

/** MPEG audio (MP3) frame-header walker — STRUCTURAL metadata without a
  * decoder: an MPEG audio stream is a sequence of self-describing
  * frames (11-bit sync, then version/layer/bitrate/samplerate/padding/
  * channel-mode fields; ISO/IEC 11172-3 §2.4.1), so duration, rate,
  * channel layout, frame count, and CBR/VBR detection fall out of
  * walking headers alone. That is exactly the metadata a crawl
  * curation pipeline filters on (drop sub-second clips, cap hours-long
  * payloads, route mono vs stereo) — full sample decode stays behind
  * the [[graft.ops.Multimodal.MediaDecoder]] seam.
  *
  * An ID3v2 tag prefix (synchsafe-sized) is skipped; the walk is
  * Content-Length-strict per frame and stops at the first non-frame
  * byte after ≥1 parsed frame (trailing tags/garbage tolerated,
  * a corrupt FIRST frame raises loudly).
  */
object Mp3Codec {

  /** @param version    "MPEG1" | "MPEG2" | "MPEG2.5"
    * @param layer      1-3
    * @param bitrateKbps first frame's bitrate (nominal rate for CBR)
    * @param vbr        true when frames carry ≠ bitrate indices
    */
  final case class Mp3Info(version: String, layer: Int, bitrateKbps: Int,
                           sampleRate: Int, channels: Int, frames: Int,
                           durationMs: Long, vbr: Boolean)

  // bitrate tables (kbps), index 1-14; 0 = free, 15 = invalid
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Skip an ID3v2 tag if present: "ID3" + 2 version bytes + flags +
    * 4-byte synchsafe size (7 bits/byte); bit 4 of flags adds a
    * 10-byte footer.
    */
  private def skipId3v2(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      10 + size + (if ((b(5) & 0x10) != 0) 10 else 0)
    } else 0

  private final case class Frame(version: String, layer: Int, bitrate: Int,
                                 sampleRate: Int, channels: Int,
                                 samples: Int, lengthBytes: Int)

  /** Parse one frame header at `o`; None when the 4 bytes there are not
    * a valid header (bad sync / reserved fields / invalid indices).
    */
  private def frameAt(b: Array[Byte], o: Int): Option[Frame] = {
    if (o + 4 > b.length) return None
    if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xe0) != 0xe0) return None
    val verBits = (b(o + 1) >> 3) & 3
    val layBits = (b(o + 1) >> 1) & 3
    if (verBits == 1 || layBits == 0) return None
    val version = verBits match {
      case 3 => "MPEG1"; case 2 => "MPEG2"; case 0 => "MPEG2.5"
    }
    val layer = 4 - layBits // bits 11/10/01 = layers 1/2/3
    val brIdx = (b(o + 2) >> 4) & 15
    val srIdx = (b(o + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/invalid
    val padding = (b(o + 2) >> 1) & 1
    val channels = if (((b(o + 3) >> 6) & 3) == 3) 1 else 2
    val sr = (version match {
      case "MPEG1" => SrV1; case "MPEG2" => SrV2; case _ => SrV25
    })(srIdx)
    val br = 1000 * ((version, layer) match {
      case ("MPEG1", 1) => BrV1L1(brIdx)
      case ("MPEG1", 2) => BrV1L2(brIdx)
      case ("MPEG1", 3) => BrV1L3(brIdx)
      case (_, 1) => BrV2L1(brIdx)
      case _ => BrV2L23(brIdx)
    })
    val (samples, len) = layer match {
      case 1 => (384, (12 * br / sr + padding) * 4)
      case 2 => (1152, 144 * br / sr + padding)
      case 3 =>
        if (version == "MPEG1") (1152, 144 * br / sr + padding)
        else (576, 72 * br / sr + padding)
    }
    Some(Frame(version, layer, br / 1000, sr, channels, samples, len))
  }

  def probe(bytes: Array[Byte]): Mp3Info = {
    var pos = skipId3v2(bytes)
    val first = frameAt(bytes, pos).getOrElse(throw new IllegalArgumentException(
      s"no MPEG audio frame header at offset $pos"))
    var frames = 0
    var samples = 0L
    var vbr = false
    var cur = Option(first)
    while (cur.isDefined) {
      val f = cur.get
      require(f.sampleRate == first.sampleRate && f.version == first.version &&
        f.layer == first.layer,
        s"mid-stream format change at frame $frames — not an MPEG audio stream")
      if (f.bitrate != first.bitrate) vbr = true
      frames += 1
      samples += f.samples
      pos += f.lengthBytes
      cur = if (pos < bytes.length) frameAt(bytes, pos) else None
    }
    Mp3Info(first.version, first.layer, first.bitrate, first.sampleRate,
      first.channels, frames, samples * 1000L / first.sampleRate, vbr)
  }

  /** Magic sniff: ID3v2 prefix or a valid frame header at byte 0. */
  def looksLikeMp3(bytes: Array[Byte]): Boolean =
    (bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
      frameAt(bytes, 0).isDefined
}

/** ISO BMFF (MP4/MOV, ISO/IEC 14496-12) box walker — STRUCTURAL
  * metadata without a decoder: the container is a tree of
  * length-prefixed boxes, so brand, movie duration, and per-track
  * handler/codec/duration come from walking `ftyp` and
  * `moov/{mvhd, trak/{mdia/{mdhd,hdlr,minf/stbl/stsd}}}` — the
  * route/filter facts for video/audio payloads at crawl scale. Sample
  * decode stays behind the [[graft.ops.Multimodal.MediaDecoder]] seam.
  */
object Mp4Codec {

  /** @param handler  `soun` / `vide` / other 4cc from `hdlr`
    * @param codec    first `stsd` sample-entry 4cc (`mp4a`, `avc1`, …)
    */
  final case class Mp4Track(handler: String, codec: String, durationMs: Long)
  final case class Mp4Info(brand: String, durationMs: Long,
                           tracks: Seq[Mp4Track])

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (fourcc, bodyStart, boxEnd) for each box in [from, to). */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var pos = from
    while (pos + 8 <= to) {
      val size32 = be32(b, pos)
      val name = cc(b, pos + 4)
      val (size, hdr) =
        if (size32 == 1 && pos + 16 <= to) (be64(b, pos + 8), 16)
        else if (size32 == 0) ((to - pos).toLong, 8) // box runs to end
        else (size32, 8)
      require(size >= hdr && pos + size <= to,
        s"mp4 box '$name' at $pos has bad size $size")
      out += ((name, pos + hdr, pos + size.toInt))
      pos += size.toInt
    }
    out.toSeq
  }

  private def find(bs: Seq[(String, Int, Int)], name: String): Option[(Int, Int)] =
    bs.collectFirst { case (`name`, s, e) => (s, e) }

  def probe(bytes: Array[Byte]): Mp4Info = {
    val top = boxes(bytes, 0, bytes.length)
    val brand = find(top, "ftyp").map { case (s, _) => cc(bytes, s) }
      .getOrElse(throw new IllegalArgumentException("no ftyp box — not ISO BMFF"))
    val (ms, me) = find(top, "moov").getOrElse(
      throw new IllegalArgumentException("no moov box"))
    val moov = boxes(bytes, ms, me)
    val movieMs = find(moov, "mvhd").map { case (s, _) =>
      val v = bytes(s) & 0xff
      val (ts, dur) =
        if (v == 1) (be32(bytes, s + 20), be64(bytes, s + 24))
        else (be32(bytes, s + 12), be32(bytes, s + 16))
      dur * 1000L / ts
    }.getOrElse(throw new IllegalArgumentException("no mvhd box"))
    val tracks = moov.collect { case ("trak", s, e) =>
      val trak = boxes(bytes, s, e)
      val (mds, mde) = find(trak, "mdia").getOrElse(
        throw new IllegalArgumentException("trak without mdia"))
      val mdia = boxes(bytes, mds, mde)
      val durMs = find(mdia, "mdhd").map { case (hs, _) =>
        val v = bytes(hs) & 0xff
        val (ts, dur) =
          if (v == 1) (be32(bytes, hs + 20), be64(bytes, hs + 24))
          else (be32(bytes, hs + 12), be32(bytes, hs + 16))
        dur * 1000L / ts
      }.getOrElse(0L)
      val handler = find(mdia, "hdlr")
        .map { case (hs, _) => cc(bytes, hs + 8) }.getOrElse("????")
      val codec = (for {
        (ms2, me2) <- find(mdia, "minf")
        (ss, se) <- find(boxes(bytes, ms2, me2), "stbl")
        (ds, de) <- find(boxes(bytes, ss, se), "stsd")
        if be32(bytes, ds + 4) > 0 && de >= ds + 16
      } yield cc(bytes, ds + 12)).getOrElse("????")
      Mp4Track(handler, codec, durMs)
    }
    Mp4Info(brand, movieMs, tracks)
  }

  /** Magic sniff: a well-formed ftyp box at byte 0. */
  def looksLikeMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && cc(bytes, 4) == "ftyp"
}

/** PNG textual metadata (ISO 15948 §11.3.4: `tEXt` latin-1 and
  * uncompressed `iTXt` utf-8 chunks) — the PNG counterpart of
  * [[ExifCodec]]: authorship/software/comment provenance a multimodal
  * corpus joins on, and occasionally PII (author names, GPS dumped as
  * comments by tools). One chunk walk, no pixel decode; compressed
  * `zTXt`/`iTXt` payloads are skipped by design (a metadata scan must
  * not inflate attacker-sized streams); malformed chunks end the walk
  * with the tags collected so far, never a throw.
  */
object PngMeta {

  /** Decompressed-size ceiling per text chunk (1 MiB): real-world
    * zTXt/iTXt payloads are provenance strings, so anything larger is
    * either junk or a decompression bomb — skipped, never inflated
    * past the cap.
    */
  val MaxInflatedChunk: Int = 1 << 20

  /** Bounded inflate of `len` bytes at `off`: None on corrupt/
    * truncated streams or when output would exceed
    * [[MaxInflatedChunk]].
    */
  private def inflateCapped(b: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    if (len <= 0) return None
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      val out = new java.io.ByteArrayOutputStream(math.min(len * 4, 65536))
      val buf = new Array[Byte](8192)
      var ok = true
      while (ok && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) ok = false
        else {
          out.write(buf, 0, n)
          if (out.size > MaxInflatedChunk) ok = false
        }
      }
      if (ok && inf.finished()) Some(out.toByteArray) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  def parse(bytes: Array[Byte]): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      if (bytes.length < 8 || (bytes(0) & 0xff) != 0x89 ||
          bytes(1) != 'P'.toByte) return Seq.empty
      var o = 8
      def be32(i: Int): Int =
        ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
          ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      while (o + 8 <= bytes.length) {
        val len = be32(o)
        val tag = new String(bytes, o + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val data = o + 8
        if (len >= 0 && data + len <= bytes.length) {
          if (tag == "tEXt") {
            val nul = (data until data + len).find(bytes(_) == 0)
            nul.foreach { n =>
              out += (new String(bytes, data, n - data, "ISO-8859-1") ->
                new String(bytes, n + 1, data + len - n - 1, "ISO-8859-1"))
            }
          } else if (tag == "iTXt") {
            val n1 = (data until data + len).find(bytes(_) == 0)
            n1.foreach { k =>
              // keyword NUL compFlag compMethod lang NUL translated NUL text
              if (k + 2 < data + len) {
                val compFlag = bytes(k + 1)
                val compMethod = bytes(k + 2)
                var p = k + 3
                var nuls = 0
                while (p < data + len && nuls < 2) {
                  if (bytes(p) == 0) nuls += 1
                  p += 1
                }
                if (nuls == 2) {
                  val key = new String(bytes, data, k - data, "ISO-8859-1")
                  if (compFlag == 0)
                    out += (key -> new String(bytes, p, data + len - p, "UTF-8"))
                  else if (compFlag == 1 && compMethod == 0)
                    // deflate-compressed payload, inflated under the cap
                    inflateCapped(bytes, p, data + len - p).foreach(t =>
                      out += (key -> new String(t, "UTF-8")))
                }
              }
            }
          } else if (tag == "zTXt") {
            // keyword NUL compMethod(0=deflate) compressed-latin1-text
            val nul = (data until data + len).find(bytes(_) == 0)
            nul.foreach { n =>
              if (n + 1 < data + len && bytes(n + 1) == 0)
                inflateCapped(bytes, n + 2, data + len - n - 2).foreach(t =>
                  out += (new String(bytes, data, n - data, "ISO-8859-1") ->
                    new String(t, "ISO-8859-1")))
            }
          }
        }
        if (tag == "IEND") return out.toSeq
        o += 12 + len // length + tag + data + crc
      }
      out.toSeq
    } catch { case _: Exception => out.toSeq }
  }
}

/** EXIF metadata (JEITA CP-3451 / TIFF 6.0) from JPEG APP1 segments —
  * the provenance AND PII surface of a multimodal crawl: camera
  * make/model/timestamps feed dedup and provenance joins, while GPS
  * coordinates are personal data most training-corpus policies require
  * stripped before use. Pure-JVM byte walk, no decode: the JPEG
  * segment scan finds the `Exif\0\0` APP1, then a TIFF IFD
  * walk over IFD0 → Exif IFD → GPS IFD renders tag values as strings
  * (ASCII trimmed at NUL; integer types comma-joined; RATIONALs as
  * `num/den` — EXACT, no float crosses an engine boundary).
  *
  * [[ExifCodec.stripExif]] removes every APP1 segment wholesale (the
  * `exiftool -all=` convention) — pixel data untouched, so the image
  * still decodes identically; a blunt instrument by design, because
  * rewriting TIFF offsets to excise ONLY the GPS IFD is where
  * strip-tools historically leaked data.
  */
object ExifCodec {

  /** Well-known tag names; unknown tags render as `tag_0xXXXX`. */
  private val TagNames: Map[Int, String] = Map(
    0x010f -> "make", 0x0110 -> "model", 0x0112 -> "orientation",
    0x011a -> "x_resolution", 0x011b -> "y_resolution",
    0x0131 -> "software", 0x0132 -> "datetime",
    0x829a -> "exposure_time", 0x829d -> "f_number",
    0x8827 -> "iso", 0x9003 -> "datetime_original",
    0x9004 -> "datetime_digitized", 0x920a -> "focal_length",
    0xa002 -> "pixel_x_dimension", 0xa003 -> "pixel_y_dimension")

  private val GpsTagNames: Map[Int, String] = Map(
    0x0001 -> "gps_latitude_ref", 0x0002 -> "gps_latitude",
    0x0003 -> "gps_longitude_ref", 0x0004 -> "gps_longitude",
    0x0005 -> "gps_altitude_ref", 0x0006 -> "gps_altitude",
    0x001d -> "gps_date")

  /** Parse EXIF tags from a JPEG payload: `(tag_name, value)` in IFD
    * walk order, GPS tags named per [[GpsTagNames]]. Empty when the
    * payload has no Exif APP1 (or is not a JPEG); malformed TIFF
    * structures yield the tags parsed up to the fault, never a throw —
    * one corrupt image must not kill a partition.
    */
  def parse(bytes: Array[Byte]): Seq[(String, String)] =
    try {
      exifTiffOffset(bytes) match {
        case None => Seq.empty
        case Some(off) => parseTiff(bytes, off)
      }
    } catch { case _: Exception => Seq.empty }

  /** Locate the Exif APP1's TIFF block offset. */
  private def exifTiffOffset(b: Array[Byte]): Option[Int] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var o = 2
    while (o + 4 <= b.length && (b(o) & 0xff) == 0xff) {
      val m = b(o + 1) & 0xff
      if (m == 0xda || m == 0xd9) return None // image data: no APP1 seen
      val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      if (m == 0xe1 && len >= 8 + 6 && o + 10 <= b.length &&
          new String(b, o + 4, 6, java.nio.charset.StandardCharsets.US_ASCII)
            == "Exif\u0000\u0000")
        return Some(o + 10)
      o += 2 + len
    }
    None
  }

  private def parseTiff(b: Array[Byte], tiff: Int): Seq[(String, String)] = {
    val le = b(tiff) == 'I'.toByte && b(tiff + 1) == 'I'.toByte
    def u16(o: Int): Int =
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    require(u16(tiff + 2) == 42, "bad TIFF magic")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exifIfd = -1L
    var gpsIfd = -1L

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 7 => 1
      case 3 => 2
      case 4 | 9 => 4
      case 5 | 10 => 8
      case _ => 1
    }

    def render(t: Int, n: Int, vo: Int): String = t match {
      case 2 => // ASCII, NUL-terminated
        val raw = new String(b, vo, n,
          java.nio.charset.StandardCharsets.US_ASCII)
        val nul = raw.indexOf('\u0000')
        if (nul >= 0) raw.substring(0, nul) else raw
      case 3 => (0 until n).map(i => u16(vo + 2 * i)).mkString(",")
      case 4 => (0 until n).map(i => u32(vo + 4 * i)).mkString(",")
      case 5 => (0 until n).map(i =>
        s"${u32(vo + 8 * i)}/${u32(vo + 8 * i + 4)}").mkString(",")
      case 9 => (0 until n).map(i => u32(vo + 4 * i).toInt).mkString(",")
      case 10 => (0 until n).map(i =>
        s"${u32(vo + 8 * i).toInt}/${u32(vo + 8 * i + 4).toInt}").mkString(",")
      case _ => // BYTE/UNDEFINED: hex, capped
        (0 until math.min(n, 32)).map(i => f"${b(vo + i) & 0xff}%02x").mkString
    }

    def walkIfd(ifdOff: Long, names: Map[Int, String], gps: Boolean): Unit = {
      val base = tiff + ifdOff.toInt
      if (ifdOff < 0 || base + 2 > b.length) return
      val n = u16(base)
      var i = 0
      while (i < n) {
        val e = base + 2 + 12 * i
        if (e + 12 > b.length) return
        val tag = u16(e)
        val typ = u16(e + 2)
        val cnt = u32(e + 4).toInt
        val size = typeSize(typ) * cnt
        val vo = if (size <= 4) e + 8 else tiff + u32(e + 8).toInt
        if (vo >= 0 && size >= 0 && vo + size <= b.length) {
          if (!gps && tag == 0x8769) exifIfd = u32(e + 8)
          else if (!gps && tag == 0x8825) gpsIfd = u32(e + 8)
          else out += (names.getOrElse(tag, f"tag_0x$tag%04X") ->
            render(typ, cnt, vo))
        }
        i += 1
      }
    }

    walkIfd(u32(tiff + 4), TagNames, gps = false)
    if (exifIfd >= 0) walkIfd(exifIfd, TagNames, gps = false)
    if (gpsIfd >= 0) walkIfd(gpsIfd, GpsTagNames, gps = true)
    out.toSeq
  }

  /** True when the payload carries any GPS EXIF tag — the PII flag a
    * corpus gate quarantines on.
    */
  def hasGps(bytes: Array[Byte]): Boolean =
    parse(bytes).exists(_._1.startsWith("gps_"))

  /** Remove every APP1 segment (EXIF and XMP ride in APP1); all other
    * segments and the entropy-coded image data pass through verbatim,
    * so the stripped payload decodes pixel-identically. Non-JPEG
    * payloads return unchanged. A truncated/malformed segment walk
    * (length field overrunning the buffer) returns the ORIGINAL bytes
    * untouched — one corrupt image must not kill a partition, the same
    * defensive contract as [[parse]] and [[PngMeta.parse]].
    */
  def stripExif(bytes: Array[Byte]): Array[Byte] = {
    val b = bytes
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return bytes
    try {
      val out = new java.io.ByteArrayOutputStream(b.length)
      out.write(b, 0, 2)
      var o = 2
      var done = false
      while (!done && o + 4 <= b.length && (b(o) & 0xff) == 0xff) {
        val m = b(o + 1) & 0xff
        if (m == 0xda || m == 0xd9) {
          // start of scan / end marker: copy the rest verbatim
          out.write(b, o, b.length - o)
          done = true
        } else {
          val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
          if (len < 2 || o + 2 + len > b.length)
            return bytes // segment overruns the buffer: malformed, pass through
          if (m != 0xe1) out.write(b, o, 2 + len)
          o += 2 + len
        }
      }
      if (!done && o < b.length) out.write(b, o, b.length - o)
      out.toByteArray
    } catch {
      case scala.util.control.NonFatal(_) => bytes
    }
  }
}
