package graft

/** Deterministic WAV/BMP fixture generator for
  * [[graft.sources.WavCodec]] / [[graft.sources.BmpCodec]] — byte-stable
  * so the committed files under `fixtures/media/` are asserted identical
  * to the generator's output (any drift of either side is loud), the
  * [[PdfFixtures]] treatment for media.
  *
  * Run `Test/runMain graft.GenMediaFixtures <dir>` to (re)write them.
  */
object MediaFixtures {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def wav16(channels: Int, sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSz = samples.length * 2
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataSz))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(sampleRate))
    out.write(le32(sampleRate * channels * 2)); out.write(le16(channels * 2))
    out.write(le16(16))
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataSz))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  def wav8(channels: Int, sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSz = samples.length
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataSz))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(sampleRate))
    out.write(le32(sampleRate * channels)); out.write(le16(channels))
    out.write(le16(8))
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataSz))
    samples.foreach(s => out.write(s & 0xff))
    out.toByteArray
  }

  /** 24-bpp bottom-up BMP from a TOP-DOWN row-major (r,g,b) pixel seq. */
  def bmp24(width: Int, height: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(px.length == width * height)
    val rowBytes = (width * 3 + 3) & ~3
    val imageSz = rowBytes * height
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(54 + imageSz)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(width)); out.write(le32(height))
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(le32(imageSz)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    for (y <- (height - 1) to 0 by -1) { // bottom-up
      for (x <- 0 until width) {
        val (r, g, b) = px(y * width + x)
        out.write(b); out.write(g); out.write(r)
      }
      var pad = width * 3
      while (pad % 4 != 0) { out.write(0); pad += 1 }
    }
    out.toByteArray
  }

  /** mono 16-bit 8 kHz, 16 frames of a ±0.5 square wave — peak 0.5,
    * rms 0.5, duration 2 ms, windowRms(4) = [0.5]*4.
    */
  def toneWav: Array[Byte] =
    wav16(1, 8000, Array.tabulate(16)(i => if (i % 2 == 0) 16384 else -16384))

  /** stereo 16-bit 4 kHz, 8 frames: ch0 = +0.25, ch1 = −0.25 —
    * peak 0.25, rms 0.25, duration 2 ms.
    */
  def stereoWav: Array[Byte] =
    wav16(2, 4000, Array.tabulate(16)(i => if (i % 2 == 0) 8192 else -8192))

  /** mono 8-bit 8 kHz, 8 frames at sample 192 ⇒ amplitude +0.5 —
    * peak 0.5, rms 0.5, duration 1 ms.
    */
  def byteWav: Array[Byte] = wav8(1, 8000, Array.fill(8)(192))

  /** 4×2: left half black, right half white — means 127.5 each,
    * gridLuma(2) = [0, 255, 0, 255].
    */
  def halvesBmp: Array[Byte] =
    bmp24(4, 2, Seq.tabulate(8) { i =>
      if (i % 4 < 2) (0, 0, 0) else (255, 255, 255)
    })

  /** 3×1: pure R, G, B pixels — channel means 85.0, gridLuma(1) = [85]. */
  def rgbBmp: Array[Byte] =
    bmp24(3, 1, Seq((255, 0, 0), (0, 255, 0), (0, 0, 255)))

  /** 18×16 gray diagonal-ramp pattern (luma `((x/2 + y/2) % 4) · 60`) —
    * structured gradients in both axes, so the 9×8 dHash grid sees a
    * non-trivial bit pattern.
    */
  def patternPixels: Seq[(Int, Int, Int)] =
    Seq.tabulate(18 * 16) { i =>
      val x = i % 18; val y = i / 18
      val v = ((x / 2 + y / 2) % 4) * 60
      (v, v, v)
    }

  def patternBmp: Array[Byte] = bmp24(18, 16, patternPixels)

  /** Minimal byte-stable PNG encoder: truecolor 8-bit, filter 0 rows,
    * zlib stream of STORED deflate blocks — no `Deflater`, so the bytes
    * depend on nothing but this code (the committed-fixture identity
    * test stays valid across JDK builds). CRC32/Adler32 are the
    * fully-specified JDK implementations.
    */
  def png24(width: Int, height: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(px.length == width * height)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(be32(data.length.toLong))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
      out.toByteArray
    }
    val raw = new Array[Byte](height * (1 + width * 3))
    var i = 0
    for (y <- 0 until height) {
      raw(i) = 0 // filter: None
      i += 1
      for (x <- 0 until width) {
        val (r, g, b) = px(y * width + x)
        raw(i) = r.toByte; raw(i + 1) = g.toByte; raw(i + 2) = b.toByte
        i += 3
      }
    }
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01) // zlib header, no preset dict
    var off = 0
    while (off < raw.length) {
      val n = math.min(65535, raw.length - off)
      val last = if (off + n >= raw.length) 1 else 0
      z.write(last) // BFINAL + BTYPE=00 (stored)
      z.write(n & 0xff); z.write((n >> 8) & 0xff)
      z.write((~n) & 0xff); z.write(((~n) >> 8) & 0xff)
      z.write(raw, off, n)
      off += n
    }
    val ad = new java.util.zip.Adler32()
    ad.update(raw)
    z.write(be32(ad.getValue))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(width.toLong)); ihdr.write(be32(height.toLong))
    ihdr.write(8); ihdr.write(2) // bit depth 8, truecolor
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, filter 0, no interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("IDAT", z.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** PNG re-encode of [[patternBmp]]'s pixels — LOSSLESS, so its dHash
    * is bit-identical to pattern.bmp's: the planted CROSS-FORMAT
    * perceptual duplicate (Hamming 0 to pattern.bmp, 2 to pattern2.bmp).
    */
  def patternPng: Array[Byte] = png24(18, 16, patternPixels)

  /** Gray JPEG via the JDK's own encoder at an explicit quality. JPEG
    * bytes are encoder-version-dependent, so these fixtures are NOT in
    * the byte-identity set — the spec pins their decode facts instead.
    */
  def jpegGray(width: Int, height: Int, luma: (Int, Int) => Int,
               quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) {
      val v = luma(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    bos.toByteArray
  }

  /** 144×128 vertical stripes aligned to the 16×16 dHash cells (and to
    * JPEG's 8×8 blocks, so every block is flat — decode noise is the DC
    * quantization only, ≪ the 110-luma stripe gap): dHash row bits
    * alternate 1010…, decisively.
    */
  def photoLuma(x: Int, y: Int): Int = if ((x / 16) % 2 == 0) 180 else 70

  /** [[photoLuma]] with the top-left 2×2 dHash-cell region re-striped at
    * 60/200 — flips exactly bits (r,c) ∈ {0,1}×{0,1} of the hash (each
    * flip has a ≥ 20-luma margin): the planted JPEG near-dup at
    * Hamming 4.
    */
  def photo2Luma(x: Int, y: Int): Int =
    if (y < 32 && x < 32) { if ((x / 16) % 2 == 0) 60 else 200 }
    else photoLuma(x, y)

  def photoJpg: Array[Byte] = jpegGray(144, 128, photoLuma, 0.85f)
  def photo2Jpg: Array[Byte] = jpegGray(144, 128, photo2Luma, 0.85f)

  /** [[patternBmp]] with the top-left 4×4 corner blown to white — every
    * raw byte of that corner changes but the gradient structure
    * elsewhere is identical: a planted perceptual NEAR-duplicate
    * (small dHash Hamming distance, far from the other images).
    */
  def pattern2Bmp: Array[Byte] =
    bmp24(18, 16, Seq.tabulate(18 * 16) { i =>
      val x = i % 18; val y = i / 18
      if (x < 4 && y < 4) (255, 255, 255)
      else { val v = ((x / 2 + y / 2) % 4) * 60; (v, v, v) }
    })

  /** mono 16-bit 8 kHz, 16 frames: first half digital silence, second
    * half the ±0.5 square — windowRms(4) = [0, 0, 0.5, 0.5], the
    * planted half-silent file for the activity gate.
    */
  def quietWav: Array[Byte] =
    wav16(1, 8000, Array.tabulate(16)(i =>
      if (i < 8) 0 else if (i % 2 == 0) 16384 else -16384))

  /** [[toneWav]] at exactly HALF the amplitude (±0.25 square, mono
    * 8 kHz) — a pure volume change: the planted audio perceptual
    * duplicate (the band-energy fingerprint is scale-invariant, so its
    * Hamming distance to tone.wav is 0; peak/rms/windowRms all halve).
    */
  def toneHalfWav: Array[Byte] =
    wav16(1, 8000, Array.tabulate(16)(i => if (i % 2 == 0) 8192 else -8192))

  /** Period-4 ±0.5 square (+,+,−,−) — same peak/RMS/activity as
    * tone.wav but the fundamental at HALF the frequency: identical to
    * tone under every envelope feature, different under the band-energy
    * fingerprint — the planted spectral discriminator.
    */
  def sweepWav: Array[Byte] =
    wav16(1, 8000, Array.tabulate(16)(i =>
      if (i % 4 < 2) 16384 else -16384))

  val all: Seq[(String, Array[Byte])] = Seq(
    "tone.wav" -> toneWav, "stereo.wav" -> stereoWav, "byte8.wav" -> byteWav,
    "quiet.wav" -> quietWav, "tone_half.wav" -> toneHalfWav,
    "sweep.wav" -> sweepWav,
    "halves.bmp" -> halvesBmp, "rgb.bmp" -> rgbBmp,
    "pattern.bmp" -> patternBmp, "pattern2.bmp" -> pattern2Bmp,
    "pattern.png" -> patternPng,
    "anim.gif" -> animGif, "pages.tif" -> twoPageTiff)

  /** Two-frame animated GIF89a: 2×1 logical screen, 2-entry global
    * color table, NETSCAPE 2.0 loop extension (loop=3), a graphic
    * control extension per frame, and 1×1 frames carrying the
    * canonical minimal VALID LZW block (`02 02 44 01 00`) — a real
    * decodable animation, probed structurally by
    * [[graft.sources.GifCodec]].
    */
  def animGif: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    b('G', 'I', 'F', '8', '9', 'a')
    b(2, 0, 1, 0)            // logical screen 2×1 (LE16)
    b(0x80, 0, 0)            // GCT present (2 entries), bg 0, aspect 0
    b(0, 0, 0, 0xff, 0xff, 0xff) // GCT: black, white
    b(0x21, 0xff, 11)        // application extension
    "NETSCAPE2.0".getBytes("US-ASCII").foreach(c => b(c.toInt))
    b(3, 1, 3, 0, 0)         // sub-block: id=1, loop=3 (LE16), term
    var x = 0
    while (x < 2) {
      b(0x21, 0xf9, 4, 0x04, 10, 0, 0, 0) // GCE: 0.10 s delay
      b(0x2c, x, 0, 0, 0, 1, 0, 1, 0, 0)  // 1×1 frame at (x, 0), no LCT
      b(2, 2, 0x44, 0x01, 0)              // LZW min 2 + data + term
      x += 1
    }
    b(0x3b)
    out.toByteArray
  }

  /** Two-page baseline TIFF (little-endian): page 0 = 8×4 gray8
    * uncompressed, page 1 = 4×2, IFDs chained through the next-IFD
    * pointer — the multi-page scanned-document layout
    * [[graft.sources.TiffCodec]] pages through.
    */
  def twoPageTiff: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { b(v); b(v >> 8) }
    def w32(v: Int): Unit = { b(v); b(v >> 8); b(v >> 16); b(v >> 24) }
    b('I'); b('I'); w16(42); w32(8)
    val nE = 8
    val ifdSize = 2 + nE * 12 + 4
    val ifd1 = 8 + ifdSize
    val data0 = ifd1 + ifdSize
    val data1 = data0 + 8 * 4
    def eShort(tag: Int, v: Int): Unit = { w16(tag); w16(3); w32(1); w16(v); w16(0) }
    def eLong(tag: Int, v: Int): Unit = { w16(tag); w16(4); w32(1); w32(v) }
    def ifd(w: Int, h: Int, dataOff: Int, next: Int): Unit = {
      w16(nE)
      eShort(0x0100, w); eShort(0x0101, h); eShort(0x0102, 8)
      eShort(0x0103, 1); eShort(0x0106, 1)
      eLong(0x0111, dataOff)
      eShort(0x0116, h)
      eLong(0x0117, w * h)
      w32(next)
    }
    ifd(8, 4, data0, ifd1)
    ifd(4, 2, data1, 0)
    (0 until 32).foreach(i => b((i * 7) & 0xff))   // page-0 strip
    (0 until 8).foreach(i => b((255 - i) & 0xff))  // page-1 strip
    out.toByteArray
  }

  /** Encoder-version-dependent fixtures (JPEG): written by the
    * generator, but pinned by DECODE facts, not byte identity.
    */
  /** Hand-built Exif APP1 payload (little-endian TIFF): IFD0 camera
    * facts, Exif IFD exposure facts, GPS IFD coordinates
    * (48°51'29.79"N 2°17'40.38"E) — the planted PII the strip op must
    * remove. Deterministic bytes regardless of the JPEG encoder, so
    * the tag VALUES are oracle-pinnable even though the carrier JPEG
    * is not byte-pinned.
    */
  def exifApp1: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def ascii(s: String): Array[Byte] =
      (s + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val make = ascii("GraftCam")
    val model = ascii("Mark II")
    val dt = ascii("2026:08:05 12:00:00")
    val dto = ascii("2026:08:05 11:58:30")
    // fixed layout: header(8) | IFD0(6 entries) | Exif IFD(4) | GPS IFD(4)
    val ifd0Off = 8
    val exifOff = ifd0Off + 2 + 6 * 12 + 4
    val gpsOff = exifOff + 2 + 4 * 12 + 4
    var dataOff = gpsOff + 2 + 4 * 12 + 4
    def alloc(n: Int): Int = { val o = dataOff; dataOff += n; o }
    val makeOff = alloc(make.length)
    val modelOff = alloc(model.length)
    val dtOff = alloc(dt.length)
    val expOff = alloc(8)
    val fnumOff = alloc(8)
    val dtoOff = alloc(dto.length)
    val gpsLatOff = alloc(24)
    val gpsLonOff = alloc(24)
    def entry(tag: Int, typ: Int, cnt: Int)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(cnt)
      val before = bos.size()
      value
      while (bos.size() < before + 4) bos.write(0) // pad inline to 4
    }
    // TIFF header
    bos.write('I'); bos.write('I'); w16(42); w32(ifd0Off)
    // IFD0
    w16(6)
    entry(0x010f, 2, make.length)(w32(makeOff))
    entry(0x0110, 2, model.length)(w32(modelOff))
    entry(0x0112, 3, 1)(w16(6))
    entry(0x0132, 2, dt.length)(w32(dtOff))
    entry(0x8769, 4, 1)(w32(exifOff))
    entry(0x8825, 4, 1)(w32(gpsOff))
    w32(0)
    // Exif IFD
    w16(4)
    entry(0x829a, 5, 1)(w32(expOff))
    entry(0x829d, 5, 1)(w32(fnumOff))
    entry(0x8827, 3, 1)(w16(200))
    entry(0x9003, 2, dto.length)(w32(dtoOff))
    w32(0)
    // GPS IFD
    w16(4)
    entry(0x0001, 2, 2) { bos.write('N'); bos.write(0) }
    entry(0x0002, 5, 3)(w32(gpsLatOff))
    entry(0x0003, 2, 2) { bos.write('E'); bos.write(0) }
    entry(0x0004, 5, 3)(w32(gpsLonOff))
    w32(0)
    // data area, in alloc order
    bos.write(make); bos.write(model); bos.write(dt)
    w32(1); w32(250) // exposure 1/250
    w32(28); w32(10) // f/2.8
    bos.write(dto)
    w32(48); w32(1); w32(51); w32(1); w32(2979); w32(100) // lat 48°51'29.79"
    w32(2); w32(1); w32(17); w32(1); w32(4038); w32(100) // lon 2°17'40.38"
    "Exif\u0000\u0000".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ bos.toByteArray
  }

  /** [[photoJpg]] with the Exif APP1 spliced after SOI — the
    * EXIF/GPS-bearing fixture for the metadata report and strip ops.
    */
  def photoExifJpg: Array[Byte] = {
    val base = photoJpg
    val app1 = exifApp1
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((app1.length + 2) >> 8) & 0xff).toByte,
      ((app1.length + 2) & 0xff).toByte) ++ app1
    base.take(2) ++ seg ++ base.drop(2)
  }

  def rendered: Seq[(String, Array[Byte])] = Seq(
    "photo.jpg" -> photoJpg, "photo2.jpg" -> photo2Jpg,
    "photo_exif.jpg" -> photoExifJpg)

  /** [[patternPng]] with planted `tEXt` + uncompressed `iTXt` chunks
    * spliced after IHDR — the PNG textual-metadata fixture (separate
    * `fixtures/pngmeta/` dir so the perceptual-dedup globs over
    * `fixtures/media` never see this pixel-identical copy).
    */
  def metaPng: Array[Byte] = {
    val base = patternPng
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Long): Array[Byte] = Array(
        ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(data.length.toLong))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
      out.toByteArray
    }
    def latin1(s: String) = s.getBytes("ISO-8859-1")
    val t1 = chunk("tEXt",
      latin1("Title") ++ Array(0.toByte) ++ latin1("Diagonal ramp pattern"))
    val t2 = chunk("tEXt",
      latin1("Software") ++ Array(0.toByte) ++ latin1("graft png24"))
    val it = chunk("iTXt",
      latin1("Comment") ++ Array[Byte](0, 0, 0) ++ latin1("en") ++
        Array(0.toByte) ++ Array(0.toByte) ++
        "café ✓ utf-8 comment".getBytes("UTF-8"))
    def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      try {
        d.setInput(data); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } finally d.end()
    }
    // zTXt: keyword NUL method(0) deflate-compressed latin-1 text
    val zt = chunk("zTXt",
      latin1("Description") ++ Array[Byte](0, 0) ++
        deflate(latin1("deflate compressed latin-1 æøå description")))
    // compressed iTXt: compFlag=1, compMethod=0, deflate utf-8 payload
    val itc = chunk("iTXt",
      latin1("Annotation") ++ Array[Byte](0, 1, 0) ++ latin1("en") ++
        Array(0.toByte) ++ Array(0.toByte) ++
        deflate("compressed utf-8 ✓ annotation".getBytes("UTF-8")))
    // IHDR ends at offset 33 (8 sig + 4 len + 4 tag + 13 data + 4 crc)
    base.take(33) ++ t1 ++ t2 ++ it ++ zt ++ itc ++ base.drop(33)
  }
}

object GenPngMetaFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/pngmeta")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "meta.png"), MediaFixtures.metaPng)
    println(s"wrote $dir/meta.png (${MediaFixtures.metaPng.length} bytes)")
  }
}

object GenMediaFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/media")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    (MediaFixtures.all ++ MediaFixtures.rendered).foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      println(s"wrote $dir/$name (${bytes.length} bytes)")
    }
  }
}
