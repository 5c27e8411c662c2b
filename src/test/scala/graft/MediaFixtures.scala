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
  def patternBmp: Array[Byte] =
    bmp24(18, 16, Seq.tabulate(18 * 16) { i =>
      val x = i % 18; val y = i / 18
      val v = ((x / 2 + y / 2) % 4) * 60
      (v, v, v)
    })

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

  val all: Seq[(String, Array[Byte])] = Seq(
    "tone.wav" -> toneWav, "stereo.wav" -> stereoWav, "byte8.wav" -> byteWav,
    "quiet.wav" -> quietWav,
    "halves.bmp" -> halvesBmp, "rgb.bmp" -> rgbBmp,
    "pattern.bmp" -> patternBmp, "pattern2.bmp" -> pattern2Bmp)
}

object GenMediaFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/media")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    MediaFixtures.all.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      println(s"wrote $dir/$name (${bytes.length} bytes)")
    }
  }
}
