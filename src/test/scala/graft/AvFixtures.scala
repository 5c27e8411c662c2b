package graft

/** Deterministic MP3 / MP4 fixture generator for
  * [[graft.sources.Mp3Codec]] / [[graft.sources.Mp4Codec]] — byte-stable
  * ([[MediaFixtures]] treatment): headers are hand-assembled per spec,
  * payload bytes are a fixed arithmetic fill, so the committed files
  * under `fixtures/av/` are asserted identical to the generator.
  *
  * Run `Test/runMain graft.GenAvFixtures <dir>` to (re)write them.
  */
object AvFixtures {

  // ---- MP3 -----------------------------------------------------------

  /** One MPEG audio frame: 4 assembled header bytes + deterministic
    * payload fill to the spec frame length.
    */
  private def mp3Frame(h1: Int, h2: Int, h3: Int, frameLen: Int,
                       idx: Int): Array[Byte] = {
    val out = new Array[Byte](frameLen)
    out(0) = 0xff.toByte; out(1) = h1.toByte
    out(2) = h2.toByte; out(3) = h3.toByte
    var j = 4
    while (j < frameLen) { out(j) = ((idx * 31 + j) % 251).toByte; j += 1 }
    out
  }

  /** CBR: MPEG1 Layer III, 44.1 kHz, stereo, 128 kbps, 10 frames.
    * frameLen = 144*128000/44100 = 417; 11520 samples → 261 ms.
    */
  def cbrMp3: Array[Byte] =
    (0 until 10).toArray.flatMap(i => mp3Frame(0xfb, 0x90, 0x00, 417, i))

  /** VBR behind an ID3v2.4 tag: MPEG1 L3 44.1 kHz stereo, frames
    * alternating 128 kbps (len 417) and 160 kbps (len 522), 6 frames;
    * 6912 samples → 156 ms. ID3 tag: 100 synchsafe body bytes.
    */
  def vbrMp3: Array[Byte] = {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 100) ++
      Array.tabulate(100)(i => (i % 7).toByte)
    id3 ++ (0 until 6).toArray.flatMap { i =>
      if (i % 2 == 0) mp3Frame(0xfb, 0x90, 0x00, 417, i)
      else mp3Frame(0xfb, 0xa0, 0x00, 522, i)
    }
  }

  /** MPEG2 Layer III, 22.05 kHz, mono, 64 kbps, 8 frames.
    * frameLen = 72*64000/22050 = 208; 4608 samples → 208 ms.
    */
  def mono2Mp3: Array[Byte] =
    (0 until 8).toArray.flatMap(i => mp3Frame(0xf3, 0x80, 0xc0, 208, i))

  // ---- MP4 -----------------------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
  private def cc(s: String): Array[Byte] = {
    require(s.length == 4); s.getBytes("US-ASCII")
  }
  private def box(name: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ cc(name) ++ body

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ new Array[Byte](80))
  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(timescale) ++ be64(duration) ++ new Array[Byte](80))
  private def mdhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ be32(0x55c40000L))
  private def mdhdV1(timescale: Long, duration: Long): Array[Byte] =
    box("mdhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(timescale) ++ be64(duration) ++ be32(0x55c40000L))
  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", be32(0) ++ be32(0) ++ cc(handler) ++ new Array[Byte](13))
  private def stsd(codec: String): Array[Byte] =
    box("stsd", be32(0) ++ be32(1) ++ (be32(16) ++ cc(codec) ++ new Array[Byte](8)))
  private def trak(mdhd: Array[Byte], handler: String,
                   codec: String): Array[Byte] =
    box("trak", box("mdia",
      mdhd ++ hdlr(handler) ++
        box("minf", box("stbl", stsd(codec)))))

  /** Two-track MP4 (isom): mvhd v0 1000/5000 → 5000 ms; audio track
    * mp4a at 44100/220500 (5000 ms), video track avc1 at 600/3000
    * (5000 ms); a trailing 32-byte mdat.
    */
  def clipMp4: Array[Byte] =
    box("ftyp", cc("isom") ++ be32(0x200) ++ cc("isom") ++ cc("iso2")) ++
      box("moov",
        mvhdV0(1000, 5000) ++
          trak(mdhdV0(44100, 220500), "soun", "mp4a") ++
          trak(mdhdV0(600, 3000), "vide", "avc1")) ++
      box("mdat", Array.tabulate(32)(i => (i * 13 % 251).toByte))

  /** Version-1 headers (64-bit durations): mvhd v1 90000/180000 →
    * 2000 ms, one hvc1 video track, brand mp42.
    */
  def clip2Mp4: Array[Byte] =
    box("ftyp", cc("mp42") ++ be32(1) ++ cc("mp42") ++ cc("isom")) ++
      box("moov",
        mvhdV1(90000, 180000) ++
          trak(mdhdV1(90000, 180000), "vide", "hvc1")) ++
      box("mdat", Array.tabulate(16)(i => (i * 7 % 251).toByte))

  def all: Seq[(String, Array[Byte])] = Seq(
    "cbr.mp3" -> cbrMp3, "vbr.mp3" -> vbrMp3, "mono2.mp3" -> mono2Mp3,
    "clip.mp4" -> clipMp4, "clip2.mp4" -> clip2Mp4)
}

object GenAvFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/av")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    AvFixtures.all.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      println(s"wrote $dir/$name (${bytes.length} bytes)")
    }
  }
}
