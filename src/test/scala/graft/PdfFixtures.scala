package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic PDF fixture generator for [[graft.sources.PdfCodec]]:
  * a from-scratch COS writer (objects + xref + trailer), byte-stable so
  * committed fixtures under `fixtures/pdf/` can be asserted identical to
  * the generator's output (any drift of either side is loud).
  *
  * Run `Test/runMain graft.GenPdfFixtures <dir>` to (re)write the
  * committed files.
  */
object PdfFixtures {

  final class Builder {
    private val bodies = scala.collection.mutable.LinkedHashMap[Int, Array[Byte]]()
    private var next = 1
    def reserve(): Int = { val n = next; next += 1; n }
    def set(n: Int, body: String): Unit = bodies(n) = body.getBytes(ISO_8859_1)
    def setRaw(n: Int, body: Array[Byte]): Unit = bodies(n) = body
    def add(body: String): Int = { val n = reserve(); set(n, body); n }
    def addRaw(body: Array[Byte]): Int = { val n = reserve(); setRaw(n, body); n }

    /** A content-stream object body, optionally FlateDecode-compressed. */
    def streamBody(data: String, compress: Boolean,
                   lengthRef: Option[Int] = None): Array[Byte] = {
      val payload =
        if (compress) deflate(data.getBytes(ISO_8859_1)) else data.getBytes(ISO_8859_1)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      val len = lengthRef.map(r => s"$r 0 R").getOrElse(payload.length.toString)
      s"<< /Length $len$filter >>\nstream\n".getBytes(ISO_8859_1) ++
        payload ++ "\nendstream".getBytes(ISO_8859_1)
    }

    def build(root: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
      w("%PDF-1.4\n%âãÏÓ\n")
      val offsets = scala.collection.mutable.Map[Int, Int]()
      for ((n, body) <- bodies.toSeq.sortBy(_._1)) {
        offsets(n) = out.size()
        w(s"$n 0 obj\n"); out.write(body); w("\nendobj\n")
      }
      val xrefPos = out.size()
      val maxN = bodies.keys.max
      w(s"xref\n0 ${maxN + 1}\n0000000000 65535 f \n")
      for (n <- 1 to maxN) w(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")
      w(s"trailer\n<< /Size ${maxN + 1} /Root $root 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
      out.toByteArray
    }
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Two uncompressed pages: escaped parens, `%` inside a string, a TJ
    * kerning array, a hex string, T* line breaks, a flat page tree.
    */
  def manualPdf: Array[Byte] = {
    val b = new Builder
    val cat = b.reserve(); val pages = b.reserve()
    val p0 = b.reserve(); val p1 = b.reserve()
    val c0 = b.reserve(); val c1 = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $pages 0 R >>")
    b.set(pages, s"<< /Type /Pages /Kids [$p0 0 R $p1 0 R] /Count 2 >>")
    b.set(p0, s"<< /Type /Page /Parent $pages 0 R /MediaBox [0 0 612 792] /Contents $c0 0 R >>")
    b.set(p1, s"<< /Type /Page /Parent $pages 0 R /MediaBox [0 0 612 792] /Contents $c1 0 R >>")
    b.setRaw(c0, b.streamBody(
      "BT /F1 12 Tf 72 720 Td (Hello, \\(graft\\) World!) Tj T* (50% off & more) Tj ET",
      compress = false))
    b.setRaw(c1, b.streamBody(
      "BT 72 720 Td [(Spark ) -250 (extracts) -250 ( page two)] TJ T* " +
        "<68657820737472696e67> Tj ET",
      compress = false))
    b.build(cat)
  }

  /** Three FlateDecode pages: nested page tree (Pages → [Pages, Page]),
    * an array-valued /Contents with an INDIRECT /Length, the `'`
    * next-line-show operator.
    */
  def flatePdf: Array[Byte] = {
    val b = new Builder
    val cat = b.reserve(); val root = b.reserve(); val inner = b.reserve()
    val p0 = b.reserve(); val p1 = b.reserve(); val p2 = b.reserve()
    val c0 = b.reserve(); val c1a = b.reserve(); val c1b = b.reserve()
    val c1bLen = b.reserve(); val c2 = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $root 0 R >>")
    b.set(root, s"<< /Type /Pages /Kids [$inner 0 R $p2 0 R] /Count 3 >>")
    b.set(inner, s"<< /Type /Pages /Parent $root 0 R /Kids [$p0 0 R $p1 0 R] /Count 2 >>")
    b.set(p0, s"<< /Type /Page /Parent $inner 0 R /Contents $c0 0 R >>")
    b.set(p1, s"<< /Type /Page /Parent $inner 0 R /Contents [$c1a 0 R $c1b 0 R] >>")
    b.set(p2, s"<< /Type /Page /Parent $root 0 R /Contents $c2 0 R >>")
    b.setRaw(c0, b.streamBody(
      "BT (Compressed alpha alpha alpha alpha) Tj ET", compress = true))
    b.setRaw(c1a, b.streamBody("BT (part one) Tj ET", compress = true))
    val c1bPayload = deflate("BT (part two) Tj ET".getBytes(ISO_8859_1))
    b.setRaw(c1b, b.streamBody("BT (part two) Tj ET", compress = true,
      lengthRef = Some(c1bLen)))
    b.set(c1bLen, c1bPayload.length.toString)
    b.setRaw(c2, b.streamBody("BT (first) Tj (second) ' ET", compress = true))
    b.build(cat)
  }

  /** One page under a CID font with a /ToUnicode CMap (bfchar incl. a
    * surrogate-pair target, bfrange, 2-byte codespace), mixed with an
    * unmapped simple font on the same line sequence; /Resources lives
    * on the PAGES node (inheritable attribute), not the leaf.
    */
  def cidPdf: Array[Byte] = {
    val b = new Builder
    val cat = b.reserve(); val pages = b.reserve(); val p0 = b.reserve()
    val c0 = b.reserve(); val f1 = b.reserve(); val f2 = b.reserve()
    val tu = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $pages 0 R >>")
    b.set(pages, s"<< /Type /Pages /Kids [$p0 0 R] /Count 1 " +
      s"/Resources << /Font << /F1 $f1 0 R /F2 $f2 0 R >> >> >>")
    b.set(p0, s"<< /Type /Page /Parent $pages 0 R /Contents $c0 0 R >>")
    b.set(f1, s"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
      s"/Encoding /Identity-H /ToUnicode $tu 0 R >>")
    b.set(f2, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.setRaw(tu, b.streamBody(
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |5 beginbfchar
        |<0001> <03B1>
        |<0002> <03B2>
        |<0003> <03B3>
        |<0004> <0020>
        |<0005> <D835DC00>
        |endbfchar
        |1 beginbfrange
        |<0010> <0019> <0061>
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end
        |end""".stripMargin, compress = false))
    b.setRaw(c0, b.streamBody(
      "BT /F1 12 Tf <001200180013000400010002000300040005> Tj T* " +
        "/F2 10 Tf (plain tail) Tj ET",
      compress = false))
    b.build(cat)
  }

  /** A modern PDF 1.5+ layout: the whole page tree (catalog, /Pages,
    * both page dicts) lives inside a FlateDecode'd `/Type /ObjStm`
    * compressed object stream, the cross-reference is an xref STREAM
    * (`/Type /XRef`, `W [1 2 1]`, type-2 entries pointing into the
    * ObjStm) and there is NO classic `trailer` keyword — the layout
    * pdflatex/word-processor exports emit, where a raw `N G obj` scan
    * alone sees zero page objects.
    */
  def objstmPdf: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def obj(n: Int, body: Array[Byte]): Unit = {
      offsets(n) = out.size()
      w(s"$n 0 obj\n"); out.write(body); w("\nendobj\n")
    }
    def flateStream(data: String, dictExtra: String = ""): Array[Byte] = {
      val payload = deflate(data.getBytes(ISO_8859_1))
      (s"<< /Length ${payload.length} /Filter /FlateDecode$dictExtra >>\nstream\n")
        .getBytes(ISO_8859_1) ++ payload ++ "\nendstream".getBytes(ISO_8859_1)
    }
    w("%PDF-1.5\n%âãÏÓ\n")
    // 1, 2: the content streams (raw objects — streams may not live in
    // an ObjStm); 3: the ObjStm holding objects 4-7; 8: the xref stream
    obj(1, flateStream(
      "BT /F1 11 Tf 72 720 Td (Object-stream page one: the page tree " +
        "itself is compressed) Tj ET"))
    obj(2, flateStream(
      "BT (Object-stream page two) Tj T* (catalog found inside ObjStm) Tj ET"))
    val inner = Seq(
      4 -> "<< /Type /Catalog /Pages 5 0 R >>",
      5 -> "<< /Type /Pages /Kids [6 0 R 7 0 R] /Count 2 >>",
      6 -> "<< /Type /Page /Parent 5 0 R /MediaBox [0 0 612 792] /Contents 1 0 R >>",
      7 -> "<< /Type /Page /Parent 5 0 R /Contents 2 0 R >>")
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    val bodyBuf = new StringBuilder
    inner.foreach { case (_, b) =>
      offs += bodyBuf.length; bodyBuf.append(b).append('\n') }
    val header = inner.zip(offs)
      .map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
    obj(3, flateStream(header + bodyBuf,
      s" /Type /ObjStm /N ${inner.length} /First ${header.length}"))
    // xref stream: W [1 2 1] — 1-byte type, 2-byte offset/objstm-num,
    // 1-byte gen/index. Objects 4-7 are type-2 entries into ObjStm 3.
    val xrefPos = out.size()
    val entries = new java.io.ByteArrayOutputStream()
    def entry(t: Int, mid: Int, last: Int): Unit = {
      entries.write(t)
      entries.write((mid >> 8) & 0xff); entries.write(mid & 0xff)
      entries.write(last)
    }
    entry(0, 0, 255) // object 0: head of the free list
    entry(1, offsets(1), 0); entry(1, offsets(2), 0); entry(1, offsets(3), 0)
    var idx = 0
    while (idx < inner.length) { entry(2, 3, idx); idx += 1 }
    entry(1, xrefPos, 0) // the xref stream object itself
    val xd = entries.toByteArray
    obj(8, (s"<< /Type /XRef /Size 9 /W [1 2 1] /Root 4 0 R " +
      s"/Length ${xd.length} >>\nstream\n").getBytes(ISO_8859_1) ++
      xd ++ "\nendstream".getBytes(ISO_8859_1))
    w(s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** TIFF-6.0-convention LZW encoder (MSB-first, 9→12-bit codes,
    * Clear=256, EOD=257), the exact inverse of `PdfCodec.lzwDecode` —
    * the encoder bumps the code width when its next-assignable code
    * reaches `(1<<len) − earlyChange`, the decoder (one deferred entry
    * behind) at `(1<<len) − 1 − earlyChange`.
    */
  def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeLen = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << codeLen) | code; bitCnt += codeLen
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    def reset(): Unit = {
      dict.clear(); (0 until 256).foreach(b => dict(Seq(b.toByte)) = b)
    }
    reset()
    var nextCode = 258
    emit(256) // leading Clear, per the TIFF/PDF convention
    var w = Vector.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (dict.contains(wb)) w = wb
      else {
        emit(dict(w))
        if (nextCode < 4096) { dict(wb) = nextCode; nextCode += 1 }
        if (nextCode >= (1 << codeLen) - earlyChange && codeLen < 12)
          codeLen += 1
        w = Vector(b)
      }
    }
    if (w.nonEmpty) emit(dict(w))
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** ASCII85 encoder — inverse of `PdfCodec.ascii85Decode`. */
  def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (j < n) data(i + j) & 0xff else 0); j += 1
      }
      if (n == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var k = 4
        while (k >= 0) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Three pages, one per non-Flate filter: LZWDecode (crossing no
    * width boundary — the big-text boundary case lives in the spec),
    * ASCIIHexDecode with whitespace + odd trailing digit semantics
    * avoided (exact pairs), and an [ASCII85Decode, FlateDecode]
    * CASCADE proving the filter array applies in order.
    */
  def filtersPdf: Array[Byte] = {
    val b = new Builder
    val cat = b.reserve(); val pages = b.reserve()
    val p0 = b.reserve(); val p1 = b.reserve(); val p2 = b.reserve()
    val c0 = b.reserve(); val c1 = b.reserve(); val c2 = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $pages 0 R >>")
    b.set(pages, s"<< /Type /Pages /Kids [$p0 0 R $p1 0 R $p2 0 R] /Count 3 >>")
    b.set(p0, s"<< /Type /Page /Parent $pages 0 R /Contents $c0 0 R >>")
    b.set(p1, s"<< /Type /Page /Parent $pages 0 R /Contents $c1 0 R >>")
    b.set(p2, s"<< /Type /Page /Parent $pages 0 R /Contents $c2 0 R >>")
    def rawStream(payload: Array[Byte], filter: String): Array[Byte] =
      (s"<< /Length ${payload.length} /Filter $filter >>\nstream\n")
        .getBytes(ISO_8859_1) ++ payload ++ "\nendstream".getBytes(ISO_8859_1)
    b.setRaw(c0, rawStream(
      lzwEncode("BT (lzw page: banana bandana ban) Tj ET".getBytes(ISO_8859_1)),
      "/LZWDecode"))
    b.setRaw(c1, rawStream(
      ("42 54 20 28 68 65 78 20 70 61 67 65 29 20 54 6A 20 45 54 >")
        .getBytes(ISO_8859_1), // "BT (hex page) Tj ET"
      "/ASCIIHexDecode"))
    b.setRaw(c2, rawStream(
      ascii85Encode(deflate(
        "BT (ascii85 over flate cascade page) Tj ET".getBytes(ISO_8859_1))),
      "[/ASCII85Decode /FlateDecode]"))
    b.build(cat)
  }

  /** Expected page texts, shared by the spec AND the `pdf_extract`
    * driver-query oracle.
    */
  val expected: Seq[(String, String)] = Seq(
    "cid_p0" -> "cid αβγ 𝐀\nplain tail",
    "filters_p0" -> "lzw page: banana bandana ban",
    "filters_p1" -> "hex page",
    "filters_p2" -> "ascii85 over flate cascade page",
    "flate_p0" -> "Compressed alpha alpha alpha alpha",
    "flate_p1" -> "part one\npart two",
    "flate_p2" -> "first\nsecond",
    "manual_p0" -> "Hello, (graft) World!\n50% off & more",
    "manual_p1" -> "Spark extracts page two\nhex string",
    "objstm_p0" -> "Object-stream page one: the page tree itself is compressed",
    "objstm_p1" -> "Object-stream page two\ncatalog found inside ObjStm")
}

object GenPdfFixtures {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(if (args.nonEmpty) args(0) else "fixtures/pdf")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("manual.pdf"), PdfFixtures.manualPdf)
    java.nio.file.Files.write(dir.resolve("flate.pdf"), PdfFixtures.flatePdf)
    java.nio.file.Files.write(dir.resolve("cid.pdf"), PdfFixtures.cidPdf)
    java.nio.file.Files.write(dir.resolve("objstm.pdf"), PdfFixtures.objstmPdf)
    java.nio.file.Files.write(dir.resolve("filters.pdf"), PdfFixtures.filtersPdf)
    println(s"wrote ${dir.toAbsolutePath}")
  }
}
