package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocumentSources, PdfCodec}

class PdfSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("manual.pdf: uncompressed streams, escapes, TJ arrays, hex strings, page order") {
    val pages = PdfCodec.extractPages(PdfFixtures.manualPdf)
    assert(pages == PdfFixtures.expected.filter(_._1.startsWith("manual")).map(_._2))
  }

  test("flate.pdf: FlateDecode, nested page tree, array /Contents, indirect /Length, ' operator") {
    val pages = PdfCodec.extractPages(PdfFixtures.flatePdf)
    assert(pages == PdfFixtures.expected.filter(_._1.startsWith("flate")).map(_._2))
  }

  test("cid.pdf: ToUnicode CMap — bfchar, bfrange, surrogate pair, inherited /Resources, font switch") {
    val pages = PdfCodec.extractPages(PdfFixtures.cidPdf)
    assert(pages == PdfFixtures.expected.filter(_._1.startsWith("cid")).map(_._2))
  }

  test("objstm.pdf: page tree inside a compressed object stream, xref stream, no trailer") {
    val pages = PdfCodec.extractPages(PdfFixtures.objstmPdf)
    assert(pages == PdfFixtures.expected.filter(_._1.startsWith("objstm")).map(_._2))
    // the fixture really has NO page objects visible to a raw text scan
    val s = new String(PdfFixtures.objstmPdf,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("/Type /Catalog") && !s.contains("/Type /Page"),
      "page tree must only exist Flate-compressed inside the ObjStm")
    assert(!s.contains("trailer"))
  }

  test("a structurally broken ObjStm fails loudly, not with silent page loss") {
    // corrupt the ObjStm header: /N claims more pairs than present
    val b = new PdfFixtures.Builder
    val cat = b.reserve(); val stm = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages 9 0 R >>") // pages live "in" the ObjStm
    val payload = PdfFixtures.deflate("9 0\n<< /Type /Pages /Kids [] /Count 0 >>\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    b.setRaw(stm, (s"<< /Type /ObjStm /N 4 /First 4 /Length ${payload.length} " +
      "/Filter /FlateDecode >>\nstream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ payload ++
      "\nendstream".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val e = intercept[IllegalArgumentException] {
      PdfCodec.extractPages(b.build(cat))
    }
    assert(e.getMessage.contains("ObjStm"))
  }

  test("filters.pdf: LZWDecode, ASCIIHexDecode, ASCII85+Flate cascade") {
    val pages = PdfCodec.extractPages(PdfFixtures.filtersPdf)
    assert(pages == PdfFixtures.expected.filter(_._1.startsWith("filters")).map(_._2))
  }

  test("LZW: TIFF-spec vector, width-boundary round-trips, KwKwK, corrupt is loud") {
    // the TIFF 6.0 worked example: codes <Clear> 7 258 8 8 258 6 6 <EOD>
    // decode to 7 7 7 8 8 7 7 6 6 — all 9-bit, externally anchored
    val codes = Seq(256, 7, 258, 8, 8, 258, 6, 6, 257)
    val packed = {
      val out = new java.io.ByteArrayOutputStream()
      var buf = 0L; var cnt = 0
      codes.foreach { c =>
        buf = (buf << 9) | c; cnt += 9
        while (cnt >= 8) { out.write(((buf >>> (cnt - 8)) & 0xff).toInt); cnt -= 8 }
      }
      if (cnt > 0) out.write(((buf << (8 - cnt)) & 0xff).toInt)
      out.toByteArray
    }
    assert(PdfCodec.lzwDecode(packed).toSeq ==
      Seq[Byte](7, 7, 7, 8, 8, 7, 7, 6, 6))
    // round-trips crossing the 9->10->11 bit boundaries, both
    // early-change conventions (encoder and decoder must stay in sync
    // across >1800 dictionary entries)
    val rnd = new scala.util.Random(7)
    val big = Array.fill(20000)((rnd.nextInt(8) + 'a').toByte)
    for (e <- Seq(0, 1))
      assert(java.util.Arrays.equals(
        PdfCodec.lzwDecode(PdfFixtures.lzwEncode(big, e), e), big),
        s"LZW round-trip failed at earlyChange=$e")
    // corrupt stream: out-of-range code is a loud error
    intercept[IllegalArgumentException] {
      PdfCodec.lzwDecode(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte))
    }
  }

  test("ASCIIHex + ASCII85 corners: whitespace, odd digit, z, partial group, loud errors") {
    assert(PdfCodec.asciiHexDecode("42 54\n20 7>".getBytes).toSeq ==
      "BT p".getBytes.toSeq) // odd trailing digit pads low nibble 0
    intercept[IllegalArgumentException] { PdfCodec.asciiHexDecode("4G>".getBytes) }
    // 'z' = four zero bytes; partial group of n chars -> n-1 bytes
    assert(PdfCodec.ascii85Decode("z~>".getBytes).toSeq == Seq[Byte](0, 0, 0, 0))
    val roundTrip = "filter cascade sample!".getBytes
    assert(PdfCodec.ascii85Decode(PdfFixtures.ascii85Encode(roundTrip)).toSeq ==
      roundTrip.toSeq)
    assert(PdfCodec.ascii85Decode("ab~>".getBytes).length == 1) // 2 chars -> 1 byte
    intercept[IllegalArgumentException] { PdfCodec.ascii85Decode("a~>".getBytes) }
    intercept[IllegalArgumentException] { PdfCodec.ascii85Decode("|~>".getBytes) }
  }

  test("CMap corners: 1-byte codes, unmapped code, trailing partial code, broken CMap ignored") {
    val cm = PdfCodec.parseToUnicodeCMap(
      "1 begincodespacerange <00> <FF> endcodespacerange\n" +
        "2 beginbfchar <41> <0058> <42> <0059> endbfchar")
    assert(cm.codeBytes == 1)
    assert(cm.map == Map(0x41 -> "X", 0x42 -> "Y"))
    // array-destination bfrange form
    val cm2 = PdfCodec.parseToUnicodeCMap(
      "1 beginbfrange <01> <02> [<0041> <0042>] endbfrange")
    assert(cm2.map == Map(1 -> "A", 2 -> "B"))
    // a font whose ToUnicode stream is junk must not sink the page
    val b = new PdfFixtures.Builder
    val cat = b.reserve(); val pages = b.reserve(); val p = b.reserve()
    val c = b.reserve(); val f = b.reserve(); val tu = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $pages 0 R >>")
    b.set(pages, s"<< /Type /Pages /Kids [$p 0 R] /Count 1 >>")
    b.set(p, s"<< /Type /Page /Parent $pages 0 R /Contents $c 0 R " +
      s"/Resources << /Font << /F9 $f 0 R >> >> >>")
    b.set(f, s"<< /Type /Font /ToUnicode $tu 0 R >>")
    b.set(tu, "<< /Length 4 /Filter /LZWDecode >>\nstream\nabcd\nendstream")
    b.setRaw(c, b.streamBody("BT /F9 9 Tf (fallback bytes) Tj ET",
      compress = false))
    assert(PdfCodec.extractPages(b.build(cat)) == Seq("fallback bytes"))
  }

  test("committed fixtures are byte-identical to the generator (codec/fixture drift is loud)") {
    val dir = java.nio.file.Paths.get("fixtures/pdf")
    assert(Files.exists(dir.resolve("manual.pdf")),
      "run Test/runMain graft.GenPdfFixtures to write fixtures/pdf")
    assert(Files.readAllBytes(dir.resolve("manual.pdf")).toSeq ==
      PdfFixtures.manualPdf.toSeq)
    assert(Files.readAllBytes(dir.resolve("flate.pdf")).toSeq ==
      PdfFixtures.flatePdf.toSeq)
    assert(Files.readAllBytes(dir.resolve("cid.pdf")).toSeq ==
      PdfFixtures.cidPdf.toSeq)
    assert(Files.readAllBytes(dir.resolve("objstm.pdf")).toSeq ==
      PdfFixtures.objstmPdf.toSeq)
    assert(Files.readAllBytes(dir.resolve("filters.pdf")).toSeq ==
      PdfFixtures.filtersPdf.toSeq)
  }

  test("string edge cases: octal escapes, line continuation, nested parens, UTF-16BE") {
    // a one-page doc exercising the string decoder's corners directly
    val b = new PdfFixtures.Builder
    val cat = b.reserve(); val pages = b.reserve(); val p = b.reserve(); val c = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $pages 0 R >>")
    b.set(pages, s"<< /Type /Pages /Kids [$p 0 R] /Count 1 >>")
    b.set(p, s"<< /Type /Page /Parent $pages 0 R /Contents $c 0 R >>")
    // \101 = 'A'; backslash-newline is a continuation (no output);
    // (nested (parens) balance); FEFF-tagged hex string is UTF-16BE
    b.setRaw(c, b.streamBody(
      "BT (\\101B\\\n C) Tj T* (nested (parens) ok) Tj T* <FEFF00480069> Tj ET",
      compress = false))
    val pdf = b.build(cat)
    assert(PdfCodec.extractPages(pdf) == Seq("AB C\nnested (parens) ok\nHi"))
  }

  test("page without /Contents is an empty string; numbers/booleans/null parse in dicts") {
    val b = new PdfFixtures.Builder
    val cat = b.reserve(); val pages = b.reserve(); val p0 = b.reserve(); val p1 = b.reserve()
    val c1 = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $pages 0 R >>")
    b.set(pages, s"<< /Type /Pages /Kids [$p0 0 R $p1 0 R] /Count 2 >>")
    b.set(p0, s"<< /Type /Page /Parent $pages 0 R /Rotate 0 /UserUnit 1.0 " +
      "/Annots null /B true >>")
    b.set(p1, s"<< /Type /Page /Parent $pages 0 R /Contents $c1 0 R >>")
    b.setRaw(c1, b.streamBody("BT (only page two speaks) Tj ET", compress = false))
    assert(PdfCodec.extractPages(b.build(cat)) == Seq("", "only page two speaks"))
  }

  test("failure modes are loud and named: not-a-pdf, unsupported filter, page-tree cycle") {
    val e1 = intercept[IllegalArgumentException] {
      PdfCodec.extractPages("hello world".getBytes)
    }
    assert(e1.getMessage.contains("%PDF-"))

    val b = new PdfFixtures.Builder
    val cat = b.reserve(); val pages = b.reserve(); val p = b.reserve(); val c = b.reserve()
    b.set(cat, s"<< /Type /Catalog /Pages $pages 0 R >>")
    b.set(pages, s"<< /Type /Pages /Kids [$p 0 R] /Count 1 >>")
    b.set(p, s"<< /Type /Page /Parent $pages 0 R /Contents $c 0 R >>")
    b.set(c, "<< /Length 4 /Filter /LZWDecode >>\nstream\nabcd\nendstream")
    val e2 = intercept[IllegalArgumentException] { PdfCodec.extractPages(b.build(cat)) }
    assert(e2.getMessage.contains("LZWDecode"))

    val b2 = new PdfFixtures.Builder
    val cat2 = b2.reserve(); val pages2 = b2.reserve()
    b2.set(cat2, s"<< /Type /Catalog /Pages $pages2 0 R >>")
    // self-referencing Kids: must terminate with a cycle error
    b2.set(pages2, s"<< /Type /Pages /Kids [$pages2 0 R] /Count 1 >>")
    val e3 = intercept[IllegalArgumentException] { PdfCodec.extractPages(b2.build(cat2)) }
    assert(e3.getMessage.contains("cycle"))
  }

  test("readPdf drives the standard split-embed pipeline from real PDF bytes") {
    val dir = Files.createTempDirectory("pdfs").toString
    Files.write(java.nio.file.Paths.get(dir, "manual.pdf"), PdfFixtures.manualPdf)
    Files.write(java.nio.file.Paths.get(dir, "flate.pdf"), PdfFixtures.flatePdf)
    Files.write(java.nio.file.Paths.get(dir, "cid.pdf"), PdfFixtures.cidPdf)
    Files.write(java.nio.file.Paths.get(dir, "objstm.pdf"), PdfFixtures.objstmPdf)
    Files.write(java.nio.file.Paths.get(dir, "filters.pdf"), PdfFixtures.filtersPdf)
    val docs = DocumentSources.readPdf(spark, s"$dir/*.pdf")
    val got = docs.select($"doc_id", $"text").as[(String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == PdfFixtures.expected)
    // page provenance rides in metadata, reference PyPDFLoader-style
    assert(docs.filter($"doc_id" === "flate_p2")
      .select(element_at($"metadata", "page")).as[String].head() == "2")
    // the standard downstream: fixed-window split + hash embed
    val chunks = graft.ops.Split.chunkDocs(docs, "doc_id", "text",
      graft.ops.Split.fixedWindow(_, size = 16, stride = 12))
    assert(chunks.count() > got.size, "multi-chunk pages must split")
    val embedded = chunks.withColumn("embedding",
      graft.embed.EmbedText.embedText($"chunk_text", graft.embed.HashEmbedder(8)))
    assert(embedded.select(size($"embedding")).distinct().as[Int].collect().toSeq == Seq(8))
  }
}
