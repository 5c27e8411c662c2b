package graft

/** Deterministic DOCX fixture generator for
  * [[graft.sources.DocxCodec]] — byte-stable ([[MediaFixtures]]
  * treatment): zip entry times are pinned via `setTimeLocal` (no
  * timezone-dependent DOS-time conversion, no extended-timestamp extra
  * field), so the bytes depend only on the JDK's deflater.
  *
  * Run `Test/runMain graft.GenDocxFixtures <dir>` to (re)write them.
  */
object DocxFixtures {

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
      |</Relationships>""".stripMargin

  def docx(documentXml: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bo)
    def put(name: String, content: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTimeLocal(java.time.LocalDateTime.of(1980, 2, 1, 0, 0, 0))
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("[Content_Types].xml", ContentTypes)
    put("_rels/.rels", Rels)
    put("word/document.xml", documentXml)
    z.close()
    bo.toByteArray
  }

  /** Exercises: tab-STOP definition (must not emit a tab), run splits,
    * xml:space preserve, entities + character references, an empty
    * paragraph (dropped, leaves an index gap), in-run tab/br chars,
    * and table-cell paragraphs.
    */
  val ManualXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
      |<w:p><w:pPr><w:tabs><w:tab w:val="left" w:pos="720"/></w:tabs></w:pPr><w:r><w:t>Title of the doc</w:t></w:r></w:p>
      |<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>Bold</w:t></w:r><w:r><w:t xml:space="preserve"> and plain &amp; entities &lt;ok&gt;</w:t></w:r></w:p>
      |<w:p/>
      |<w:p><w:r><w:t>Col A</w:t><w:tab/><w:t>Col B</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
      |<w:p><w:r><w:t>Caf&#233; r&#xE9;sum&#233;</w:t></w:r></w:p>
      |<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell one</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>cell two</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
      |</w:body></w:document>""".stripMargin

  val ReportXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
      |<w:p><w:r><w:t>Quarterly report.</w:t></w:r></w:p>
      |</w:body></w:document>""".stripMargin

  def manualDocx: Array[Byte] = docx(ManualXml)
  def reportDocx: Array[Byte] = docx(ReportXml)

  def all: Seq[(String, Array[Byte])] = Seq(
    "manual.docx" -> manualDocx, "report.docx" -> reportDocx)
}

object GenDocxFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/docx")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    DocxFixtures.all.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      println(s"wrote $dir/$name (${bytes.length} bytes)")
    }
  }
}
