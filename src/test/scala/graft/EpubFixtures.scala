package graft

/** Deterministic EPUB fixture generator for
  * [[graft.sources.EpubCodec]] — byte-stable ([[DocxFixtures]]
  * treatment: setTimeLocal-pinned zip entries; the `mimetype` entry is
  * STORED uncompressed per the OCF spec).
  *
  * Run `Test/runMain graft.GenEpubFixtures <dir>` to (re)write them.
  */
object EpubFixtures {

  private val Container =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
      |<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles>
      |</container>""".stripMargin

  /** Spine order (ch2, ch1) REVERSED from zip/manifest order; nav and
    * img are in the manifest but not the spine (must not extract).
    */
  private val Opf =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
      |<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
      |<dc:identifier id="uid">urn:uuid:graft-epub-1</dc:identifier>
      |<dc:title>Graft Sample Book</dc:title></metadata>
      |<manifest>
      |<item id="ch1" href="text/chapter1.xhtml" media-type="application/xhtml+xml"/>
      |<item id="ch2" href="text/chapter2.xhtml" media-type="application/xhtml+xml"/>
      |<item id="nav" href="nav.xhtml" media-type="application/xhtml+xml" properties="nav"/>
      |<item id="img" href="img.png" media-type="image/png"/>
      |</manifest>
      |<spine><itemref idref="ch2"/><itemref idref="ch1"/></spine>
      |</package>""".stripMargin

  private val Chapter1 =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html xmlns="http://www.w3.org/1999/xhtml"><head><title>Chapter One</title>
      |<style>p { color: red; }</style></head>
      |<body><p>First chapter text.</p><script>var x = 1;</script></body></html>""".stripMargin

  private val Chapter2 =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html xmlns="http://www.w3.org/1999/xhtml"><head><title>Chapter Two</title></head>
      |<body><h1>Two</h1><p>Second chapter comes <em>first</em> in the spine &amp; proves order.</p></body></html>""".stripMargin

  private val Nav =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<html xmlns="http://www.w3.org/1999/xhtml"><head><title>nav</title></head>
      |<body><p>navigation — never extracted</p></body></html>""".stripMargin

  def epub(): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bo)
    val t = java.time.LocalDateTime.of(1980, 2, 1, 0, 0, 0)
    // mimetype: STORED, first entry, per OCF
    val mt = "application/epub+zip".getBytes("US-ASCII")
    val e0 = new java.util.zip.ZipEntry("mimetype")
    e0.setTimeLocal(t)
    e0.setMethod(java.util.zip.ZipOutputStream.STORED)
    e0.setSize(mt.length)
    val crc = new java.util.zip.CRC32(); crc.update(mt)
    e0.setCrc(crc.getValue)
    z.putNextEntry(e0); z.write(mt); z.closeEntry()
    def put(name: String, content: Array[Byte]): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTimeLocal(t)
      z.putNextEntry(e); z.write(content); z.closeEntry()
    }
    put("META-INF/container.xml", Container.getBytes("UTF-8"))
    put("OEBPS/content.opf", Opf.getBytes("UTF-8"))
    put("OEBPS/text/chapter1.xhtml", Chapter1.getBytes("UTF-8"))
    put("OEBPS/text/chapter2.xhtml", Chapter2.getBytes("UTF-8"))
    put("OEBPS/nav.xhtml", Nav.getBytes("UTF-8"))
    put("OEBPS/img.png", Array.tabulate(16)(i => (i * 11 % 251).toByte))
    z.close()
    bo.toByteArray
  }

  def all: Seq[(String, Array[Byte])] = Seq("book.epub" -> epub())
}

object GenEpubFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/epub")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    EpubFixtures.all.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      println(s"wrote $dir/$name (${bytes.length} bytes)")
    }
  }
}
