package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** EPUB (OCF/OPF, ISO/IEC 23736) text extractor — the ebook container
  * behind most book corpora. Pure JVM: the container is a ZIP, the
  * packaging is XML (JDK StAX, like [[DocxCodec]]), the content
  * documents are XHTML.
  *
  * Extraction follows the SPINE (the publication's linear reading
  * order), not zip entry order: `META-INF/container.xml` → rootfile →
  * OPF manifest (id → href) + spine (ordered idrefs) → one row per
  * spine content document. Per document: `<title>` captured, `script`/
  * `style` subtrees skipped, remaining character data concatenated —
  * the [[DocumentSources.readHtml]] flattening contract, XML edition.
  */
object EpubCodec {

  /** (spine_idx, href, title, text) per spine content document; text
    * is whitespace-collapsed.
    */
  def extractSections(bytes: Array[Byte]): Seq[(Int, String, String, String)] = {
    val entries = allEntries(bytes)
    def entry(name: String): Array[Byte] =
      entries.getOrElse(name, throw new IllegalArgumentException(
        s"epub is missing '$name'"))
    val containerXml = new String(entry("META-INF/container.xml"), "UTF-8")
    val opfPath = attrOfFirst(containerXml, "rootfile", "full-path").getOrElse(
      throw new IllegalArgumentException("container.xml has no rootfile"))
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    val opf = new String(entry(opfPath), "UTF-8")
    val (manifest, spine) = parseOpf(opf)
    spine.zipWithIndex.flatMap { case (idref, idx) =>
      manifest.get(idref).map { href =>
        val path = normalize(opfDir + href)
        val (title, text) = xhtmlText(new String(entry(path), "UTF-8"))
        (idx, href, title, text)
      }
    }
  }

  private def normalize(path: String): String =
    path.split("/").foldLeft(List.empty[String]) {
      case (acc, "..") => if (acc.nonEmpty) acc.tail else acc
      case (acc, ".") => acc
      case (acc, seg) => seg :: acc
    }.reverse.mkString("/")

  /** manifest id→href and spine idref order from the OPF package doc. */
  private def parseOpf(opf: String): (Map[String, String], Seq[String]) = {
    val r = reader(opf)
    val manifest = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val spine = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT)
          r.getLocalName match {
            case "item" =>
              val id = attr(r, "id"); val href = attr(r, "href")
              if (id != null && href != null) manifest(id) = href
            case "itemref" =>
              val idref = attr(r, "idref")
              if (idref != null) spine += idref
            case _ =>
          }
      }
    } finally r.close()
    (manifest.toMap, spine.toSeq)
  }

  /** (title, flattened text) from one XHTML content document. */
  private def xhtmlText(xhtml: String): (String, String) = {
    val r = reader(xhtml)
    val text = new StringBuilder
    val title = new StringBuilder
    var inTitle = false
    var skipDepth = 0 // inside script/style subtrees
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "script" | "style" => skipDepth += 1
              case "title" => inTitle = true
              case _ => if (skipDepth > 0) skipDepth += 1
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "title" => inTitle = false
              case _ => if (skipDepth > 0) skipDepth -= 1
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inTitle) title.append(r.getText)
            else if (skipDepth == 0) { text.append(r.getText); text.append(' ') }
          case _ =>
        }
      }
    } finally r.close()
    (title.toString.trim.replaceAll("\\s+", " "),
      text.toString.trim.replaceAll("\\s+", " "))
  }

  private def reader(xml: String): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.StringReader(xml))
  }

  private def attr(r: javax.xml.stream.XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** First `<element ... attr="...">` attribute value in an XML string. */
  private def attrOfFirst(xml: String, element: String,
                          attrName: String): Option[String] = {
    val r = reader(xml)
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == element) {
          val v = attr(r, attrName)
          if (v != null) return Some(v)
        }
      }
      None
    } finally r.close()
  }

  private def allEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val bo = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](32 * 1024)
          var n = zin.read(buf)
          while (n >= 0) { bo.write(buf, 0, n); n = zin.read(buf) }
          out(e.getName) = bo.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }
}
