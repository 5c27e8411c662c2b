package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** DOCX (OOXML WordprocessingML, ECMA-376) text extractor — pure JVM:
  * the container is a ZIP (`java.util.zip`) and the body is
  * `word/document.xml`, parsed with the JDK's own StAX reader (real XML
  * parsing: namespaces, attributes, entity and character references —
  * no regex over markup). One extracted string per `w:p` paragraph, in
  * document order; table-cell paragraphs surface naturally (they are
  * `w:p` elements too).
  *
  * Within a paragraph: every `w:t` run's character data concatenates
  * (bold/italic run splits are invisible, as they should be),
  * `w:tab` → TAB, `w:br`/`w:cr` → LF. `xml:space="preserve"`
  * whitespace survives because StAX reports character data verbatim.
  * Empty paragraphs are dropped AFTER ordering (paragraph offsets stay
  * stable via the emitted index).
  */
object DocxCodec {

  /** (paragraph_idx, text) for every non-empty paragraph. */
  def extractParagraphs(bytes: Array[Byte]): Seq[(Int, String)] = {
    val xml = entryBytes(bytes, "word/document.xml").getOrElse(
      throw new IllegalArgumentException(
        "no word/document.xml entry — not a DOCX payload"))
    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    // the body is self-contained; never fetch DTDs/external entities
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var para: StringBuilder = null
    var paraIdx = -1
    var inT = false
    var inRun = false // w:tab INSIDE a run is a tab char; inside w:pPr/w:tabs it's a tab-STOP definition
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "p" => para = new StringBuilder; paraIdx += 1
              case "r" => inRun = true
              case "t" => inT = true
              case "tab" if para != null && inRun => para.append('\t')
              case "br" | "cr" if para != null && inRun => para.append('\n')
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inT && para != null) para.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "r" => inRun = false
              case "p" =>
                if (para != null && para.nonEmpty) out += ((paraIdx, para.toString))
                para = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Bytes of the named zip entry, or None. */
  private def entryBytes(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](32 * 1024)
          var n = zin.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return Some(out.toByteArray)
        }
        e = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  /** Magic sniff: ZIP local-file-header signature. */
  def looksLikeZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4
}
