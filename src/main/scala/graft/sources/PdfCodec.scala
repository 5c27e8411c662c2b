package graft.sources

import java.nio.charset.StandardCharsets

/** Minimal pure-JVM PDF text extractor: one string per page, in page-tree
  * order — the contract of the reference's ingestion front door
  * (`PyPDFLoader`, one Document per page,
  * `/root/reference/src/server/utils/embedding.py:180-181`), re-homed as
  * a self-contained parser so [[DocumentSources.readPdf]] needs no codec
  * dependency in the container.
  *
  * Scope (deliberately the common denominator of machine-written PDFs):
  *   - classic cross-reference tables AND xref-stream files (objects are
  *     discovered by a full `N G obj` scan, so both layouts parse; the
  *     trailer/catalog is located structurally, not via offsets — a
  *     damaged or split xref cannot hide pages), INCLUDING objects
  *     packed inside `/Type /ObjStm` compressed object streams (the
  *     PDF 1.5+ layout modern producers emit, where the page tree
  *     itself lives compressed — each ObjStm is inflated, its
  *     `objnum offset` pair header parsed, and the contained objects
  *     merged into the object map);
  *   - object graph: dicts, arrays, names, numbers, booleans, null,
  *     literal + hex strings, indirect references (including indirect
  *     `/Length`), streams;
  *   - filters: `FlateDecode` (java.util.zip.Inflater) and unfiltered;
  *     anything else fails loudly with the filter name;
  *   - text operators inside content streams: `Tj`, `'`, `"`, `TJ`
  *     (strings concatenated; kerning numbers ignored), line breaks from
  *     `T*`/`Td`/`TD` (dy ≠ 0) — the same order-of-appearance extraction
  *     a layout-free extractor performs;
  *   - fonts: the active font tracks `Tf`, and a font carrying a
  *     `/ToUnicode` CMap (the CID-font case — every LaTeX/word-processor
  *     PDF with subset fonts) has its strings decoded through the CMap
  *     (codespacerange/bfchar/bfrange, 1- or 2-byte codes, UTF-16BE
  *     targets; unmapped codes become U+FFFD, a broken CMap is ignored).
  *     Simple-font `/Encoding` differences are NOT applied: bytes decode
  *     as PDFDoc/Latin-1, UTF-16BE for BOM-tagged strings — correct for
  *     standard-font PDFs, and the accepted failure mode (garbled exotic
  *     unmapped text, never a crash) degrades the same way `pypdf`
  *     without font data does.
  *
  * Parsing is per-FILE inside a `binaryFile` scan, so the work
  * distributes with the files; a 100 TB corpus is many PDFs, not one.
  */
object PdfCodec {

  private final case class Name(v: String)
  private final case class Ref(n: Long, g: Long)
  private final case class Str(bytes: Array[Byte])
  /** A stream object: its dict plus the byte offset where data starts. */
  private final case class StreamObj(dict: Map[String, Any], dataStart: Int)

  /** Extract page texts from raw PDF bytes. Throws IllegalArgumentException
    * on structurally un-parseable input (not a PDF, unsupported filter).
    */
  def extractPages(bytes: Array[Byte]): Seq[String] = {
    // latin-1 maps bytes 0-255 to chars 0-255 one to one, so string
    // indexes ARE byte offsets — binary stream payloads pass through
    // undamaged and substring slicing stays exact
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    require(s.startsWith("%PDF-"), "not a PDF (missing %PDF- header)")
    val objects = withObjStmObjects(scanObjects(s), s)
    val catalog = findCatalog(s, objects)
    val pagesRef = catalog.get("Pages") match {
      case Some(r: Ref) => r
      case other => throw new IllegalArgumentException(s"catalog has no /Pages ref: $other")
    }
    val pages = collectPages(pagesRef, objects, new scala.collection.mutable.HashSet[Ref])
    pages.map { page =>
      val content = page.get("Contents") match {
        case Some(r: Ref) => decodedStream(r, objects, s)
        case Some(a: Vector[Any] @unchecked) =>
          a.collect { case r: Ref => decodedStream(r, objects, s) }.mkString("\n")
        case _ => ""
      }
      extractText(content, fontCMaps(page, objects, s))
    }
  }

  // ---- ToUnicode CMaps --------------------------------------------------

  /** A parsed ToUnicode CMap: fixed code width in bytes + code → text. */
  private[graft] final case class CMap(codeBytes: Int, map: Map[Int, String])

  /** The page's fonts that carry a /ToUnicode CMap, keyed by resource
    * name (the `/F1` of `Tf`). `/Resources` is an inheritable page
    * attribute — when the leaf lacks one, the nearest ancestor's is
    * recorded under `__inheritedResources` by [[collectPages]]. A font
    * whose CMap fails to parse is skipped (fallback byte decoding), not
    * an error — one exotic font must not sink the page.
    */
  private def fontCMaps(page: Map[String, Any], objects: Map[Ref, Any],
                        s: String): Map[String, CMap] = {
    val res = page.get("Resources").orElse(page.get("__inheritedResources"))
      .map(resolve(_, objects))
    val fonts = res match {
      case Some(d: Map[String, Any] @unchecked) =>
        d.get("Font").map(resolve(_, objects)) match {
          case Some(f: Map[String, Any] @unchecked) => f
          case _ => Map.empty[String, Any]
        }
      case _ => Map.empty[String, Any]
    }
    fonts.flatMap { case (name, fref) =>
      try {
        resolve(fref, objects) match {
          case fd: Map[String, Any] @unchecked =>
            fd.get("ToUnicode").collect { case r: Ref =>
              name -> parseToUnicodeCMap(decodedStream(r, objects, s))
            }
          case _ => None
        }
      } catch { case _: Exception => None }
    }
  }

  /** Parse a ToUnicode CMap stream: `begincodespacerange`,
    * `beginbfchar`, `beginbfrange` (both the incrementing-hex and the
    * explicit-array destination forms). Code width = the byte length of
    * the first codespacerange low bound (2 for the Identity-H CID case,
    * 1 for simple subset fonts), falling back to the first bfchar/
    * bfrange source width when the codespace section is absent.
    */
  private[graft] def parseToUnicodeCMap(content: String): CMap = {
    val p = new Parser(content, 0)
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    var codeBytes = 0
    val operands = scala.collection.mutable.ArrayBuffer[Any]()
    def codeOf(t: Str): Int = {
      if (codeBytes == 0) codeBytes = t.bytes.length
      t.bytes.foldLeft(0)((acc, b) => (acc << 8) | (b & 0xff))
    }
    def dstOf(t: Str): String = new String(t.bytes, StandardCharsets.UTF_16BE)
    while (p.hasMore) {
      p.ws()
      if (p.hasMore) {
        if (p.peekDelim) {
          try operands += p.parseValue()
          catch { case _: Exception => p.i += 1 }
        } else p.parseBareWord() match {
          case "begincodespacerange" =>
            operands.clear()
            var w = nextWordOrValue(p, operands)
            while (w != Some("endcodespacerange") && w.isDefined) {
              w = nextWordOrValue(p, operands)
            }
            operands.collectFirst { case t: Str => codeBytes = t.bytes.length }
              : Unit
            operands.clear()
          case "beginbfchar" =>
            operands.clear()
            var w = nextWordOrValue(p, operands)
            while (w != Some("endbfchar") && w.isDefined) {
              w = nextWordOrValue(p, operands)
            }
            operands.grouped(2).foreach {
              case scala.collection.mutable.ArrayBuffer(src: Str, dst: Str) =>
                map(codeOf(src)) = dstOf(dst)
              case _ => ()
            }
            operands.clear()
          case "beginbfrange" =>
            operands.clear()
            var w = nextWordOrValue(p, operands)
            while (w != Some("endbfrange") && w.isDefined) {
              w = nextWordOrValue(p, operands)
            }
            operands.grouped(3).foreach {
              case scala.collection.mutable.ArrayBuffer(
                  lo: Str, hi: Str, dst: Str) =>
                val l = codeOf(lo); val h = codeOf(hi)
                val base = dst.bytes
                var c = l
                while (c <= h) {
                  // increment the LAST code unit (the spec's rule)
                  val b = java.util.Arrays.copyOf(base, base.length)
                  val off = c - l
                  if (b.length >= 2) {
                    val last = (((b(b.length - 2) & 0xff) << 8) |
                      (b(b.length - 1) & 0xff)) + off
                    b(b.length - 2) = ((last >> 8) & 0xff).toByte
                    b(b.length - 1) = (last & 0xff).toByte
                  }
                  map(c) = new String(b, StandardCharsets.UTF_16BE)
                  c += 1
                }
              case scala.collection.mutable.ArrayBuffer(
                  lo: Str, hi: Str, dsts: Vector[Any] @unchecked) =>
                val l = codeOf(lo); val h = codeOf(hi)
                var c = l
                while (c <= h && (c - l) < dsts.length) {
                  dsts(c - l) match {
                    case d: Str => map(c) = dstOf(d)
                    case _ => ()
                  }
                  c += 1
                }
              case _ => ()
            }
            operands.clear()
          case _ => operands.clear()
        }
      }
    }
    CMap(if (codeBytes <= 0) 1 else codeBytes, map.toMap)
  }

  /** Read the next token into `operands` when it is a value; return the
    * bare word otherwise (None at end of input).
    */
  private def nextWordOrValue(
      p: Parser,
      operands: scala.collection.mutable.ArrayBuffer[Any]): Option[String] = {
    p.ws()
    if (!p.hasMore) None
    else if (p.peekDelim) {
      try operands += p.parseValue()
      catch { case _: Exception => p.i += 1 }
      nextWordOrValue(p, operands)
    } else Some(p.parseBareWord())
  }

  // ---- object scan ----------------------------------------------------

  private val ObjRe = """(?s)(\d+)\s+(\d+)\s+obj\b""".r

  /** Every `N G obj` body in the file, parsed. Later definitions of the
    * same (N, G) win — incremental-update files append the live version.
    */
  private def scanObjects(s: String): Map[Ref, Any] = {
    val out = scala.collection.mutable.LinkedHashMap[Ref, Any]()
    for (m <- ObjRe.findAllMatchIn(s)) {
      // an "N G obj" matched inside a stream payload is possible in
      // principle; a failed parse there must not kill the real objects
      try {
        val p = new Parser(s, m.end)
        val v = p.parseValue()
        p.ws()
        val value =
          if (s.startsWith("stream", p.i)) {
            v match {
              case d: Map[String, Any] @unchecked =>
                var ds = p.i + "stream".length
                if (ds < s.length && s.charAt(ds) == '\r') ds += 1
                if (ds < s.length && s.charAt(ds) == '\n') ds += 1
                StreamObj(d, ds)
              case _ => v
            }
          } else v
        out(Ref(m.group(1).toLong, m.group(2).toLong)) = value
      } catch { case _: Exception => () }
    }
    out.toMap
  }

  /** The document catalog: last `trailer` dict's /Root when present
    * (classic xref), else the unique object with /Type /Catalog
    * (xref-stream files carry the trailer inside the xref stream's dict,
    * which this offset-free parser does not read).
    */
  private def findCatalog(s: String, objects: Map[Ref, Any]): Map[String, Any] = {
    val trailerRoots =
      """trailer""".r.findAllMatchIn(s).toSeq.reverseIterator.flatMap { m =>
        try {
          val p = new Parser(s, m.end)
          p.parseValue() match {
            case d: Map[String, Any] @unchecked => d.get("Root").collect { case r: Ref => r }
            case _ => None
          }
        } catch { case _: Exception => None }
      }
    val rootRef = trailerRoots.flatMap(r => objects.get(r).map(_ => r)).take(1).toSeq.headOption
    val cat = rootRef.map(resolve(_, objects)).orElse {
      objects.values.collectFirst {
        case d: Map[String, Any] @unchecked if d.get("Type").contains(Name("Catalog")) => d
      }
    }
    cat match {
      case Some(d: Map[String, Any] @unchecked) => d
      case _ => throw new IllegalArgumentException("no document catalog found")
    }
  }

  private def resolve(v: Any, objects: Map[Ref, Any]): Any = v match {
    case r: Ref => objects.getOrElse(r,
      throw new IllegalArgumentException(s"dangling object reference $r"))
    case other => other
  }

  /** Depth-first page-tree walk: /Pages nodes recurse through /Kids in
    * order, /Page leaves collect — cycle-guarded (a malformed tree is a
    * loud error, not an infinite loop). `/Resources` is inheritable:
    * the nearest ancestor's rides along as `__inheritedResources` on
    * leaves that lack their own.
    */
  private def collectPages(ref: Ref, objects: Map[Ref, Any],
                           seen: scala.collection.mutable.HashSet[Ref],
                           inheritedRes: Option[Any] = None): Vector[Map[String, Any]] = {
    require(seen.add(ref), s"cycle in page tree at $ref")
    resolve(ref, objects) match {
      case d: Map[String, Any] @unchecked =>
        d.get("Type") match {
          case Some(Name("Page")) =>
            if (d.contains("Resources")) Vector(d)
            else Vector(inheritedRes
              .map(r => d + ("__inheritedResources" -> r)).getOrElse(d))
          case _ =>
            val inh = d.get("Resources").orElse(inheritedRes)
            d.get("Kids") match {
              case Some(kids: Vector[Any] @unchecked) =>
                kids.collect { case r: Ref => r }
                  .flatMap(collectPages(_, objects, seen, inh)).toVector
              case _ => Vector.empty
            }
        }
      case _ => Vector.empty
    }
  }

  // ---- stream decoding ------------------------------------------------

  private def decodedStream(ref: Ref, objects: Map[Ref, Any], s: String): String =
    resolve(ref, objects) match {
      case so: StreamObj => decodeStreamObj(so, objects, s)
      case other =>
        throw new IllegalArgumentException(s"content ref $ref is not a stream: $other")
    }

  private def decodeStreamObj(so: StreamObj, objects: Map[Ref, Any], s: String): String = {
    so match {
      case StreamObj(dict, dataStart) =>
        val len = resolve(dict.getOrElse("Length",
          throw new IllegalArgumentException("stream without /Length")), objects) match {
          case n: Long => n.toInt
          case n: Double => n.toInt
          case other => throw new IllegalArgumentException(s"bad /Length: $other")
        }
        val raw = new Array[Byte](len)
        var k = 0
        while (k < len) { raw(k) = s.charAt(dataStart + k).toByte; k += 1 }
        val filters = dict.get("Filter") match {
          case None => Nil
          case Some(Name(f)) => Seq(f)
          case Some(a: Vector[Any] @unchecked) => a.collect { case Name(f) => f }
          case Some(other) => throw new IllegalArgumentException(s"bad /Filter: $other")
        }
        // /DecodeParms (or legacy /DP): dict, or array parallel to the
        // filter array — only /EarlyChange (LZW) is consulted
        val parms: Int => Option[Map[String, Any]] = {
          val dp = dict.get("DecodeParms").orElse(dict.get("DP"))
            .map(resolve(_, objects))
          i => dp match {
            case Some(m: Map[String, Any] @unchecked) if i == 0 => Some(m)
            case Some(a: Vector[Any] @unchecked) if i < a.length =>
              resolve(a(i), objects) match {
                case m: Map[String, Any] @unchecked => Some(m)
                case _ => None
              }
            case _ => None
          }
        }
        val decoded = filters.zipWithIndex.foldLeft(raw) {
          case (data, ("FlateDecode", _)) => inflate(data)
          case (data, ("ASCIIHexDecode", _)) => asciiHexDecode(data)
          case (data, ("ASCII85Decode", _)) => ascii85Decode(data)
          case (data, ("LZWDecode", i)) =>
            val early = parms(i).flatMap(_.get("EarlyChange")).map {
              case n: Long => n.toInt
              case _ => 1
            }
            early match {
              case Some(e) => lzwDecode(data, e)
              case None =>
                // convention unstated: try the spec default (early
                // change), fall back to the late convention — desynced
                // widths surface as out-of-range codes, loudly
                try lzwDecode(data, 1)
                catch { case _: IllegalArgumentException => lzwDecode(data, 0) }
            }
          case (_, (f, _)) =>
            throw new IllegalArgumentException(s"unsupported stream filter /$f — " +
              "PdfCodec handles FlateDecode, LZWDecode, ASCIIHexDecode, " +
              "ASCII85Decode, and unfiltered streams")
        }
        new String(decoded, StandardCharsets.ISO_8859_1)
    }
  }

  // ---- non-Flate stream filters ----------------------------------------

  /** ASCIIHexDecode (PDF 7.4.2): hex pairs, whitespace ignored, `>`
    * ends the data, an odd trailing digit is padded with 0.
    */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        if (v < 0)
          throw new IllegalArgumentException(s"bad ASCIIHexDecode char '$c'")
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: low nibble = 0
    out.toByteArray
  }

  /** ASCII85Decode (PDF 7.4.3): base-85 groups of 5 chars (`!`..`u`)
    * to 4 bytes, `z` = four zero bytes, whitespace ignored, `~>` ends
    * the data; a partial group of n chars yields n−1 bytes (padded
    * with `u` before decode).
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5)
    val grp = new Array[Int](5)
    var n = 0
    def flush(count: Int): Unit = {
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < count) grp(i) else 84); i += 1 }
      if (v > 0xffffffffL)
        throw new IllegalArgumentException("ASCII85Decode group overflow")
      val bytes = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bytes, 0, count - 1)
      n = 0
    }
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (!c.isWhitespace) {
        if (c < '!' || c > 'u')
          throw new IllegalArgumentException(s"bad ASCII85Decode char '$c'")
        grp(n) = c - '!'
        n += 1
        if (n == 5) flush(5)
      }
      i += 1
    }
    if (n == 1)
      throw new IllegalArgumentException("ASCII85Decode: lone trailing char")
    if (n > 1) flush(n)
    out.toByteArray
  }

  /** LZWDecode (PDF 7.4.4 / TIFF 6.0 LZW): MSB-first variable-width
    * codes 9→12 bits, Clear=256, EOD=257. `earlyChange = 1` (the
    * default) widens the code one step early — the deferred-entry
    * decoder compensates with the `− 1` in the bump test below, the
    * classic off-by-one the PDF spec inherited from TIFF. Out-of-range
    * codes are a loud error (which is also how the caller detects a
    * stream written under the other convention and retries).
    */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    var codeLen = 9
    var prev: Array[Byte] = null
    def reset(): Unit = { dictSize = 258; codeLen = 9; prev = null }
    reset()
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    var eod = false
    while (!eod && (bitCnt >= codeLen || i < data.length)) {
      while (bitCnt < codeLen && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xff); bitCnt += 8; i += 1
      }
      if (bitCnt < codeLen) eod = true // trailing pad bits
      else {
        val code = ((bitBuf >>> (bitCnt - codeLen)) & ((1L << codeLen) - 1)).toInt
        bitCnt -= codeLen
        if (code == 256) reset()
        else if (code == 257) eod = true
        else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code < dictSize && dict(code) != null) dict(code)
            else if (prev != null && code == dictSize) prev :+ prev(0) // KwKwK
            else throw new IllegalArgumentException(
              s"corrupt LZWDecode stream: code $code, dict $dictSize")
          out.write(entry, 0, entry.length)
          if (prev != null && dictSize < 4096) {
            dict(dictSize) = prev :+ entry(0)
            dictSize += 1
          }
          prev = entry
          if (dictSize >= (1 << codeLen) - 1 - earlyChange && codeLen < 12)
            codeLen += 1
        }
      }
    }
    out.toByteArray
  }

  // ---- object streams (/Type /ObjStm, PDF 1.5+) -------------------------

  /** Merge objects packed inside compressed object streams into the
    * raw-scan object map. Modern xref-stream producers keep the page
    * tree (catalog, /Pages nodes, page dicts) inside `/Type /ObjStm`
    * streams, invisible to the `N G obj` text scan — without this pass
    * those pages are silently lost. Each ObjStm decodes (FlateDecode),
    * its header (`/N` space-separated `objnum offset` integer pairs,
    * data starting at `/First`) is parsed, and every contained object
    * joins the map with generation 0 (the spec fixes gen 0 for
    * compressed objects). A raw-scanned object with the same number
    * wins on conflict (an incremental update appending a raw
    * replacement is the only case both exist). A structurally broken
    * ObjStm is a LOUD error — it means real objects are unreachable,
    * the exact silent-page-loss failure this pass exists to close.
    */
  private def withObjStmObjects(raw: Map[Ref, Any], s: String): Map[Ref, Any] = {
    val extra = scala.collection.mutable.LinkedHashMap[Ref, Any]()
    raw.foreach {
      case (_, so @ StreamObj(dict, _))
          if dict.get("Type").contains(Name("ObjStm")) =>
        val content = decodeStreamObj(so, raw, s)
        val n = resolve(dict.getOrElse("N",
          throw new IllegalArgumentException("ObjStm without /N")), raw) match {
          case v: Long => v.toInt
          case other => throw new IllegalArgumentException(s"bad ObjStm /N: $other")
        }
        val first = resolve(dict.getOrElse("First",
          throw new IllegalArgumentException("ObjStm without /First")), raw) match {
          case v: Long => v.toInt
          case other => throw new IllegalArgumentException(s"bad ObjStm /First: $other")
        }
        if (first > content.length)
          throw new IllegalArgumentException("ObjStm /First beyond stream end")
        val header = content.substring(0, first).trim.split("\\s+")
        if (header.length < 2 * n)
          throw new IllegalArgumentException(
            s"ObjStm header has ${header.length} ints, need ${2 * n}")
        var i = 0
        while (i < n) {
          val num = header(2 * i).toLong
          val off = header(2 * i + 1).toInt
          val p = new Parser(content, first + off)
          extra(Ref(num, 0L)) = p.parseValue()
          i += 1
        }
      case _ => ()
    }
    raw ++ extra.filterNot { case (r, _) => raw.contains(r) }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) {
          throw new IllegalArgumentException("truncated FlateDecode stream")
        }
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt FlateDecode stream: ${e.getMessage}")
    } finally inf.end()
  }

  // ---- content-stream text extraction ---------------------------------

  /** Order-of-appearance text from one decoded content stream; `fonts`
    * maps `Tf` resource names to their ToUnicode CMaps (strings shown
    * under a CMap'd font decode through it).
    */
  private[sources] def extractText(content: String,
                                   fonts: Map[String, CMap] = Map.empty): String = {
    val sb = new StringBuilder
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    val p = new Parser(content, 0)
    // operand stack: operators consume what precedes them
    var curCMap: Option[CMap] = None
    val operands = scala.collection.mutable.ArrayBuffer[Any]()
    def show(t: Str): Unit = sb.append(decodeString(t, curCMap))
    while (p.hasMore) {
      p.ws()
      if (!p.hasMore) ()
      else if (p.peekDelim) {
        try operands += p.parseValue()
        catch { case _: Exception => p.i += 1 } // skip junk byte, keep going
      } else {
        val op = p.parseBareWord()
        op match {
          case "Tf" =>
            // [/FontName size Tf] — switch the active ToUnicode CMap
            operands.dropRight(1).lastOption.collect {
              case Name(f) => curCMap = fonts.get(f)
            }: Unit
          case "Tj" =>
            operands.lastOption.collect { case t: Str => show(t) }: Unit
          case "'" =>
            newline()
            operands.lastOption.collect { case t: Str => show(t) }: Unit
          case "\"" =>
            newline()
            operands.lastOption.collect { case t: Str => show(t) }: Unit
          case "TJ" =>
            operands.lastOption.collect { case a: Vector[Any] @unchecked =>
              a.foreach { case t: Str => show(t); case _ => () }
            }: Unit
          case "T*" => newline()
          // each BT..ET text object is a block: break between blocks
          // (consecutive Tj inside one object stay on one line)
          case "ET" => newline()
          case "Td" | "TD" =>
            // dy is the last-but-zero operand pair: [tx ty Td]
            val dy = operands.takeRight(1).headOption
            dy match {
              case Some(n: Long) if n != 0L => newline()
              case Some(n: Double) if n != 0.0 => newline()
              case _ => ()
            }
          case "BI" =>
            // inline image: skip to EI (binary payload would desync the lexer)
            val ei = content.indexOf("EI", p.i)
            p.i = if (ei < 0) content.length else ei + 2
          case _ => ()
        }
        operands.clear()
      }
    }
    sb.result().trim
  }

  /** PDF string bytes → text: through the active font's ToUnicode CMap
    * when one applies (fixed-width codes big-endian; unmapped → U+FFFD,
    * trailing partial code → U+FFFD), else UTF-16BE when BOM-tagged,
    * else PDFDocEncoding ≈ Latin-1.
    */
  private def decodeString(t: Str, cmap: Option[CMap] = None): String =
    cmap match {
      case Some(CMap(w, m)) =>
        val out = new StringBuilder
        var k = 0
        while (k + w <= t.bytes.length) {
          var code = 0
          var j = 0
          while (j < w) { code = (code << 8) | (t.bytes(k + j) & 0xff); j += 1 }
          out.append(m.getOrElse(code, "�"))
          k += w
        }
        if (k < t.bytes.length) out.append('�')
        out.result()
      case None =>
        if (t.bytes.length >= 2 && (t.bytes(0) & 0xff) == 0xfe &&
            (t.bytes(1) & 0xff) == 0xff)
          new String(t.bytes, 2, t.bytes.length - 2, StandardCharsets.UTF_16BE)
        else new String(t.bytes, StandardCharsets.ISO_8859_1)
    }

  // ---- recursive-descent value parser ---------------------------------

  /** Parses one COS value at `i`; shared by the object scan, trailer
    * dicts, and the content-stream tokenizer.
    */
  private final class Parser(s: String, var i: Int) {
    def hasMore: Boolean = i < s.length

    def ws(): Unit = {
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0) i += 1
        else if (c == '%') { while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1 }
        else return
      }
    }

    /** True when the next token is a VALUE start (not an operator word). */
    def peekDelim: Boolean = {
      val c = s.charAt(i)
      c == '<' || c == '[' || c == '(' || c == '/' || c == '+' || c == '-' ||
        c == '.' || (c >= '0' && c <= '9')
    }

    def parseValue(): Any = {
      ws()
      require(i < s.length, "unexpected end of input")
      s.charAt(i) match {
        case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' => parseDict()
        case '<' => parseHexString()
        case '[' => parseArray()
        case '(' => parseLiteralString()
        case '/' => parseName()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') => parseNumberOrRef()
        case _ =>
          parseBareWord() match {
            case "true" => true
            case "false" => false
            case "null" => null
            case w => throw new IllegalArgumentException(s"unexpected token '$w' at $i")
          }
      }
    }

    def parseBareWord(): String = {
      val start = i
      while (i < s.length && !" \t\r\n\f ()<>[]{}/%".contains(s.charAt(i))) i += 1
      require(i > start, s"empty token at $i")
      s.substring(start, i)
    }

    private def parseName(): Name = {
      i += 1 // '/'
      val start = i
      while (i < s.length && !" \t\r\n\f ()<>[]{}/%".contains(s.charAt(i))) i += 1
      val raw = s.substring(start, i)
      // #xx hex escapes in names
      val out = new StringBuilder
      var k = 0
      while (k < raw.length) {
        if (raw.charAt(k) == '#' && k + 2 < raw.length) {
          out.append(Integer.parseInt(raw.substring(k + 1, k + 3), 16).toChar); k += 3
        } else { out.append(raw.charAt(k)); k += 1 }
      }
      Name(out.result())
    }

    private def parseDict(): Map[String, Any] = {
      i += 2 // '<<'
      val out = scala.collection.mutable.LinkedHashMap[String, Any]()
      while ({ ws(); !(i + 1 < s.length && s.charAt(i) == '>' && s.charAt(i + 1) == '>') }) {
        val key = parseValue() match {
          case Name(n) => n
          case other => throw new IllegalArgumentException(s"dict key must be a name, got $other")
        }
        out(key) = parseValue()
      }
      i += 2 // '>>'
      out.toMap
    }

    private def parseArray(): Vector[Any] = {
      i += 1 // '['
      val out = Vector.newBuilder[Any]
      while ({ ws(); s.charAt(i) != ']' }) out += parseValue()
      i += 1 // ']'
      out.result()
    }

    private def parseLiteralString(): Str = {
      i += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        require(i < s.length, "unterminated string")
        val c = s.charAt(i)
        c match {
          case '\\' =>
            i += 1
            val e = s.charAt(i)
            e match {
              case 'n' => out.write('\n'); i += 1
              case 'r' => out.write('\r'); i += 1
              case 't' => out.write('\t'); i += 1
              case 'b' => out.write('\b'); i += 1
              case 'f' => out.write('\f'); i += 1
              case '(' => out.write('('); i += 1
              case ')' => out.write(')'); i += 1
              case '\\' => out.write('\\'); i += 1
              case '\r' => i += 1; if (i < s.length && s.charAt(i) == '\n') i += 1 // line continuation
              case '\n' => i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other.toInt); i += 1
            }
          case '(' => depth += 1; out.write('('); i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(')')
            i += 1
          case other => out.write(other.toInt); i += 1
        }
      }
      Str(out.toByteArray)
    }

    private def parseHexString(): Str = {
      i += 1 // '<'
      val hex = new StringBuilder
      while (s.charAt(i) != '>') {
        val c = s.charAt(i)
        if (!c.isWhitespace) hex.append(c)
        i += 1
      }
      i += 1 // '>'
      if (hex.length % 2 == 1) hex.append('0') // odd count: implicit trailing 0
      val out = new Array[Byte](hex.length / 2)
      var k = 0
      while (k < out.length) {
        out(k) = Integer.parseInt(hex.substring(2 * k, 2 * k + 2), 16).toByte
        k += 1
      }
      Str(out)
    }

    /** `N G R` lookahead distinguishes a reference from a bare number. */
    private def parseNumberOrRef(): Any = {
      val first = parseNumber()
      first match {
        case n: Long if n >= 0 =>
          val save = i
          ws()
          if (i < s.length && s.charAt(i).isDigit) {
            val gStart = i
            while (i < s.length && s.charAt(i).isDigit) i += 1
            val g = s.substring(gStart, i).toLong
            ws()
            if (i < s.length && s.charAt(i) == 'R' &&
                (i + 1 >= s.length || " \t\r\n\f ()<>[]{}/%".contains(s.charAt(i + 1)))) {
              i += 1
              return Ref(n, g)
            }
          }
          i = save
          n
        case other => other
      }
    }

    private def parseNumber(): Any = {
      val start = i
      if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
      var isReal = false
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) {
        if (s.charAt(i) == '.') isReal = true
        i += 1
      }
      val raw = s.substring(start, i)
      require(raw.nonEmpty && raw != "+" && raw != "-", s"bad number at $start")
      if (isReal) raw.toDouble else raw.toLong
    }
  }
}
