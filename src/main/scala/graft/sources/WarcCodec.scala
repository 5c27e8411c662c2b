package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

/** WARC (Web ARChive, ISO 28500) record parser — the container format
  * web-scale crawl corpora ship in (Common Crawl publishes ~100 TB of
  * WARC per snapshot), i.e. the file format a training-data pipeline at
  * the target scale actually reads first. Pure-JVM and self-contained,
  * the [[PdfCodec]] treatment: no external codec, parsing happens per
  * FILE inside a binaryFile scan so the work distributes with the files.
  *
  * Format notes (ISO 28500 / WARC 1.0-1.1):
  *  - a WARC file is a sequence of records, each: a version line
  *    (`WARC/1.0` or `WARC/1.1`), CRLF-delimited named headers (with
  *    optional LWS continuation lines), an empty line, then exactly
  *    `Content-Length` bytes of block, then two CRLFs;
  *  - `.warc.gz` files are a CONCATENATION of gzip members (per spec,
  *    one record per member, so byte-range reads can start at any
  *    member boundary); `java.util.zip.GZIPInputStream` decompresses
  *    concatenated members natively;
  *  - `response` records carry a full HTTP response (status line +
  *    headers + body) as their block; the document payload is the HTTP
  *    body, and the authoritative media type is the HTTP
  *    `Content-Type`, not the WARC-level one
  *    (`application/http; msgtype=response`).
  *
  * The parser is strict about the byte framing (Content-Length is the
  * only legal way to find the next record) and tolerant about line
  * endings inside the HTTP header block (CRLF per spec, bare LF
  * accepted — real crawls contain both).
  */
object WarcCodec {

  /** One parsed WARC record.
    *
    * @param recordType      `WARC-Type` (warcinfo/request/response/resource/…)
    * @param targetUri       `WARC-Target-URI` ("" when absent, e.g. warcinfo);
    *                        WARC 1.0 writers sometimes wrap the URI in
    *                        `<` `>` — brackets are stripped
    * @param warcDate        `WARC-Date` (ISO 8601, "" when absent)
    * @param recordId        `WARC-Record-ID` ("" when absent)
    * @param contentType     effective payload media type: the HTTP
    *                        `Content-Type` for parsed `response` records,
    *                        else the WARC-level `Content-Type`
    * @param httpStatus      HTTP status code for parsed `response`
    *                        records, -1 otherwise
    * @param body            payload bytes: the HTTP body for parsed
    *                        `response` records, else the whole block
    */
  final case class WarcRecord(
      recordType: String,
      targetUri: String,
      warcDate: String,
      recordId: String,
      contentType: String,
      httpStatus: Int,
      body: Array[Byte],
      payloadDigest: String = "",
      refersTo: String = "")

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Parse a whole WARC file (plain or gzip-member-concatenated).
    *
    * Gzip archives are parsed INCREMENTALLY off the stream — a
    * standard ~1 GB `.warc.gz` decompresses to 4-5 GB, past the JVM's
    * 2 GiB array limit, so the decompressed archive is never buffered
    * whole; only one record's block is in memory at a time (the spec's
    * one-record-per-member layout keeps individual records bounded).
    */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    val base = new ByteArrayInputStream(bytes)
    val in: java.io.InputStream =
      if (bytes.length >= 2 && bytes(0) == GzipMagic0 && bytes(1) == GzipMagic1)
        new GZIPInputStream(base, 64 * 1024)
      else base
    try parseStream(in) finally in.close()
  }

  /** Decompress a concatenation of gzip members into one byte array —
    * used ONLY for per-record HTTP `Content-Encoding: gzip` bodies
    * (bounded by the record, not the archive).
    */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Parse records incrementally from an already-decompressed WARC
    * stream: version+header lines to the first empty line, then exactly
    * `Content-Length` block bytes, then inter-record CRLFs. Strict
    * framing (a truncated record raises loudly), tolerant line endings.
    */
  def parseStream(in0: java.io.InputStream): Seq[WarcRecord] = {
    val in = new java.io.BufferedInputStream(in0, 64 * 1024)
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var idx = 0
    var done = false
    while (!done) {
      readHeaderLines(in) match {
        case None => done = true
        case Some(lines) =>
          val headers = foldHeaders(lines)
          val version = headers.getOrElse("__version", "")
          require(version.startsWith("WARC/"),
            s"not a WARC record at record index $idx: version line '$version'")
          val len = headers.get("content-length") match {
            case Some(v) => v.trim.toLong
            case None => throw new IllegalArgumentException(
              s"WARC record $idx has no Content-Length")
          }
          require(len <= Int.MaxValue - 8,
            s"WARC record $idx: Content-Length $len exceeds the 2 GiB " +
              "JVM array limit (spec layout is one record per gzip member)")
          val block = in.readNBytes(len.toInt)
          require(block.length == len,
            s"WARC record $idx: Content-Length $len overruns file " +
              s"(${block.length} bytes left)")
          out += toRecord(headers, block)
          idx += 1
      }
    }
    out.toSeq
  }

  /** Read one CRLF/LF-terminated line; None at EOF before any byte. */
  private def readLine(in: java.io.BufferedInputStream): Option[String] = {
    val first = in.read()
    if (first < 0) return None
    val buf = new java.io.ByteArrayOutputStream(96)
    var c = first
    while (c >= 0 && c != '\n' && c != '\r') { buf.write(c); c = in.read() }
    if (c == '\r') { // consume a following \n if present
      in.mark(1)
      val n = in.read()
      if (n != '\n' && n >= 0) in.reset()
    }
    Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Skip inter-record blank lines, then read header lines up to the
    * first empty line. None when EOF arrives before a header line.
    */
  private def readHeaderLines(
      in: java.io.BufferedInputStream): Option[Seq[String]] = {
    var line = readLine(in)
    while (line.contains("")) line = readLine(in)
    line match {
      case None => None
      case Some(first) =>
        val lines = scala.collection.mutable.ArrayBuffer(first)
        var l = readLine(in)
        while (l.exists(_.nonEmpty)) { lines += l.get; l = readLine(in) }
        Some(lines.toSeq)
    }
  }

  /** Fold header lines into (lower-cased name → value incl.
    * "__version"), applying LWS continuation-line folding.
    */
  private def foldHeaders(lines: Seq[String]): Map[String, String] = {
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastName: String = null
    headers("__version") = lines.head.trim
    lines.tail.foreach { line =>
      if (line(0) == ' ' || line(0) == '\t') {
        // LWS continuation of the previous header value
        if (lastName != null)
          headers(lastName) = headers(lastName) + " " + line.trim
      } else {
        val i = line.indexOf(':')
        require(i > 0, s"malformed WARC header line: '$line'")
        lastName = line.substring(0, i).trim.toLowerCase
        headers(lastName) = line.substring(i + 1).trim
      }
    }
    headers.toMap
  }

  private def lineEnd(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i < bytes.length && bytes(i) != '\n' && bytes(i) != '\r') i += 1
    i
  }

  private def skipEol(bytes: Array[Byte], at: Int): Int =
    if (at < bytes.length && bytes(at) == '\r' &&
        at + 1 < bytes.length && bytes(at + 1) == '\n') at + 2
    else if (at < bytes.length && (bytes(at) == '\n' || bytes(at) == '\r')) at + 1
    else at

  private def toRecord(headers: Map[String, String],
                       block: Array[Byte]): WarcRecord = {
    val rtype = headers.getOrElse("warc-type", "")
    val uri0 = headers.getOrElse("warc-target-uri", "")
    val uri = // WARC 1.0 writers may wrap the URI in angle brackets
      if (uri0.length >= 2 && uri0.head == '<' && uri0.last == '>')
        uri0.substring(1, uri0.length - 1)
      else uri0
    val warcCt = headers.getOrElse("content-type", "")
    val isHttpResponse = rtype == "response" &&
      block.length >= 5 && new String(block, 0, 5,
        java.nio.charset.StandardCharsets.US_ASCII) == "HTTP/"
    // dedup-crawl provenance: the payload digest every capture carries
    // and the original-record pointer a `revisit` record names
    val digest = headers.getOrElse("warc-payload-digest", "")
    val refers0 = headers.getOrElse("warc-refers-to", "")
    val refers =
      if (refers0.length >= 2 && refers0.head == '<' && refers0.last == '>')
        refers0.substring(1, refers0.length - 1)
      else refers0
    if (isHttpResponse) {
      val (status, httpCt, body) = splitHttpResponse(block)
      WarcRecord(rtype, uri, headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-record-id", ""),
        if (httpCt.nonEmpty) httpCt else warcCt, status, body,
        digest, refers)
    } else {
      WarcRecord(rtype, uri, headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-record-id", ""), warcCt, -1, block,
        digest, refers)
    }
  }

  /** Split an HTTP response block into (status code, Content-Type,
    * body). Header/body boundary is the first empty line; both CRLF and
    * bare-LF line endings are accepted (real crawls contain both).
    *
    * Real crawls store the wire bytes, so the body is DECODED here:
    * `Transfer-Encoding: chunked` framing is removed, then
    * `Content-Encoding: gzip|x-gzip|deflate` is decompressed (raw and
    * zlib-wrapped deflate both occur in the wild). Decoding is
    * tolerant — a truncated/corrupt encoded body falls back to the
    * raw bytes rather than sinking the whole WARC file (one bad record
    * in a million must not kill a partition).
    */
  private def splitHttpResponse(block: Array[Byte]): (Int, String, Array[Byte]) = {
    var pos = 0
    var status = -1
    var contentType = ""
    var contentEncoding = ""
    var chunked = false
    var firstLine = true
    var done = false
    while (!done && pos < block.length) {
      val eol = lineEnd(block, pos)
      val line = new String(block, pos, eol - pos,
        java.nio.charset.StandardCharsets.UTF_8)
      pos = skipEol(block, eol)
      if (line.isEmpty) done = true
      else if (firstLine) {
        firstLine = false
        // "HTTP/1.1 200 OK" → 200; malformed status → -1 (kept as raw)
        val parts = line.split("\\s+", 3)
        if (parts.length >= 2 && parts(1).forall(_.isDigit) && parts(1).nonEmpty)
          status = parts(1).toInt
      } else {
        val i = line.indexOf(':')
        if (i > 0) {
          val name = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          if (name == "content-type") contentType = value
          else if (name == "content-encoding") contentEncoding = value.toLowerCase
          else if (name == "transfer-encoding")
            chunked = value.toLowerCase.contains("chunked")
        }
      }
    }
    var body = java.util.Arrays.copyOfRange(block, pos, block.length)
    if (chunked) body = dechunk(body).getOrElse(body)
    contentEncoding match {
      case "gzip" | "x-gzip" => body = tryDecode(body, gunzipAll)
      case "deflate" => body = tryDecode(body, inflate)
      case _ =>
    }
    (status, contentType, body)
  }

  private def tryDecode(body: Array[Byte],
                        f: Array[Byte] => Array[Byte]): Array[Byte] =
    try f(body) catch { case _: Exception => body }

  /** Remove HTTP/1.1 chunked framing: hex size line (optional
    * extensions after ';'), chunk bytes, CRLF, …, 0-chunk, optional
    * trailers. None on malformed framing (caller keeps raw bytes).
    */
  private def dechunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    while (true) {
      val eol = lineEnd(body, pos)
      if (eol >= body.length && pos >= body.length) return None
      val sizeLine = new String(body, pos, eol - pos,
        java.nio.charset.StandardCharsets.US_ASCII)
      pos = skipEol(body, eol)
      val hexStr = sizeLine.takeWhile(_ != ';').trim
      if (hexStr.isEmpty || !hexStr.forall(c => Character.digit(c, 16) >= 0))
        return None
      val size = java.lang.Long.parseLong(hexStr, 16)
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      if (pos + size > body.length) return None
      out.write(body, pos, size.toInt)
      pos += size.toInt
      pos = skipEol(body, lineEnd(body, pos)) // chunk-terminating CRLF
    }
    None // unreachable
  }

  /** Byte ranges `(offset, length)` of each gzip MEMBER in a
    * concatenated `.warc.gz` — the CDX indexer's core: the spec's
    * one-record-per-member layout means these ranges ARE the ranged-
    * fetch entry points. Boundaries come from real decompression
    * bookkeeping (RFC 1952 header parse + raw-deflate
    * `Inflater.getBytesRead` + the 8-byte CRC32/ISIZE trailer), never
    * from scanning for magic bytes — `1f 8b` can occur inside
    * compressed data.
    */
  def gzipMemberRanges(bytes: Array[Byte]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var off = 0
    while (off < bytes.length) {
      require(off + 10 <= bytes.length &&
        bytes(off) == GzipMagic0 && bytes(off + 1) == GzipMagic1,
        s"not a gzip member at offset $off")
      val flg = bytes(off + 3) & 0xff
      var p = off + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, p, bytes.length - p)
        val buf = new Array[Byte](64 * 1024)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished())
            throw new IllegalArgumentException(
              s"truncated gzip member at offset $off")
        }
        val end = p + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE trailer
        require(end <= bytes.length,
          s"gzip member at $off overruns the file trailer")
        out += ((off.toLong, (end - off).toLong))
        off = end
      } finally inf.end()
    }
    out.toSeq
  }

  // ---- charset-aware text decode --------------------------------------
  //
  // Crawled pages are NOT all UTF-8: a real few percent of any crawl is
  // ISO-8859-1/Windows-1252 (and long-tail encodings), and decoding
  // those as UTF-8 either throws (Spark 4's strict `decode`) or yields
  // replacement-char soup that poisons everything downstream (dedup
  // keys, quality gates, tokenizers). Resolution order follows the
  // WHATWG HTML encoding sniffing algorithm, the convention every
  // browser and crawl pipeline implements:
  //   0. a byte-order mark wins over EVERYTHING, the declared charset
  //      included (WHATWG "BOM sniffing"): EF BB BF → UTF-8,
  //      FE FF → UTF-16BE, FF FE → UTF-16LE; the BOM itself is
  //      stripped from the decoded text;
  //   1. the `charset=` parameter of the HTTP Content-Type;
  //   2. for HTML/XML payloads, a `<meta charset=…>` /
  //      `<meta http-equiv="Content-Type" …>` prescan of the first
  //      1024 bytes (ASCII-compatible superset decode, per WHATWG);
  //   3. content sniff: a body that validates as UTF-8 is UTF-8;
  //   4. fallback: windows-1252 (the WHATWG default — every byte maps,
  //      so decoding never fails).
  // Per WHATWG, the labels iso-8859-1 / latin1 / us-ascii resolve to
  // windows-1252 (servers routinely mislabel 1252 content as latin-1;
  // the two agree outside 0x80-0x9F). Malformed sequences under the
  // RESOLVED charset are replaced (U+FFFD), never thrown — one bad
  // record must not kill a partition.

  private val CharsetParam = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:+-]+)\"?")

  /** The `charset=` parameter of a Content-Type value, if any. */
  def declaredCharset(contentType: String): Option[String] = {
    if (contentType == null) None
    else {
      val m = CharsetParam.matcher(contentType)
      if (m.find()) Some(m.group(1)) else None
    }
  }

  /** WHATWG-style `<meta>` prescan over the first 1024 bytes (decoded
    * as ISO-8859-1, an ASCII-transparent superset — charset labels are
    * ASCII). Matches both `<meta charset=…>` and the `http-equiv`
    * form's `content="…; charset=…"` (the regex keys on `charset=`
    * inside a meta tag either way).
    */
  def sniffMetaCharset(body: Array[Byte]): Option[String] = {
    val n = math.min(body.length, 1024)
    val head = new String(body, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = java.util.regex.Pattern.compile(
      "(?i)<meta[^>]*?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:+-]+)").matcher(head)
    if (m.find()) Some(m.group(1)) else None
  }

  /** True when `bytes` is well-formed UTF-8 in its entirety. */
  def isValidUtf8(bytes: Array[Byte]): Boolean =
    try {
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .decode(java.nio.ByteBuffer.wrap(bytes))
      true
    } catch { case _: java.nio.charset.CharacterCodingException => false }

  private val Windows1252 = java.nio.charset.Charset.forName("windows-1252")

  /** WHATWG label→encoding mapping for the labels where it diverges
    * from the JVM's (the JVM takes iso-8859-1 literally; browsers and
    * crawls treat it as windows-1252).
    */
  private def mapLabel(label: String): String = label.toLowerCase match {
    case "iso-8859-1" | "iso8859-1" | "latin1" | "latin-1" | "l1" |
         "us-ascii" | "ascii" | "ansi_x3.4-1968" => "windows-1252"
    case other => other
  }

  private def isHtmlish(contentType: String): Boolean =
    contentType != null &&
      contentType.toLowerCase.matches("^(text/html|application/xhtml|text/xml|application/xml).*")

  /** The BOM's charset and BOM byte length, when `body` opens with
    * one (WHATWG BOM sniffing — step 0, outranks the declared label).
    */
  def sniffBom(body: Array[Byte]): Option[(java.nio.charset.Charset, Int)] = {
    def b(i: Int) = body(i) & 0xff
    if (body.length >= 3 && b(0) == 0xef && b(1) == 0xbb && b(2) == 0xbf)
      Some((java.nio.charset.StandardCharsets.UTF_8, 3))
    else if (body.length >= 2 && b(0) == 0xfe && b(1) == 0xff)
      Some((java.nio.charset.StandardCharsets.UTF_16BE, 2))
    else if (body.length >= 2 && b(0) == 0xff && b(1) == 0xfe)
      Some((java.nio.charset.StandardCharsets.UTF_16LE, 2))
    else None
  }

  /** Resolve the effective charset of a payload per the object
    * contract's sniffing order (BOM first). Unknown/unsupported labels
    * fall through to the content sniff.
    */
  def resolveCharset(contentType: String,
                     body: Array[Byte]): java.nio.charset.Charset =
    sniffBom(body).map(_._1).getOrElse {
      val label = declaredCharset(contentType)
        .orElse(if (isHtmlish(contentType)) sniffMetaCharset(body) else None)
      label.flatMap { l =>
        try Some(java.nio.charset.Charset.forName(mapLabel(l)))
        catch { case _: Exception => None }
      }.getOrElse(if (isValidUtf8(body)) java.nio.charset.StandardCharsets.UTF_8
                  else Windows1252)
    }

  /** Decode a payload to text under the resolved charset; malformed
    * sequences become U+FFFD, never an exception; a leading BOM is
    * consumed, not emitted.
    */
  def decodeBody(contentType: String, body: Array[Byte]): String = {
    if (body == null) return null
    val skip = sniffBom(body).map(_._2).getOrElse(0)
    val dec = resolveCharset(contentType, body).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(body, skip, body.length - skip))
      .toString
  }

  /** Inflate a deflate body — zlib-wrapped first, raw-deflate fallback
    * (servers send both under the same header).
    */
  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished())
          throw new java.util.zip.DataFormatException("stuck inflate")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }
    try run(false) catch { case _: Exception => run(true) }
  }
}
