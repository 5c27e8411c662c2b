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
      body: Array[Byte])

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** Parse a whole WARC file (plain or gzip-member-concatenated). */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    val plain =
      if (bytes.length >= 2 && bytes(0) == GzipMagic0 && bytes(1) == GzipMagic1)
        gunzipAll(bytes)
      else bytes
    parsePlain(plain)
  }

  /** Decompress a concatenation of gzip members into one byte array. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def parsePlain(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      // skip inter-record CRLFs (two per spec; tolerate any run)
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val (headers, blockStart) = readHeaderBlock(bytes, pos)
        val version = headers.getOrElse("__version", "")
        require(version.startsWith("WARC/"),
          s"not a WARC record at offset $pos: version line '$version'")
        val len = headers.get("content-length") match {
          case Some(v) => v.trim.toLong
          case None => throw new IllegalArgumentException(
            s"WARC record at offset $pos has no Content-Length")
        }
        require(blockStart + len <= bytes.length,
          s"WARC record at offset $pos: Content-Length $len overruns file " +
            s"(${bytes.length - blockStart} bytes left)")
        val block = java.util.Arrays.copyOfRange(
          bytes, blockStart, blockStart + len.toInt)
        out += toRecord(headers, block)
        pos = blockStart + len.toInt
      }
    }
    out.toSeq
  }

  /** Read the version line + header lines ending at the first empty
    * line; returns (lower-cased name → value incl. "__version", offset
    * of the first block byte). Handles CRLF and bare-LF line ends and
    * LWS continuation lines.
    */
  private def readHeaderBlock(bytes: Array[Byte],
                              start: Int): (Map[String, String], Int) = {
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var pos = start
    var lastName: String = null
    var first = true
    var done = false
    while (!done) {
      val eol = lineEnd(bytes, pos)
      val line = new String(bytes, pos, eol - pos,
        java.nio.charset.StandardCharsets.UTF_8)
      pos = skipEol(bytes, eol)
      if (line.isEmpty) done = true
      else if (first) { headers("__version") = line.trim; first = false }
      else if (line(0) == ' ' || line(0) == '\t') {
        // LWS continuation of the previous header value
        if (lastName != null)
          headers(lastName) = headers(lastName) + " " + line.trim
      } else {
        val i = line.indexOf(':')
        require(i > 0, s"malformed WARC header line: '$line'")
        lastName = line.substring(0, i).trim.toLowerCase
        headers(lastName) = line.substring(i + 1).trim
      }
      if (pos >= bytes.length) done = true
    }
    (headers.toMap, pos)
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
    if (isHttpResponse) {
      val (status, httpCt, body) = splitHttpResponse(block)
      WarcRecord(rtype, uri, headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-record-id", ""),
        if (httpCt.nonEmpty) httpCt else warcCt, status, body)
    } else {
      WarcRecord(rtype, uri, headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-record-id", ""), warcCt, -1, block)
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
