package graft

import java.nio.charset.StandardCharsets.UTF_8

/** Deterministic WARC fixture generator for
  * [[graft.sources.WarcCodec]] — byte-stable so the committed files
  * under `fixtures/warc/` are asserted identical to the generator's
  * output ([[MediaFixtures]] treatment; for the `.gz` fixture the JDK's
  * GZIPOutputStream header carries no timestamp, so the member bytes
  * are deterministic for a fixed JDK).
  *
  * Run `Test/runMain graft.GenWarcFixtures <dir>` to (re)write them.
  *
  * Bodies use LF-only line breaks (Content-Length framing doesn't care)
  * so the oracle can restate them with `chr(10)`; the WARC/HTTP header
  * machinery itself uses spec CRLF — except one gzip member whose HTTP
  * headers are bare-LF on purpose (real crawls contain both).
  */
object WarcFixtures {

  private def record(headers: Seq[(String, String)],
                     block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.1\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    sb.toString.getBytes(UTF_8) ++ block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpResponse(statusLine: String, contentType: String,
                           body: Array[Byte], eol: String = "\r\n"): Array[Byte] =
    (s"HTTP/1.1 $statusLine${eol}Content-Type: $contentType$eol" +
      s"Content-Length: ${body.length}$eol$eol").getBytes(UTF_8) ++ body

  // -- payloads the oracle restates as literals ------------------------
  val WarcinfoBody = "software: graft-crawler/1.0\nformat: WARC File Format 1.1\n"
  val RequestBody = "GET /index.html HTTP/1.1\nHost: example.com\n\n"
  val HtmlBody = "<html><head><title>T</title>" +
    "<script>var x = \"<h1>no</h1>\";</script></head>\n" +
    "<body><h1>Crawl Doc</h1><p>First &amp; second.</p></body></html>"
  val NotFoundBody = "<html><body>Not found</body></html>"
  val ResourceBody = "Plain resource text.\nSecond line."
  val FakePngBody = "FAKEPNGBYTES"
  val GzTextBody = "gzip member one payload — naïve café ✓"
  val GzHtmlBody = "<p>LF-header parsing</p> ok"

  /** Plain `.warc`: 6 records covering warcinfo, request (bracketed
    * URI + LWS continuation header), 200 HTML response, 404 response,
    * text resource, and a 200 response with a non-text payload.
    */
  def sampleWarc: Array[Byte] = {
    val r0 = record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-08-01T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>",
      "Content-Type" -> "application/warc-fields"),
      WarcinfoBody.getBytes(UTF_8))
    val r1 = record(Seq(
      "WARC-Type" -> "request",
      // WARC 1.0 writers wrap the URI in <>: the parser must strip them
      "WARC-Target-URI" -> "<http://example.com/index.html>",
      "WARC-Date" -> "2026-08-01T00:00:01Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000001>",
      // LWS continuation line: value folds with a single space
      "WARC-Concurrent-To" -> "<urn:uuid:00000000-0000-0000-0000-000000000002>\r\n (folded)",
      "Content-Type" -> "application/http; msgtype=request"),
      RequestBody.getBytes(UTF_8))
    val r2 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://example.com/index.html",
      "WARC-Date" -> "2026-08-01T00:00:01Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000002>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("200 OK", "text/html; charset=UTF-8", HtmlBody.getBytes(UTF_8)))
    val r3 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://example.com/missing",
      "WARC-Date" -> "2026-08-01T00:00:02Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000003>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("404 Not Found", "text/html", NotFoundBody.getBytes(UTF_8)))
    val r4 = record(Seq(
      "WARC-Type" -> "resource",
      "WARC-Target-URI" -> "http://example.com/readme.txt",
      "WARC-Date" -> "2026-08-01T00:00:03Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000004>",
      "Content-Type" -> "text/plain"),
      ResourceBody.getBytes(UTF_8))
    val r5 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://example.com/logo.png",
      "WARC-Date" -> "2026-08-01T00:00:04Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000005>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("200 OK", "image/png", FakePngBody.getBytes(UTF_8)))
    r0 ++ r1 ++ r2 ++ r3 ++ r4 ++ r5
  }

  private def gz(bytes: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(bytes); g.close()
    bo.toByteArray
  }

  /** HTTP/1.1 chunked framing over `body`, split at `at` bytes. */
  private def chunk2(body: Array[Byte], at: Int): Array[Byte] = {
    val (a, b) = body.splitAt(at)
    (a.length.toHexString + "\r\n").getBytes(UTF_8) ++ a ++ "\r\n".getBytes(UTF_8) ++
      (b.length.toHexString + ";ext=1\r\n").getBytes(UTF_8) ++ b ++ "\r\n".getBytes(UTF_8) ++
      "0\r\n\r\n".getBytes(UTF_8)
  }

  /** `.warc.gz`: TWO gzip members (the spec's one-record-per-member
    * layout), the second with bare-LF HTTP headers.
    */
  def sample2WarcGz: Array[Byte] = {
    val m0 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.org/a",
      "WARC-Date" -> "2026-08-02T10:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000010>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("200 OK", "text/plain; charset=utf-8", GzTextBody.getBytes(UTF_8)))
    val m1 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.org/b",
      "WARC-Date" -> "2026-08-02T10:00:01Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000011>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("200 OK", "text/html", GzHtmlBody.getBytes(UTF_8), eol = "\n"))
    gz(m0) ++ gz(m1)
  }

  val ChunkedBody = "Wikipedia in chunks."
  val GzEncBody = "<p>gzipped body</p>"
  val BothEncBody = "both encodings survive"

  /** Wire-encoding coverage: real crawls store the HTTP wire bytes, so
    * bodies arrive chunked, gzip-encoded, or both (chunked framing
    * applied over the gzip stream, per RFC 9112 ordering).
    */
  def sample3Warc: Array[Byte] = {
    def resp(extraHeaders: String, body: Array[Byte], ct: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n$extraHeaders" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
    val r0 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.org/chunked",
      "WARC-Date" -> "2026-08-03T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000020>",
      "Content-Type" -> "application/http; msgtype=response"),
      resp("Transfer-Encoding: chunked\r\n",
        chunk2(ChunkedBody.getBytes(UTF_8), 4), "text/plain"))
    val r1 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.org/gzipped",
      "WARC-Date" -> "2026-08-03T00:00:01Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000021>",
      "Content-Type" -> "application/http; msgtype=response"),
      resp("Content-Encoding: gzip\r\n", gz(GzEncBody.getBytes(UTF_8)), "text/html"))
    val r2 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.org/both",
      "WARC-Date" -> "2026-08-03T00:00:02Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000022>",
      "Content-Type" -> "application/http; msgtype=response"),
      resp("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
        chunk2(gz(BothEncBody.getBytes(UTF_8)), 10), "text/plain"))
    r0 ++ r1 ++ r2
  }

  // charset coverage bodies — the STRINGS are what a correct decode
  // yields; the fixture stores their ISO-8859-1 / windows-1252 bytes
  val Latin1Body = "<html><body><h1>Café</h1><p>naïve déjà vu à Zürich ©1999</p></body></html>"
  val Cp1252Body = "<html><head><meta charset=\"windows-1252\"></head>" +
    "<body><p>“Smart quotes” cost €99 — dash</p></body></html>"
  val Utf8SniffBody = "UTF-8 sniffed → café ✓"
  val FallbackBody = "résumé façade"
  val BomBody = "BOM wins übermäßig ✓"

  /** Charset coverage: a crawl's bodies are NOT all UTF-8. Four 200
    * responses exercising [[graft.sources.WarcCodec.decodeBody]]'s
    * resolution order: declared `charset=iso-8859-1` (non-UTF-8
    * bytes), `<meta charset=windows-1252>` prescan (no HTTP charset),
    * undeclared valid UTF-8 (content sniff), undeclared non-UTF-8
    * (windows-1252 fallback), and a UTF-16LE BOM page whose WRONG
    * declared charset the BOM must override (WHATWG step 0).
    */
  def sample4Warc: Array[Byte] = {
    def resp(uri: String, n: Int, ct: String, body: Array[Byte]): Array[Byte] =
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> s"2026-08-04T00:00:0${n}Z",
        "WARC-Record-ID" -> s"<urn:uuid:00000000-0000-0000-0000-00000000003$n>",
        "Content-Type" -> "application/http; msgtype=response"),
        httpResponse("200 OK", ct, body))
    resp("http://latin1.example.net/menu", 0,
      "text/html; charset=iso-8859-1",
      Latin1Body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ++
      resp("http://cp1252.example.net/quotes", 1, "text/html",
        Cp1252Body.getBytes(java.nio.charset.Charset.forName("windows-1252"))) ++
      resp("http://utf8.example.net/plain", 2, "text/plain",
        Utf8SniffBody.getBytes(UTF_8)) ++
      resp("http://fallback.example.net/resume", 3, "text/plain",
        FallbackBody.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) ++
      resp("http://bom.example.net/utf16", 4, "text/plain; charset=iso-8859-1",
        Array(0xff.toByte, 0xfe.toByte) ++
          BomBody.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
  }

  /** Chrome-laden page: nav + cookie banner + footer around a short
    * article — the main-content extraction fixture (ASCII, single
    * line, no quotes beyond attribute double-quotes, so the oracle can
    * restate the body verbatim).
    */
  val ChromeBody: String =
    "<html lang=\"en-US\"><head><title>Widget Portal</title>" +
      "<meta name=\"description\" content=\"Widget care tips and guides\">" +
      "<script>var x = 1;</script></head>" +
      "<body><nav><a href=\"/\">Home</a> <a href=\"/shop\">Shop</a> <a href=\"/faq\">FAQ</a></nav>" +
      "<div>Accept our cookie policy <a href=\"/ok\">OK</a></div>" +
      "<main><h1>Widget care guide</h1>" +
      "<p>A widget lasts for decades when it is cleaned gently, stored dry, and kept away from direct sunlight at all times.</p>" +
      "<p>Never oil the bearing.</p></main>" +
      "<footer>Copyright 2026 Widget Portal. <a href=\"/terms\">Terms</a> of use apply worldwide.</footer></body></html>"

  def sample5Warc: Array[Byte] =
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://portal.example.com/widgets",
      "WARC-Date" -> "2026-08-05T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000040>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("200 OK", "text/html; charset=utf-8", ChromeBody.getBytes(UTF_8)))

  def all: Seq[(String, Array[Byte])] = Seq(
    "sample.warc" -> sampleWarc,
    "sample2.warc.gz" -> sample2WarcGz,
    "sample3.warc" -> sample3Warc,
    "sample4.warc" -> sample4Warc,
    "sample5.warc" -> sample5Warc)

  val RevisitHtmlBody = "<html><body>canonical page body</body></html>"
  val RevisitOtherBody = "<html><body>a different page</body></html>"
  val DigestA = "sha1:AAAABBBBCCCCDDDDEEEEFFFFGGGGHHHHIIIIJJJJ"
  val DigestB = "sha1:ZZZZYYYYXXXXWWWWVVVVUUUUTTTTSSSSRRRRQQQQ"

  /** Dedup-aware crawl: two original 200 captures plus two `revisit`
    * records (identical-payload-digest profile) whose
    * `WARC-Payload-Digest` matches capture A and whose
    * `WARC-Refers-To` names its record id — the storage-saving layout
    * every large crawl emits. Lives in its OWN fixture dir so the
    * `fixtures/warc` glob oracles stay untouched.
    */
  def revisitWarc: Array[Byte] = {
    val origId = "<urn:uuid:00000000-0000-0000-0000-0000000000a0>"
    val r0 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://example.com/page",
      "WARC-Date" -> "2026-08-01T10:00:00Z",
      "WARC-Record-ID" -> origId,
      "WARC-Payload-Digest" -> DigestA,
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("200 OK", "text/html", RevisitHtmlBody.getBytes(UTF_8)))
    val r1 = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://example.com/other",
      "WARC-Date" -> "2026-08-01T10:01:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-0000000000a1>",
      "WARC-Payload-Digest" -> DigestB,
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse("200 OK", "text/html", RevisitOtherBody.getBytes(UTF_8)))
    val r2 = record(Seq(
      "WARC-Type" -> "revisit",
      "WARC-Target-URI" -> "http://mirror.example.org/page",
      "WARC-Date" -> "2026-08-02T09:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-0000000000a2>",
      "WARC-Payload-Digest" -> DigestA,
      "WARC-Refers-To" -> origId,
      "WARC-Profile" ->
        "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
      "Content-Type" -> "application/http; msgtype=response"),
      Array.emptyByteArray)
    val r3 = record(Seq(
      "WARC-Type" -> "revisit",
      "WARC-Target-URI" -> "http://example.com/page", // recrawl, unchanged
      "WARC-Date" -> "2026-08-03T09:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-0000000000a3>",
      "WARC-Payload-Digest" -> DigestA,
      "WARC-Refers-To" -> origId,
      "WARC-Profile" ->
        "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
      "Content-Type" -> "application/http; msgtype=response"),
      Array.emptyByteArray)
    r0 ++ r1 ++ r2 ++ r3
  }
}

object GenWarcFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/warc")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    WarcFixtures.all.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
      println(s"wrote $dir/$name (${bytes.length} bytes)")
    }
    // the revisit fixture lives in its own dir (fixtures/warc/* globs
    // must keep their pinned row sets)
    val rdir = java.nio.file.Paths.get(dir).getParent.resolve("warc-revisit")
    java.nio.file.Files.createDirectories(rdir)
    java.nio.file.Files.write(rdir.resolve("revisit.warc"),
      WarcFixtures.revisitWarc)
    println(s"wrote $rdir/revisit.warc (${WarcFixtures.revisitWarc.length} bytes)")
  }
}
