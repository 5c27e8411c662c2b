package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document loaders (SURVEY.md §2.1 S1-S4, S9): every loader lands on the
  * same `(doc_id STRING, text STRING, metadata MAP)` shape the splitter
  * consumes, mirroring the reference's per-extension dispatch
  * (`src/server/utils/embedding.py:179-189`). Network staging (S5-S8) is
  * a pre-step outside the engine: Spark reads a staged directory.
  */
object DocumentSources {

  /** S3: whole-file text/markdown — one row per file. */
  def readText(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("wholetext", "true").text(pathGlob)
      .withColumn("path", input_file_name())
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1).as("doc_id"),
        col("value").as("text"),
        map(lit("source"), col("path")).as("metadata"))

  /** S3 sections: markdown heading split — ATX headings (`# ` through
    * `###### `) at line start open a section; text before the first
    * heading is section 0 with an empty title at level 0. A heading
    * marker INSIDE a ``` code fence must NOT open a section (the
    * [[readHtmlSections]] script-tag rule, markdown edition — a shell
    * comment in an example block is not a document heading); the fence
    * state is a per-FILE line scan, one call per file like
    * [[splitCsvRecords]], never a hot-path UDF.
    */
  def readMarkdownSections(spark: SparkSession, pathGlob: String): DataFrame = {
    val raw = readText(spark, pathGlob)
    val sectionize = udf((text: String) => splitMarkdownSections(
      Option(text).getOrElse("")))
    raw
      .select(col("doc_id"), posexplode(sectionize(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("section_idx"),
        col("col._1").as("level"), col("col._2").as("title"),
        col("col._3").as("body"))
  }

  private[graft] def splitMarkdownSections(
      content: String): Seq[(Int, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var level = 0
    var title = ""
    val body = new StringBuilder
    // CommonMark fence pairing: an open fence of N backticks closes only
    // on a backticks-only line of >= N (an inner ```lang line is fence
    // CONTENT, not a close) — naive toggling would desync on a
    // 4-backtick fence wrapping a 3-backtick example, and a '# ' inside
    // the still-open fence would open a phantom section
    var fenceLen = 0 // 0 = not inside a fence
    var started = false // becomes true at the first heading OR content line
    def flush(): Unit = {
      if (started) out += ((level, title, body.result().stripLineEnd))
      body.clear()
    }
    val heading = "^(#{1,6}) (.*)$".r
    def backtickRun(s: String): Int = s.segmentLength(_ == '`')
    content.split("\n", -1).foreach { line =>
      val t = line.trim
      val run = backtickRun(t)
      if (fenceLen == 0 && run >= 3) {
        fenceLen = run
        started = true
        body.append(line).append('\n')
      } else if (fenceLen > 0 && run >= fenceLen && t.forall(_ == '`')) {
        fenceLen = 0
        started = true
        body.append(line).append('\n')
      } else line match {
        case heading(hashes, tt) if fenceLen == 0 =>
          flush()
          started = true
          level = hashes.length
          title = tt.trim
        case _ =>
          if (line.nonEmpty) started = true
          body.append(line).append('\n')
      }
    }
    flush()
    out.toSeq
  }

  /** Quote-aware CSV record split (RFC 4180): record boundaries are
    * newlines *outside* double quotes, so quoted fields may embed
    * newlines — the reference CSVLoader's (python csv) behavior. A
    * doubled quote toggles the state twice, leaving it unchanged, which
    * is exactly the escaped-quote semantics a boundary scanner needs.
    * Runs once per *file*, not per row — not a hot-path UDF.
    */
  private[sources] def splitCsvRecords(content: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inQuotes = false
    var i = 0
    val n = content.length
    while (i < n) {
      val c = content.charAt(i)
      if (c == '"') { inQuotes = !inQuotes; sb.append(c) }
      else if (c == '\n' && !inQuotes) { out += sb.result(); sb.clear() }
      else if (c == '\r' && !inQuotes) {
        if (i + 1 < n && content.charAt(i + 1) == '\n') i += 1
        out += sb.result(); sb.clear()
      }
      else sb.append(c)
      i += 1
    }
    if (sb.nonEmpty) out += sb.result()
    out.toSeq
  }

  /** S4: CSV — one Document per row (reference CSVLoader semantics): the
    * row rendered as `col: value` lines, keyed `{filestem}_{rownum}` with
    * `rownum` the row's true 0-based position in its file — stable across
    * partitionings, task retries, and re-runs, as an ingest provenance key
    * must be. (`monotonically_increasing_id` would encode the partition
    * layout into the id and change under retries.) Record positions come
    * from reading each file whole and splitting on [[splitCsvRecords]]'s
    * quote-aware boundaries — quoted fields may embed newlines, matching
    * the reference's CSVLoader; each record is then parsed with
    * `from_csv` against the header-derived schema in FAILFAST mode, so a
    * malformed record fails the read instead of silently becoming an
    * all-null "col:" document.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame = {
    // escape = '"' selects RFC 4180 doubled-quote escaping (python csv /
    // reference CSVLoader convention); Spark's default is backslash
    val csvOpts = Map("header" -> "true", "multiLine" -> "true", "escape" -> "\"")
    val schema = spark.read.options(csvOpts).csv(path).schema
    val rendered = concat_ws("\n",
      scala.collection.immutable.ArraySeq.unsafeWrapArray(schema.fieldNames)
        .map(c => concat_ws(": ", lit(c), col("row").getField(c))): _*)
    // blank records are dropped BEFORE numbering (Spark's CSV reader skips
    // them around the header the same way), so `rownum` enumerates actual
    // data rows 0,1,… like the reference's CSVLoader; the first non-blank
    // record is the header. wholetext caps a single file at the 2 GB string
    // limit — the reference ingests small config-like CSVs; a 100 TB
    // corpus arrives as many files, which parallelize per file.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("path")).orderBy(col("pos"))
    val records = udf(splitCsvRecords _)
    spark.read.option("wholetext", "true").text(path)
      .withColumn("path", input_file_name())
      .select(col("path"), posexplode(records(col("value"))))
      .filter(length(trim(col("col"))) > 0)
      .withColumn("__ln", row_number().over(w))
      .filter(col("__ln") > 1)
      .withColumn("row", from_csv(col("col"), schema, Map("mode" -> "FAILFAST", "escape" -> "\"")))
      .select(
        concat(regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1),
          lit("_"), (col("__ln") - 2).cast("string")).as("doc_id"),
        rendered.as("text"),
        map(lit("source"), col("path")).as("metadata"))
  }

  /** S2: HTML — tags stripped, whitespace collapsed (the UnstructuredHTML
    * flattening, minus layout heuristics). Pure column expressions.
    */
  def readHtml(spark: SparkSession, pathGlob: String): DataFrame =
    readText(spark, pathGlob)
      .withColumn("text",
        trim(regexp_replace(regexp_replace(regexp_replace(col("text"),
          "(?is)<(script|style)[^>]*>.*?</\\1>", " "),
          "<[^>]+>", " "),
          "\\s+", " ")))

  /** HTML section split (reference HTMLSectionSplitter semantics,
    * `src/server/utils/embedding.py:126-133,140-146`: h1-h5 headers key
    * the sections): one row per header-led section, `section_idx` the
    * section's 0-based position in the document (empty sections are
    * dropped AFTER numbering, so indices are stable provenance —
    * gaps mark dropped empties), `header` the section's own header text
    * (empty for a pre-header preamble). Script/style blocks are removed
    * BEFORE sectioning ([[readHtml]]'s rule — a header tag inside a
    * script string must not open a section); tags are stripped and
    * whitespace collapsed in both header and text; HTML entities are NOT
    * decoded (`&amp;` stays literal), matching the tag-flattening
    * contract of [[readHtml]]. Pure column expressions per file.
    */
  def readHtmlSections(spark: SparkSession, pathGlob: String): DataFrame = {
    val raw = readText(spark, pathGlob)
      .withColumn("text", regexp_replace(col("text"),
        "(?is)<(script|style)[^>]*>.*?</\\1>", " "))
    val sectioned = raw.withColumn("__sec",
      split(col("text"), "(?i)(?=<h[1-5][^>]*>)"))
    sectioned
      .select(col("doc_id"), posexplode(col("__sec")))
      .withColumnRenamed("pos", "section_idx")
      .withColumn("header",
        trim(regexp_replace(regexp_replace(
          regexp_extract(col("col"), "(?is)<h[1-5][^>]*>(.*?)</h[1-5]>", 1),
          "<[^>]+>", " "), "\\s+", " ")))
      .withColumn("text",
        trim(regexp_replace(regexp_replace(col("col"), "<[^>]+>", " "), "\\s+", " ")))
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("section_idx"), col("header"), col("text"))
  }

  /** S1: PDF — one row per page in page-tree order (the reference's
    * `PyPDFLoader` contract, `embedding.py:180-181`). The default
    * extractor is [[PdfCodec.extractPages]], a self-contained pure-JVM
    * parser (xref-free object scan → page tree → FlateDecode → Tj/TJ/'/"
    * text operators); the parameter stays a pluggable seam for corpora
    * needing a heavier codec (scanned/OCR, exotic CID fonts). Parsing is
    * per FILE inside the binaryFile scan — the work distributes with the
    * files.
    */
  def readPdf(spark: SparkSession, pathGlob: String,
              extractPages: Array[Byte] => Seq[String] = PdfCodec.extractPages): DataFrame = {
    import spark.implicits._
    val ex = udf(extractPages)
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1).as("stem"),
        posexplode(ex(col("content"))))
      .select(
        concat(col("stem"), lit("_p"), col("pos")).as("doc_id"),
        col("col").as("text"),
        map(lit("page"), col("pos").cast("string")).as("metadata"))
  }

  /** Deterministic stand-in for a PDF text extractor. */
  val FakePdfExtractor: Array[Byte] => Seq[String] =
    bytes => new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .split("\f").toSeq.filter(_.nonEmpty)

  /** S9: re-hydrate split chunks from a JSON dump (reference
    * `embedding.py:268-282` reads `kwargs.page_content` / metadata).
    */
  def readChunksJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
      .select(col("id").cast("string").as("doc_id"), col("page_content").as("text"),
        col("metadata"))

  /** DOCX scan — one row per non-empty paragraph in document order
    * ([[DocxCodec]]: JDK zip + StAX over `word/document.xml`; run
    * splits invisible, tab/br as chars, entity refs decoded,
    * table-cell paragraphs included). `doc_id` = `<stem>_p<paraIdx>`
    * with the paragraph index as stable provenance (gaps mark dropped
    * empty paragraphs — the [[readPdf]] page-row pattern). Parsing is
    * per FILE inside the binaryFile scan.
    */
  def readDocx(spark: SparkSession, pathGlob: String): DataFrame = {
    val ex = udf((b: Array[Byte]) => DocxCodec.extractParagraphs(b))
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1).as("stem"),
        explode(ex(col("content"))).as("p"))
      .select(
        concat(col("stem"), lit("_p"), col("p._1")).as("doc_id"),
        col("p._2").as("text"),
        map(lit("para"), col("p._1").cast("string")).as("metadata"))
  }

  /** EPUB scan — one row per SPINE content document in reading order
    * ([[EpubCodec]]: OCF container → OPF manifest/spine → XHTML
    * flatten; script/style skipped, title captured separately).
    * `doc_id` = `<stem>_s<spineIdx>`. Note: XML parsing decodes
    * entity references (`&amp;` → `&`), unlike the tag-regex
    * [[readHtml]] path — XHTML is well-formed XML, so the parser is
    * the contract here.
    */
  def readEpub(spark: SparkSession, pathGlob: String): DataFrame = {
    val ex = udf((b: Array[Byte]) => EpubCodec.extractSections(b))
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1).as("stem"),
        explode(ex(col("content"))).as("s"))
      .select(
        concat(col("stem"), lit("_s"), col("s._1")).as("doc_id"),
        col("s._4").as("text"),
        map(lit("href"), col("s._2"), lit("title"), col("s._3")).as("metadata"))
      .filter(length(col("text")) > 0)
  }

  /** WARC scan — one row per WARC record, every record type. The
    * crawl-archive front door ([[WarcCodec]]): parsing is per FILE
    * inside the binaryFile scan, so the work distributes with the
    * files; `.warc` and `.warc.gz` (concatenated gzip members) both
    * work. At crawl scale each WARC file is ~1 GB by convention, so
    * file-granular parallelism is the natural partitioning — no
    * in-file splitting needed.
    *
    * Columns: `warc_file` (file stem), `record_idx` (0-based position
    * in the file — stable provenance), `record_type`, `target_uri`,
    * `warc_date`, `record_id`, `http_status` (-1 for non-HTTP
    * records), `content_type` (effective payload type: HTTP header for
    * response records, WARC header otherwise), `content` (payload
    * bytes — HTTP body for response records).
    */
  def readWarc(spark: SparkSession, pathGlob: String): DataFrame = {
    val parse = udf((bytes: Array[Byte]) =>
      WarcCodec.parseAll(bytes).map(r =>
        (r.recordType, r.targetUri, r.warcDate, r.recordId,
          r.contentType, r.httpStatus, r.body, r.payloadDigest, r.refersTo)))
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        regexp_extract(col("path"), "([^/]+?)(\\.warc)?(\\.gz)?$", 1).as("warc_file"),
        posexplode(parse(col("content"))))
      .select(
        col("warc_file"),
        col("pos").cast("long").as("record_idx"),
        col("col._1").as("record_type"),
        col("col._2").as("target_uri"),
        col("col._3").as("warc_date"),
        col("col._4").as("record_id"),
        col("col._6").cast("long").as("http_status"),
        col("col._5").as("content_type"),
        col("col._7").as("content"),
        col("col._8").as("payload_digest"),
        col("col._9").as("refers_to"))
  }

  /** WARC → documents: successful (2xx) HTTP `response` records plus
    * `resource` records whose payload is text or HTML land on the
    * standard `(doc_id, text, metadata)` loader shape. Bodies are
    * decoded CHARSET-AWARE ([[WarcCodec.decodeBody]]: Content-Type
    * `charset=` → HTML `<meta>` prescan → UTF-8 validity sniff →
    * windows-1252 fallback, malformed sequences replaced never thrown —
    * a strict UTF-8 `decode` would corrupt ISO-8859-1/1252 pages and
    * throw on any invalid byte, killing the batch and wedging the
    * streaming ingest's retry loop). HTML payloads then go
    * through [[readHtml]]'s exact flattening rule (script/style
    * stripped first, tags stripped, whitespace collapsed, entities NOT
    * decoded); other `text/` payloads are whitespace-collapsed only. Other
    * media types (images, PDFs, …) are out of this front door's scope —
    * read them via [[readWarc]] and route the binary `content` to the
    * matching codec ([[PdfCodec]], [[graft.ops.Multimodal]]).
    *
    * With `mainContent = true`, HTML payloads instead go through
    * [[graft.ops.MainContent]]'s DOM-aware block extraction
    * (nav/footer/cookie-banner chrome dropped), FALLING BACK to the
    * full flatten when no block qualifies — favor-recall: short pages
    * survive, template chrome on long pages goes.
    */
  def readWarcDocuments(spark: SparkSession, pathGlob: String,
                        mainContent: Boolean = false): DataFrame =
    warcDocumentsFromBinary(spark.read.format("binaryFile").load(pathGlob),
      mainContent)

  /** The WARC→documents transform over any `(path, content)` relation —
    * shared by the batch front door and the streaming drop-directory
    * ingest ([[graft.streaming.IncrementalIngest.startWarcIngest]]):
    * the SAME plan runs per micro-batch, so stream ≡ batch by
    * construction.
    */
  def warcDocumentsFromBinary(binary: DataFrame,
                              mainContent: Boolean = false): DataFrame = {
    val parse = udf((bytes: Array[Byte]) =>
      WarcCodec.parseAll(bytes).map(r =>
        (r.recordType, r.targetUri, r.warcDate, r.recordId,
          r.contentType, r.httpStatus, r.body)))
    val records = binary
      .select(
        regexp_extract(col("path"), "([^/]+?)(\\.warc)?(\\.gz)?$", 1).as("warc_file"),
        posexplode(parse(col("content"))))
      .select(
        col("warc_file"),
        col("pos").cast("long").as("record_idx"),
        col("col._1").as("record_type"),
        col("col._2").as("target_uri"),
        col("col._3").as("warc_date"),
        col("col._6").cast("long").as("http_status"),
        col("col._5").as("content_type"),
        col("col._7").as("content"))
      .filter((col("record_type") === "response" &&
        col("http_status") >= 200 && col("http_status") < 300) ||
        col("record_type") === "resource")
      .filter(col("content_type").rlike("(?i)^(text/|application/xhtml)"))
    val decodeText = udf((ct: String, body: Array[Byte]) =>
      WarcCodec.decodeBody(ct, body))
    val raw = records.withColumn("__raw",
      decodeText(col("content_type"), col("content")))
    val isHtml = col("content_type").rlike("(?i)^(text/html|application/xhtml)")
    val fullFlatten = regexp_replace(regexp_replace(col("__raw"),
      "(?is)<(script|style)[^>]*>.*?</\\1>", " "),
      "<[^>]+>", " ")
    val htmlText = if (mainContent) {
      val mainUdf = udf((html: String) => graft.ops.MainContent.extract(html))
      // favor-recall fallback: a page with no qualifying block keeps its
      // full flatten rather than vanishing from the corpus
      val main = mainUdf(col("__raw"))
      when(length(main) > 0, main).otherwise(fullFlatten)
    } else fullFlatten
    val flattened = when(isHtml, htmlText).otherwise(col("__raw"))
    raw.select(
      concat(col("warc_file"), lit("_r"), col("record_idx")).as("doc_id"),
      trim(regexp_replace(flattened, "\\s+", " ")).as("text"),
      map(
        lit("url"), col("target_uri"),
        lit("date"), col("warc_date"),
        lit("content_type"), col("content_type")).as("metadata"))
      .filter(length(col("text")) > 0)
  }

  /** WARC → WET-style plain-text derivative (the Common Crawl
    * `*.warc.wet` convention: one text "conversion" record per
    * successful HTTP response): 2xx `response` records with a text
    * payload land as `(warc_file, record_idx, target_uri, warc_date,
    * content_type, wet_text)`. HTML payloads go through the
    * charset-aware decode + [[graft.ops.MainContent]] block extraction
    * (blocks newline-joined — WET preserves paragraph structure),
    * falling back to the full flatten when no block qualifies; other
    * text payloads are decoded and trimmed verbatim. One pass over the
    * archive, per-file parallelism, same [[readWarc]] scan.
    */
  def readWarcWet(spark: SparkSession, pathGlob: String): DataFrame = {
    val wet = udf((ct: String, body: Array[Byte]) => {
      val raw = WarcCodec.decodeBody(ct, body)
      if (ct != null &&
          ct.toLowerCase.matches("^(text/html|application/xhtml).*")) {
        val main = graft.ops.MainContent.extract(raw)
        if (main.nonEmpty) main
        else raw.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
          .replaceAll("<[^>]+>", " ").replaceAll("\\s+", " ").trim
      } else raw.trim
    })
    readWarc(spark, pathGlob)
      .filter(col("record_type") === "response" &&
        col("http_status") >= 200 && col("http_status") < 300 &&
        col("content_type").rlike("(?i)^(text/|application/xhtml)"))
      .select(col("warc_file"), col("record_idx"), col("target_uri"),
        col("warc_date"), col("content_type"),
        wet(col("content_type"), col("content")).as("wet_text"))
      .filter(length(col("wet_text")) > 0)
  }

  /** CDXJ crawl-index scan (the Common Crawl / pywb index convention:
    * one line per capture — `SURT-key timestamp {json}` — the lookup
    * structure that makes a 100 TB WARC corpus randomly addressable):
    * `(surt, ts, url, mime, status, digest, length, offset, filename)`
    * — `offset`/`length` locate the record inside its named `.warc.gz`
    * for a ranged fetch, which is how selective re-processing avoids
    * scanning archives. Line splitting + JSON field extraction are
    * pure expressions; the text scan distributes per file.
    */
  def readCdxj(spark: SparkSession, pathGlob: String): DataFrame = {
    val line = col("value")
    val json = regexp_extract(line, "^\\S+ \\S+ (.*)$", 1)
    def field(name: String) = get_json_object(json, s"$$.$name")
    spark.read.text(pathGlob)
      .filter(length(trim(line)) > 0)
      .select(
        regexp_extract(line, "^(\\S+)", 1).as("surt"),
        regexp_extract(line, "^\\S+ (\\S+)", 1).as("ts"),
        field("url").as("url"),
        field("mime").as("mime"),
        field("status").cast("long").as("status"),
        field("digest").as("digest"),
        field("length").cast("long").as("rec_length"),
        field("offset").cast("long").as("rec_offset"),
        field("filename").as("filename"))
  }

  /** Build the CDX index OF a `.warc.gz` archive — the write side of
    * the [[readCdxj]]/[[fetchWarcRecords]] loop: per file, gzip member
    * boundaries from real decompression bookkeeping
    * ([[WarcCodec.gzipMemberRanges]]) pair each record with its ranged-
    * fetch `(rec_offset, rec_length)`; the record itself supplies
    * `surt` ([[graft.ops.UrlOps.surtKey]]), the 14-digit CDX timestamp
    * (digits of `WARC-Date`), url, type, status, and mime. One
    * binaryFile scan, per-file kernels — indexing distributes with the
    * archives exactly like parsing.
    */
  def indexWarcGz(spark: SparkSession, pathGlob: String): DataFrame =
    indexWarcGzFromBinary(spark.read.format("binaryFile").load(pathGlob))

  /** The indexing transform over any `(path, content)` relation —
    * shared by the batch indexer and the streaming drop-directory
    * index maintenance
    * ([[graft.streaming.IncrementalIngest.startWarcIndexing]]): the
    * SAME plan runs per micro-batch, so stream ≡ batch by construction
    * (the [[warcDocumentsFromBinary]] discipline).
    */
  def indexWarcGzFromBinary(binary: DataFrame): DataFrame = {
    val index = udf((bytes: Array[Byte]) =>
      WarcCodec.gzipMemberRanges(bytes).map { case (off, len) =>
        val r = WarcCodec.parseAll(
          java.util.Arrays.copyOfRange(bytes, off.toInt,
            (off + len).toInt)).head
        (off, len, r.recordType, r.targetUri, r.warcDate, r.contentType,
          r.httpStatus)
      })
    binary
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("filename"),
        explode(index(col("content"))).as("m"))
      .select(
        graft.ops.UrlOps.surtKey(col("m._4")).as("surt"),
        substring(regexp_replace(col("m._5"), "[^0-9]", ""), 1, 14).as("ts"),
        col("m._4").as("url"),
        col("m._3").as("record_type"),
        col("m._7").cast("long").as("status"),
        col("m._6").as("mime"),
        col("m._2").as("rec_length"),
        col("m._1").as("rec_offset"),
        col("filename"))
  }

  /** Ranged WARC record fetch — the index's payoff: each CDXJ row's
    * `(filename, rec_offset, rec_length)` seeks straight to its gzip
    * member (one record per member by spec, so any member boundary is
    * a valid entry point) and parses exactly that record — a corpus
    * slice re-processes by reading index-selected BYTE RANGES, never
    * scanning archives. Per-row bounded kernel over the Hadoop
    * FileSystem API (S3/GCS ranged GETs on a real cluster; seek+read
    * locally); output `(surt, ts, url, record_type, http_status,
    * content_type, content)`. A row whose range fails to parse
    * surfaces `record_type = "error"` with the message in
    * `content_type` — one bad index row must not kill the fetch job.
    */
  def fetchWarcRecords(spark: SparkSession, index: DataFrame,
                       archiveDir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fetch = udf((filename: String, offset: Long, length: Long) => {
      try {
        val path = new org.apache.hadoop.fs.Path(archiveDir, filename)
        val fs = path.getFileSystem(conf.value)
        val in = fs.open(path)
        try {
          in.seek(offset)
          val bytes = new Array[Byte](length.toInt)
          in.readFully(bytes)
          val r = WarcCodec.parseAll(bytes).head
          (r.recordType, r.targetUri, r.contentType, r.httpStatus, r.body)
        } finally in.close()
      } catch {
        case e: Exception =>
          ("error", "", e.toString.takeWhile(_ != '\n').take(120), -1,
            Array.empty[Byte])
      }
    })
    index
      .withColumn("__r", fetch(col("filename"), col("rec_offset"),
        col("rec_length")))
      .select(col("surt"), col("ts"),
        col("__r._2").as("url"), col("__r._1").as("record_type"),
        col("__r._4").cast("long").as("http_status"),
        col("__r._3").as("content_type"), col("__r._5").as("content"))
  }

  /** WARC → WAT-style outlink derivative (the metadata record family's
    * most-used payload): one row per `<a href=…>` in each successful
    * HTML response — `(doc_id, link_idx, href, href_abs)` with `href`
    * RAW as written (the WAT convention) and `href_abs` resolved
    * against the page URL per RFC 3986 §5
    * ([[graft.ops.UrlOps.resolveReference]]) — the link-graph edge key.
    * The href harvest is a pure `regexp_extract_all` + `posexplode`;
    * resolution is one bounded per-link kernel.
    */
  def readWarcOutlinks(spark: SparkSession, pathGlob: String): DataFrame = {
    val decodeText = udf((ct: String, body: Array[Byte]) =>
      WarcCodec.decodeBody(ct, body))
    readWarc(spark, pathGlob)
      .filter(col("record_type") === "response" &&
        col("http_status") >= 200 && col("http_status") < 300 &&
        col("content_type").rlike("(?i)^(text/html|application/xhtml)"))
      .select(
        concat(col("warc_file"), lit("_r"), col("record_idx")).as("doc_id"),
        col("target_uri"),
        posexplode(regexp_extract_all(
          decodeText(col("content_type"), col("content")),
          lit("(?i)<a[^>]*?href\\s*=\\s*[\"']([^\"'#][^\"']*)[\"']"), lit(1))))
      .select(col("doc_id"), col("pos").cast("long").as("link_idx"),
        col("col").as("href"),
        graft.ops.UrlOps.resolveUrl(col("target_uri"), col("col"))
          .as("href_abs"))
  }
}
