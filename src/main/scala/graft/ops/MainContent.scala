package graft.ops

/** DOM-aware main-content extraction — the readability/trafilatura/
  * boilerpipe heuristic family (Kohlschütter et al., "Boilerplate
  * Detection using Shallow Text Features", WSDM 2010) as a pure
  * per-document kernel: segment the page into BLOCKS at block-level
  * tag boundaries, score each block by text mass and link density,
  * drop navigation/footer/sidebar chrome, keep the article body.
  *
  * Every serious web-corpus pipeline (CCNet → RefinedWeb → FineWeb
  * lineage) runs an extractor of this class between the WARC scan and
  * the quality gates: page-LOCAL chrome (nav bars, cookie banners,
  * footers) repeats per TEMPLATE, not per corpus, so the corpus-level
  * boilerplate-line dedup can't catch it on small domains. (The
  * reference's loader stack delegates the same job to
  * `UnstructuredHTMLLoader`'s element partitioning —
  * `/root/reference/src/server/utils/embedding.py:182-183`.)
  *
  * The kernel is bounded by the document (one linear scan + one
  * constant-pass classification), deterministic, and allocation-light —
  * the [[graft.sources.PdfCodec]] treatment: per-document imperative
  * kernels are the sanctioned UDF shape, and the scan distributes with
  * the documents. Entities are NOT decoded (`&amp;` stays literal),
  * matching [[graft.sources.DocumentSources.readHtml]]'s contract.
  *
  * Classification rules (engine-defined, pinned by the oracle):
  *   - blocks inside `<nav> <footer> <aside> <header> <form>` are
  *     chrome — never content;
  *   - `<script> <style> <noscript> <svg> <template> <head>` subtrees
  *     are dropped wholesale (a header tag inside a script string must
  *     not open a block);
  *   - a block is CONTENT when it has ≥ 8 words and ≤ 35% of them
  *     inside `<a>` (link density — the single strongest shallow
  *     feature per the boilerpipe study);
  *   - a short (≥ 2 words) zero-link block ADJACENT to a content block
  *     is promoted (quotes, single-sentence paragraphs inside the
  *     article);
  *   - a zero-link heading (`h1`-`h6`) is kept when a kept block
  *     follows it before the next heading (section titles belong to
  *     their section).
  */
object MainContent {

  /** One segmented block: owning tag, collapsed text, word counts. */
  final case class Block(tag: String, text: String, words: Int,
                         linkWords: Int, chrome: Boolean)

  private val BlockTags = Set(
    "address", "article", "aside", "blockquote", "body", "center", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "tbody", "td",
    "tfoot", "th", "thead", "tr", "ul", "br")

  private val ChromeTags = Set("nav", "footer", "aside", "header", "form")

  private val DropTags = Set("script", "style", "noscript", "svg",
    "template", "head")

  private def isHeading(tag: String): Boolean =
    tag.length == 2 && tag.charAt(0) == 'h' &&
      tag.charAt(1) >= '1' && tag.charAt(1) <= '6'

  /** Segment `html` into blocks: one linear scan, comments and
    * [[DropTags]] subtrees skipped, text runs flushed at block-tag
    * boundaries, link words counted under `<a>` depth, chrome flagged
    * under [[ChromeTags]] depth.
    */
  def blocks(html: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val text = new StringBuilder
    val linkText = new StringBuilder
    val tagStack = scala.collection.mutable.Stack.empty[String]
    var anchorDepth = 0
    var chromeDepth = 0
    var i = 0
    val n = html.length
    lazy val lowerHtml = html.toLowerCase // once, for drop-tag close scans

    def curTag: String = tagStack.headOption.getOrElse("body")

    def flush(): Unit = {
      val t = text.toString.replaceAll("\\s+", " ").trim
      if (t.nonEmpty) {
        val words = t.split(" ").length
        val lt = linkText.toString.replaceAll("\\s+", " ").trim
        val linkWords = if (lt.isEmpty) 0 else lt.split(" ").length
        out += Block(curTag, t, words, linkWords, chromeDepth > 0)
      }
      text.setLength(0)
      linkText.setLength(0)
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // parse tag name (after optional '/')
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // advance to the tag's '>' (tolerate '>' inside quoted attrs
          // being absent — real crawls are full of malformed markup).
          // Track unquoted attribute values so a trailing '/' that is
          // part of one (e.g. <a href=/x/>) is NOT read as XML-style
          // self-closing — that would skip the anchor-depth increment
          // and undercount link density.
          var k = j
          var inQuote = 0.toChar
          var afterEq = false // saw '=', awaiting the value
          var inUnq = false   // inside an unquoted attribute value
          var lastInUnq = false // was the last consumed char in one?
          while (k < n && (inQuote != 0 || html.charAt(k) != '>')) {
            val ch = html.charAt(k)
            lastInUnq = (inUnq && !ch.isWhitespace) ||
              (afterEq && !ch.isWhitespace && ch != '"' && ch != '\'')
            if (inQuote != 0) {
              if (ch == inQuote) inQuote = 0.toChar
            } else if (inUnq) {
              if (ch.isWhitespace) inUnq = false
            } else if (afterEq) {
              if (ch == '"' || ch == '\'') { inQuote = ch; afterEq = false }
              else if (!ch.isWhitespace) { inUnq = true; afterEq = false }
            } else if (ch == '=') afterEq = true
            k += 1
          }
          val selfClosed = k > i && k <= n - 1 && k >= 1 &&
            html.charAt(k - 1) == '/' && !lastInUnq
          val tagEnd = if (k < n) k + 1 else n
          if (name.isEmpty) {
            // stray '<' — literal text
            text.append(c); if (anchorDepth > 0) linkText.append(c)
            i += 1
          } else if (DropTags.contains(name) && !closing) {
            // skip the subtree to the matching close tag (first close —
            // these tags don't nest in practice). The tag name must end
            // at a boundary ('>', whitespace, '/') so </styles> does
            // not terminate a <style> subtree and leak CSS into blocks.
            var close = lowerHtml.indexOf(s"</$name", tagEnd)
            while (close >= 0 && {
              val after = close + 2 + name.length
              after < n && {
                val ch = lowerHtml.charAt(after)
                ch != '>' && ch != '/' && !ch.isWhitespace
              }
            }) close = lowerHtml.indexOf(s"</$name", close + 1)
            flush()
            i = if (close < 0) n
            else {
              val gt = html.indexOf('>', close)
              if (gt < 0) n else gt + 1
            }
          } else {
            if (name == "a") {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else if (!selfClosed) anchorDepth += 1
            }
            if (BlockTags.contains(name)) {
              flush()
              if (ChromeTags.contains(name)) {
                if (closing) chromeDepth = math.max(0, chromeDepth - 1)
                else if (!selfClosed) chromeDepth += 1
              }
              if (closing) {
                // tolerant pop: unwind to the matching open if present
                if (tagStack.contains(name))
                  while (tagStack.nonEmpty && tagStack.pop() != name) ()
              } else if (!selfClosed && name != "br" && name != "hr") {
                tagStack.push(name)
              }
            }
            i = tagEnd
          }
        }
      } else {
        text.append(c)
        if (anchorDepth > 0) linkText.append(c)
        i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** The kept block texts, in document order, per the object
    * contract's classification rules.
    */
  def extractBlocks(html: String): Seq[String] = {
    val bs = blocks(html)
    val n = bs.length
    // pass 1: the text-mass + link-density rule
    val base = bs.map(b => !b.chrome && !isHeading(b.tag) &&
      b.words >= 8 && b.linkWords * 100 <= b.words * 35)
    // pass 2: adjacent short zero-link promotion
    val promoted = bs.indices.map { i =>
      base(i) || (!bs(i).chrome && !isHeading(bs(i).tag) &&
        bs(i).linkWords == 0 && bs(i).words >= 2 &&
        ((i > 0 && base(i - 1)) || (i + 1 < n && base(i + 1))))
    }
    // pass 3: headings kept when their section has kept content
    val keep = bs.indices.map { i =>
      promoted(i) || (isHeading(bs(i).tag) && !bs(i).chrome &&
        bs(i).linkWords == 0 && {
          var j = i + 1
          var found = false
          while (j < n && !isHeading(bs(j).tag) && !found) {
            if (promoted(j)) found = true
            j += 1
          }
          found
        })
    }
    bs.indices.collect { case i if keep(i) => bs(i).text }
  }

  /** Main content as one newline-joined string ("" when the page has
    * no qualifying block — callers fall back to the full flatten when
    * recall matters more than precision).
    */
  def extract(html: String): String = extractBlocks(html).mkString("\n")
}
