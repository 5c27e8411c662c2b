package graft.ops

import scala.collection.mutable.ArrayBuffer

/** HTML table extraction for the training-data pipeline: a tolerant
  * single-pass scanner (the [[MainContent]] discipline — real crawls
  * are full of malformed markup, so no DOM, no exceptions for missing
  * close tags) that recovers each TOP-LEVEL `<table>` as structured
  * rows plus a GitHub-markdown rendering — the linearization that
  * preserves the column alignment an LLM can learn from, where plain
  * text-soup extraction destroys it.
  *
  * Contract:
  *   - only top-level tables emit (a nested `<table>` folds its text
  *     into the owning cell — layout-nesting noise, not data);
  *   - a row is a `<tr>` holding `<td>`/`<th>` cells; stray cell text
  *     outside any cell is dropped; `<script>`/`<style>` subtrees
  *     never leak (boundary-checked close, the MainContent fix);
  *   - cell text: tags stripped, `<br>` becomes a space, the five
  *     basic entities decoded (`&amp; &lt; &gt; &quot; &nbsp;` and
  *     numeric `&#NN;`), whitespace collapsed;
  *   - `has_header` = every cell of the FIRST row is `<th>`;
  *   - markdown: ragged rows pad to the widest row; a headerless
  *     table renders an empty header row (GitHub markdown requires
  *     one); `|` inside a cell escapes as `\|`.
  *
  * Per-document bounded kernel — the work distributes with the
  * documents, no shuffle, no driver trips.
  */
object HtmlTables {

  final case class Table(index: Int, nRows: Int, nCols: Int,
                         hasHeader: Boolean, markdown: String)

  def extract(html: String): Seq[Table] = {
    if (html == null) return Seq.empty
    val n = html.length
    val lower = html.toLowerCase
    val out = ArrayBuffer.empty[Table]
    var i = 0
    while (i < n) {
      val start = lower.indexOf("<table", i)
      if (start < 0) i = n
      else {
        val after = start + 6
        val boundary = after >= n || {
          val c = lower.charAt(after)
          c == '>' || c == '/' || c.isWhitespace
        }
        if (boundary) {
          val (tbl, end) = parseTable(html, lower, start)
          tbl.foreach { t => out += t.copy(index = out.length) }
          i = end
        } else i = after
      }
    }
    out.toSeq
  }

  /** Parse one table starting at the `<table` offset; returns the
    * table (None when it holds no rows) and the scan-resume offset.
    */
  private def parseTable(html: String, lower: String,
                         start: Int): (Option[Table], Int) = {
    val n = html.length
    var i = tagEnd(html, start)
    var depth = 1
    val rows = ArrayBuffer.empty[ArrayBuffer[(String, Boolean)]]
    var curRow: ArrayBuffer[(String, Boolean)] = null
    var cell: StringBuilder = null
    var cellIsTh = false
    def endCell(): Unit =
      if (cell != null) {
        if (curRow != null) curRow += ((collapse(cell.toString), cellIsTh))
        cell = null
      }
    def endRow(): Unit = {
      endCell()
      if (curRow != null && curRow.nonEmpty) rows += curRow
      curRow = null
    }
    while (i < n && depth > 0) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val name = lower.substring(nameStart, j)
          val te = tagEnd(html, i)
          name match {
            case "" =>
              if (cell != null) cell.append(c)
              i += 1
            case "table" =>
              if (closing) {
                depth -= 1
                if (depth == 0) endRow()
              } else depth += 1
              i = te
            case "tr" if depth == 1 =>
              if (closing) endRow()
              else { endRow(); curRow = ArrayBuffer.empty }
              i = te
            case "td" | "th" if depth == 1 =>
              if (closing) endCell()
              else {
                endCell()
                if (curRow == null) curRow = ArrayBuffer.empty
                cell = new StringBuilder
                cellIsTh = name == "th"
              }
              i = te
            case "script" | "style" =>
              if (closing) i = te
              else {
                // boundary-checked close (the MainContent fix): the
                // name must end at '>', '/', or whitespace
                var close = lower.indexOf(s"</$name", te)
                while (close >= 0 && {
                  val a = close + 2 + name.length
                  a < n && {
                    val ch = lower.charAt(a)
                    ch != '>' && ch != '/' && !ch.isWhitespace
                  }
                }) close = lower.indexOf(s"</$name", close + 1)
                i = if (close < 0) n
                else {
                  val gt = html.indexOf('>', close)
                  if (gt < 0) n else gt + 1
                }
              }
            case "br" =>
              if (cell != null) cell.append(' ')
              i = te
            case _ =>
              if (cell != null) cell.append(' ') // tag = token boundary
              i = te
          }
        }
      } else {
        if (cell != null) cell.append(c)
        i += 1
      }
    }
    if (depth > 0) endRow() // unterminated table: keep what was seen
    if (rows.isEmpty) (None, math.max(i, start + 6))
    else {
      val nCols = rows.map(_.length).max
      val hasHeader = rows.head.forall(_._2)
      val header: Seq[String] =
        if (hasHeader) rows.head.map(_._1).toSeq else Seq.fill(nCols)("")
      val data = (if (hasHeader) rows.tail else rows).map(_.map(_._1).toSeq)
      def line(cells: Seq[String]): String =
        (0 until nCols).map(k => esc(cells.lift(k).getOrElse("")))
          .mkString("| ", " | ", " |")
      val md = (line(header) +:
        (0 until nCols).map(_ => "---").mkString("| ", " | ", " |") +:
        data.map(line)).mkString("\n")
      (Some(Table(0, data.length, nCols, hasHeader, md)), i)
    }
  }

  /** Offset just past the tag's `>` (quote-tolerant, the MainContent
    * scan rule).
    */
  private def tagEnd(html: String, at: Int): Int = {
    val n = html.length
    var k = at
    var inQuote = 0.toChar
    while (k < n && (inQuote != 0 || html.charAt(k) != '>')) {
      val ch = html.charAt(k)
      if (inQuote == 0 && (ch == '"' || ch == '\'')) inQuote = ch
      else if (ch == inQuote) inQuote = 0.toChar
      k += 1
    }
    if (k < n) k + 1 else n
  }

  private def esc(s: String): String = s.replace("|", "\\|")

  /** Entity decode (the five named + numeric) then whitespace
    * collapse + space-only edge strip (Spark/DuckDB trim semantics).
    */
  private def collapse(s: String): String = {
    val numeric = "&#(\\d{1,6});".r.replaceAllIn(s, m => {
      val cp = m.group(1).toInt
      // surrogate code points (U+D800-U+DFFF) are valid code points to
      // Character.toChars but emit a LONE UTF-16 surrogate — an
      // ill-formed string that corrupts downstream UTF-8 hashing
      if (cp <= 0x10ffff && Character.isValidCodePoint(cp) &&
          !(cp >= 0xD800 && cp <= 0xDFFF))
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      else ""
    })
    val resolved = numeric.replace("&amp;", "&").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&nbsp;", " ")
    var t = resolved.replaceAll("\\s+", " ")
    var a = 0
    var b = t.length
    while (a < b && t.charAt(a) == ' ') a += 1
    while (b > a && t.charAt(b - 1) == ' ') b -= 1
    t.substring(a, b)
  }
}
