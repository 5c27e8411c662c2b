package graft.ops

/** LaTeX source → plain training text (the arXiv-class corpus step):
  * a single-pass bounded kernel, not a typesetter — the goal is the
  * HUMAN-readable prose with markup noise gone, deterministic enough
  * to pin byte-for-byte.
  *
  * Rules (in scan order):
  *   - `%` comments to end of line (escaped `\%` is the percent sign);
  *   - math is DROPPED wholesale: `$...$`, `$$...$$`, `\(...\)`,
  *     `\[...\]`, and the display environments (equation/align/
  *     eqnarray/math/displaymath/gather/multline, starred or not);
  *   - argument-consuming commands drop their `[..]`/`{..}` arguments
  *     entirely: cite/citep/citet/ref/eqref/pageref/label/
  *     includegraphics/input/include/usepackage/documentclass/
  *     bibliography/bibliographystyle/begin/end (non-math environment
  *     CONTENT still flows); `\href{url}{text}` keeps only the text;
  *   - every other `\command` becomes a token boundary (one space) and
  *     its braced content flows — so `\section{X}`, `\textbf{X}`,
  *     `\footnote{X}` all keep X;
  *   - escapes unescape (`\% \& \_ \$ \# \{ \}`), `\\`/`~`/thin
  *     spaces become spaces, `\ldots`/`\dots` become `...`;
  *   - braces are token boundaries (one space each), then whitespace
  *     collapses and the edges trim.
  *
  * One bounded imperative kernel per document — distributes with the
  * documents, no shuffle.
  */
object Latex {

  private val MathEnvs = Set("equation", "align", "eqnarray", "math",
    "displaymath", "gather", "multline")

  private val DropArgCommands = Set("cite", "citep", "citet", "ref",
    "eqref", "pageref", "label", "includegraphics", "input", "include",
    "usepackage", "documentclass", "bibliography", "bibliographystyle")

  def strip(src: String): String = {
    if (src == null) return ""
    val n = src.length
    val out = new StringBuilder(n)
    var i = 0

    def skipBraced(from: Int): Int = { // past a balanced {..} group
      var p = from
      if (p < n && src.charAt(p) == '{') {
        var depth = 1
        p += 1
        while (p < n && depth > 0) {
          src.charAt(p) match {
            case '\\' => p += 1 // escaped char never changes depth
            case '{' => depth += 1
            case '}' => depth -= 1
            case _ =>
          }
          p += 1
        }
      }
      p
    }
    def skipOptional(from: Int): Int = { // past a [..] group
      var p = from
      if (p < n && src.charAt(p) == '[') {
        while (p < n && src.charAt(p) != ']') p += 1
        if (p < n) p += 1
      }
      p
    }
    def bracedContent(from: Int): (String, Int) = {
      val end = skipBraced(from)
      if (end > from + 1 && src.charAt(from) == '{')
        (src.substring(from + 1, end - 1), end)
      else ("", end)
    }

    while (i < n) {
      src.charAt(i) match {
        case '%' => // comment to EOL (escaped % handled at '\\')
          while (i < n && src.charAt(i) != '\n') i += 1
        case '$' =>
          val double = i + 1 < n && src.charAt(i + 1) == '$'
          val delim = if (double) "$$" else "$"
          var p = i + delim.length
          var closed = false
          while (p < n && !closed) {
            if (src.charAt(p) == '\\') p += 2
            else if (src.startsWith(delim, p)) closed = true
            else p += 1
          }
          out.append(' ')
          i = if (closed) p + delim.length else n
        case '{' | '}' =>
          out.append(' '); i += 1
        case '~' =>
          out.append(' '); i += 1
        case '\\' if i + 1 < n =>
          val c = src.charAt(i + 1)
          if (!c.isLetter) {
            c match {
              case '%' | '&' | '_' | '$' | '#' | '{' | '}' => out.append(c)
              case '\\' | ',' | ';' | ':' | ' ' => out.append(' ')
              case '[' | '(' => // inline/display math \[..\] \(..\)
                val close = if (c == '[') "\\]" else "\\)"
                val e = src.indexOf(close, i + 2)
                out.append(' ')
                i = (if (e < 0) n else e + 2) - 2 // -2: +=2 below
              case _ => out.append(' ')
            }
            i += 2
          } else {
            var j = i + 1
            while (j < n && src.charAt(j).isLetter) j += 1
            val name0 = src.substring(i + 1, j)
            val name = name0.stripSuffix("*")
            if (j < n && src.charAt(j) == '*') j += 1
            if (name == "ldots" || name == "dots") {
              out.append("...")
              i = j
            } else if (name == "begin" || name == "end") {
              val (env0, afterArg) = bracedContent(j)
              val env = env0.stripSuffix("*")
              if (name == "begin" && MathEnvs.contains(env)) {
                // drop the math environment wholesale
                val closeTag = s"\\end{$env0}"
                val e = src.indexOf(closeTag, afterArg)
                out.append(' ')
                i = if (e < 0) n else e + closeTag.length
              } else { out.append(' '); i = afterArg }
            } else if (name == "href") {
              // drop the URL arg; the text arg flows as ordinary input
              out.append(' ')
              i = skipBraced(skipOptional(j))
            } else if (DropArgCommands.contains(name)) {
              var p = skipOptional(j)
              p = skipBraced(p)
              out.append(' ')
              i = p
            } else {
              out.append(' ') // unknown command: token boundary, args flow
              i = j
            }
          }
        case '\\' => i += 1 // lone trailing backslash
        case c =>
          out.append(c); i += 1
      }
    }
    out.toString.replaceAll("\\s+", " ").trim
  }
}
