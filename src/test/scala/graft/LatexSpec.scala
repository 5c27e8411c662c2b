package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Latex

class LatexSpec extends AnyFunSuite {

  test("sectioning, text commands, footnotes keep their text") {
    val src = "\\documentclass{article}\\begin{document}" +
      "\\section{Introduction}We study \\textbf{large} corpora" +
      "\\footnote{see appendix}.\\end{document}"
    assert(Latex.strip(src) ==
      "Introduction We study large corpora see appendix .")
  }

  test("math drops: inline, display, starred environments; cites and labels consumed") {
    assert(Latex.strip("Let $x^2 + y_i$ hold \\cite{fermat1637}; QED.") ==
      "Let hold ; QED.")
    assert(Latex.strip("$$\\int f$$ tail") == "tail")
    assert(Latex.strip("\\[ a = b \\] tail") == "tail")
    assert(Latex.strip("\\(c\\) tail") == "tail")
    assert(Latex.strip("\\begin{equation}\\label{eq:1}E=mc^2\\end{equation}" +
      " As \\eqref{eq:1} shows, it holds.") == "As shows, it holds.")
    assert(Latex.strip("\\begin{align*}x &= y\\\\ y &= z\\end{align*}done") ==
      "done")
  }

  test("comments, escapes, href, ldots, spacing commands") {
    assert(Latex.strip("cost is 50\\% \\& rising~now % trailing comment\nnext") ==
      "cost is 50% & rising now next")
    assert(Latex.strip("See \\href{https://example.com}{the docs}\\\\and \\ldots end") ==
      "See the docs and ... end")
    assert(Latex.strip("a\\,b\\;c\\ d") == "a b c d")
    assert(Latex.strip("braces \\{kept\\} literally") == "braces {kept} literally")
  }

  test("non-math environment content flows; optional args consumed; tolerance") {
    assert(Latex.strip("\\begin{abstract}short summary\\end{abstract}") ==
      "short summary")
    assert(Latex.strip("\\includegraphics[width=3cm]{fig.png}caption text") ==
      "caption text")
    assert(Latex.strip("\\cite[p. 7]{knuth}after") == "after")
    assert(Latex.strip(null) == "")
    assert(Latex.strip("unterminated $math to the end") == "unterminated")
    assert(Latex.strip("\\begin{equation}never closed") == "")
    assert(Latex.strip("plain prose stays exactly as written.") ==
      "plain prose stays exactly as written.")
  }
}
