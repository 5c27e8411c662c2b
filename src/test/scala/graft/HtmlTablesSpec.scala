package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HtmlTables

class HtmlTablesSpec extends AnyFunSuite {

  test("header table: th row, entities, markdown shape") {
    val html = "<table><tr><th>name</th><th>qty</th></tr>" +
      "<tr><td>item 42</td><td>3</td></tr>" +
      "<tr><td>b&amp;w &#233;</td><td>7</td></tr></table>"
    val Seq(t) = HtmlTables.extract(html)
    assert(t.hasHeader && t.nRows == 2 && t.nCols == 2 && t.index == 0)
    assert(t.markdown ==
      "| name | qty |\n| --- | --- |\n| item 42 | 3 |\n| b&w é | 7 |")
  }

  test("headerless ragged table: pipe escape, tag-stripped cells, padding") {
    val html = "<table><tr><td>a|b</td><td><b>bold</b> text</td></tr>" +
      "<tr><td>only</td></tr></table>"
    val Seq(t) = HtmlTables.extract(html)
    assert(!t.hasHeader && t.nRows == 2 && t.nCols == 2)
    assert(t.markdown ==
      "|  |  |\n| --- | --- |\n| a\\|b | bold text |\n| only |  |")
  }

  test("nested table folds into the owning cell; sibling tables index in order") {
    val html = "<table><tr><td>outer <table><tr><td>inner</td></tr></table>" +
      " tail</td></tr></table><p>x</p><table><tr><td>t2</td></tr></table>"
    val ts = HtmlTables.extract(html)
    assert(ts.length == 2)
    assert(ts(0).index == 0 && ts(0).nRows == 1 && ts(0).nCols == 1)
    assert(ts(0).markdown.endsWith("| outer inner tail |"))
    assert(ts(1).index == 1 && ts(1).markdown.endsWith("| t2 |"))
  }

  test("script/style inside a cell never leaks; close-tag boundary honored") {
    val html = "<table><tr><td>keep<script>var t = '<td>no</td>';" +
      "</scripted></script></td><td>two</td></tr></table>" +
      "<table><tr><td><style>.x{}</styles> p{}</style>real</td></tr></table>"
    val ts = HtmlTables.extract(html)
    assert(ts.length == 2)
    assert(ts(0).markdown.endsWith("| keep | two |"))
    assert(ts(1).markdown.endsWith("| real |"))
    assert(!ts.exists(_.markdown.contains("no")))
    assert(!ts.exists(_.markdown.contains("p{}")))
  }

  test("tolerance: no tables, empty table, unterminated table, null") {
    assert(HtmlTables.extract("<p>plain prose, no tables</p>").isEmpty)
    assert(HtmlTables.extract("<table></table>").isEmpty)
    assert(HtmlTables.extract(null).isEmpty)
    // unterminated: rows seen so far survive
    val Seq(t) = HtmlTables.extract("<table><tr><td>open</td>")
    assert(t.nRows == 1 && t.markdown.endsWith("| open |"))
    // a '<tablet>' tag is NOT a table
    assert(HtmlTables.extract("<tablet><tr><td>x</td></tr></tablet>").isEmpty)
  }

  test("br becomes a space; tr without cells dropped; tbody tolerated") {
    val html = "<table><tbody><tr></tr><tr><td>line one<br>line two</td></tr>" +
      "</tbody></table>"
    val Seq(t) = HtmlTables.extract(html)
    assert(t.nRows == 1)
    assert(t.markdown.endsWith("| line one line two |"))
  }

  test("numeric entities: surrogate code points are rejected, never emitted lone") {
    // &#55296; = U+D800 (high surrogate) — Character.toChars would emit
    // a lone UTF-16 surrogate, an ill-formed string
    val html = "<table><tr><td>a&#55296;b &#57343;c &#233;</td></tr></table>"
    val Seq(t) = HtmlTables.extract(html)
    assert(t.markdown.endsWith("| ab c é |"), t.markdown)
    assert(!t.markdown.exists(ch => Character.isSurrogate(ch)))
  }
}
