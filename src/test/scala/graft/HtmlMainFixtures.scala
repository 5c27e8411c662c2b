package graft

/** Deterministic chrome-laden HTML fixture for
  * [[graft.ops.MainContent]] — committed under `fixtures/htmlmain/`
  * and byte-asserted against this generator ([[MediaFixtures]]
  * treatment). Run `Test/runMain graft.GenHtmlMainFixtures <dir>` to
  * (re)write it.
  */
object HtmlMainFixtures {

  /** A news-portal page with every chrome class the extractor must
    * drop: header+nav, a cookie banner, a link-list related-stories
    * block, an aside rail, and a footer — wrapped around a real
    * article (h1/h2 sections, one long and one short paragraph each).
    */
  val PortalHtml: String =
    """<!DOCTYPE html>
      |<html>
      |<head><title>Portal Title Ignored</title><style>.x{color:red}</style><script>var nav = "<p>fake</p>";</script></head>
      |<body>
      |<header><div class="logo">MegaCorp Portal</div><nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav></header>
      |<div id="cookie-banner">We use cookies. <a href="/accept">Accept all</a> <a href="/reject">Reject</a></div>
      |<main>
      |<h1>The Migration of Monarch Butterflies</h1>
      |<p>Every autumn millions of monarch butterflies leave their breeding grounds in southern Canada and fly nearly five thousand kilometres to the oyamel fir forests of central Mexico.</p>
      |<p>Short aside.</p>
      |<p>The navigation skills of the monarch remain an active research topic; the butterflies combine a time compensated sun compass with a magnetic backup sense, and no single individual survives the full round trip.</p>
      |<h2>Conservation status</h2>
      |<p>Logging pressure on the wintering forests &amp; the loss of milkweed corridors along the migration route have reduced the eastern population by more than eighty percent since the nineteen nineties.</p>
      |<ul><li><a href="/r1">Related story one</a></li><li><a href="/r2">Related story two</a></li></ul>
      |</main>
      |<aside><h3>Trending</h3><a href="/t1">Top ten lists</a> <a href="/t2">Celebrity news</a></aside>
      |<footer><p>Copyright 2026 MegaCorp. <a href="/terms">Terms</a> <a href="/privacy">Privacy</a> All rights reserved worldwide.</p></footer>
      |</body>
      |</html>
      |""".stripMargin

  def all: Seq[(String, String)] = Seq("portal.html" -> PortalHtml)
}

object GenHtmlMainFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/htmlmain")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    HtmlMainFixtures.all.foreach { case (name, text) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $dir/$name (${text.length} chars)")
    }
  }
}
