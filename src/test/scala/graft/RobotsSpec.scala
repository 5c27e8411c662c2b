package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Robots

class RobotsSpec extends AnyFunSuite {

  private val sample =
    """# robots for example.com
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok/
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /tmp/
      |Disallow: /*.png$
      |Allow: /tmp/shared
      |Disallow:
      |
      |Sitemap: https://example.com/sitemap.xml
      |Sitemap: https://example.com/sitemap2.xml
      |""".stripMargin

  test("parse: groups, rules, crawl-delay, sitemaps, comments, empty Disallow") {
    val r = Robots.parse(sample)
    assert(r.groups.length == 2)
    assert(r.groups(0).agents == Seq("graftbot"))
    assert(r.groups(0).rules == Seq(
      Robots.Rule(allow = false, "/private/"), Robots.Rule(allow = true, "/private/ok/")))
    assert(r.groups(0).crawlDelay.contains(2.5))
    // the empty Disallow: line adds no rule
    assert(r.groups(1).rules.length == 3)
    assert(r.sitemaps == Seq("https://example.com/sitemap.xml",
      "https://example.com/sitemap2.xml"))
  }

  test("group selection: longest agent token wins, * is the fallback, case-insensitive") {
    val r = Robots.parse(
      "User-agent: bot\nDisallow: /a\n\nUser-agent: graftbot\nDisallow: /b\n\nUser-agent: *\nDisallow: /c\n")
    assert(!Robots.isAllowed(r, "GraftBot/1.0", "/b")) // longest match: graftbot
    assert(Robots.isAllowed(r, "graftbot/1.0", "/a")) // bot group not selected
    assert(Robots.isAllowed(r, "graftbot/1.0", "/c"))
    assert(!Robots.isAllowed(r, "otherbot", "/c")) // falls back to *
    assert(Robots.isAllowed(r, "otherbot", "/b"))
  }

  test("decision: longest pattern wins, Allow wins length ties, no match allows") {
    val r = Robots.parse(sample)
    assert(!Robots.isAllowed(r, "graftbot", "/private/x"))
    assert(Robots.isAllowed(r, "graftbot", "/private/ok/x")) // longer Allow
    assert(Robots.isAllowed(r, "graftbot", "/anything"))
    // tie: Allow and Disallow same length → Allow wins
    val tie = Robots.parse("User-agent: *\nDisallow: /dir/\nAllow: /dir*\n")
    assert(Robots.isAllowed(tie, "x", "/dir/page"))
  }

  test("wildcards and $ anchors, including the backtracking shape") {
    val r = Robots.parse(sample)
    assert(!Robots.isAllowed(r, "otherbot", "/img/photo.png"))
    assert(Robots.isAllowed(r, "otherbot", "/img/photo.png.html")) // $ anchored
    assert(!Robots.isAllowed(r, "otherbot", "/tmp/x"))
    assert(Robots.isAllowed(r, "otherbot", "/tmp/shared/x"))
    // greedy-leftmost would miss this anchored match
    val bt = Robots.parse("User-agent: *\nDisallow: /a*b$\n")
    assert(!Robots.isAllowed(bt, "x", "/axbyb"))
    assert(Robots.isAllowed(bt, "x", "/axbyc"))
    // '*' alone blocks everything for the group
    val all = Robots.parse("User-agent: *\nDisallow: *\n")
    assert(!Robots.isAllowed(all, "x", "/"))
  }

  test("consecutive User-agent lines share one group; a later agent starts a new one") {
    val r = Robots.parse(
      "User-agent: a\nUser-agent: b\nDisallow: /x\n\nUser-agent: c\nDisallow: /y\n")
    assert(r.groups.length == 2)
    assert(r.groups(0).agents == Seq("a", "b"))
    assert(!Robots.isAllowed(r, "b", "/x1"))
    assert(Robots.isAllowed(r, "b", "/y1"))
    assert(!Robots.isAllowed(r, "c", "/y1"))
  }

  test("gateUrls: per-host join, no-robots hosts allowed, crawl_delay surfaces") {
    val spark = TestSpark.spark
    import spark.implicits._
    val urls = Seq(
      "https://example.com/private/x", "https://example.com/ok",
      "https://EXAMPLE.com:443/img/a.png", // host normalization meets the join key
      "https://other.org/anything").toDF("url")
    val robots = Seq(("example.com", sample)).toDF("host", "body")
    val out = Robots.gateUrls(urls, "url", robots, "host", "body", "graftbot")
      .select($"url", $"allowed", $"crawl_delay").collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), Option(r.get(2))))).toMap
    assert(out("https://example.com/private/x") == ((false, Some(2.5))))
    assert(out("https://example.com/ok") == ((true, Some(2.5))))
    // graftbot's group has no *.png rule — the * group does not apply
    assert(out("https://EXAMPLE.com:443/img/a.png")._1)
    assert(out("https://other.org/anything") == ((true, None)))
  }

  test("a Sitemap line ends an agent run — later agents get their own group") {
    val r = Robots.parse(
      "User-agent: a\nSitemap: https://x.com/s.xml\n" +
        "User-agent: b\nDisallow: /p\n")
    // a's group exists with NO rules; b's group carries the Disallow
    assert(r.groups.map(_.agents) == Seq(Seq("a"), Seq("b")))
    assert(r.groups(0).rules.isEmpty)
    assert(r.groups(1).rules == Seq(Robots.Rule(allow = false, "/p")))
    assert(r.sitemaps == Seq("https://x.com/s.xml"))
    assert(Robots.isAllowed(r, "a", "/p"))
    assert(!Robots.isAllowed(r, "b", "/p"))
  }

  test("percent-encoding-normalized matching, both directions") {
    // unencoded rule vs encoded URL
    val r1 = Robots.parse("User-agent: *\nDisallow: /café\n")
    assert(!Robots.isAllowed(r1, "bot", "/caf%C3%A9"))
    assert(!Robots.isAllowed(r1, "bot", "/café"))
    // encoded rule (lowercase hex) vs unencoded URL
    val r2 = Robots.parse("User-agent: *\nDisallow: /caf%c3%a9\n")
    assert(!Robots.isAllowed(r2, "bot", "/café"))
    assert(!Robots.isAllowed(r2, "bot", "/caf%C3%A9"))
    assert(Robots.isAllowed(r2, "bot", "/cafe"))
    // bare % (not an escape) normalizes to %25 on both sides
    val r3 = Robots.parse("User-agent: *\nDisallow: /100%\n")
    assert(!Robots.isAllowed(r3, "bot", "/100%25off"))
    // metacharacters survive normalization: anchor still anchors
    val r4 = Robots.parse("User-agent: *\nDisallow: /é$\n")
    assert(!Robots.isAllowed(r4, "bot", "/%C3%A9"))
    assert(Robots.isAllowed(r4, "bot", "/%C3%A9x"))
  }

  test("compileForAgent: rules-sized build side, gate decision unchanged") {
    val spark = TestSpark.spark
    import spark.implicits._
    val body = "User-agent: graftbot\nDisallow: /café\nCrawl-delay: 2\n" +
      "User-agent: *\nDisallow: /\n"
    val robots = Seq(("h.com", body)).toDF("host", "body")
    val compiled = Robots.compileForAgent(robots, "host", "body", "graftbot")
      .collect().head
    // the compiled struct carries ONLY graftbot's group, pre-normalized
    assert(compiled.getAs[scala.collection.Seq[String]]("__patterns").toSeq ==
      Seq("/caf%C3%A9"))
    assert(compiled.getAs[scala.collection.Seq[Boolean]]("__allows").toSeq ==
      Seq(false))
    assert(compiled.getAs[Double]("__delay") == 2.0)
    val urls = Seq("https://h.com/caf%C3%A9", "https://h.com/tea").toDF("url")
    val out = Robots.gateUrls(urls, "url", robots, "host", "body", "graftbot")
      .select($"url", $"allowed").as[(String, Boolean)].collect().toMap
    assert(out == Map("https://h.com/caf%C3%A9" -> false,
      "https://h.com/tea" -> true))
  }

  test("gateUrls plan: the compiled rules side broadcasts, bodies never ride the join") {
    val spark = TestSpark.spark
    import spark.implicits._
    val robots = Seq(("h.com", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "body")
    val urls = spark.range(1000).select(
      concat(lit("https://h.com/p"), $"id").as("url"))
    val plan = Robots.gateUrls(urls, "url", robots, "host", "body", "bot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rules-sized build side must broadcast; plan:\n$plan")
    // the join's streamed side carries url+host only; the body column
    // exists solely inside the build side's compile projection
    val joinLine = plan.linesIterator.find(_.contains("BroadcastHashJoin")).get
    assert(!joinLine.contains("body"), s"bodies must not ride the join: $joinLine")
  }

  test("frontier schedule: per-host slots, declared vs default delay, md5 order") {
    val spark = TestSpark.spark
    import spark.implicits._
    val urls = Seq(
      ("u1", "https://a.com/1", "a.com", Some(2.0)),
      ("u2", "https://a.com/2", "a.com", Some(2.0)),
      ("u3", "https://a.com/3", "a.com", Some(2.0)),
      ("u4", "https://b.com/1", "b.com", None))
      .toDF("id", "url", "host", "crawl_delay")
    val out = graft.ops.Frontier.schedule(urls, "url", "host", "crawl_delay")
      .select($"id", $"slot", $"fetch_ms")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // a.com: three urls at 2 s spacing — slots 0,1,2 / 0,2000,4000 ms
    val aSlots = Seq("u1", "u2", "u3").map(out(_)._1).sorted
    assert(aSlots == Seq(0L, 1L, 2L))
    Seq("u1", "u2", "u3").foreach { u =>
      assert(out(u)._2 == out(u)._1 * 2000L) }
    // b.com schedules independently at the 1 s default
    assert(out("u4") == ((0L, 0L)))
    // deterministic: same input, same schedule
    val again = graft.ops.Frontier.schedule(urls, "url", "host", "crawl_delay")
      .select($"id", $"slot").as[(String, Long)].collect().toMap
    Seq("u1", "u2", "u3", "u4").foreach(u => assert(again(u) == out(u)._1))
  }

  test("sitemap XML: urlset and sitemapindex, lastmod optional") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://a.com/1</loc><lastmod>2026-01-01</lastmod></url>
        |<url><loc>https://a.com/2</loc></url>
        |</urlset>""".stripMargin
    assert(Robots.parseSitemap(urlset) ==
      Seq(("https://a.com/1", "2026-01-01"), ("https://a.com/2", "")))
    val index =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap><loc>https://a.com/s1.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Robots.parseSitemap(index) == Seq(("https://a.com/s1.xml", "")))
  }
}
