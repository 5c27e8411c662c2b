package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) — the crawl
  * politeness gate next to [[UrlOps]] and the WARC front door: a crawl
  * curation pipeline re-checks fetched URLs against the site's rules
  * (takedowns, post-hoc compliance audits, filtering archived crawls
  * fetched by someone else's policy).
  *
  * Semantics per RFC 9309 / the Google REP reference implementation:
  *   - groups of `User-agent` lines share the following Allow/Disallow
  *     rules; group selection picks the LONGEST agent token that is a
  *     case-insensitive substring-prefix match of the product token,
  *     falling back to `*`;
  *   - rule matching is on the percent-decoded path + query; `*`
  *     wildcards, `$` end-anchor; the MOST SPECIFIC (longest-pattern)
  *     match wins, Allow winning length ties; no match ⇒ allowed;
  *   - an empty `Disallow:` value disallows nothing; unknown
  *     directives are ignored; `#` starts a comment.
  *
  * The parse is a bounded per-host kernel (robots.txt is capped at
  * 500 KiB by the RFC); the gate is a broadcast-or-shuffle equi-join
  * of URLs to their host's parsed rules and a per-row match over the
  * selected group's rules — O(urls × rules-per-host), never
  * O(urls × hosts).
  */
object Robots {

  /** One rule: allow/disallow + the raw pattern. */
  final case class Rule(allow: Boolean, pattern: String)

  /** One user-agent group (agents lowercased). */
  final case class Group(agents: Seq[String], rules: Seq[Rule],
                         crawlDelay: Option[Double])

  final case class RobotsRules(groups: Seq[Group], sitemaps: Seq[String])

  /** Parse a robots.txt body. Never throws on junk lines — real-world
    * robots files are full of them; unknown directives are skipped.
    */
  def parse(content: String): RobotsRules = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var delay: Option[Double] = None
    var inAgentRun = false // consecutive User-agent lines share one group
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
      delay = None
    }
    content.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) flush()
            agents += value.toLowerCase
            inAgentRun = true
          case "allow" =>
            inAgentRun = false
            if (agents.nonEmpty && value.nonEmpty) rules += Rule(allow = true, value)
          case "disallow" =>
            inAgentRun = false
            // empty Disallow: disallows nothing (explicit allow-all)
            if (agents.nonEmpty && value.nonEmpty) rules += Rule(allow = false, value)
          case "crawl-delay" =>
            inAgentRun = false
            if (agents.nonEmpty) delay = value.toDoubleOption
          case "sitemap" =>
            if (value.nonEmpty) sitemaps += value
          case _ => inAgentRun = false // unknown directive: ignored
        }
      }
    }
    flush()
    RobotsRules(groups.toSeq, sitemaps.toSeq)
  }

  // per-JVM (executor-lifetime) caches: robots bodies repeat per host
  // and rule patterns repeat per body — both maps are bounded by the
  // distinct hosts/patterns a partition sees and cleared past a cap so
  // a pathological crawl can't grow them without bound
  private val ruleRegexCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private val parseCache =
    new java.util.concurrent.ConcurrentHashMap[String, RobotsRules]()
  private val CacheCap = 8192

  private[ops] def parseCached(body: String): RobotsRules = {
    if (parseCache.size > CacheCap) parseCache.clear()
    parseCache.computeIfAbsent(body, parse(_))
  }

  /** True when `pattern` (with `*` wildcards and an optional trailing
    * `$` anchor) matches a prefix of `pathQuery` — compiled to an
    * anchored regex (quoted segments joined by `.*`), cached per
    * pattern, so wildcard backtracking (`/a*b$` against `/axbyb`) is
    * the regex engine's problem, not a greedy scan's.
    */
  private[ops] def patternMatches(pattern: String, pathQuery: String): Boolean = {
    if (ruleRegexCache.size > CacheCap) ruleRegexCache.clear()
    val re = ruleRegexCache.computeIfAbsent(pattern, p => {
      val anchored = p.endsWith("$")
      val body = if (anchored) p.dropRight(1) else p
      val sb = new StringBuilder("^")
      body.split("\\*", -1).zipWithIndex.foreach { case (seg, i) =>
        if (i > 0) sb.append(".*")
        if (seg.nonEmpty) sb.append(java.util.regex.Pattern.quote(seg))
      }
      if (anchored) sb.append("$")
      java.util.regex.Pattern.compile(sb.toString,
        java.util.regex.Pattern.DOTALL)
    })
    re.matcher(pathQuery).lookingAt()
  }

  /** The group whose agent token best matches `userAgent` (longest
    * case-insensitive prefix-token match; `*` as fallback), or None.
    */
  private[ops] def selectGroup(rules: RobotsRules,
                               userAgent: String): Option[Group] = {
    val ua = userAgent.toLowerCase
    val scored = rules.groups.flatMap { g =>
      g.agents.collect {
        case a if a != "*" && ua.startsWith(a) => (a.length, g)
      }
    }
    if (scored.nonEmpty) Some(scored.maxBy(_._1)._2)
    else rules.groups.find(_.agents.contains("*"))
  }

  /** RFC 9309 decision for one URL path(+query) under one parsed
    * rules object.
    */
  def isAllowed(rules: RobotsRules, userAgent: String,
                pathQuery: String): Boolean =
    selectGroup(rules, userAgent) match {
      case None => true
      case Some(g) =>
        val hits = g.rules.filter(r => patternMatches(r.pattern, pathQuery))
        if (hits.isEmpty) true
        else {
          val best = hits.map(_.pattern.length).max
          // Allow wins length ties
          hits.filter(_.pattern.length == best).exists(_.allow)
        }
    }

  /** Gate a URL table against a per-host robots table.
    *
    * @param urls       any df with `urlCol`
    * @param robotsTxt  df of `(hostCol, bodyCol)` — one robots.txt body
    *                   per host (as fetched/archived)
    * @return urls plus `host`, `allowed`, `crawl_delay` (null when the
    *         host has no robots.txt — allowed per RFC, or no delay)
    *
    * Plan shape: hosts derive from the URL via [[UrlOps.host]]
    * (codegen'd), the join key is the scalar host string (robots
    * bodies move once; broadcast when small), and the per-row decision
    * is a bounded imperative kernel over the SELECTED group only.
    */
  def gateUrls(urls: DataFrame, urlCol: String, robotsTxt: DataFrame,
               hostCol: String, bodyCol: String,
               userAgent: String): DataFrame = {
    val decide = udf((body: String, url: String) => {
      if (body == null) (true, null.asInstanceOf[java.lang.Double])
      else {
        val rules = parseCached(body)
        val pq = {
          val u = try new java.net.URI(url) catch { case _: Exception => null }
          if (u == null) "/"
          else {
            val p = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
            Option(u.getRawQuery).map(q => s"$p?$q").getOrElse(p)
          }
        }
        val delay = selectGroup(rules, userAgent).flatMap(_.crawlDelay)
          .map(java.lang.Double.valueOf).orNull
        (isAllowed(rules, userAgent, pq), delay)
      }
    })
    urls
      .withColumn("host", UrlOps.host(col(urlCol)))
      .join(robotsTxt.select(col(hostCol).as("host"), col(bodyCol).as("__body")),
        Seq("host"), "left")
      .withColumn("__d", decide(col("__body"), col(urlCol)))
      .withColumn("allowed", col("__d._1"))
      .withColumn("crawl_delay", col("__d._2"))
      .drop("__body", "__d")
  }

  /** Sitemap XML (urlset/sitemapindex) → one row per `loc` with
    * optional lastmod — StAX, namespace-tolerant.
    */
  def parseSitemap(xml: String): Seq[(String, String)] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var loc: String = null
    var lastmod: String = ""
    var field: String = null
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "url" | "sitemap" => loc = null; lastmod = ""
              case "loc" | "lastmod" => field = r.getLocalName
              case _ => field = null
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
            if (field == "loc") loc = Option(loc).getOrElse("") + r.getText.trim
            else if (field == "lastmod") lastmod += r.getText.trim
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "url" | "sitemap" =>
                if (loc != null && loc.nonEmpty) out += ((loc, lastmod))
                loc = null
              case "loc" | "lastmod" => field = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toSeq
  }
}
