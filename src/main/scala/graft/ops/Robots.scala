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
  *     falling back to `*`; any non-user-agent directive ends an
  *     agent run (so `User-agent: a / Sitemap: x / User-agent: b`
  *     starts a NEW group at `b` — Google's parser convention);
  *   - rule matching is PERCENT-ENCODING-NORMALIZED on both sides
  *     ([[Robots.normalizePercent]]: existing `%XY` escapes uppercase,
  *     non-ASCII characters percent-encoded from their UTF-8 bytes, a
  *     bare `%` escaped — so `Disallow: /café` matches the fetched
  *     `/caf%C3%A9` and vice versa); `*` wildcards, `$` end-anchor;
  *     the MOST SPECIFIC (longest-pattern) match wins, Allow winning
  *     length ties; no match ⇒ allowed;
  *   - an empty `Disallow:` value disallows nothing; unknown
  *     directives are ignored; `#` starts a comment.
  *
  * The parse is a bounded per-host kernel (robots.txt is capped at
  * 500 KiB by the RFC). The gate PRE-REDUCES the robots table to
  * compact per-(host, selected-group) rule structs BEFORE the URL
  * join ([[Robots.compileForAgent]]): the build side carries ~1 KB of
  * rules per host instead of up-to-500-KB bodies, so it stays
  * broadcastable to ~millions of hosts — and when it does outgrow a
  * broadcast, the shuffle moves rule structs, not bodies, and AQE's
  * skew-join split handles the one-mega-host key. The per-row decision
  * is O(rules-in-selected-group), never O(urls × hosts).
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
            if (agents.nonEmpty && value.nonEmpty)
              rules += Rule(allow = true, normalizePercent(value))
          case "disallow" =>
            inAgentRun = false
            // empty Disallow: disallows nothing (explicit allow-all)
            if (agents.nonEmpty && value.nonEmpty)
              rules += Rule(allow = false, normalizePercent(value))
          case "crawl-delay" =>
            inAgentRun = false
            if (agents.nonEmpty) delay = value.toDoubleOption
          case "sitemap" =>
            // a sitemap line ends an agent run like any other directive
            // (Google's parser: only consecutive user-agent lines merge)
            inAgentRun = false
            if (value.nonEmpty) sitemaps += value
          case _ => inAgentRun = false // unknown directive: ignored
        }
      }
    }
    flush()
    RobotsRules(groups.toSeq, sitemaps.toSeq)
  }

  private def isHexDigit(c: Char): Boolean = Character.digit(c, 16) >= 0

  /** Percent-encoding normalization applied identically to rule
    * patterns (at parse) and URL path+query (at match): valid `%XY`
    * escapes keep their bytes with uppercase hex, non-ASCII characters
    * are percent-encoded from their UTF-8 bytes, and a bare `%` (not
    * followed by two hex digits) becomes `%25`. ASCII — including the
    * `*` and `$` rule metacharacters — passes through, so the
    * normalized form is still a rule pattern.
    */
  private[ops] def normalizePercent(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 < s.length && isHexDigit(s.charAt(i + 1)) &&
            isHexDigit(s.charAt(i + 2))) {
          sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { sb.append("%25"); i += 1 }
      } else if (c < 0x80) { sb.append(c); i += 1 }
      else {
        val cp = s.codePointAt(i)
        new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
        i += Character.charCount(cp)
      }
    }
    sb.toString
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

  /** Longest-match Allow/Disallow decision over one group's rules
    * (patterns already percent-normalized at parse; `pathQuery` raw).
    */
  private def decideRules(patterns: IndexedSeq[String],
                          allows: IndexedSeq[Boolean],
                          pathQuery: String): Boolean = {
    val pq = normalizePercent(pathQuery)
    var best = -1
    var allowed = true
    var i = 0
    while (i < patterns.length) {
      if (patternMatches(patterns(i), pq)) {
        val len = patterns(i).length
        // most specific wins; Allow wins length ties
        if (len > best) { best = len; allowed = allows(i) }
        else if (len == best && allows(i)) allowed = true
      }
      i += 1
    }
    allowed
  }

  /** RFC 9309 decision for one URL path(+query) under one parsed
    * rules object. `pathQuery` may arrive raw — it is
    * percent-normalized here to match the parse-time rule form.
    */
  def isAllowed(rules: RobotsRules, userAgent: String,
                pathQuery: String): Boolean =
    selectGroup(rules, userAgent) match {
      case None => true
      case Some(g) =>
        decideRules(g.rules.map(_.pattern).toIndexedSeq,
          g.rules.map(_.allow).toIndexedSeq, pathQuery)
    }

  /** Path(+query) of a URL for rule matching, raw-escaped form; "/"
    * for unparseable URLs or empty paths.
    */
  private def pathQueryOf(url: String): String = {
    val u = try new java.net.URI(url) catch { case _: Exception => null }
    if (u == null) "/"
    else {
      val p = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
      Option(u.getRawQuery).map(q => s"$p?$q").getOrElse(p)
    }
  }

  /** Pre-reduce a per-host robots.txt table to the compact rule struct
    * the gate join carries: `(host, __patterns, __allows, __delay)`
    * for the group [[selectGroup]] picks for `userAgent` (group
    * selection is agent-pure, so it happens ONCE per host here, not
    * per URL). This is the 100-TB shape: rules for one agent are ~1 KB
    * where the body is up to 500 KB, so the build side stays
    * broadcastable to ~millions of hosts; past that the shuffle moves
    * rule structs, never bodies.
    */
  def compileForAgent(robotsTxt: DataFrame, hostCol: String, bodyCol: String,
                      userAgent: String): DataFrame = {
    val compile = udf((body: String) => {
      if (body == null) (Array.empty[String], Array.empty[Boolean],
        Option.empty[Double])
      else {
        val rules = parseCached(body)
        selectGroup(rules, userAgent) match {
          case None =>
            (Array.empty[String], Array.empty[Boolean], Option.empty[Double])
          case Some(g) =>
            (g.rules.map(_.pattern).toArray, g.rules.map(_.allow).toArray,
              g.crawlDelay)
        }
      }
    })
    robotsTxt
      .select(col(hostCol).as("host"), compile(col(bodyCol)).as("__r"))
      .select(col("host"), col("__r._1").as("__patterns"),
        col("__r._2").as("__allows"), col("__r._3").as("__delay"))
  }

  /** Gate a URL table against a per-host robots table.
    *
    * @param urls       any df with `urlCol`
    * @param robotsTxt  df of `(hostCol, bodyCol)` — one robots.txt body
    *                   per host (as fetched/archived)
    * @return urls plus `host`, `allowed`, `crawl_delay` (null when the
    *         host has no robots.txt — allowed per RFC, or no delay)
    *
    * Plan shape: the robots side is first [[compileForAgent]]-reduced
    * to per-host rule structs (bodies parsed once per host, never
    * shipped); hosts derive from the URL via [[UrlOps.host]]
    * (codegen'd); the join key is the scalar host string; and the
    * per-row decision is a bounded imperative kernel over the selected
    * group's rules only.
    */
  def gateUrls(urls: DataFrame, urlCol: String, robotsTxt: DataFrame,
               hostCol: String, bodyCol: String,
               userAgent: String): DataFrame = {
    val compiled = compileForAgent(robotsTxt, hostCol, bodyCol, userAgent)
    val decide = udf((patterns: Seq[String], allows: Seq[Boolean], url: String) =>
      if (patterns == null) true // host with no robots.txt: allowed per RFC
      else decideRules(patterns.toIndexedSeq, allows.toIndexedSeq,
        pathQueryOf(url)))
    urls
      .withColumn("host", UrlOps.host(col(urlCol)))
      .join(compiled, Seq("host"), "left")
      .withColumn("allowed", decide(col("__patterns"), col("__allows"),
        col(urlCol)))
      .withColumn("crawl_delay", col("__delay"))
      .drop("__patterns", "__allows", "__delay")
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
