package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL curation for crawl corpora — canonicalization, registered-domain
  * extraction, and canonical-URL dedup keys. At crawl scale the URL is
  * the first dedup/grouping key (a Common Crawl snapshot carries ~3 B
  * fetches whose URL list alone is ~200 GB), so these are pure column
  * expressions end to end: parse once with `try_parse_url`, then
  * array/string functions — no UDF, no shuffle, one projection. The
  * query-param filter/sort are Spark higher-order functions
  * (interpreted lambdas) over ≤ param-count elements — negligible next
  * to the URL parse itself, and measured flat at 16× rows (SCALE.md
  * round 12).
  *
  * Canonical form (the common crawl-dedup normalization):
  *   - scheme and host lowercased; userinfo dropped; fragment dropped;
  *   - default ports dropped (`:80` for http, `:443` for https), other
  *     ports kept;
  *   - empty path becomes `/` (other paths byte-preserved — path case
  *     is significant per RFC 3986);
  *   - tracking parameters dropped (`utm_*` prefix plus the
  *     [[UrlOps.TrackingParams]] set), remaining parameters sorted
  *     byte-wise; an emptied query drops its `?`.
  *
  * Invalid URLs (no scheme/authority) canonicalize to null — filter or
  * quarantine on that.
  */
object UrlOps {

  /** Exact-name tracking parameters dropped by [[canonicalize]] (the
    * `utm_` prefix family is dropped by prefix, on top of these).
    */
  val TrackingParams: Seq[String] = Seq(
    "fbclid", "gclid", "msclkid", "dclid", "yclid", "twclid", "igshid",
    "mc_cid", "mc_eid", "ref_src", "spm", "_hsenc", "_hsmi")

  private def hostPort(url: Column): Column = {
    // AUTHORITY = [userinfo@]host[:port]; drop userinfo, lowercase
    val auth = try_parse_url(url, lit("AUTHORITY"))
    lower(element_at(split(auth, "@"), -1))
  }

  /** Lowercased host (no port, no userinfo); null for invalid URLs. */
  def host(url: Column): Column =
    regexp_replace(hostPort(url), ":\\d+$", "")

  /** The canonical URL per the object contract; null when the URL has
    * no parseable scheme/authority.
    */
  def canonicalize(url: Column): Column = {
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    val hp = hostPort(url)
    val h = regexp_replace(hp, ":\\d+$", "")
    val port = regexp_extract(hp, ":(\\d+)$", 1)
    val keepPort = (port =!= "") &&
      !((proto === "http" && port === "80") ||
        (proto === "https" && port === "443"))
    val rawPath = try_parse_url(url, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", "/").otherwise(rawPath)
    val query = try_parse_url(url, lit("QUERY"))
    val params = filter(split(query, "&"), p => {
      val name = substring_index(p, "=", 1)
      (p =!= "") && !name.startsWith("utm_") &&
        !name.isInCollection(TrackingParams)
    })
    val kept = array_join(array_sort(params), "&")
    when(proto.isNull || h.isNull || h === "", lit(null).cast("string"))
      .otherwise(concat(
        proto, lit("://"), h,
        when(keepPort, concat(lit(":"), port)).otherwise(""),
        path,
        when(query.isNotNull && size(params) > 0, concat(lit("?"), kept))
          .otherwise("")))
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the
    * webarchive-commons/Common Crawl index convention): scheme and
    * userinfo dropped, host lowercased with a leading `www.` removed
    * and labels REVERSED comma-joined, then `)` + path (empty → `/`)
    * + `?query` — so one site's URLs sort contiguously and a host
    * range-scan is a prefix scan. Pure column expressions (the
    * [[canonicalize]] treatment); null for unparseable URLs. Fragments
    * are dropped (they never reach a server). Non-default ports ride
    * after the reversed host as `:port`.
    */
  def surtKey(url: Column): Column = {
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    val hp = hostPort(url)
    val h0 = regexp_replace(hp, ":\\d+$", "")
    val h = regexp_replace(h0, "^www\\.", "")
    val port = regexp_extract(hp, ":(\\d+)$", 1)
    val keepPort = (port =!= "") &&
      !((proto === "http" && port === "80") ||
        (proto === "https" && port === "443"))
    val revHost = array_join(reverse(split(h, "\\.")), ",")
    val rawPath = try_parse_url(url, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", "/").otherwise(rawPath)
    val query = try_parse_url(url, lit("QUERY"))
    when(proto.isNull || h.isNull || h === "", lit(null).cast("string"))
      .otherwise(concat(
        revHost,
        when(keepPort, concat(lit(":"), port)).otherwise(""),
        lit(")"), path,
        when(query.isNotNull && query =!= "", concat(lit("?"), query))
          .otherwise("")))
  }

  // ---- RFC 3986 reference resolution -----------------------------------

  private val UriRe = java.util.regex.Pattern.compile(
    // RFC 3986 appendix B
    "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?$")

  private final case class UriParts(scheme: String, authority: String,
                                    path: String, query: String,
                                    fragment: String)

  private def parts(s: String): UriParts = {
    val m = UriRe.matcher(s)
    m.matches() // appendix-B regex matches every string
    UriParts(m.group(2), m.group(4), Option(m.group(5)).getOrElse(""),
      m.group(7), m.group(9))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, verbatim. */
  private[ops] def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        val cut = out.lastIndexOf('/')
        out.setLength(if (cut < 0) 0 else cut)
      } else if (in == "/..") {
        in = "/"
        val cut = out.lastIndexOf('/')
        out.setLength(if (cut < 0) 0 else cut)
      } else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val seg = if (next < 0) in else in.substring(0, next)
        out.append(seg)
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.result()
  }

  /** RFC 3986 §5.2 reference resolution (strict — `http:g` stays
    * `http:g`), the WAT-outlink → absolute-URL step: java.net.URI's
    * resolve deviates from the RFC on several of §5.4's own test
    * vectors, so the algorithm is transcribed verbatim (§5.2.2
    * transform + §5.2.3 merge + §5.2.4 remove_dot_segments —
    * [[UrlOpsSpec]] pins all 41 §5.4 vectors). Null when the base has
    * no scheme (a relative base cannot anchor resolution).
    */
  def resolveReference(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    val b = parts(base)
    if (b.scheme == null) return null
    val r = parts(ref)
    val t =
      if (r.scheme != null)
        r.copy(path = removeDotSegments(r.path))
      else if (r.authority != null)
        UriParts(b.scheme, r.authority, removeDotSegments(r.path),
          r.query, r.fragment)
      else if (r.path.isEmpty)
        UriParts(b.scheme, b.authority, b.path,
          if (r.query != null) r.query else b.query, r.fragment)
      else {
        val merged =
          if (r.path.startsWith("/")) r.path
          else if (b.authority != null && b.path.isEmpty) "/" + r.path
          else {
            val cut = b.path.lastIndexOf('/')
            (if (cut < 0) "" else b.path.substring(0, cut + 1)) + r.path
          }
        UriParts(b.scheme, b.authority, removeDotSegments(merged),
          r.query, r.fragment)
      }
    val sb = new StringBuilder
    if (t.scheme != null) sb.append(t.scheme).append(':')
    if (t.authority != null) sb.append("//").append(t.authority)
    sb.append(t.path)
    if (t.query != null) sb.append('?').append(t.query)
    if (t.fragment != null) sb.append('#').append(t.fragment)
    sb.toString
  }

  /** [[resolveReference]] as a column (bounded per-row kernel). */
  def resolveUrl(base: Column, ref: Column): Column =
    udf((b: String, r: String) => Option(resolveReference(b, r)))
      .apply(base, ref)

  /** Registered domain (the "site" key for per-site quotas, crawl
    * politeness buckets, and domain-level quality priors) — PSL-backed:
    * delegates to [[Psl.registeredDomain]] over the committed
    * public-suffix-list snapshot (exceptions, wildcards, and exact
    * rules to 4 labels; the full upstream list is a drop-in resource
    * swap). IP-literal hosts and hosts that are themselves a public
    * suffix pass through unchanged.
    */
  def registeredDomain(hostCol: Column): Column =
    Psl.registeredDomain(hostCol)
}
