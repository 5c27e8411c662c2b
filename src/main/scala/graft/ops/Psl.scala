package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-Suffix-List-backed registered-domain derivation — the "site"
  * key behind per-site quotas ([[Sampling.stratifiedQuota]] domain
  * caps), crawl politeness buckets ([[Frontier]]) and domain-level
  * quality priors.
  *
  * The list is the committed snapshot at
  * `src/main/resources/graft/public_suffix_list.dat` (publicsuffix.org
  * format — the full upstream file is a drop-in; see the header there).
  * Matching follows the published PSL algorithm: among all matching
  * rules the LONGEST wins, an exception rule (`!www.ck`) always wins
  * and denotes the rule minus its leftmost label, a wildcard rule
  * (`*.ck`) matches exactly one extra label, and when nothing matches
  * the prevailing rule is `*` (the bare TLD is the suffix). The
  * registered domain is the suffix plus one label; a host that IS a
  * public suffix (or shorter) passes through unchanged, as do IPv4
  * literals and single-label hosts.
  *
  * Scale shape: the parsed rule sets become literal `InSet` predicates
  * compiled INTO the plan (whole-stage-codegen hash-set probes over the
  * last 1-4 host labels) — no join, no broadcast variable to ship, no
  * per-row regex beyond the IPv4 literal check. Rule depth is bounded
  * by the list format itself (exact rules to 4 labels, wildcard bases
  * to 2), so the expression is a fixed 6-arm CASE regardless of list
  * size.
  */
object Psl {

  /** Parsed rule sets, keyed by what the match probes: exact rules by
    * label count, wildcard bases by label count, exceptions by label
    * count of the exception name itself.
    */
  final case class Rules(exact2: Set[String], exact3: Set[String],
                         exact4: Set[String], wild1: Set[String],
                         wild2: Set[String], exc2: Set[String],
                         exc3: Set[String]) {
    def size: Int = exact2.size + exact3.size + exact4.size +
      wild1.size + wild2.size + exc2.size + exc3.size
  }

  /** Parse PSL-format lines: `//` comments and blank lines skipped,
    * the rule is the first whitespace-delimited token, `!` marks an
    * exception, `*.` a wildcard. Single-label exact rules are dropped —
    * behaviorally identical to the default `*` rule the matcher
    * applies when nothing longer hits.
    */
  def parse(lines: Iterator[String]): Rules = {
    val e2 = Set.newBuilder[String]; val e3 = Set.newBuilder[String]
    val e4 = Set.newBuilder[String]
    val w1 = Set.newBuilder[String]; val w2 = Set.newBuilder[String]
    val x2 = Set.newBuilder[String]; val x3 = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+")(0).toLowerCase
        def nLabels(s: String) = s.count(_ == '.') + 1
        if (rule.startsWith("!")) {
          val name = rule.substring(1)
          nLabels(name) match {
            case 2 => x2 += name
            case 3 => x3 += name
            case _ => () // deeper exceptions don't occur in the list
          }
        } else if (rule.startsWith("*.")) {
          val base = rule.substring(2)
          nLabels(base) match {
            case 1 => w1 += base
            case 2 => w2 += base
            case _ => ()
          }
        } else nLabels(rule) match {
          case 2 => e2 += rule
          case 3 => e3 += rule
          case 4 => e4 += rule
          case _ => () // 1-label ≡ default rule
        }
      }
    }
    Rules(e2.result(), e3.result(), e4.result(), w1.result(), w2.result(),
      x2.result(), x3.result())
  }

  /** The committed snapshot, parsed once per JVM. */
  lazy val rules: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "classpath resource graft/public_suffix_list.dat missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** The public-suffix label count for a host column, per the PSL
    * algorithm (exceptions first, then longest match, default 1).
    */
  private def suffixLen(labels: Column, r: Rules): Column = {
    def lastK(k: Int) = concat_ws(".", slice(labels, -k, k))
    def inSet(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isInCollection(s)
    val last1 = element_at(labels, -1)
    val last2 = lastK(2); val last3 = lastK(3); val last4 = lastK(4)
    when(inSet(last3, r.exc3), lit(2))
      .when(inSet(last4, r.exact4), lit(4))
      .when(inSet(last3, r.exact3) || inSet(last2, r.wild2), lit(3))
      .when(inSet(last2, r.exc2), lit(1))
      .when(inSet(last2, r.exact2) || inSet(last1, r.wild1), lit(2))
      .otherwise(lit(1))
  }

  /** Registered domain (public suffix + one label) for a lowercase
    * host column; IPv4 literals and hosts that are themselves a public
    * suffix (or shorter) pass through unchanged, null stays null.
    */
  def registeredDomain(hostCol: Column): Column =
    registeredDomain(hostCol, rules)

  /** [[registeredDomain]] against an explicit rule set (tests, or a
    * swapped-in full upstream list parsed at runtime).
    */
  def registeredDomain(hostCol: Column, r: Rules): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val isIpv4 = hostCol.rlike("^(\\d{1,3}\\.){3}\\d{1,3}$")
    val sfx = suffixLen(labels, r)
    when(hostCol.isNull, lit(null).cast("string"))
      .when(isIpv4, hostCol)
      .when(n <= sfx, hostCol)
      .otherwise(concat_ws(".", slice(labels, -(sfx + lit(1)), sfx + lit(1))))
  }
}
