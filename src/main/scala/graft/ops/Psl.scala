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
  * format). The full upstream file is a drop-in: the parser accepts
  * exact rules to 6 labels, wildcard bases to 4 and exceptions to 4 —
  * strictly deeper than anything in the published list (deepest today:
  * 6-label exact `s3.dualstack.<region>.amazonaws.com.cn`-class rules,
  * 4-label wildcard bases like `*.compute.amazonaws.com.cn`, 3-label
  * exceptions like `!city.kawasaki.jp`) — and FAILS LOUDLY on a rule
  * deeper than that, so a future list revision can never be silently
  * mis-parsed into wrong registered domains.
  *
  * Matching follows the published PSL algorithm: an exception rule
  * (`!www.ck`) ALWAYS wins regardless of any other matching rule's
  * length and denotes the rule minus its leftmost label; otherwise
  * among matching rules the LONGEST wins; a wildcard rule (`*.ck`)
  * matches exactly one extra label; when nothing matches the
  * prevailing rule is `*` (the bare TLD is the suffix). The
  * registered domain is the suffix plus one label; a host that IS a
  * public suffix (or shorter) passes through unchanged, as do IPv4
  * literals and single-label hosts.
  *
  * Scale shape: the parsed rule sets become literal `InSet` predicates
  * compiled INTO the plan (whole-stage-codegen hash-set probes over the
  * last 1-6 host labels) — no join, no broadcast variable to ship, no
  * per-row regex beyond the IPv4 literal check. Rule depth is bounded
  * by the parser's loud ceiling, so the expression is a fixed-arm CASE
  * regardless of list size.
  */
object Psl {

  /** Deepest accepted exact rule (labels), wildcard base (labels) and
    * exception name (labels). `parse` throws on anything deeper.
    */
  val MaxExact = 6
  val MaxWildBase = 4
  val MaxException = 4

  /** Parsed rule sets, keyed by what the match probes: exact rules by
    * label count (2..[[MaxExact]]), wildcard bases by label count
    * (1..[[MaxWildBase]]), exceptions by label count of the exception
    * name itself (2..[[MaxException]]).
    */
  final case class Rules(exact: Map[Int, Set[String]],
                         wild: Map[Int, Set[String]],
                         exc: Map[Int, Set[String]]) {
    def size: Int = exact.valuesIterator.map(_.size).sum +
      wild.valuesIterator.map(_.size).sum +
      exc.valuesIterator.map(_.size).sum
  }

  /** Parse PSL-format lines: `//` comments and blank lines skipped,
    * the rule is the first whitespace-delimited token, `!` marks an
    * exception, `*.` a wildcard. Single-label exact rules are dropped —
    * behaviorally identical to the default `*` rule the matcher
    * applies when nothing longer hits. A rule deeper than the matcher's
    * fixed CASE ([[MaxExact]]/[[MaxWildBase]]/[[MaxException]]) is an
    * IllegalArgumentException, never a silent drop.
    */
  def parse(lines: Iterator[String]): Rules = {
    val e = Map((2 to MaxExact).map(_ -> Set.newBuilder[String]): _*)
    val w = Map((1 to MaxWildBase).map(_ -> Set.newBuilder[String]): _*)
    val x = Map((2 to MaxException).map(_ -> Set.newBuilder[String]): _*)
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+")(0).toLowerCase
        def nLabels(s: String) = s.count(_ == '.') + 1
        if (rule.startsWith("!")) {
          val name = rule.substring(1)
          val n = nLabels(name)
          require(n >= 2 && n <= MaxException,
            s"PSL exception rule '$rule' has $n labels — matcher supports 2..$MaxException; widen Psl.suffixLen")
          x(n) += name
        } else if (rule.startsWith("*.")) {
          val base = rule.substring(2)
          val n = nLabels(base)
          require(n <= MaxWildBase,
            s"PSL wildcard rule '$rule' has a $n-label base — matcher supports 1..$MaxWildBase; widen Psl.suffixLen")
          w(n) += base
        } else {
          val n = nLabels(rule)
          require(n <= MaxExact,
            s"PSL exact rule '$rule' has $n labels — matcher supports 2..$MaxExact; widen Psl.suffixLen")
          if (n >= 2) e(n) += rule // 1-label ≡ default rule
        }
      }
    }
    Rules(e.map { case (k, b) => k -> b.result() },
      w.map { case (k, b) => k -> b.result() },
      x.map { case (k, b) => k -> b.result() })
  }

  /** The committed snapshot, parsed once per JVM. */
  lazy val rules: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "classpath resource graft/public_suffix_list.dat missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** The public-suffix label count for a host column, per the PSL
    * algorithm: EVERY exception arm precedes every ordinary arm (the
    * published "the prevailing rule is the exception rule" — an
    * exception beats even a longer exact/wildcard match), then ordinary
    * rules longest-first, default 1.
    */
  private def suffixLen(labels: Column, r: Rules): Column = {
    def lastK(k: Int): Column =
      if (k == 1) element_at(labels, -1) else concat_ws(".", slice(labels, -k, k))
    def inSet(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isInCollection(s)
    // exceptions first, deepest first (an exception name of n labels
    // denotes a suffix of n-1)
    val excArms = (MaxException to 2 by -1).map { n =>
      (inSet(lastK(n), r.exc(n)), lit(n - 1))
    }
    // ordinary rules by match length descending: an exact rule of n
    // labels yields suffix n; a wildcard base of n labels yields n+1
    // (its rule is n+1 labels long), so exact(n) ties wild(n-1)
    val ordArms = (MaxExact to 2 by -1).map { n =>
      val exactHit = inSet(lastK(n), r.exact(n))
      val wildHit =
        if (n - 1 >= 1 && n - 1 <= MaxWildBase) inSet(lastK(n - 1), r.wild(n - 1))
        else lit(false)
      (exactHit || wildHit, lit(n))
    }
    (excArms ++ ordArms)
      .foldLeft(Option.empty[Column]) {
        case (None, (cond, v)) => Some(when(cond, v))
        case (Some(c), (cond, v)) => Some(c.when(cond, v))
      }.get.otherwise(lit(1))
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
