package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the contract
  * gate a pipeline runs before promoting a corpus drop (the Deequ /
  * Great Expectations idea, reduced to its deterministic core so every
  * report row is exactly replayable relationally).
  *
  * One call validates a rule set and returns one report row per rule:
  * `(rule, column, observed, violations, passed)` — `observed` is the
  * rule's measured quantity (null count, duplicate-extra rows,
  * out-of-range count, mismatch count, row count), `violations` what
  * breaks the expectation, `passed = violations == 0`.
  *
  * Scale: every row-level rule (null / range / regex) folds into ONE
  * aggregation over ONE scan — adding rules adds conditional-sum
  * columns, not passes. Each [[Validate.Unique]] rule needs its own
  * exact distinct (a shuffle keyed on its column set) — the price of an
  * exact uniqueness guarantee; use the sketch-based `tableProfile` when
  * approximate suffices.
  */
object Validate {

  sealed trait Rule
  /** Expect no nulls in `column`. */
  final case class NotNull(column: String) extends Rule
  /** Expect `columns` to be a unique key. Violations = rows beyond the
    * first of each duplicated key (n_rows − n_distinct).
    */
  final case class Unique(columns: Seq[String]) extends Rule
  /** Expect non-null values of `column` within [lo, hi]. Nulls are
    * [[NotNull]]'s business and never count here.
    */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule
  /** Expect non-null values of `column` to match `regex` (write in the
    * RE2∩Java subset — the engine-portable convention).
    */
  final case class MatchesRegex(column: String, regex: String) extends Rule
  /** Expect at least `n` rows. Observed = row count, violations = the
    * shortfall.
    */
  final case class MinRows(n: Long) extends Rule

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val scanRules = rules.collect {
      case NotNull(c) =>
        val v = sum(when(col(c).isNull, 1L).otherwise(0L))
        ("not_null", c, v, v)
      case InRange(c, lo, hi) =>
        val v = sum(when(col(c).isNotNull &&
          (col(c).cast("double") < lo || col(c).cast("double") > hi), 1L)
          .otherwise(0L))
        ("in_range", c, v, v)
      case MatchesRegex(c, re) =>
        val v = sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
        ("matches_regex", c, v, v)
      case MinRows(n) =>
        (s"min_rows_$n", "*", count(lit(1)),
          greatest(lit(0L), lit(n) - count(lit(1))))
    }
    val scanReport: Option[DataFrame] =
      if (scanRules.isEmpty) None
      else {
        val structs = scanRules.map { case (kind, c, obs, vio) =>
          struct(lit(kind).as("rule"), lit(c).as("column"),
            coalesce(obs, lit(0L)).as("observed"),
            coalesce(vio, lit(0L)).as("violations"))
        }
        Some(df.agg(array(structs: _*).as("__r"))
          .select(explode(col("__r")).as("r"))
          .select(col("r.rule"), col("r.column"), col("r.observed"),
            col("r.violations")))
      }
    val uniqueReports = rules.collect { case Unique(cols) =>
      df.agg(count(lit(1)).as("__n"),
          count_distinct(struct(cols.map(col): _*)).as("__d"))
        .select(lit("unique").as("rule"),
          lit(cols.mkString(",")).as("column"),
          (col("__n") - col("__d")).as("observed"),
          (col("__n") - col("__d")).as("violations"))
    }
    (scanReport.toSeq ++ uniqueReports)
      .reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
  }

  /** k-anonymity audit over quasi-identifier columns — the re-ID-risk
    * check a training-data governance pass runs before a corpus with
    * user-linked metadata ships: every quasi-identifier combination
    * with fewer than `k` rows is a re-identification risk (its members
    * are distinguishable by those attributes alone). Returns one row
    * per group: the quasi columns, `n`, and `risky = n < k` — the
    * relation a suppression/generalization step consumes directly;
    * roll it up for the k_min / risky-share summary.
    *
    * Scale: ONE map-side-combined count aggregation keyed by the quasi
    * tuple — group cardinality is the product of attribute domains,
    * bounded far below the corpus. Null attribute values form their own
    * groups (SQL grouping semantics) — deliberately: "unknown" is a
    * distinguishing value for re-identification too.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (got $k)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("risky", col("n") < k)
  }

  /** l-diversity audit — [[kAnonymity]]'s stronger sibling: a
    * quasi-identifier group can be large yet still leak if everyone in
    * it shares the same SENSITIVE value (homogeneity attack). Per
    * group: size, distinct sensitive values, `risky = n_sensitive < l`.
    * Same single map-side-combined aggregation; the distinct count is
    * exact (the group relation is domain-bounded, so the two-phase
    * distinct agg is cheap — no sketch needed for an audit that gates
    * a release).
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2 (got $l)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        count_distinct(col(sensitiveCol)).cast("long").as("n_sensitive"))
      .withColumn("risky", col("n_sensitive") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung after [[kAnonymity]] and [[lDiversity]]: a group can be
    * k-anonymous AND l-diverse yet still leak if its sensitive-value
    * DISTRIBUTION differs sharply from the corpus-wide one (skewness
    * attack: "this group is mostly the rare value"). Per group, the
    * Earth Mover's Distance between the group's distribution over the
    * ORDERED sensitive domain and the global distribution; for the
    * ordered/numeric distance the closed form is
    * `EMD = (1/(m-1)) * SUM_i |SUM_{j<=i} (Q(v_j) - P(v_j))|` over the
    * m distinct sensitive values in order (the prefix-mass transport).
    *
    * Exact integer arithmetic (the cross-engine hash discipline):
    * with group-value count c, global-value count C, group size n_g,
    * corpus size N, each prefix term is
    * `cum_i = SUM_{j<=i} (c_j*N - C_j*n_g)` (units of 1/(n_g*N)), so
    * `EMD = SUM_i |cum_i| / ((m-1)*n_g*N)`. The audit emits the exact
    * `emd_num`/`emd_den` pair and `risky = emd_num*tDen > tNum*emd_den`
    * (EMD > t with t = tNum/tDen as a rational) — no float ever
    * materializes, so the oracle replay is bit-stable.
    *
    * Scale: two map-side-combined aggregations (group sizes; group x
    * value counts) plus a broadcast of the GLOBAL value histogram
    * (domain-bounded, like a vocab). The densify step is groups x m
    * rows — the same domain-bounded relation the other audits emit.
    * Long arithmetic holds exactly for N <= ~3e9 (c*N < 2^63); the
    * guard below trips loudly past it (an audit corpus above that
    * wants the decimal variant, not silent overflow).
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tNum >= 0 && tDen > 0 && tNum <= tDen,
      s"t must be a rational in [0, 1] (got $tNum/$tDen)")
    val base = df.select(
      (quasiCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
    // global value histogram + totals: domain-bounded, broadcast both
    val gv = base.groupBy(col("__v"))
      .agg(count(lit(1)).cast("long").as("__cv"))
    val tot = gv.agg(sum(col("__cv")).cast("long").as("__n_total"),
      count(lit(1)).cast("long").as("__m"))
    val n = tot.head()
    val nTotal = n.getLong(0)
    val m = n.getLong(1)
    require(m >= 2, s"sensitive domain must have >= 2 values (got $m)")
    // the largest Long this audit ever forms is bounded by
    // max(tNum, tDen) * m * N² (emd_num <= m·N² before the risky
    // cross-multiplication; emd_den = (m-1)·n_g·N <= (m-1)·N²) — check
    // the actual bound exactly instead of a flat N cap, so a wide
    // domain or a large t denominator trips LOUDLY instead of
    // wrapping negative and flipping verdicts
    require(BigInt(math.max(tNum, tDen)) * m * nTotal * nTotal <=
      Long.MaxValue,
      s"exact Long EMD arithmetic would overflow at N=$nTotal, m=$m, " +
        s"t=$tNum/$tDen (needs max(tNum,tDen)*m*N^2 <= 2^63-1)")
    val qc = quasiCols.map(col)
    val gn = base.groupBy(qc: _*).agg(count(lit(1)).cast("long").as("n"))
    val gvc = base.groupBy((qc :+ col("__v")): _*)
      .agg(count(lit(1)).cast("long").as("__c"))
    // densify: every (group, value) cell exists so prefix sums see the
    // zero-count values too (a group missing a value still transports
    // mass past it). The join keys must be NULL-SAFE: SQL grouping
    // formed a real group for NULL quasi values (and a real domain
    // value for NULL sensitives), and a null-unsafe equi-join would
    // score those groups as if empty — spuriously maximal EMD
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(qc: _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val gvcR = gvc.select(
      (quasiCols.map(c => col(c).as(s"__r_$c")) :+
        col("__v").as("__r_v") :+ col("__c")): _*)
    val joinCond = (quasiCols.map(c => col(c) <=> col(s"__r_$c")) :+
      (col("__v") <=> col("__r_v"))).reduce(_ && _)
    gn.crossJoin(broadcast(gv))
      .join(gvcR, joinCond, "left")
      .drop((quasiCols.map(c => s"__r_$c") :+ "__r_v"): _*)
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .withColumn("__cum",
        sum(col("__c") * lit(nTotal) - col("__cv") * col("n")).over(win))
      .groupBy((qc :+ col("n")): _*)
      .agg(sum(abs(col("__cum"))).cast("long").as("emd_num"))
      .withColumn("emd_den", lit(m - 1) * col("n") * lit(nTotal))
      .withColumn("risky",
        col("emd_num") * lit(tDen) > lit(tNum) * col("emd_den"))
  }
}
