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
}
