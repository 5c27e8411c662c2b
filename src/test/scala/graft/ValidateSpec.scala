package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Validate

class ValidateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some("a"), Some(5.0)),
    (2L, Some("b"), Some(50.0)),
    (2L, None: Option[String], Some(-1.0)), // dup key, null s, below range
    (3L, Some("CC"), None: Option[Double])  // regex mismatch, null v
  ).toDF("id", "s", "v")

  private def run(rules: Seq[Validate.Rule]): Map[(String, String), (Long, Long, Boolean)] =
    Validate.validate(t, rules).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("every rule kind: observed counts, violations, pass flags") {
    val got = run(Seq(
      Validate.NotNull("s"), Validate.NotNull("id"),
      Validate.Unique(Seq("id")), Validate.Unique(Seq("id", "s")),
      Validate.InRange("v", 0, 10), Validate.MatchesRegex("s", "^[a-z]+$"),
      Validate.MinRows(3), Validate.MinRows(10)))
    assert(got(("not_null", "s")) == ((1L, 1L, false)))
    assert(got(("not_null", "id")) == ((0L, 0L, true)))
    assert(got(("unique", "id")) == ((1L, 1L, false)))
    assert(got(("unique", "id,s")) == ((0L, 0L, true)))
    // v: -1 below, 50 above → 2 violations; the null v never counts
    assert(got(("in_range", "v")) == ((2L, 2L, false)))
    // s: "CC" mismatches; the null s never counts
    assert(got(("matches_regex", "s")) == ((1L, 1L, false)))
    assert(got(("min_rows_3", "*")) == ((4L, 0L, true)))
    assert(got(("min_rows_10", "*")) == ((4L, 6L, false)))
  }

  test("empty table: zero observed everywhere, min_rows reports the full shortfall") {
    val empty = t.filter($"id" < 0)
    val got = Validate.validate(empty, Seq(
        Validate.NotNull("s"), Validate.Unique(Seq("id")), Validate.MinRows(2)))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got("not_null") == ((0L, 0L)))
    assert(got("unique") == ((0L, 0L)))
    assert(got("min_rows_2") == ((0L, 2L)))
  }

  test("lDiversity: homogeneous groups are risky even when large") {
    val rows = Seq(
      // group (1): 3 rows, all sensitive=10 → n=3, n_sensitive=1, risky
      (1L, 10L), (1L, 10L), (1L, 10L),
      // group (2): 2 rows, sensitive {10, 20} → n_sensitive=2, safe at l=2
      (2L, 10L), (2L, 20L)
    ).toDF("q", "sens")
    val got = Validate.lDiversity(rows, Seq("q"), "sens", l = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((3L, 1L, true)))
    assert(got(2L) == ((2L, 2L, false)))
    intercept[IllegalArgumentException](Validate.lDiversity(rows, Nil, "sens", 2))
    intercept[IllegalArgumentException](Validate.lDiversity(rows, Seq("q"), "sens", 1))
  }

  test("tCloseness: exact integer EMD, hand-computed on a tiny corpus") {
    // corpus: 9 rows over ordered domain {0, 1, 2}; global counts
    // (5, 1, 3) → m=3, N=9. Per-group prefix sums in exact integer
    // units of 1/(n_g*N): cum_i = SUM_{j<=i} (c_j*N - C_j*n_g).
    val rows = Seq(
      // g1 (n=3), all on the COMMON value 0 → cums (12, 9, 0),
      //   emd = 21/54 ≈ 0.389 > 1/4 → risky
      (1L, 0L), (1L, 0L), (1L, 0L),
      // g2 (n=4), roughly global-shaped (2,1,1) → cums (-2, 3, 0),
      //   emd = 5/72 ≈ 0.069 → safe
      (2L, 0L), (2L, 0L), (2L, 1L), (2L, 2L),
      // g3 (n=2), concentrated on the RARER tail value 2 →
      //   cums (-10, -12, 0), emd = 22/36 ≈ 0.611 → risky
      (3L, 2L), (3L, 2L)
    ).toDF("q", "sens")
    val got = Validate.tCloseness(rows, Seq("q"), "sens", tNum = 1, tDen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, 21L, 54L, true)))
    assert(got(2L) == ((4L, 5L, 72L, false)))
    assert(got(3L) == ((2L, 22L, 36L, true)))
    // a NULL-quasi group is a real group (SQL grouping semantics): the
    // densify join must match it null-safely — with a null-unsafe join
    // it scored as empty and reported spuriously maximal EMD. Group
    // null here is global-shaped (one of each value, like group 2), so
    // its EMD must be exactly group 2's, scaled to the new corpus
    // totals — NOT the maximal 'every value missing' distance.
    val withNullGroup = rows.union(Seq(
      (999L, 0L), (999L, 1L), (999L, 2L)).toDF("q", "sens"))
      .withColumn("q", when($"q" === 999L, lit(null)).otherwise($"q"))
    val gotN = Validate.tCloseness(withNullGroup, Seq("q"), "sens", 1, 4)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // N=12, global (6,2,4); null group c=(1,1,1), n=3:
    //   cum1 = 1*12-6*3 = -6; cum2 = -6+(12-6) = 0; cum3 = 0+(12-12)=0
    //   emd_num = 6, emd_den = 2*3*12 = 72 -> EMD 1/12, safe
    assert(gotN(-1L) == ((3L, 6L, 72L, false)),
      "null-quasi group must be scored against its REAL rows")
    intercept[IllegalArgumentException](
      Validate.tCloseness(rows, Nil, "sens", 1, 4))
    intercept[IllegalArgumentException](
      Validate.tCloseness(rows, Seq("q"), "sens", 5, 4))
    // a single-valued sensitive domain has no transport distance
    intercept[IllegalArgumentException](
      Validate.tCloseness(rows.withColumn("sens", lit(7L)),
        Seq("q"), "sens", 1, 4))
  }

  test("one scan serves all row-level rules (single aggregate subtree)") {
    val report = Validate.validate(t, Seq(
      Validate.NotNull("s"), Validate.InRange("v", 0, 10),
      Validate.MatchesRegex("s", "^[a-z]+$"), Validate.MinRows(1)))
    val scans = report.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    assert(scans <= 1, "row-level rules must fold into one aggregation pass")
  }
}
