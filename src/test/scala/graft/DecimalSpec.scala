package graft

import org.apache.spark.sql.types.{DecimalType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** §1.2 DecimalType semantics, pinned locally where no foreign harness
  * intermediates (the driver gate hashes the decimal queries' outputs
  * as strings — see decimal_pricing_summary / decimal_literal_roundtrip
  * in queries/Relational.scala; the reference stringifies decimals at
  * its own boundary too, src/server/agents/chatbot.py:83-88
  * DecimalEncoder). This spec is the TYPE-system claim: pinned scales,
  * exact sums, the (22,4) product, and the scale-preserving string
  * rendering the hashed boundary depends on.
  */
class DecimalSpec extends AnyFunSuite {
  import TestSpark._

  test("decimal literal arithmetic is exact at pinned scales") {
    val row = spark.sql(
      """SELECT
        |  CAST(SUM(a) AS DECIMAL(18,2)) AS sum_a,
        |  CAST(SUM(a * b) AS DECIMAL(22,4)) AS sum_prod,
        |  CAST(MIN(a) AS DECIMAL(12,2)) AS min_a
        |FROM VALUES
        |  (CAST(0.45 AS DECIMAL(12,2)), CAST(1.05 AS DECIMAL(12,2))),
        |  (CAST(99.99 AS DECIMAL(12,2)), CAST(0.01 AS DECIMAL(12,2))),
        |  (CAST(-12.34 AS DECIMAL(12,2)), CAST(12.34 AS DECIMAL(12,2)))
        |  AS t(a, b)""".stripMargin).head()
    // exact: 0.45 + 99.99 - 12.34 = 88.10 (no binary-float drift)
    assert(row.getDecimal(0) == new java.math.BigDecimal("88.10"))
    // (12,2)×(12,2) product carries scale 4 exactly:
    // 0.4725 + 0.9999 - 152.2756 = -150.8032
    assert(row.getDecimal(1) == new java.math.BigDecimal("-150.8032"))
    assert(row.getDecimal(2) == new java.math.BigDecimal("-12.34"))
  }

  test("declared output types carry the pinned precision/scale") {
    val df = spark.sql(
      """SELECT CAST(1.5 AS DECIMAL(18,2)) AS a,
        |       CAST(1.5 AS DECIMAL(22,4)) AS b,
        |       CAST(1 AS BIGINT) AS n""".stripMargin)
    assert(df.schema("a").dataType == DecimalType(18, 2))
    assert(df.schema("b").dataType == DecimalType(22, 4))
    assert(df.schema("n").dataType == LongType)
  }

  test("decimal->string rendering is scale-preserving (the hashed boundary)") {
    val row = spark.sql(
      """SELECT CAST(CAST(88.1 AS DECIMAL(18,2)) AS STRING) AS a,
        |       CAST(CAST(-12.34 AS DECIMAL(12,2)) AS STRING) AS b,
        |       CAST(CAST(0.05 AS DECIMAL(22,4)) AS STRING) AS c,
        |       CAST(CAST(0 AS DECIMAL(18,2)) AS STRING) AS z""".stripMargin).head()
    // trailing zeros survive — "88.10" not "88.1"; matches DuckDB's
    // decimal->VARCHAR so the driver hash compares identical strings
    assert(row.getString(0) == "88.10")
    assert(row.getString(1) == "-12.34")
    assert(row.getString(2) == "0.0500")
    assert(row.getString(3) == "0.00")
  }

  test("the 100 TB sum path: e4 units summed as DECIMAL(30,0) cannot overflow") {
    // sum of price_c*(100-disc_c) at ~1e9/row over ~6e11 rows ≈ 6e20
    // > Long.MaxValue (9.2e18) — the (30,0) accumulator absorbs it.
    val row = spark.sql(
      """SELECT CAST(CAST(SUM(CAST(x AS DECIMAL(30,0))) AS DECIMAL(26,0))
        |         * CAST(0.0001 AS DECIMAL(5,4)) AS DECIMAL(22,4)) AS v
        |FROM VALUES (9000000000000000000), (9000000000000000000),
        |            (9000000000000000000) AS t(x)""".stripMargin).head()
    assert(row.getDecimal(0) ==
      new java.math.BigDecimal("2700000000000000.0000"))
  }

  test("driver-hashed decimal queries emit only STRING/BIGINT columns") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (name <- Seq("decimal_pricing_summary", "decimal_literal_roundtrip")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val decimalCols = df.schema.fields.filter(
        _.dataType.isInstanceOf[DecimalType]).map(_.name)
      assert(decimalCols.isEmpty,
        s"$name leaks DECIMAL to the hashed boundary: ${decimalCols.mkString(",")}")
      assert(df.schema.fields.exists(_.dataType == StringType))
    }
  }
}
