package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the ANALYZE/data-quality report a pipeline
  * runs before trusting a new corpus drop: per column, row/null counts,
  * min/max, and a distinct-count estimate, computed in a SINGLE
  * aggregation job over one scan (every metric for every column is one
  * aggregate expression; map-side partial aggregation reduces each
  * partition to one row of sketches, the exchange carries just those).
  * The wide one-row result is then unpivoted to one row per column with
  * a stack projection — no second pass, no per-column jobs.
  *
  * Distinct counts are HLL++ (`approx_count_distinct`, fixed memory per
  * column at any scale); `exactDistinct = true` swaps in exact
  * `count_distinct` — the oracle-parity/test path, one shuffle-free
  * partial-agg per column but memory O(distinct values), so keep it off
  * at corpus scale. min/max are rendered as strings so heterogeneous
  * column types stack into one report column.
  */
object Profile {

  def tableProfile(df: DataFrame, cols: Seq[String],
                   exactDistinct: Boolean = false,
                   rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) count_distinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stack(k, name1, nn1, nd1, mn1, mx1, ...) -> one row per column
    val stackArgs = cols.flatMap { c =>
      Seq(lit(c), col(s"__nn_$c"), col(s"__nd_$c"), col(s"__mn_$c"), col(s"__mx_$c"))
    }
    wide.select(col("__n"),
        stack((lit(cols.size) +: stackArgs): _*)
          .as(Seq("column", "n_non_null", "n_distinct", "min_value", "max_value")))
      .select(col("column"), col("__n").as("n_rows"),
        (col("__n") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** [[tableProfile]] with the HLL++ estimates bound-checked IN the plan
    * against the exact distinct counts — the test-time anchor for the
    * sketch path (the 100 TB profiler keeps only the sketch): adds
    * `distinct_within_rsd` = |est − exact| ≤ 4·rsd·exact (HLL++'s rsd
    * is a standard deviation; 4σ makes the bit deterministic in
    * practice while still catching a broken sketch loudly). Exact and
    * sketch aggregates ride the SAME single aggregation job — the
    * anchored profile still scans the table once.
    */
  def tableProfileChecked(df: DataFrame, cols: Seq[String],
                          rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        approx_count_distinct(col(c), rsd).as(s"__ad_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.flatMap { c =>
      Seq(lit(c), col(s"__nn_$c"), col(s"__nd_$c"), col(s"__ad_$c"),
        col(s"__mn_$c"), col(s"__mx_$c"))
    }
    wide.select(col("__n"),
        stack((lit(cols.size) +: stackArgs): _*)
          .as(Seq("column", "n_non_null", "n_distinct", "__est",
            "min_value", "max_value")))
      .select(col("column"), col("__n").as("n_rows"),
        (col("__n") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"),
        (abs(col("__est") - col("n_distinct")) <=
          lit(4.0) * lit(rsd) * col("n_distinct")).as("distinct_within_rsd"))
  }
}
