package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points × intervals where
  * `lo <= point <= hi`. Spark plans the naive inequality join as a
  * broadcast-nested-loop — O(|points| × |intervals|) comparisons, the
  * first thing that dies at 100 TB. Binning turns it into an EQUI-join:
  * each point belongs to exactly one bin of width `binWidth`, each
  * interval covers `⌈len/binWidth⌉+1` bins, and candidates meet on the
  * bin id through a plain hash shuffle; the exact `BETWEEN` predicate
  * then prunes the bin-edge false positives. No duplicates are possible
  * (a point has ONE bin), so no distinct pass is needed.
  *
  * Pick `binWidth` on the order of the typical interval length: the
  * interval explode is O(len/binWidth + 1) rows per interval, while the
  * per-bin candidate count grows with binWidth — the standard bin-join
  * trade every range-join engine (and Spark's own AQE-less alternatives)
  * makes.
  */
object RangeJoin {

  /** Inner join of `points` to the `intervals` rows whose
    * `[loCol, hiCol]` contains `pointCol`. Column names must be disjoint
    * across the two inputs. Intervals with `hi < lo` are empty and
    * dropped (Spark's `sequence(a, b)` would otherwise count DOWN and
    * route candidates through wrong bins).
    *
    * `maxBinsPerInterval` bounds the per-interval explode: `sequence()`
    * materializes the whole bin array per row, so one pathological
    * interval (sentinel bounds like `Double.MaxValue`, or a span
    * millions of times `binWidth`) would OOM a task before the join even
    * runs. An interval over the cap fails LOUDLY at execution — the
    * check lives inside the join-key derivation, so no optimizer pass
    * can prune it; raise `binWidth` (or the cap, deliberately) instead
    * of letting a bad row take down an executor.
    */
  def binned(points: DataFrame, pointCol: String, intervals: DataFrame,
             loCol: String, hiCol: String, binWidth: Double,
             maxBinsPerInterval: Int = 100000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty, s"column names must be disjoint, both sides have: $shared")
    val pb = points.withColumn("__bin",
      floor(col(pointCol).cast("double") / binWidth).cast("long"))
    val loBin = floor(col(loCol).cast("double") / binWidth).cast("long")
    val hiBin = floor(col(hiCol).cast("double") / binWidth).cast("long")
    val checkedHiBin = when(hiBin - loBin < lit(maxBinsPerInterval.toLong), hiBin)
      .otherwise(raise_error(format_string(
        s"range-join interval [%s, %s] spans %s bins of width $binWidth " +
          s"(cap $maxBinsPerInterval): raise binWidth or maxBinsPerInterval",
        col(loCol), col(hiCol), hiBin - loBin + lit(1))).cast("long"))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(loBin, checkedHiBin)))
    pb.join(ib, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
