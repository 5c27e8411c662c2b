package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate rollups — a materialized GROUP BY
  * kept fresh in O(batch) instead of recomputed in O(table): the corpus
  * dashboard (rows/tokens per domain, per language, per day) a 100 TB
  * ingest updates on every micro-batch without ever re-scanning history.
  *
  * The state per (key, measure) is the classic mergeable quadruple
  * `(n, sum, min, max)` — each merges associatively and commutatively,
  * so folding a batch's partial aggregate into the stored state gives
  * EXACTLY the aggregate of the full history (spec'd against a direct
  * recompute; `avg` is `sum/n` at read time). The rollup table itself
  * lives in a [[VersionedStore]]: each maintenance folds through
  * [[VersionedStore.compact]]'s race-safe swap (the table is per-key
  * small — the whole point is that the CORPUS never re-scans), so a
  * concurrent fold abandons cleanly and time travel replays the rollup
  * as of any batch.
  */
object Rollup {

  /** One batch reduced to rollup state rows: per key, the row count and
    * per measure the sum/min/max. Map-side partial aggregation makes
    * the exchange carry one row per (partition, key).
    */
  def partialState(batch: DataFrame, keyCols: Seq[String],
                   measureCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "rollup needs at least one key column")
    val aggs = count(lit(1)).as("n") +: measureCols.flatMap(c => Seq(
      sum(col(c)).as(s"sum_$c"), min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    batch.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of state rows per key back into one: counts and
    * sums add, mins/maxes fold — the associativity that makes the
    * incremental fold exact.
    */
  private def mergeStates(states: DataFrame, keyCols: Seq[String],
                          measureCols: Seq[String]): DataFrame = {
    val aggs = sum(col("n")).as("n") +: measureCols.flatMap(c => Seq(
      sum(col(s"sum_$c")).as(s"sum_$c"),
      min(col(s"min_$c")).as(s"min_$c"),
      max(col(s"max_$c")).as(s"max_$c")))
    states.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold one batch into the materialized rollup at `aggTable`. The
    * batch is reduced to per-key state first (one aggregation of the
    * BATCH — history is never read beyond the rollup rows themselves),
    * then folded into the stored state via the compact swap. Returns
    * the number of state rows after the fold.
    */
  def maintain(spark: SparkSession, aggTable: String, batch: DataFrame,
               keyCols: Seq[String], measureCols: Seq[String]): Long = {
    val partial = partialState(batch, keyCols, measureCols)
    VersionedStore.currentState(spark, aggTable).filter(_.segments.nonEmpty) match {
      case None =>
        // first fold: the plain append is only correct while the table
        // is STILL empty at commit time — two concurrent first folds
        // would otherwise both append and readRollup would serve two
        // state rows per key. The CAS transform re-checks emptiness; a
        // lost race falls through to the merge path with the same
        // batch (the winner's state is now there to fold into).
        val rows = partial.localCheckpoint()
        if (rows.isEmpty) return VersionedStore.read(spark, aggTable)
          .map(_.count()).getOrElse(0L)
        val seg = VersionedStore.writeSegment(spark, aggTable, rows)
        val won =
          try {
            VersionedStore.commit(spark, aggTable, cur => {
              if (cur.nonEmpty) throw new FirstFoldRace
              Seq(seg)
            }, op = "append")
            true
          } catch {
            case _: FirstFoldRace =>
              graft.Fs.delete(spark, s"$aggTable/$seg")
              false
          }
        if (won) rows.count()
        else foldInto(spark, aggTable, rows, keyCols, measureCols)
      case Some(_) =>
        // localCheckpoint: the reshape lambda runs INSIDE compact and may
        // be re-evaluated on a CAS retry — the batch aggregate must not
        // recompute (or, for a streaming source, become unreadable)
        foldInto(spark, aggTable, partial.localCheckpoint(), keyCols, measureCols)
    }
  }

  private final class FirstFoldRace extends RuntimeException

  private def foldInto(spark: SparkSession, aggTable: String, pinned: DataFrame,
                       keyCols: Seq[String], measureCols: Seq[String]): Long = {
    val (_, files) = VersionedStore.compact(spark, aggTable,
      reshape = old => mergeStates(old.unionByName(pinned),
        keyCols, measureCols))
    if (files == 0)
      throw new IllegalStateException(
        s"rollup fold at $aggTable lost a concurrent-compaction race; retry the batch")
    VersionedStore.read(spark, aggTable).map(_.count()).getOrElse(0L)
  }

  /** The rollup read back with derived averages: `avg_<c> = sum/n` per
    * measure. Read-time derivation keeps the stored state minimal and
    * exactly mergeable.
    */
  def readRollup(spark: SparkSession, aggTable: String,
                 measureCols: Seq[String]): Option[DataFrame] =
    VersionedStore.read(spark, aggTable).map { df =>
      measureCols.foldLeft(df)((d, c) =>
        d.withColumn(s"avg_$c", col(s"sum_$c").cast("double") / col("n")))
    }
}
