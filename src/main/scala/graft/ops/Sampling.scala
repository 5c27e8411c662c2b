package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * The reference never samples (its corpora are curated uploads), but a
  * 100 TB pipeline mixes domains/languages to target proportions before
  * training — and the sample must be reproducible across runs, engines,
  * and partitionings, which rules out `df.sample` (seeded per partition
  * layout). The md5-rank trick from [[Testbed.generateTestset]] is the
  * portable seed: rank rows by the md5 of a key column and keep the
  * smallest — a uniform pseudo-random choice any engine reproduces.
  */
object Sampling {

  /** Stratified quota sample (domain mixing): within each stratum keep
    * the `quotas(stratum)` rows with the smallest md5(key) — strata not
    * in the map get `defaultQuota`. Rank ties are impossible when `key`
    * is unique (the id column is the natural choice); the key itself is
    * the tiebreak either way.
    *
    * Plan shape: a per-partition bounded heap (`mapPartitions`) first
    * reduces every scan partition to at most quota rows per stratum
    * under EXACTLY the final ordering (md5 asc, key asc) — the
    * [[Similarity.similarityJoin]] LocalTopK pattern — so the rank
    * window's Exchange moves O(quota × strata × partitions) rows,
    * independent of corpus size, and one giant stratum cannot skew the
    * shuffle.
    */
  def stratifiedQuota(df: DataFrame, strataCol: String, keyCol: String,
                      quotas: Map[String, Int], defaultQuota: Int = 0): DataFrame = {
    require(defaultQuota >= 0 && quotas.values.forall(_ >= 0), "quotas must be >= 0")
    // the per-partition reducer reads the stratum via getString, and the
    // quota map is keyed by strings — reject other types HERE instead of
    // surfacing as a ClassCastException deep inside mapPartitions (cast
    // the column to string at the call site to stratify by e.g. an int id)
    require(df.schema(strataCol).dataType == org.apache.spark.sql.types.StringType,
      s"strata column '$strataCol' must be STRING, found " +
        s"${df.schema(strataCol).dataType.sql} — cast it to string first")
    // stringify-then-hash keeps the ranking portable: md5 of the key's
    // canonical string form is the same bytes in any engine
    val withKey = df.withColumn("__smp", md5(col(keyCol).cast("string").cast("binary")))
    val reduced = withKey.mapPartitions(new StratumTopQ(quotas, defaultQuota,
        withKey.columns.indexOf(strataCol), withKey.columns.indexOf("__smp"),
        withKey.columns.indexOf(keyCol)))(
      org.apache.spark.sql.Encoders.row(withKey.schema))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__smp"), col(keyCol))
    val quotaCol = quotas.foldLeft(lit(defaultQuota)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    reduced
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quotaCol)
      .drop("__rk", "__smp")
  }

  /** Per-partition bounded top-quota reducer: keeps, per stratum, the
    * `quota` rows smallest under (md5, key) — the final window's exact
    * ordering, so pre-pruning can never change the global result. Memory
    * is O(strata × quota) per partition.
    */
  private final class StratumTopQ(quotas: Map[String, Int], defaultQuota: Int,
                                  sIdx: Int, mIdx: Int, kIdx: Int)
      extends (Iterator[Row] => Iterator[Row]) with Serializable {
    // natural (ascending) order: the priority queue's head is the
    // LARGEST kept row — the one to evict when a smaller row arrives
    private val byRank: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val m = a.getString(mIdx).compareTo(b.getString(mIdx))
        if (m != 0) m
        else a.get(kIdx).asInstanceOf[Comparable[Any]].compareTo(b.get(kIdx))
      }
    }
    def apply(rows: Iterator[Row]): Iterator[Row] = {
      val heaps = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val s = r.getString(sIdx)
        val q = quotas.getOrElse(s, defaultQuota)
        if (q > 0) {
          val heap = heaps.getOrElseUpdate(s,
            scala.collection.mutable.PriorityQueue.empty[Row](byRank))
          if (heap.size < q) heap.enqueue(r)
          else if (byRank.compare(r, heap.head) < 0) { heap.dequeue(); heap.enqueue(r) }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}
