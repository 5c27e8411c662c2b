package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB scale: bucketed co-located joins
  * and skew salting. These are the two knobs the query-level operators
  * assume exist when the data grows 1000×:
  *
  *   - **Bucketing** pre-shuffles a table once at write time; every later
  *     equi-join or aggregation on the bucket key is shuffle-free (the
  *     scan reports the bucketing and Catalyst drops the Exchange).
  *     The reference's per-config vector-store tables (one table per
  *     embedding config) map exactly to bucketed-by-id chunk tables.
  *
  *   - **Salting** splits a skewed key into `factor` sub-keys, replicating
  *     the small side per salt, so one hot key spreads over `factor`
  *     tasks. AQE's skew-join handles sort-merge skew automatically;
  *     salting covers aggregations and the cases AQE can't see.
  */
object Layout {

  /** Write `df` bucketed by `keyCol` into the session catalog as
    * `tableName` (parquet). Joins/aggs between tables bucketed the same
    * way on the same key need no Exchange.
    */
  def writeBucketed(df: DataFrame, tableName: String, keyCol: String,
                    numBuckets: Int = 32): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(tableName) // managed table in spark.sql.warehouse.dir

  /** Shuffle-free equi-join of two tables bucketed identically on `key`. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Add a salt column in [0, factor): spreads a skewed key over
    * `factor` partial groups / join tasks. The salt value itself is
    * retry-unstable (monotonic ids can change on task retry) — safe
    * here because no downstream result depends on WHICH salt a row got,
    * only that rows spread: partial aggregates re-combine over all
    * salts, and salted joins replicate the dimension for every salt.
    */
  def withSalt(df: DataFrame, keyCol: String, factor: Int,
               saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, pmod(xxhash64(col(keyCol), monotonically_increasing_id()), lit(factor)))

  /** Two-phase salted aggregation: count+sum per (key, salt) partials,
    * then combine per key — the hot key's rows no longer land in one
    * task. `sumCol` must be a LongType column (exact combine).
    */
  def saltedSumCount(df: DataFrame, keyCol: String, sumCol: Column,
                     factor: Int): DataFrame = {
    val salted = withSalt(df.withColumn("__v", sumCol), keyCol, factor)
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }

  /** Quantile-bucket index of `c` against precomputed `boundaries`
    * (ascending): the count of boundaries strictly below the value — a
    * codegen'd chain of compare-adds, no join, no UDF. Nulls land in
    * bucket 0.
    */
  def quantileBucket(c: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c > lit(b), 1).otherwise(0)
    }

  /** Morton (Z-order) interleave of per-column bucket ids: bit `i` of
    * column `j` lands at position `i*n + j`, so a range on ANY of the
    * columns maps to a bounded set of Z-runs. Pure bit arithmetic —
    * whole-stage codegen keeps it in the projection.
    */
  def mortonKey(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits * buckets.size <= 62,
      s"bits*cols must fit a long, got $bits x ${buckets.size}")
    val n = buckets.size
    (for (i <- 0 until bits; j <- 0 until n) yield {
      shiftleft(shiftright(buckets(j).cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    }).reduce(_.bitwiseOR(_))
  }

  /** Z-order-clustered write — multi-dimensional data skipping for the
    * predicates partitioning can't serve: each output file covers a
    * NARROW range of every `cols` member simultaneously (one
    * approx-quantile pass per write buckets each column into 2^bits
    * quantile cells; rows sort by the Morton interleave of their cell
    * ids and range-partition into `nFiles` files), so parquet's
    * row-group/file min-max stats prune scans filtered on ANY of the
    * columns — a linear sort gives that for its leading column only.
    * At 100 TB this is the difference between "point query on a
    * non-partition column reads one file" and "reads the table".
    *
    * Cost: one `approxQuantile` pass (fixed-memory GK sketches, all
    * columns in one job) + one range exchange + local sorts — the same
    * shape as any global orderBy write. `cols` must be numeric.
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    bits: Int = 6, nFiles: Int = 64): Unit = {
    require(cols.nonEmpty, "writeZOrdered needs at least one column")
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (1 << bits)).toArray
    val bnds = df.stat.approxQuantile(
      cols.toArray, probs, 1.0 / math.max(1000, 1 << (bits + 4)))
    val zkey = mortonKey(
      cols.zip(bnds).map { case (c, b) =>
        quantileBucket(col(c).cast("double"), b.toSeq.distinct.sorted)
      }, bits)
    df.withColumn("__z", zkey)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Salted join of a skewed fact side against a dimension: the fact
    * gets a random salt, the dimension is replicated `factor` times with
    * every salt value, and the join key becomes (key, salt). Semantics
    * identical to the plain equi-join; the hot key spreads over `factor`
    * tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factor: Int): DataFrame = {
    val saltedFact = withSalt(fact, key, factor)
    val saltedDim = dim.withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
