package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding pooling — collapse many vectors into one per group: the
  * chunk-embeddings → document-embedding step of a RAG/training
  * pipeline (parent-document vectors, cluster centroids, label
  * prototypes). Extends the reference's per-chunk embedding model
  * (/root/reference/src/server/utils/embedding.py:161-176 embeds each
  * chunk independently and never aggregates) with the doc-level
  * aggregate its retrieval layer would need for coarse routing.
  *
  * Scale shape: ONE hash-aggregate shuffle keyed by the group column;
  * the aggregation state is a single `2·dim`-double buffer per group
  * ([[graft.functions.VectorMean]] — O(1) aggregate expressions at any
  * dim, the Ivf.fit planner-strain argument), partially aggregated
  * map-side so the exchange carries buffers, not vectors. The
  * normalization pass is a per-row expression over the pooled result —
  * group-count rows, not corpus rows.
  */
object Pool {

  /** Mean-pool `embCol` (ARRAY<FLOAT>, length `dim`) per `keyCol` —
    * `(keyCol, n_vecs, pooled ARRAY<DOUBLE>)`, unit-L2-normalized when
    * `unitNorm` (an all-zero mean is left as-is rather than divided by
    * zero). Null embeddings are excluded; ragged/partially-null arrays
    * follow [[graft.functions.VectorMean]]'s per-element null-skipping.
    */
  def meanPool(df: DataFrame, keyCol: String, embCol: String, dim: Int,
               unitNorm: Boolean = true): DataFrame = {
    require(dim >= 1, s"dim must be >= 1 (got $dim)")
    val pooled = df.filter(col(embCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_vecs"),
        graft.functions.VectorMean.vectorMean(col(embCol), dim).as("__m"))
    if (!unitNorm) pooled.withColumnRenamed("__m", "pooled")
    else pooled
      .withColumn("__nrm",
        sqrt(aggregate(col("__m"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("pooled",
        when(col("__nrm") > 0,
          transform(col("__m"), x => x / col("__nrm")))
          .otherwise(col("__m")))
      .drop("__m", "__nrm")
  }
}
