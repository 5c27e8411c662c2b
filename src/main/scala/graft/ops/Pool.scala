package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** SIF sentence/document embedding (Arora et al. 2017, "A Simple but
    * Tough-to-Beat Baseline"): every token contributes its word vector
    * scaled by the smooth-inverse-frequency weight `a / (a + p(w))`,
    * where `p(w)` is the corpus unigram probability — frequent words
    * are damped, rare content words dominate. The word vectors here are
    * md5-derived Rademacher vectors (`±1` per dim from the parity of
    * `md5("sif:" + term + ":" + dim)` — the [[Dedup.rademacherPlanes]]
    * portability construction), so an external engine can replay the
    * whole embedding bit-for-bit; a real pipeline swaps in learned
    * vectors through the same vocab relation without changing the plan.
    *
    * Bit-stable float discipline: the weight is ONE double division of
    * exact integers (`a = aPermille/1000` ⇒ `w = aPermille·T /
    * (aPermille·T + 1000·cnt)`), and the per-dim sum folds the token
    * contributions in document order (collect + sort by position +
    * sequential `aggregate`/`zip_with`), so any engine that folds the
    * same sequence lands on the same doubles — the bitext-mining
    * sequential-fold rule.
    *
    * Scale shape: the vocab relation (distinct term → count + vector)
    * is built with one map-side-combined aggregation; md5 cost is
    * O(|vocab|·dim), not O(corpus tokens·dim). Tokens join the vocab on
    * the term key — broadcast when the vocab fits (default),
    * SHUFFLE_HASH otherwise (hot stopword terms stay out of any sort
    * either way). Per-doc state is one `len·dim` contribution list
    * during the fold — bounded by the same max-doc-length contract as
    * the splitters. `p(w)` uses corpus totals, so two passes over the
    * token relation (count, then weight) — the standard SIF shape.
    */
  def sifEmbed(df: DataFrame, idCol: String, textCol: String, dim: Int,
               aPermille: Int = 1, broadcastVocab: Boolean = true): DataFrame = {
    require(dim >= 1 && dim <= 256, s"dim must be in [1,256] (got $dim)")
    require(aPermille >= 1, s"aPermille must be >= 1 (got $aPermille)")
    val toks = df
      .select(col(idCol),
        posexplode(graft.ops.TextAnalysis.tokens(coalesce(col(textCol), lit("")))))
      .toDF(idCol, "__pos", "__term")
      .filter(length(col("__term")) > 0)
    val sign = (term: Column, d: Column) =>
      when(conv(substring(md5(concat(lit("sif:"), term, lit(":"), d.cast("string"))),
          1, 1), 16, 10).cast("int") % 2 === 0, lit(1.0d))
        .otherwise(lit(-1.0d))
    val vocab = toks.groupBy(col("__term"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__vec",
        transform(sequence(lit(0), lit(dim - 1)), d => sign(col("__term"), d)))
    val vocabSide = if (broadcastVocab) broadcast(vocab)
                    else vocab.hint("SHUFFLE_HASH")
    val tot = toks.agg(count(lit(1)).as("__T"))
    val weighted = toks.join(vocabSide, Seq("__term"))
      .crossJoin(broadcast(tot))
      .withColumn("__w",
        (lit(aPermille.toLong) * col("__T")).cast("double") /
          (lit(aPermille.toLong) * col("__T") + lit(1000L) * col("__cnt")).cast("double"))
      .select(col(idCol), col("__pos"),
        transform(col("__vec"), v => col("__w") * v).as("__contrib"))
    val zero = array((0 until dim).map(_ => lit(0.0d)): _*)
    val folded = weighted.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      aggregate(
        transform(array_sort(collect_list(struct(col("__pos"), col("__contrib")))),
          x => x("__contrib")),
        zero, (acc, c) => zip_with(acc, c, (a, b) => a + b)).as("__emb"))
    // pooled float sums (data floats, not integer ratios), accumulated
    // in the array_sort-pinned order so the pre-round double is
    // engine-identical: round(6) is the embedding-output convention
    folded.select(col(idCol) +: col("n_tokens") +:
      (0 until dim).map(d => round(element_at(col("__emb"), d + 1), 6).as(s"e$d")): _*)
  }
}
