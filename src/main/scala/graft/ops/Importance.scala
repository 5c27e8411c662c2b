package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * rank a raw corpus by how target-domain-like each document is under a
  * hashed-unigram bag-of-words model, so a 100 TB crawl can be filtered
  * to the slice that matters for a given training mix WITHOUT a learned
  * classifier.
  *
  * The importance model is two categorical distributions over `buckets`
  * hash buckets — one fit on the target sample, one on the raw source
  * corpus — with additive smoothing; a document's log-weight is
  * Σ_tokens ln(p_target(bucket(tok)) / p_source(bucket(tok))). Feature
  * hashing is what makes this work at corpus scale: the model state is
  * `buckets` doubles regardless of vocabulary size.
  *
  * Engine-portability: the bucket is the first 3 hex chars of
  * md5(token) — 12 bits, 4096 buckets — the [[graft.functions.SimHash64]]
  * md5-prefix convention, so any SQL engine recomputes every bucket,
  * both distributions, and every document weight bit-for-bit
  * (`('0x' || substr(md5(tok), 1, 3))::INT`).
  *
  * Scale shape: each corpus is one narrow token explode collapsed by a
  * two-stage hash agg to ≤4096 (bucket, count) rows — the exchange
  * carries thousands of rows, not tokens. The λ = log-ratio table (4096
  * rows) broadcasts to the per-document scoring join, so corpus rows
  * never shuffle to score; the only corpus-sized exchange is the
  * per-document count agg keyed by id. Totals cross the driver as two
  * scalar literals (the [[Keyword.bm25]] stats pattern), leaving no
  * stats subtree in the returned plan.
  */
object Importance {

  /** 12-bit md5-prefix feature bucket of a token — `[0, 4096)`,
    * identical in any engine with md5 and hex casts.
    */
  def tokenBucket(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 3), 16, 10).cast("int")

  private val Buckets = 4096

  /** Per-document DSIR log importance weights of `corpus` toward
    * `target` — `(idCol, n_tokens, logweight)`, logweight rounded to 6
    * decimals (the cross-engine float convention), one row per corpus
    * document; a document with no tokens scores 0.0 over 0 tokens.
    * `alpha` is the additive smoothing mass per bucket on BOTH
    * distributions (so a bucket unseen in the target stays finite and
    * negative rather than -∞).
    */
  def dsirLogWeights(corpus: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be > 0 (got $alpha)")
    val spark = corpus.sparkSession
    def bucketed(df: DataFrame, cols: Column*): DataFrame = df
      .select(cols :+ explode_outer(filter(TextAnalysis.tokens(col(textCol)),
        t => length(t) > 0)).as("__tok"): _*)
      .withColumn("__b", tokenBucket(col("__tok")))
    def dist(df: DataFrame): DataFrame = bucketed(df)
      .filter(col("__b").isNotNull)
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
    // two tiny actions: each distribution is ≤4096 rows after the
    // map-side partial agg; totals become plan literals
    val src = dist(corpus).withColumnRenamed("__c", "__cs").localCheckpoint()
    val tgt = dist(target).withColumnRenamed("__c", "__ct").localCheckpoint()
    val srcTotal = src.agg(sum(col("__cs"))).head().getLong(0)
    val tgtTotal = tgt.agg(sum(col("__ct"))).head().getLong(0)
    require(srcTotal > 0, "source corpus has no tokens")
    require(tgtTotal > 0, "target sample has no tokens")
    // λ over ALL buckets (zero-count buckets smooth to alpha), built on
    // a 4096-row range — broadcastable by construction
    val lambda = spark.range(Buckets).select(col("id").cast("int").as("__b"))
      .join(src, Seq("__b"), "left").join(tgt, Seq("__b"), "left")
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + alpha) /
            lit(tgtTotal + alpha * Buckets)) -
         log((coalesce(col("__cs"), lit(0L)) + alpha) /
            lit(srcTotal + alpha * Buckets))).as("__lam"))
    // score: per-doc bucket counts (cnt × λ summed per doc) — the same
    // grouped form the oracle aggregates, so float summation meets the
    // 6-decimal round identically
    bucketed(corpus, col(idCol))
      .groupBy(col(idCol), col("__b")).agg(count(col("__tok")).as("__cnt"))
      .join(broadcast(lambda), Seq("__b"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        round(coalesce(sum(col("__cnt") * col("__lam")), lit(0.0)), 6)
          .as("logweight"))
  }

  /** The DSIR selection step: the `quota` corpus documents most
    * target-like by log importance weight — rank on the ROUNDED weight
    * with an id tiebreak (the [[Keyword.bm25]] ranking convention: a
    * raw-double cut would leave the selection vulnerable to last-ulp
    * cross-engine divergence). Returns `(idCol, n_tokens, logweight)`,
    * best first.
    */
  def dsirTopK(corpus: DataFrame, target: DataFrame, idCol: String,
               textCol: String, quota: Int, alpha: Double = 1.0): DataFrame = {
    require(quota >= 1, s"quota must be >= 1 (got $quota)")
    dsirLogWeights(corpus, target, idCol, textCol, alpha)
      .orderBy(col("logweight").desc, col(idCol))
      .limit(quota)
  }
}
