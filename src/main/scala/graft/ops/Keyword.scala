package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword (lexical) retrieval: corpus-statistics BM25 scoring and
  * reciprocal-rank fusion — the lexical half of hybrid search. The
  * reference retrieves by vector similarity only
  * (`src/server/agents/chatbot.py:188-210`), but a production RAG/
  * training-data stack pairs that with a BM25 leg and fuses the two
  * rankings; both legs and the fusion are pure relational algebra, so
  * they belong in the engine.
  *
  * Scale shape: document length comes from the token array WITHOUT a
  * full-corpus token explode — only tokens matching the (tiny) query
  * term set are exploded, so the heavy shuffle is O(matches), not
  * O(corpus tokens). Corpus stats (N, avg doclen) and per-term document
  * frequencies are broadcast; the final top-k is a
  * TakeOrderedAndProject.
  */
object Keyword {

  /** BM25 score of every document containing at least one of
    * `queryTerms`, highest first, top `topK`. Output: `(idCol,
    * bm25 DOUBLE)` with the score rounded to 6 decimals — ranking runs
    * on the raw double; rounding only stabilizes the emitted value
    * cross-engine (same convention as the vector-search queries).
    *
    * Standard Robertson/Sparck-Jones BM25 with the +1 idf floor
    * (Lucene's variant, always positive):
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
    * `score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__w"))
      .select(col(idCol), size(col("__w")).cast("long").as("__dl"),
        filter(col("__w"), t => t.isin(queryTerms: _*)).as("__qw"))
    // avgdl over the WHOLE corpus (docs with zero query-term hits count)
    val stats = base.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val tf = base
      .select(col(idCol), col("__dl"), explode(col("__qw")).as("__term"))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val df = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val denom = col("__tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / avgdl)
    val termScore = idf * (col("__tf") * lit(k1 + 1.0)) / denom
    tf.join(broadcast(df), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__s", termScore)
      .groupBy(col(idCol))
      .agg(sum(col("__s")).as("__raw"))
      .select(col(idCol), round(col("__raw"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion of independent rankings: each input carries
    * `(idCol, rankCol)` (rank 1 = best) and contributes `1/(c + rank)`;
    * ids absent from a ranking contribute nothing from it. Output:
    * `(idCol, rrf DOUBLE)` rounded to 6 decimals, best first, top
    * `topK`. One union + one hash aggregation — rankings are already
    * top-k-bounded, so this is driver-cheap at any corpus size.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              c: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contrib: Column = lit(1.0) / (lit(c) + col(rankCol))
    rankings
      .map(_.select(col(idCol), contrib.as("__c")))
      .reduce(_ union _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("__raw"))
      .select(col(idCol), round(col("__raw"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
