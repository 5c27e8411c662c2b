package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Contrastive training-pair mining over an embedding corpus — the
  * data-prep step for training retrieval/embedding models (DPR-style
  * hard negatives: the wrong-label items MOST similar to the anchor are
  * the informative ones; random negatives teach nothing once the model
  * separates easy cases).
  *
  * Scale: the [[Similarity.similarityJoin]] shape — the anchor batch
  * broadcasts (bounded, like a query batch), the corpus is scanned once
  * with the label predicate evaluated BEFORE scoring (wrong-label rows
  * never pay the distance kernel for positives and vice versa), and the
  * per-anchor top-k runs through [[Similarity.boundedRank]]'s
  * per-partition bounded-heap pre-prune, so the rank exchange moves
  * O(k × anchors × partitions) rows, never the scored corpus.
  */
object Contrastive {

  private def labelTopK(anchors: DataFrame, corpus: DataFrame,
                        anchorIdCol: String, anchorEmbCol: String, anchorLabelCol: String,
                        corpusIdCol: String, corpusEmbCol: String, corpusLabelCol: String,
                        k: Int, metric: String, sameLabel: Boolean): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val q = anchors.select(col(anchorIdCol).as("__qid"),
      col(anchorEmbCol).as("__qemb"), col(anchorLabelCol).as("__qlab"))
    val keep =
      if (sameLabel) col(corpusLabelCol) === col("__qlab")
      else col(corpusLabelCol) =!= col("__qlab")
    val score = VectorFunctions.score(metric)(col(corpusEmbCol), col("__qemb"))
    val scored = corpus
      .crossJoin(broadcast(q))
      .filter(keep)
      .withColumn("score", score)
      .filter(col("score").isNotNull)
      .select(col("__qid"), col(corpusIdCol), col("score"))
    Similarity.boundedRank(scored, anchorIdCol, corpusIdCol, k, metric,
      "score", "rank")
  }

  /** Per anchor: the `k` highest-scoring corpus items with a DIFFERENT
    * label — the hard negatives. Returns
    * `(anchorIdCol, rank, corpusIdCol, score)`, rank 1-based by score
    * (ties to the smaller corpus id). Null-label corpus rows compare
    * unequal to every anchor label and are — by the SQL null contract —
    * excluded from BOTH negatives and positives: unlabeled data cannot
    * be trusted either way.
    */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame,
                    anchorIdCol: String, anchorEmbCol: String, anchorLabelCol: String,
                    corpusIdCol: String, corpusEmbCol: String, corpusLabelCol: String,
                    k: Int, metric: String = "COSINE"): DataFrame =
    labelTopK(anchors, corpus, anchorIdCol, anchorEmbCol, anchorLabelCol,
      corpusIdCol, corpusEmbCol, corpusLabelCol, k, metric, sameLabel = false)

  /** Per anchor: the `k` highest-scoring SAME-label corpus items — the
    * positives of the contrastive pair. Same shape as
    * [[hardNegatives]].
    */
  def positives(anchors: DataFrame, corpus: DataFrame,
                anchorIdCol: String, anchorEmbCol: String, anchorLabelCol: String,
                corpusIdCol: String, corpusEmbCol: String, corpusLabelCol: String,
                k: Int, metric: String = "COSINE"): DataFrame =
    labelTopK(anchors, corpus, anchorIdCol, anchorEmbCol, anchorLabelCol,
      corpusIdCol, corpusEmbCol, corpusLabelCol, k, metric, sameLabel = true)

  /** InfoNCE-style training triples: the single nearest positive joined
    * with the top-`negK` hard negatives per anchor —
    * `(anchorIdCol, pos_id, pos_score, neg_rank, neg_id, neg_score)`.
    * Anchors with no same-label corpus item (nothing to pull toward)
    * drop out; anchors with no wrong-label item drop likewise. One
    * broadcast-joined corpus scan per leg, then a per-anchor join of
    * two k-bounded sides.
    */
  def triples(anchors: DataFrame, corpus: DataFrame,
              anchorIdCol: String, anchorEmbCol: String, anchorLabelCol: String,
              corpusIdCol: String, corpusEmbCol: String, corpusLabelCol: String,
              negK: Int, metric: String = "COSINE"): DataFrame = {
    val pos = positives(anchors, corpus, anchorIdCol, anchorEmbCol, anchorLabelCol,
        corpusIdCol, corpusEmbCol, corpusLabelCol, k = 1, metric)
      .select(col(anchorIdCol), col(corpusIdCol).as("pos_id"),
        col("score").as("pos_score"))
    val neg = hardNegatives(anchors, corpus, anchorIdCol, anchorEmbCol, anchorLabelCol,
        corpusIdCol, corpusEmbCol, corpusLabelCol, k = negK, metric)
      .select(col(anchorIdCol), col("rank").as("neg_rank"),
        col(corpusIdCol).as("neg_id"), col("score").as("neg_score"))
    // the positive leg is ONE row per anchor and anchors are broadcast-
    // bounded by contract — broadcast it so the k-bounded negative leg
    // is never re-exchanged (or sorted) for this join
    neg.join(broadcast(pos), Seq(anchorIdCol))
      .select(col(anchorIdCol), col("pos_id"), col("pos_score"),
        col("neg_rank"), col("neg_id"), col("neg_score"))
  }
}
