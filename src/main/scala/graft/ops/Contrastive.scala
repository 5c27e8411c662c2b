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

  /** [[hardNegatives]] at CORPUS-SCALE anchors — the every-row-is-an-
    * anchor mining pass a full training-set build runs, where the
    * anchor side can no longer broadcast: both sides assign to the
    * shared IVF model's cells ([[Similarity.ivfJoinTopK]]'s shape — the
    * anchor explodes to its `nProbe` nearest cells, candidates are the
    * cell equi-join, SHUFFLE_HASH so embedding payloads never sort),
    * the label-mismatch predicate runs BEFORE the distance kernel, and
    * the per-anchor top-k goes through the bounded-rank tail. At
    * `nProbe = model.k` every wrong-label pair is scored exactly once
    * and the result EQUALS [[hardNegatives]] rank for rank; at partial
    * probe, recall follows the measured nprobe sweep (SCALE.md). Null
    * labels stay excluded on both sides (the SQL null contract).
    */
  def hardNegativesIvf(anchors: DataFrame, corpus: DataFrame,
                       anchorIdCol: String, anchorEmbCol: String, anchorLabelCol: String,
                       corpusIdCol: String, corpusEmbCol: String, corpusLabelCol: String,
                       model: Ivf.IvfModel, nProbe: Int, k: Int,
                       metric: String = "COSINE"): DataFrame =
    labelTopKIvf(anchors, corpus, anchorIdCol, anchorEmbCol, anchorLabelCol,
      corpusIdCol, corpusEmbCol, corpusLabelCol, model, nProbe, k, metric,
      sameLabel = false)

  /** [[positives]] at corpus-scale anchors — [[hardNegativesIvf]] with
    * the same-label predicate.
    */
  def positivesIvf(anchors: DataFrame, corpus: DataFrame,
                   anchorIdCol: String, anchorEmbCol: String, anchorLabelCol: String,
                   corpusIdCol: String, corpusEmbCol: String, corpusLabelCol: String,
                   model: Ivf.IvfModel, nProbe: Int, k: Int,
                   metric: String = "COSINE"): DataFrame =
    labelTopKIvf(anchors, corpus, anchorIdCol, anchorEmbCol, anchorLabelCol,
      corpusIdCol, corpusEmbCol, corpusLabelCol, model, nProbe, k, metric,
      sameLabel = true)

  private def labelTopKIvf(anchors: DataFrame, corpus: DataFrame,
                           anchorIdCol: String, anchorEmbCol: String, anchorLabelCol: String,
                           corpusIdCol: String, corpusEmbCol: String, corpusLabelCol: String,
                           model: Ivf.IvfModel, nProbe: Int, k: Int,
                           metric: String, sameLabel: Boolean): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(nProbe >= 1 && nProbe <= model.k,
      s"nProbe must be in [1, ${model.k}] (got $nProbe)")
    val q = Similarity.probeCellsExploded(
      anchors.select(col(anchorIdCol).as("__qid"), col(anchorEmbCol).as("__qemb"),
        col(anchorLabelCol).as("__qlab")),
      "__qemb", model, nProbe, "__cell")
    val c = Ivf.assign(
        corpus.select(col(corpusIdCol), col(corpusEmbCol), col(corpusLabelCol)),
        corpusEmbCol, model, clusterCol = "__cell")
      .filter(col("__cell").isNotNull)
    val keep =
      if (sameLabel) col(corpusLabelCol) === col("__qlab")
      else col(corpusLabelCol) =!= col("__qlab")
    val scored = q.join(c.hint("SHUFFLE_HASH"), Seq("__cell"))
      .filter(keep) // label predicate BEFORE the distance kernel
      .withColumn("score", VectorFunctions.score(metric)(col(corpusEmbCol), col("__qemb")))
      .filter(col("score").isNotNull)
      .select(col("__qid"), col(corpusIdCol), col("score"))
    Similarity.boundedRank(scored, anchorIdCol, corpusIdCol, k, metric,
      "score", "rank")
  }

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

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix parallel-corpus miner): for every `a`-side vector,
    * the best `b`-side candidate by MARGIN score — cosine divided by
    * the mean of both sides' average top-`k` cosines — kept when the
    * margin clears `minMargin`. The margin normalizes away hubness:
    * a vector whose neighborhood is uniformly close scores no pair,
    * while a genuinely isolated translation pair stands out.
    *
    * Engine-portability here is STRONGER than the usual round-before-
    * rank convention: margins are ratios of neighborhood AVERAGES, and
    * a last-ulp cosine difference inside an average survives rounding.
    * So every float reduction is a SEQUENTIAL FOLD with a defined
    * order — cosine as a left-to-right `aggregate` over the zipped
    * arrays, the top-k average as a fold over the rank-sorted score
    * list — making cosines, averages, margins, and the argmax
    * BIT-identical in any engine with IEEE doubles (DuckDB replays the
    * folds with `list_reduce`); outputs round only for display.
    *
    * Scale: this exact form materializes the |A|×|B| scored cross join
    * (checkpointed once, reused by both direction rankings) — the
    * oracle-able base. At corpus scale swap the candidate generator
    * for [[Similarity.ivfJoinTopK]] in both directions (identical
    * rounded-score ranking), which prunes the cross join to cell-local
    * work; everything downstream of the top-k relations is k-bounded
    * per id.
    */
  def mineBitext(a: DataFrame, b: DataFrame, idACol: String, idBCol: String,
                 embCol: String, k: Int = 4,
                 minMargin: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val w = org.apache.spark.sql.expressions.Window
    val (pa, pb) = bitextSides(a, b, idACol, idBCol, embCol)
    val scored = pa.crossJoin(pb)
      .select(col("id_a"), col("id_b"), seqCos.as("cos"))
      .localCheckpoint()
    val topA = scored.withColumn("__ra", row_number().over(
        w.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))))
      .filter(col("__ra") <= k)
    val topB = scored.withColumn("__rb", row_number().over(
        w.partitionBy(col("id_b")).orderBy(col("cos").desc, col("id_a"))))
      .filter(col("__rb") <= k)
    marginBest(topA, "__ra", topB, "__rb", minMargin)
  }

  /** IVF-pruned [[mineBitext]] — the corpus-scale form: candidates per
    * direction come from the [[Similarity.ivfJoinTopK]] cell equi-join
    * (each side probes its `nProbe` nearest cells of the shared
    * `model`, candidates are cell-local — Σ |q-cell|·|c-cell| work,
    * never |A|×|B|), and everything downstream of the two top-k
    * relations is the identical k-bounded margin arithmetic.
    *
    * At `nProbe = model.k` every (a, b) pair is generated exactly once
    * (a corpus row lives in ONE cell), the per-direction rankings use
    * the same (cos desc, id asc) order, and the cosine is the SAME
    * left-to-right sequential fold `dot/(‖a‖·‖b‖)` — NOT the codegen'd
    * kernel's `dot/√(‖a‖²·‖b‖²)`, which differs in the last ulp and
    * margins are ratios of unrounded averages — so full probe is
    * BIT-identical to [[mineBitext]] (the `ann_join_full_probe`
    * pin-to-exact contract; partial probe trades recall per the
    * SCALE.md nprobe sweep).
    */
  def mineBitextIvf(a: DataFrame, b: DataFrame, idACol: String, idBCol: String,
                    embCol: String, model: Ivf.IvfModel, nProbe: Int,
                    k: Int = 4, minMargin: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(nProbe >= 1 && nProbe <= model.k,
      s"nProbe must be in [1, ${model.k}] (got $nProbe)")
    val (pa, pb) = bitextSides(a, b, idACol, idBCol, embCol)
    // each direction generates its own cell-local candidates: the probe
    // side explodes into nProbe cells, the other side sits in its one
    // home cell, SHUFFLE_HASH keeps the embedding payloads out of sorts
    def candidates(probe: DataFrame, home: DataFrame): DataFrame =
      Similarity.probeCellsExploded(probe, probe.columns(1), model, nProbe, "__cell")
        .join(Ivf.assign(home, home.columns(1), model, clusterCol = "__cell")
          .filter(col("__cell").isNotNull).hint("SHUFFLE_HASH"), Seq("__cell"))
        .select(col("id_a"), col("id_b"), seqCos.as("cos"))
    val topA = Similarity.boundedRank(
      candidates(pa, pb).select(col("id_a").as("__qid"), col("id_b"), col("cos")),
      "id_a", "id_b", k, "COSINE", "cos", "__ra")
    val topB = Similarity.boundedRank(
      candidates(pb, pa).select(col("id_b").as("__qid"), col("id_a"), col("cos")),
      "id_b", "id_a", k, "COSINE", "cos", "__rb")
    marginBest(topA, "__ra", topB, "__rb", minMargin)
  }

  /** Left-to-right fold dot product: the element order IS the summation
    * order, so any IEEE-double engine replays the sum bit-identically.
    * Round 11: the fold runs as the codegen'd
    * [[graft.functions.SequentialDotProduct]] kernel — bit-identical
    * arithmetic and null semantics to the `aggregate(zip_with(...))`
    * form it replaces (spec-pinned), which was CodegenFallback
    * (per-element interpreted lambdas) on the miner's hot
    * pair-scoring path.
    */
  private def seqDot(x: Column, y: Column): Column =
    VectorFunctions.seqDotProduct(x, y)

  /** `dot/(‖a‖·‖b‖)` over the prepared side columns — the pinned
    * parenthesization both miners share (see [[mineBitextIvf]]).
    */
  private def seqCos: Column =
    seqDot(col("__ea"), col("__eb")) / (col("__na") * col("__nb"))

  private def bitextSides(a: DataFrame, b: DataFrame, idACol: String,
                          idBCol: String, embCol: String): (DataFrame, DataFrame) = (
    a.select(col(idACol).as("id_a"), col(embCol).as("__ea"))
      .filter(col("__ea").isNotNull)
      .withColumn("__na", sqrt(seqDot(col("__ea"), col("__ea")))),
    b.select(col(idBCol).as("id_b"), col(embCol).as("__eb"))
      .filter(col("__eb").isNotNull)
      .withColumn("__nb", sqrt(seqDot(col("__eb"), col("__eb")))))

  /** Shared margin tail: rank-ordered sequential neighborhood averages,
    * margin = cos / mean(avg_a, avg_b), best-per-`id_a` argmax gated by
    * `minMargin`. `topA`/`topB` carry (id, rank, other-id, cos) from
    * either the window ranking or [[Similarity.boundedRank]] — both
    * order (cos desc, id asc), so the fold order is identical.
    */
  private def marginBest(topA: DataFrame, rankACol: String,
                         topB: DataFrame, rankBCol: String,
                         minMargin: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // rank-ordered sequential average of a top-k group
    def foldAvg(rankCol: String): Column = {
      val sorted = org.apache.spark.sql.functions.transform(
        sort_array(collect_list(struct(col(rankCol), col("cos").as("__c")))),
        s => s.getField("__c"))
      aggregate(sorted, lit(0.0), (acc, v) => acc + v) / size(sorted)
    }
    val avgA = topA.groupBy(col("id_a")).agg(foldAvg(rankACol).as("__avga"))
    val avgB = topB.groupBy(col("id_b")).agg(foldAvg(rankBCol).as("__avgb"))
    topA.join(avgA, Seq("id_a")).join(avgB, Seq("id_b"))
      .withColumn("margin",
        col("cos") / ((col("__avga") + col("__avgb")) / 2))
      .withColumn("__rbest", row_number().over(
        w.partitionBy(col("id_a")).orderBy(col("margin").desc, col("id_b"))))
      .filter(col("__rbest") === 1 && col("margin") >= minMargin)
      // cosine-derived doubles (transcendental chain): round(6) is the
      // knn-score convention — tie boundary has measure zero here,
      // unlike exact integer ratios (those leave as micros)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"),
        round(col("margin"), 6).as("margin"))
  }
}
