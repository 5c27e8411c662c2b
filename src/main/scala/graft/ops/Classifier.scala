package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained quality classifier over hashed bag-of-words features — the
  * CCNet / LLaMA-pipeline "fastText quality gate" re-expressed
  * relationally: logistic regression on 12-bit md5 feature buckets,
  * fit by full-batch gradient descent INSIDE the engine, then applied
  * as a scoring join. Where [[Importance]] (DSIR) ranks documents by a
  * closed-form generative log-ratio, this op LEARNS the discriminator
  * from labeled examples, which is what production crawls actually run
  * (reference context: the quality gates around ingest,
  * /root/reference/src/server/utils/embedding.py:296-304 — the
  * reference outsources "is this worth embedding" to upstream
  * curation; this operator is that upstream step).
  *
  * Engine-portability: features are the [[Importance.tokenBucket]]
  * md5-prefix buckets (4096) plus a bias bucket −1; `x` is the
  * document-normalized term frequency `cnt / n_tokens`. Each GD step
  * rounds the weight vector to 6 decimals — a quantized per-iteration
  * checkpoint — so the ENTIRE training trajectory is replayable
  * bit-for-bit by any SQL engine as K unrolled CTE iterations (the
  * pagerank/BPE unrolled-iteration oracle pattern): last-ulp float-sum
  * divergence cannot compound across steps because every step re-bases
  * on the rounded vector.
  *
  * Scale shape: the model is ≤4097 (bucket, weight) rows and
  * BROADCASTS to every join; the corpus-sized exchanges are the
  * per-document feature agg (keyed by id) and the per-bucket gradient
  * agg (collapses map-side to ≤4096 partials per task) — both linear,
  * once per iteration, with the iteration count a small constant. The
  * only driver round-trip is the labeled-row count (one scalar);
  * features build once and `localCheckpoint` so K iterations never
  * re-tokenize.
  */
object Classifier {

  /** Hashed features of `df`: one `(idCol, b, x)` row per distinct
    * md5 bucket per document (`x` = bucket count / doc token count)
    * plus a bias row `(idCol, −1, 1.0)` for EVERY document — so a
    * tokenless document still scores (at the bias prior) instead of
    * silently dropping out of the gate.
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tb = df
      .select(col(idCol).as("__id"),
        explode(filter(TextAnalysis.tokens(col(textCol)),
          t => length(t) > 0)).as("__tok"))
      .withColumn("__b", Importance.tokenBucket(col("__tok")))
    val nd = tb.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val tokFeat = tb.groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .join(nd, Seq("__id"))
      .select(col("__id"), col("__b"),
        (col("__c").cast("double") / col("__n")).as("__x"))
    val biasFeat = df.select(col(idCol).as("__id")).distinct()
      .select(col("__id"), lit(-1).as("__b"), lit(1.0).as("__x"))
    tokFeat.unionByName(biasFeat)
  }

  /** Fit logistic-regression weights on `labeled` (`labelCol` ∈ {0, 1})
    * by `iters` full-batch GD steps at learning rate `lr` (scaled by
    * 1/N, N = labeled rows). Returns `(b, w)` — ≤4097 rows, weights
    * rounded to 6 decimals (the replayable-checkpoint contract).
    *
    * Each step: p_d = σ(Σ_b w_b·x_db); g_b = Σ_d (p_d − y_d)·x_db;
    * w ← round(w − (lr/N)·g, 6). Zero-init makes step 1's
    * probabilities exactly 0.5 in every engine. The gradient inner
    * join is total by construction: g's bucket domain equals w's
    * (every feature bucket belongs to some labeled document, and every
    * document has a probability row).
    */
  def fitLogReg(labeled: DataFrame, idCol: String, textCol: String,
                labelCol: String, iters: Int = 3, lr: Double = 5.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    require(lr > 0, s"lr must be > 0 (got $lr)")
    val ydf = labeled
      .select(col(idCol).as("__id"), col(labelCol).cast("double").as("__y"))
    val feat = hashedFeatures(labeled, idCol, textCol).localCheckpoint()
    val n = ydf.count()
    require(n > 0, "no labeled rows")
    val step = lr / n
    var w = feat.select(col("__b")).distinct()
      .select(col("__b"), lit(0.0).as("__w")).localCheckpoint()
    for (_ <- 1 to iters) {
      val p = feat.join(broadcast(w), Seq("__b"))
        .groupBy(col("__id")).agg(sum(col("__w") * col("__x")).as("__s"))
        .join(ydf, Seq("__id"))
        .select(col("__id"), col("__y"),
          (lit(1.0) / (lit(1.0) + exp(-col("__s")))).as("__p"))
      val g = feat.join(p, Seq("__id"))
        .groupBy(col("__b"))
        .agg(sum((col("__p") - col("__y")) * col("__x")).as("__g"))
      w = w.join(g, Seq("__b"))
        .select(col("__b"),
          round(col("__w") - lit(step) * col("__g"), 6).as("__w"))
        .localCheckpoint()
    }
    w.select(col("__b").as("b"), col("__w").as("w"))
  }

  /** Score `df` under trained `weights` — `(idCol, prob)` with prob
    * rounded to 6 decimals; buckets the model never saw contribute 0
    * (left join), so scoring a NEW corpus under a model trained
    * elsewhere is well-defined. The weights broadcast; the corpus
    * never shuffles except the per-document feature agg.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: DataFrame): DataFrame = {
    hashedFeatures(df, idCol, textCol)
      .join(broadcast(weights.select(col("b").as("__b"), col("w").as("__w"))),
        Seq("__b"), "left")
      .groupBy(col("__id"))
      .agg(round(lit(1.0) / (lit(1.0) +
        exp(-sum(coalesce(col("__w"), lit(0.0)) * col("__x")))), 6).as("prob"))
      .select(col("__id").as(idCol), col("prob"))
  }

  /** Collect a trained weight frame into the literal map
    * [[scoreMapSide]] embeds — bounded by construction (≤4097 rows).
    */
  def collectWeights(weights: DataFrame): Map[Int, Double] =
    weights.select(col("b").cast("int"), col("w").cast("double"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  /** Reliability table for a scored, labeled frame — the calibration
    * check every deployed quality gate needs before its probabilities
    * are used as thresholds: `prob` binned into `bins` equal-width
    * bins, per bin the count, mean predicted probability, observed
    * positive fraction, their absolute gap, and the global expected
    * calibration error (ECE = Σ nᵢ·gapᵢ / N, identical on every row).
    * Bounded output (≤ bins rows); one aggregation over the scored
    * frame.
    */
  def calibrationTable(scored: DataFrame, probCol: String, labelCol: String,
                       bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2 (got $bins)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    scored
      .withColumn("__bin",
        least(floor(col(probCol) * bins), lit(bins - 1)).cast("int"))
      .groupBy(col("__bin").as("bin"))
      // frac_pos is an exact integer ratio (tie-capable at a round
      // boundary) and gap/ECE chain off it — the whole table leaves as
      // integer micros (Tables.micros floor pin), keeping every
      // downstream op exact integer arithmetic: gap is an integer
      // difference, ECE an integer-valued double division both engines
      // floor identically. avg_prob's pre-pin sum is order-sensitive in
      // its last ulp either way; the pin absorbs it exactly as round did.
      .agg(count(lit(1)).as("n"),
        graft.Tables.micros(avg(col(probCol))).as("avg_prob_micros"),
        graft.Tables.micros(avg(col(labelCol).cast("double")))
          .as("frac_pos_micros"))
      .withColumn("gap_micros",
        abs(col("avg_prob_micros") - col("frac_pos_micros")))
      .withColumn("ece_micros",
        floor(sum(col("n") * col("gap_micros")).over(w).cast("double") /
          sum(col("n")).over(w).cast("double")).cast("long"))
  }

  /** Shuffle-FREE scoring — the serving/streaming path. Because
    * `x_b = cnt_b / n`, the logit telescopes to
    * `bias + (Σ_tokens w_bucket(tok)) / n`: one fold over the row's own
    * token array against an embedded weight map, no explode, no
    * aggregation, no exchange. Safe in Structured Streaming append mode
    * (stateless narrow map) and the shape a 1000-executor scoring pass
    * wants — the model rides the plan, the corpus never shuffles.
    * Agrees with [[score]] up to the last ulp of the pre-round logit
    * (the fold visits tokens in document order; the grouped sum is
    * partial-aggregation order).
    */
  def scoreMapSide(df: DataFrame, idCol: String, textCol: String,
                   weights: Map[Int, Double]): DataFrame = {
    val bias = weights.getOrElse(-1, 0.0)
    val wmap = typedlit(weights.filter { case (b, _) => b >= 0 })
    val toks = filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)
    val s = aggregate(toks, lit(0.0),
      (acc, t) => acc + coalesce(wmap(Importance.tokenBucket(t)), lit(0.0)))
    val logit = when(size(toks) > 0, s / size(toks)).otherwise(lit(0.0)) +
      lit(bias)
    df.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-logit)), 6).as("prob"))
  }
}
