package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language model with Stupid Backoff scoring
  * (Brants et al. 2007, "Large Language Models in Machine Translation"
  * — the scheme built precisely for distributed batch infrastructure:
  * no discounting or normalization passes, just counts and a fixed
  * backoff multiplier, which is why it scales to web corpora where
  * Kneser-Ney's held-out statistics don't).
  *
  * The model IS a count table `(order, gram, cnt)`; scoring a document
  * walks its token stream with
  * S(w|u,v) = c(uvw)/c(uv), else α·S(w|v);
  * S(w|v) = c(vw)/c(v), else α·S(w);
  * S(w) = c(w)/N (0 when unseen — an OOV token).
  * Leading positions use the longest available order WITHOUT the α
  * penalty (position 1 scores as a unigram because no context exists,
  * not because a context was unseen).
  *
  * Scale: counting is one explode + one hash agg per order over the
  * corpus (unioned into a single plan). Scoring reshapes each position
  * into FIVE (order, gram) probe rows — the trigram, its context
  * bigram, the bigram, its context unigram, the unigram — and joins
  * the count table ONCE (SHUFFLE_HASH on the gram key), instead of
  * five separate count-table joins; the per-position pivot back is a
  * (doc, position)-keyed agg. Context tokens come from per-document
  * `lag` windows (bounded by document length), so token arrays never
  * ride along the join.
  */
object NgramLm {

  /** `(order, gram, cnt)` for n-gram orders 1..`maxN` — space-joined
    * token grams over [[TextAnalysis.tokens]] words (empty tokens
    * dropped). The Stupid Backoff "model artifact": persist it once,
    * score any stream against it.
    */
  def gramCounts(docs: DataFrame, textCol: String, maxN: Int = 3): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1 (got $maxN)")
    val toks = docs.select(
      filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0).as("__w"))
    (1 to maxN).map { o =>
      toks.select(explode(TextAnalysis.wordGrams(col("__w"), o)).as("gram"))
        .select(lit(o).as("order"), col("gram"))
    }.reduce(_ union _)
      .groupBy(col("order"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Score documents against a trigram Stupid Backoff model. Returns
    * one row per non-empty document:
    * `(idCol, n_tokens, n_zero, logprob)` — token count, OOV-chain
    * zero-score count, and Σ ln(S) over the positive scores (null when
    * every position scored zero). `counts` is a [[gramCounts]] table
    * with maxN ≥ 3.
    */
  def scoreStupidBackoff(docs: DataFrame, idCol: String, textCol: String,
                         counts: DataFrame, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1) (got $alpha)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__p"))
    val positions = docs
      .select(col(idCol),
        posexplode(filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)))
      .withColumnRenamed("pos", "__p").withColumnRenamed("col", "__t")
      .withColumn("__i", col("__p") + lit(1))
      .withColumn("__p1", lag(col("__t"), 1).over(w))
      .withColumn("__p2", lag(col("__t"), 2).over(w))
    // five probe roles per position, one join against the count table;
    // concat (not concat_ws) so a missing context nulls the gram out
    val roleArr = array(
      struct(lit(1).as("order"), col("__t").as("gram"), lit("u").as("role")),
      struct(lit(1).as("order"), col("__p1").as("gram"), lit("c1").as("role")),
      struct(lit(2).as("order"),
        concat(col("__p1"), lit(" "), col("__t")).as("gram"), lit("b").as("role")),
      struct(lit(2).as("order"),
        concat(col("__p2"), lit(" "), col("__p1")).as("gram"), lit("cb").as("role")),
      struct(lit(3).as("order"),
        concat(col("__p2"), lit(" "), col("__p1"), lit(" "), col("__t")).as("gram"),
        lit("tr").as("role")))
    val probes = positions
      .select(col(idCol), col("__i"), explode(roleArr).as("r"))
      .select(col(idCol), col("__i"), col("r.order").as("order"),
        col("r.gram").as("gram"), col("r.role").as("role"))
      .filter(col("gram").isNotNull)
    val joined = probes
      .join(counts.hint("SHUFFLE_HASH"), Seq("order", "gram"), "left")
      .groupBy(col(idCol), col("__i"))
      .agg(
        max(when(col("role") === "u", col("cnt"))).as("c_u"),
        max(when(col("role") === "c1", col("cnt"))).as("c_c1"),
        max(when(col("role") === "b", col("cnt"))).as("c_b"),
        max(when(col("role") === "cb", col("cnt"))).as("c_cb"),
        max(when(col("role") === "tr", col("cnt"))).as("c_tr"))
    val nDf = counts.filter(col("order") === 1).agg(sum(col("cnt")).as("__n"))
    val sU = coalesce(col("c_u").cast("double") / col("__n"), lit(0.0))
    val sB = when(col("c_b").isNotNull, col("c_b").cast("double") / col("c_c1"))
      .otherwise(lit(alpha) * sU)
    val sT = when(col("c_tr").isNotNull, col("c_tr").cast("double") / col("c_cb"))
      .otherwise(lit(alpha) * sB)
    joined
      .crossJoin(broadcast(nDf))
      .withColumn("__s",
        when(col("__i") === 1, sU).when(col("__i") === 2, sB).otherwise(sT))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__s") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("__s") > 0, log(col("__s")))).as("logprob"))
  }

  /** KenLM-style fluency gate: per-document perplexity against a
    * [[gramCounts]] Stupid Backoff model, keeping documents with
    * `ppl = exp(-logprob / n_tokens) ≤ maxPpl` — the standard "drop
    * gibberish and boilerplate the LM finds implausible" curation
    * filter. Documents with ANY zero-score chain (an OOV even at the
    * unigram level) are dropped outright: their true perplexity is
    * infinite, not the positive-position average.
    *
    * Returns `(idCol, n_tokens, ppl)` for survivors, ppl rounded to 6
    * decimals with the CUT applied to the rounded value (the
    * [[Keyword.bm25]] convention — a raw-double threshold would let
    * last-ulp cross-engine drift flip membership).
    *
    * Scale shape is [[scoreStupidBackoff]]'s: the model table joins
    * SHUFFLE_HASH against the probe stream, the gate itself is a
    * map-side filter on the scored aggregate.
    */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
                       counts: DataFrame, maxPpl: Double,
                       alpha: Double = 0.4): DataFrame = {
    require(maxPpl > 0, s"maxPpl must be > 0 (got $maxPpl)")
    scoreStupidBackoff(docs, idCol, textCol, counts, alpha)
      .filter(col("n_zero") === 0)
      .select(col(idCol), col("n_tokens"),
        // exp/ln chain (transcendental): round(6) is the score
        // convention, never an exact-ratio round
        round(exp(-col("logprob") / col("n_tokens")), 6).as("ppl"))
      .filter(col("ppl") <= maxPpl)
  }
}
