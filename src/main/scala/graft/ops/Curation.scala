package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: distribution-derived quality filtering,
  * curriculum ordering, and semantic (cluster-balanced) sampling — the
  * steps between "scored corpus" ([[TextAnalysis]]) and "training mix"
  * ([[Sampling]]) in a large-scale pipeline.
  *
  * The reference stops at per-document scoring; these close the loop the
  * way production pipelines do: thresholds come from the CORPUS
  * DISTRIBUTION (keep the top half by quality), ordering comes from a
  * curriculum (easy/clean phases first, seeded-shuffled within a phase),
  * and sampling balances SEMANTIC clusters rather than only metadata
  * strata.
  */
object Curation {

  /** The corpus q-quantile of `scoreCol` as a double, or None on an
    * empty/all-null corpus. `exact = true` uses `percentile` (sorts each
    * group's values in memory — the oracle-parity path, fine to ~10^7
    * values); the default `approx_percentile` is the 100 TB path: a
    * fixed-memory Greenwald-Khanna sketch whose rank error is bounded by
    * 1/`accuracy`, aggregated map-side like any partial agg.
    */
  def quantileThreshold(df: DataFrame, scoreCol: String, q: Double,
                        exact: Boolean = false,
                        accuracy: Int = 10000): Option[Double] = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val agg =
      if (exact) expr(s"percentile(`$scoreCol`, ${q}d)")
      else expr(s"approx_percentile(`$scoreCol`, ${q}d, $accuracy)")
    val r = df.agg(agg.cast("double")).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  /** Keep rows at or above the corpus q-quantile of `scoreCol` — the
    * "drop the worst X% by quality" gate. Two jobs: the threshold
    * aggregation, then a map-side filter at a driver-literal threshold
    * (no join, no second shuffle — the plan the filter pushes straight
    * into the scan). An empty/all-null corpus keeps nothing.
    */
  def filterByQuantile(df: DataFrame, scoreCol: String, q: Double,
                       exact: Boolean = false): DataFrame =
    quantileThreshold(df, scoreCol, q, exact) match {
      case Some(thr) => df.filter(col(scoreCol) >= lit(thr))
      case None      => df.filter(lit(false))
    }

  /** Curriculum ordering: a global 1-based `posName` position that walks
    * `phase` groups in ascending order and seeded-shuffles WITHIN each
    * phase (md5 of `keyCol:seed` — the [[Sampling.deterministicShuffle]]
    * permutation, so within-phase order is uncorrelated across seeds and
    * identical across engines/partitionings). The data-loader feed for
    * staged training: cleanest/easiest phase first, random inside.
    *
    * `phase` must be non-null (the expression raises on null — a null
    * phase would silently sort first and corrupt the curriculum);
    * `keyCol` must be unique for positions to be well-defined. Plan
    * shape: one range exchange + sort, then the two-pass zipWithIndex
    * (per-partition counts, one long per partition through the driver).
    */
  def curriculumOrder(df: DataFrame, phase: Column, keyCol: String,
                      seed: String, posName: String = "position"): DataFrame = {
    val checkedPhase = when(phase.isNotNull, phase).otherwise(raise_error(lit(
      "curriculumOrder: null phase — a curriculum needs every row staged")))
    // null keys raise exactly as in deterministicShuffle: a null key
    // would hash to null, tie with every other null-keyed row, and get
    // a partition-layout-dependent position — silently nondeterministic
    val checkedKey = when(col(keyCol).isNotNull, col(keyCol).cast("string"))
      .otherwise(raise_error(lit(
        s"curriculumOrder: null $keyCol — seeded ordering needs a non-null key")))
    val keyed = df
      .withColumn("__phase", checkedPhase)
      .withColumn("__shk",
        md5(concat(checkedKey, lit(":" + seed)).cast("binary")))
    Sampling.indexByOrder(keyed,
        Seq(col("__phase"), col("__shk"), col(keyCol)), posName)
      ._1.drop("__phase", "__shk")
  }

  /** Corpus-level boilerplate line removal (the CCNet/RefinedWeb cleanup
    * step): any line that appears VERBATIM in more than `maxOccurrences`
    * DISTINCT documents is navigation / footer / cookie-banner
    * boilerplate, and is stripped from every document while the
    * surviving lines keep their original order. Counting distinct
    * documents (not raw occurrences — the papers' semantics) means one
    * degenerate document repeating a line thousands of times cannot get
    * that line deleted corpus-wide.
    *
    * Returns `(idCol, clean_text, n_kept, n_removed)` — one row per input
    * document, `clean_text = ""` when every line was boilerplate.
    *
    * Plan shape, sized for 100 TB: one narrow `posexplode` over the line
    * split; a distinct-doc count (partial (line, doc) dedup map-side,
    * then a two-stage agg keyed by the line — the boilerplate lines
    * themselves never become skewed shuffle keys); with the default
    * `broadcastHeavy` the anti-join BROADCASTS the heavy set and the
    * corpus lines never shuffle for the filter; one final exchange
    * regroups surviving lines by document. Null text is treated as
    * empty.
    *
    * The line split is evaluated once per consumer (the count branch and
    * the anti-join branch — no cross-branch CSE in Catalyst); persisting
    * the exploded lines would cost ≈ the corpus bytes again, so the
    * deliberate choice is the second narrow scan. Callers whose input is
    * itself an expensive plan should persist IT upstream.
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                             maxOccurrences: Long,
                             delimiter: String = "\n",
                             broadcastHeavy: Boolean = true): DataFrame = {
    require(maxOccurrences >= 1,
      s"maxOccurrences must be >= 1, got $maxOccurrences")
    val delim = java.util.regex.Pattern.quote(delimiter)
    val text = coalesce(col(textCol), lit(""))
    val lines = df.select(col(idCol), posexplode(split(text, delim)))
      .toDF(idCol, "__pos", "__line")
    val heavy = lines.groupBy(col("__line"))
      .agg(countDistinct(col(idCol)).as("__n"))
      .filter(col("__n") > maxOccurrences)
      .select(col("__line"))
    // the heavy-set bound totalLines/maxOccurrences still grows with the
    // corpus: when maxOccurrences is small relative to corpus size the
    // set can exceed the driver/broadcast budget — flip broadcastHeavy
    // off to anti-join through a sort-free shuffled hash join instead
    val heavySide = if (broadcastHeavy) broadcast(heavy)
                    else heavy.hint("SHUFFLE_HASH")
    val kept = lines.join(heavySide, Seq("__line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol)).agg(
      concat_ws(delimiter,
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x("__line"))).as("clean_text"),
      count(lit(1)).as("n_kept"))
    // SHUFFLE_HASH keeps the rebuilt clean_text payloads out of any
    // sort (the round-5 array/CLOB-payload SMJ cliff)
    df.select(col(idCol), size(split(text, delim)).cast("long").as("__total"))
      .join(rebuilt.hint("SHUFFLE_HASH"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Cluster-balanced sample: k-means the embedding space ([[Ivf.fit]] —
    * deterministic seeded init), assign every row its cluster (narrow
    * argmin projection, no shuffle), then keep the `perCluster` rows
    * with the smallest md5(id) per cluster ([[Sampling.stratifiedQuota]]
    * — per-partition bounded heaps, quota-bounded exchange). The
    * semantic diversification a metadata-stratified mix can't express:
    * over-represented topics are capped at the same quota as rare ones.
    *
    * Returns the sampled rows plus their `cluster_id`. Null embeddings
    * carry no semantics and are dropped (they'd otherwise form a
    * pseudo-cluster of unknowns).
    */
  def clusterBalancedSample(df: DataFrame, idCol: String, embCol: String,
                            k: Int, perCluster: Int,
                            iters: Int = 2): DataFrame = {
    val model = Ivf.fit(df, idCol, embCol, k, iters)
    val assigned = Ivf.assign(df.filter(col(embCol).isNotNull), embCol, model)
      .withColumn("cluster_id", col("cluster_id").cast("string"))
    Sampling.stratifiedQuota(assigned, "cluster_id", idCol,
        quotas = Map.empty, defaultQuota = perCluster)
      .withColumn("cluster_id", col("cluster_id").cast("int"))
  }

  /** Quality-ordered token-budget fill — the mixture-allocation step
    * when a training run has a TOKEN budget and domains of unequal
    * quality: domains are taken whole in (quality desc, domain asc)
    * order until the budget runs out, the boundary domain gets the
    * remainder, everything after gets 0. The greedy waterline is a
    * prefix sum, not a loop: `allocated = clamp(budget − Σ tokens of
    * strictly-better domains, 0, own tokens)` — fully relational, so
    * any engine replays the allocation exactly (ties broken by the
    * domain name; order on a ROUNDED quality so a last-ulp aggregate
    * difference can never flip the waterline cross-engine).
    *
    * Scale: `perDomain` is the |domains|-row aggregate (dozens — the
    * [[Sampling.temperatureQuotas]] boundedness argument), so the one
    * global window is over bounded rows; the corpus-side aggregation
    * that produces it partial-aggregates map-side as usual.
    */
  def budgetFillMix(perDomain: DataFrame, domainCol: String,
                    tokensCol: String, qualityCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0 (got $budget)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      // internal portable-ranking round: the cut happens on the SAME
      // rounded value in any engine replaying this plan, and the
      // domain tiebreak makes the order total — never an output column
      .orderBy(round(col(qualityCol), 6).desc, col(domainCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perDomain
      .withColumn("__prev", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("allocated",
        greatest(lit(0L), least(col(tokensCol).cast("long"),
          lit(budget) - col("__prev"))))
      .drop("__prev")
  }

  /** Fill-in-the-middle training transform (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * for a deterministic `ratePct`% of documents, split the text at
    * two md5-derived cut points and emit the PSM rearrangement
    * `<PRE> prefix <SUF> suffix <MID> middle` (the paper's
    * prefix-suffix-middle order with sentinel tokens); the rest pass
    * through unchanged with `fim_applied = false` — the paper's
    * finding is that a FIM fraction costs no left-to-right capability,
    * so the mix IS the product.
    *
    * Everything is exact integers off md5 prefixes (the tokenBucket
    * discipline), so cut points replay bit-for-bit in SQL:
    * `c1 = h1 % (len+1)`, `c2 = c1 + h2 % (len−c1+1)` over CHARACTER
    * offsets — empty prefix/middle/suffix segments are legal FIM rows
    * (the paper trains on them too). Pure column expressions; one
    * narrow map, no shuffle.
    */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   ratePct: Long = 50, preTok: String = "<PRE>",
                   sufTok: String = "<SUF>", midTok: String = "<MID>")
      : DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, s"ratePct $ratePct not in 0..100")
    val t = coalesce(col(textCol), lit(""))
    val n = length(t).cast("long")
    def h(salt: String) = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(salt))), 1, 6), 16, 10)
      .cast("long")
    val applied = h("_fim") % 100 < lit(ratePct)
    val c1 = h("_c1") % (n + 1)
    val c2 = c1 + h("_c2") % (n - c1 + 1)
    // substring is 1-based; slice [a, b) of the char sequence
    val prefix = substring(t, lit(1), c1.cast("int"))
    val middle = t.substr((c1 + 1).cast("int"), (c2 - c1).cast("int"))
    val suffix = t.substr((c2 + 1).cast("int"), (n - c2).cast("int"))
    df.withColumn("fim_applied", applied)
      .withColumn("fim_text",
        when(applied, concat(lit(preTok), prefix, lit(sufTok), suffix,
          lit(midTok), middle)).otherwise(t))
  }
}
