package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") as a
  * distributed Spark job — the step a from-scratch training pipeline
  * runs before any tokenization exists: learn the merge table from the
  * corpus itself.
  *
  * The classical algorithm operates on a WORD-COUNT dictionary, not the
  * raw corpus: one corpus pass builds `(word, cnt)` (vocabulary-sized —
  * orders of magnitude smaller than the text), every iteration then
  * touches only that table. Each merge round is (1) one hash agg for
  * weighted adjacent-pair counts, (2) a 1-row argmax collect (count
  * desc, pair lexicographic on ties — deterministic in any engine), and
  * (3) a map-side fold that applies the merge to every word's symbol
  * array, with a `localCheckpoint` lineage cut per round (the
  * [[GraphOps.pageRank]] iteration discipline — T rounds cost T·(agg +
  * map) with a bounded plan, not a T-deep lineage).
  *
  * The merge application is the textbook left-to-right non-overlapping
  * greedy: fold over the symbols, merging when the accumulator's LAST
  * element is `a` and the incoming symbol is `b`. A just-merged token
  * `a+b` can never equal `a` (b is non-empty), so a merged token never
  * re-merges within the same round — exactly the "aaa" → ["aa","a"]
  * semantics, and exactly what the oracle's run-parity formulation
  * (candidate runs, even offsets active) computes on original
  * positions.
  */
object Bpe {

  /** `(word, cnt)` from a corpus — [[TextAnalysis.tokens]] whitespace
    * words, empty tokens dropped, exact counts.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(
        filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Character-split expression with the empty/null guard:
    * `sequence(1, 0)` in Spark is the DESCENDING [1, 0], so an
    * unguarded split would turn "" into ["", ""]; empty and null words
    * both become the empty symbol array.
    */
  private def charSplit(word: Column): Column =
    when(length(word) > 0,
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))
      .otherwise(array().cast("array<string>"))

  /** Initial symbol table `(word, cnt, syms)`: every word split into
    * single characters (`Column.substr` takes the position as a column,
    * which the index-driven transform needs).
    */
  def charSymbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("cnt"), charSplit(col("word")).as("syms"))

  /** One learned merge: the pair, its weighted frequency, and the
    * 1-based round it was learned in.
    */
  final case class Merge(iteration: Int, a: String, b: String, freq: Long)

  /** Apply ONE merge `(a, b) → a+b` to a symbol-array column: the
    * left-to-right non-overlapping greedy fold (see object doc).
    */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Learn `nMerges` BPE merges from a `(word, cnt)` table. Returns the
    * merge table in learned order (possibly shorter than `nMerges` if
    * the corpus runs out of adjacent pairs) and the final symbol table
    * `(word, cnt, syms)` — the segmentation of every vocabulary word
    * under the learned merges.
    */
  def learnMerges(words: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1 (got $nMerges)")
    var syms = charSymbols(words).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var exhausted = false
    while (round <= nMerges && !exhausted) {
      val best = syms
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("a"),
              element_at(col("syms"), i + lit(1)).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += Merge(round, a, b, n)
        syms = syms.select(col("word"), col("cnt"),
            mergeOnce(col("syms"), a, b).as("syms"))
          .localCheckpoint()
        round += 1
      }
    }
    (learned.toSeq, syms)
  }

  /** Segment a word column under an already-learned merge table,
    * applying merges in learned order — the tokenizer-apply step for
    * NEW text once training is done. The merges nest as one expression
    * tree with a lineage cut every `checkpointEvery` merges, bounding
    * both codegen size and plan depth; a production tokenizer serves
    * this from a trie, but THIS formulation is what an engine can
    * verify relationally.
    */
  def segment(words: DataFrame, wordCol: String, merges: Seq[Merge],
              checkpointEvery: Int = 16): DataFrame = {
    var out = words.withColumn("syms", charSplit(col(wordCol)))
    if (merges.isEmpty) return out
    merges.grouped(math.max(1, checkpointEvery)).foreach { batch =>
      val folded = batch.foldLeft(col("syms")) { (c, m) => mergeOnce(c, m.a, m.b) }
      out = out.withColumn("syms", folded).localCheckpoint()
    }
    out
  }

  /** The tokenizer APPLIED to the corpus: per-document subword counts
    * under a learned merge table — `(idCol, n_words, n_bpe_tokens)`,
    * one row per document (0/0 for an empty one). The number a corpus
    * owner actually budgets with: sequence lengths and packing windows
    * are counted in THESE tokens, not whitespace words.
    *
    * Scale shape: segmentation runs once per DISTINCT word (the
    * vocabulary — orders of magnitude smaller than the corpus, but
    * UNBOUNDED on a web crawl: typos/URLs/numbers reach 10⁸+ distinct
    * words, past any broadcast), so the word→length join is
    * SHUFFLE_HASH on the narrow (word, len) table — the
    * [[NgramLm.scoreStupidBackoff]] convention for unbounded model
    * tables; the only other corpus-sized exchange is the per-document
    * agg keyed by id.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val words = docs.select(col(idCol), explode_outer(
      filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)).as("word"))
    val vocab = words.filter(col("word").isNotNull).select(col("word")).distinct()
    val lens = segment(vocab, "word", merges)
      .select(col("word"), size(col("syms")).cast("long").as("__len"))
    words.join(lens.hint("SHUFFLE_HASH"), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(col("word")).as("n_words"),
        coalesce(sum(col("__len")), lit(0L)).as("n_bpe_tokens"))
  }
}
