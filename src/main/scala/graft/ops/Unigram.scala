package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece/Kudo 2018 family) —
  * the OTHER standard tokenizer next to BPE: pieces carry corpus
  * log-probabilities and each word segments to its maximum-likelihood
  * piece sequence by Viterbi, instead of replaying greedy merges.
  *
  * This is the deterministic single-round variant: the vocabulary is
  * the count-weighted top-V multi-character substrings plus ALL single
  * characters (the closure that keeps every word segmentable), with
  * `logp = ln(cnt / total)`. Real SentencePiece prunes this same seed
  * vocabulary with EM rounds; the engine exposes the identical plan
  * shape and swapping in EM-refined scores changes only the vocab
  * relation. Extends the BPE family (`Bpe.scala`; reference splitter
  * surface at /root/reference/src/server/utils/embedding.py:161-176).
  *
  * Everything is hash-checkable: piece scores are ONE double division
  * + ln of exact integers; the Viterbi DP adds those doubles in a
  * PINNED order (position-ascending, candidates compared max-logp →
  * fewer-pieces → earliest-split) so an external engine replaying the
  * same recurrence lands on bit-identical path scores; per-document
  * log-likelihoods fold in document order (the sequential-fold rule).
  */
object Unigram {

  /** Candidate substrings of `word` with length 1..maxPieceLen, as a
    * column expression (no UDF — stays inside codegen).
    */
  private def subPieces(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(0), length(word) - 1), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(word) - s)),
        l => word.substr(s + 1, l))))

  /** Learn the piece vocabulary from a `(word, cnt)` relation
    * ([[Bpe.wordCounts]]): top `vocabSize` multi-char substrings by
    * (weighted count desc, piece asc) ∪ all single characters.
    * Returns `(piece, pcnt, logp)`.
    *
    * Scale: the substring explode is over the DISTINCT-word relation
    * (vocabulary-sized, the [[Bpe]] discipline), never the corpus; the
    * counts aggregate map-side; the top-V cut is a TakeOrdered. The
    * one action computes the vocabulary total for the score constant.
    */
  def learnVocab(words: DataFrame, maxPieceLen: Int = 4,
                 vocabSize: Int = 50, emRounds: Int = 0): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1 (got $maxPieceLen)")
    require(vocabSize >= 0, s"vocabSize must be >= 0 (got $vocabSize)")
    val pieces = words
      // sequence(0, len-1) on an empty word would generate DESCENDING —
      // guard here rather than rely on upstream hygiene
      .filter(length(col("word")) > 0)
      .select(col("cnt"), explode(subPieces(col("word"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("pcnt"))
    val multi = pieces.filter(length(col("piece")) > 1)
      .orderBy(col("pcnt").desc, col("piece")).limit(vocabSize)
    val vocab = pieces.filter(length(col("piece")) === 1)
      .unionByName(multi)
      .localCheckpoint() // two consumers (total + result); vocab-sized
    val total = vocab.agg(sum(col("pcnt"))).head().getLong(0)
    val seed = vocab.withColumn("logp",
      log(col("pcnt").cast("double") / lit(total).cast("double")))
    emRefine(words, seed, maxPieceLen, emRounds)
  }

  /** Viterbi-EM refinement of a piece vocabulary (the hard-EM variant
    * of Kudo 2018 §3.2's prune loop): each round re-segments every
    * distinct word under the CURRENT scores, recounts pieces by their
    * count-weighted usage in those max-likelihood segmentations, PRUNES
    * multi-char pieces that no segmentation uses, and re-normalizes
    * `logp = ln(usage/total)`. Single characters always survive (the
    * closure that keeps every word segmentable) with a usage floor of
    * 1 — a char every segmentation routes around still needs a finite
    * score.
    *
    * Engine-portability is the quantized-checkpoint discipline
    * ([[Classifier.fitLogReg]]'s replay trick, taken further): each
    * round's DP runs on INTEGER micro-log-probs
    * `round(logp · 10⁶)` — the checkpoint every engine lands on
    * exactly — so path scores are integer sums, the (score desc,
    * pieces asc, earliest split) tie order is exact, and a DuckDB
    * recursive-CTE replay reproduces segmentations, usage counts, and
    * the refined scores bit-for-bit. No float ever feeds float
    * arithmetic across a round boundary.
    *
    * Scale: each round is one pass over the DISTINCT-word relation
    * (vocabulary-sized — the [[Bpe]] discipline), one map-side-combined
    * usage aggregate, and a vocab-sized driver collect for the next
    * round's broadcast scores.
    */
  def emRefine(words: DataFrame, vocab: DataFrame, maxPieceLen: Int = 4,
               rounds: Int = 1): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0 (got $rounds)")
    var v = vocab
    for (_ <- 1 to rounds) {
      // the quantized checkpoint: micro-log-prob integers
      val lq: Map[String, Long] = v
        .select(col("piece"), round(col("logp") * 1e6, 0).cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val segU = udf((w: String) => viterbiSegmentQ(w, lq, maxPieceLen))
      val usage = words.filter(length(col("word")) > 0)
        .select(col("cnt"), explode(segU(col("word"))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("ucnt"))
        .localCheckpoint() // vocab-sized; two consumers below
      val merged = v.filter(length(col("piece")) === 1).select(col("piece"))
        .join(usage, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("ucnt"), lit(1L)).as("pcnt"))
        .unionByName(usage.filter(length(col("piece")) > 1)
          .select(col("piece"), col("ucnt").as("pcnt")))
        .localCheckpoint() // total + result
      val total = merged.agg(sum(col("pcnt"))).head().getLong(0)
      v = merged.withColumn("logp",
        log(col("pcnt").cast("double") / lit(total).cast("double")))
    }
    v
  }

  /** [[viterbiSegment]] over integer micro-log-prob scores — the EM
    * rounds' exact-arithmetic DP. Same recurrence, same (score desc,
    * fewer pieces, earliest split) tie order, Long path sums.
    */
  def viterbiSegmentQ(word: String, lq: Map[String, Long],
                      maxPieceLen: Int): Seq[String] = {
    val L = word.length
    if (L == 0) return Seq.empty
    val NegInf = Long.MinValue / 4 // headroom: sums of per-piece scores never underflow
    val best = Array.fill(L + 1)(NegInf)
    val nPieces = Array.fill(L + 1)(Int.MaxValue)
    val back = Array.fill(L + 1)(-1)
    best(0) = 0L
    nPieces(0) = 0
    back(0) = 0
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != NegInf) {
          lq.get(word.substring(j, i)) match {
            case Some(s) =>
              val cand = best(j) + s
              val np = nPieces(j) + 1
              if (cand > best(i) || (cand == best(i) && np < nPieces(i))) {
                best(i) = cand
                nPieces(i) = np
                back(i) = j
              }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(L) == NegInf) Seq.empty
    else {
      val rev = scala.collection.mutable.ListBuffer.empty[String]
      var i2 = L
      while (i2 > 0) { rev.prepend(word.substring(back(i2), i2)); i2 = back(i2) }
      rev.toList
    }
  }

  /** Collect the vocab relation to the broadcastable score map — bounded
    * by the configured vocabulary size (SentencePiece vocabs are
    * megabytes at production scale; the reference's own tokenizer ships
    * in-process the same way).
    */
  def vocabMap(vocab: DataFrame): Map[String, Double] =
    vocab.select(col("piece"), col("logp")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Maximum-likelihood segmentation of one word: `(nPieces, logp)`.
    * DP over end positions; candidates at each position are compared
    * by (path logp desc, piece count asc, earliest split) — the pinned
    * total order the oracle replays. Every single char is in the vocab
    * by construction, so the DP never strands (a char absent from the
    * vocab means the word was not in the training corpus — those score
    * -inf and are reported as OOV by the caller).
    */
  def viterbi(word: String, logp: Map[String, Double],
              maxPieceLen: Int): (Int, Double) = {
    val (best, nPieces, _) = viterbiTables(word, logp, maxPieceLen)
    val L = word.length
    if (best(L) == Double.NegativeInfinity) (0, Double.NegativeInfinity)
    else (nPieces(L), best(L))
  }

  /** The max-likelihood piece sequence itself (tokenizer output):
    * backpointer walk over the same DP — empty for OOV words.
    */
  def viterbiSegment(word: String, logp: Map[String, Double],
                     maxPieceLen: Int): Seq[String] = {
    val (best, _, back) = viterbiTables(word, logp, maxPieceLen)
    val L = word.length
    if (L == 0 || best(L) == Double.NegativeInfinity) Seq.empty
    else {
      val rev = scala.collection.mutable.ListBuffer.empty[String]
      var i = L
      while (i > 0) { rev.prepend(word.substring(back(i), i)); i = back(i) }
      rev.toList
    }
  }

  private def viterbiTables(word: String, logp: Map[String, Double],
                            maxPieceLen: Int): (Array[Double], Array[Int], Array[Int]) = {
    val L = word.length
    val best = Array.fill(L + 1)(Double.NegativeInfinity)
    val nPieces = Array.fill(L + 1)(Int.MaxValue)
    val back = Array.fill(L + 1)(-1)
    best(0) = 0.0
    nPieces(0) = 0
    back(0) = 0
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          logp.get(word.substring(j, i)) match {
            case Some(lp) =>
              val cand = best(j) + lp
              val np = nPieces(j) + 1
              if (cand > best(i) || (cand == best(i) && np < nPieces(i))) {
                best(i) = cand
                nPieces(i) = np
                back(i) = j
              }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    (best, nPieces, back)
  }

  /** Tokenizer-apply over the corpus vocabulary: one row per DISTINCT
    * word with its max-likelihood segmentation — what ships as the
    * word→pieces table a training run's data loader consumes. Segmentations
    * are space-joined (pieces contain no whitespace by construction:
    * they are substrings of whitespace tokens).
    */
  def encodeWords(docs: DataFrame, textCol: String,
                  vocab: Map[String, Double],
                  maxPieceLen: Int = 4): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    val seg = udf((w: String) =>
      viterbiSegment(w, vocab, maxPieceLen).mkString(" "))
    docs
      .select(explode(
        filter(TextAnalysis.tokens(coalesce(col(textCol), lit(""))),
          t => length(t) > 0)).as("word"))
      .distinct()
      .withColumn("segmentation", seg(col("word")))
      .withColumn("n_pieces",
        when(length(col("segmentation")) > 0,
          size(split(col("segmentation"), " "))).otherwise(0).cast("long"))
  }

  /** Per-document segmentation stats under a learned vocabulary:
    * `(idCol, n_words, n_pieces, logp, pieces_per_word_micros)` — subword
    * fertility and corpus likelihood, the panel that drives tokenizer
    * selection for a training run.
    *
    * Scale shape: Viterbi runs once per DISTINCT word (the
    * [[Bpe.encodeStats]] trick — vocabulary-sized work, broadcast
    * scores); the word→stats table broadcasts into the per-document
    * join, so corpus rows never shuffle to be measured; the per-doc
    * log-likelihood folds position-ascending (collect + sort +
    * sequential aggregate — bit-identical cross-engine); `n_pieces` is
    * an integer sum (order-free). Words containing characters unseen at
    * vocab time (impossible when scored on the training corpus itself)
    * are dropped from the panel with their documents' OOV count
    * reported — never silently scored.
    */
  def segmentStats(docs: DataFrame, idCol: String, textCol: String,
                   vocab: Map[String, Double],
                   maxPieceLen: Int = 4,
                   broadcastWords: Boolean = true): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    val vit = udf((w: String) => {
      val (np, lp) = viterbi(w, vocab, maxPieceLen)
      (np, lp)
    })
    val toks = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(coalesce(col(textCol), lit("")))))
      .toDF(idCol, "__pos", "__word")
      .filter(length(col("__word")) > 0)
    val wordStats = toks.select(col("__word")).distinct()
      .withColumn("__s", vit(col("__word")))
      .select(col("__word"), col("__s._1").as("__np"),
        col("__s._2").as("__lp"))
    // the distinct-word relation is vocabulary-sized, not corpus-sized,
    // but a web-scale corpus still grows it past the broadcast budget —
    // flip broadcastWords off to join SHUFFLE_HASH (hot words stay off
    // the sort path either way)
    val wordSide = if (broadcastWords) broadcast(wordStats)
                   else wordStats.hint("SHUFFLE_HASH")
    toks.join(wordSide, Seq("__word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("__lp") === Double.NegativeInfinity, 1L).otherwise(0L))
          .as("n_oov_words"),
        sum(when(col("__lp") =!= Double.NegativeInfinity, col("__np"))
          .otherwise(0L)).cast("long").as("n_pieces"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("__pos"),
              when(col("__lp") =!= Double.NegativeInfinity, col("__lp"))
                .otherwise(lit(0.0d)).as("lp")))),
            x => x("lp")),
          lit(0.0d), (acc, x) => acc + x).as("__logp"))
      .select(col(idCol), col("n_words"), col("n_oov_words"), col("n_pieces"),
        round(col("__logp"), 6).as("logp"),
        // exact-integer ratio — tie-capable at a round boundary, so it
        // leaves as the bit-identical floor pin (Tables.micros); logp
        // passes through log-space sums (measure-zero boundary)
        when(col("n_words") > col("n_oov_words"),
          graft.Tables.micros(col("n_pieces").cast("double") /
            (col("n_words") - col("n_oov_words"))))
          .otherwise(lit(0L)).as("pieces_per_word_micros"))
  }
}
