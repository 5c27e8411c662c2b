package graft

import org.apache.spark.sql.functions.{length, max}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bpe, Unigram}

/** Unigram-LM tokenizer: vocabulary learning, Viterbi segmentation
  * (max-likelihood path, pinned tie rules, OOV), per-doc stats.
  */
class UnigramSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("viterbi: picks the max-likelihood split, not the greedy one") {
    // greedy longest-match would take 'ab' + stranded 'c' (-1.0 -4.0 = -5.0);
    // best is 'a' + 'bc' (-2.0 - 1.5 = -3.5)
    val v = Map("a" -> -2.0, "b" -> -3.0, "c" -> -4.0, "ab" -> -1.0, "bc" -> -1.5)
    assert(Unigram.viterbi("abc", v, 4) == ((2, -3.5)))
    // single pieces
    assert(Unigram.viterbi("a", v, 4) == ((1, -2.0)))
    assert(Unigram.viterbi("ab", v, 4) == ((1, -1.0)))
  }

  test("viterbi: equal-likelihood paths resolve to fewer pieces") {
    // 'aa' via piece 'aa' (-2.0) ties 'a'+'a' (-1.0 + -1.0): fewer pieces wins
    val v = Map("a" -> -1.0, "aa" -> -2.0)
    assert(Unigram.viterbi("aa", v, 4) == ((1, -2.0)))
  }

  test("viterbi: maxPieceLen bounds the lookback; OOV chars score -inf") {
    val v = Map("a" -> -1.0, "aaaa" -> -0.5)
    // maxPieceLen 2: the 4-char piece is unreachable
    assert(Unigram.viterbi("aaaa", v, 2) == ((4, -4.0)))
    assert(Unigram.viterbi("aaaa", v, 4) == ((1, -0.5)))
    val (np, lp) = Unigram.viterbi("ax", v, 4) // 'x' not in vocab
    assert(np == 0 && lp == Double.NegativeInfinity)
  }

  test("learnVocab: all single chars kept, multi-char cut at (count desc, piece asc)") {
    val words = Seq(("abab", 10L), ("cd", 1L)).toDF("word", "cnt")
    val vocab = Unigram.learnVocab(words, maxPieceLen = 2, vocabSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // chars: a,b appear 20x each in 'abab'(2 each x10), c,d 1x
    assert(vocab("a") == 20L && vocab("b") == 20L && vocab("c") == 1L && vocab("d") == 1L)
    // 2-grams of 'abab': ab(2x10=20), ba(10); 'cd': cd(1). top-2 = ab, ba
    assert(vocab.contains("ab") && vocab.contains("ba") && !vocab.contains("cd"))
    assert(vocab.size == 6)
  }

  test("emRefine: usage recount prunes unused multi pieces, chars survive with a floor, 0 rounds is identity") {
    val words = Seq(("abab", 10L), ("cd", 1L)).toDF("word", "cnt")
    val seed = Unigram.learnVocab(words, maxPieceLen = 2, vocabSize = 2)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // rounds = 0 returns the seed relation untouched
    assert(asMap(Unigram.emRefine(words, seed, maxPieceLen = 2, rounds = 0)) ==
      asMap(seed))
    val r1 = asMap(Unigram.emRefine(words, seed, maxPieceLen = 2, rounds = 1))
    // Viterbi under the seed scores segments 'abab' as [ab, ab] (the
    // 2-piece path beats any char path) and 'cd' as [c, d]:
    // usage ab = 20, c = 1, d = 1; 'ba' is never used -> PRUNED;
    // chars a, b route around -> floor 1
    assert(!r1.contains("ba"), s"unused multi piece must prune: $r1")
    assert(r1("ab")._1 == 20L)
    assert(r1("a")._1 == 1L && r1("b")._1 == 1L, "unused chars keep the floor")
    assert(r1("c")._1 == 1L && r1("d")._1 == 1L)
    // scores renormalize over the refined totals (24)
    assert(math.abs(r1("ab")._2 - math.log(20.0 / 24.0)) < 1e-12)
    // a second round is stable here (the segmentations cannot change:
    // 'ab' only got MORE likely relative to chars)
    val r2 = asMap(Unigram.emRefine(words, seed, maxPieceLen = 2, rounds = 2))
    assert(r2.keySet == r1.keySet && r2("ab")._1 == 20L)
    // quantized-checkpoint DP: Long scores, same tie rules as the float DP
    val lq = Map("a" -> -1000000L, "aa" -> -2000000L)
    assert(Unigram.viterbiSegmentQ("aa", lq, 4) == Seq("aa"),
      "equal path scores resolve to fewer pieces")
    assert(Unigram.viterbiSegmentQ("ax", lq, 4).isEmpty, "OOV chars strand to empty")
  }

  test("segmentStats: per-doc fertility over distinct-word Viterbi") {
    val docs = Seq((1L, "abab abab cd"), (2L, "cd")).toDF("doc_id", "text")
    val vocab = Unigram.vocabMap(
      Unigram.learnVocab(Bpe.wordCounts(docs, "text"), 2, vocabSize = 4))
    val got = Unigram.segmentStats(docs, "doc_id", "text", vocab, 2)
      .orderBy($"doc_id").collect()
    // 'abab' -> ab+ab (2 pieces); 'cd' -> ... depends on learned scores, but
    // counts are structural: doc 1 has 3 words, doc 2 has 1
    assert(got(0).getLong(1) == 3L && got(1).getLong(1) == 1L)
    assert(got(0).getLong(2) == 0L) // no OOV when scored on the training corpus
    assert(got(0).getLong(3) >= 2L + 2L + 1L) // at least the piece minimum
    // doc 2's single word must match the distinct-word Viterbi directly
    val (npCd, lpCd) = Unigram.viterbi("cd", vocab, 2)
    assert(got(1).getLong(3) == npCd.toLong)
    assert(got(1).getDouble(4) ==
      BigDecimal(lpCd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the SHUFFLE_HASH word-join fallback is bit-identical
    val sh = Unigram.segmentStats(docs, "doc_id", "text", vocab, 2,
      broadcastWords = false).orderBy($"doc_id").collect()
    assert(sh.toSeq == got.toSeq)
  }

  test("viterbiSegment: pieces concatenate to the word, count matches the DP") {
    val v = Map("a" -> -2.0, "b" -> -3.0, "c" -> -4.0, "ab" -> -1.0, "bc" -> -1.5)
    assert(Unigram.viterbiSegment("abc", v, 4) == Seq("a", "bc"))
    assert(Unigram.viterbiSegment("ab", v, 4) == Seq("ab"))
    assert(Unigram.viterbiSegment("ax", v, 4).isEmpty) // OOV
    assert(Unigram.viterbiSegment("", v, 4).isEmpty)
    // structural invariants on a larger random-ish word
    val w = "abcabcbab"
    val seg = Unigram.viterbiSegment(w, v, 4)
    assert(seg.mkString("") == w)
    assert(seg.length == Unigram.viterbi(w, v, 4)._1)
  }

  test("encodeWords: one row per distinct word, segmentation rebuilds the word") {
    val docs = Seq((1L, "abc ab abc"), (2L, "ab")).toDF("doc_id", "text")
    val v = Map("a" -> -2.0, "b" -> -3.0, "c" -> -4.0, "ab" -> -1.0, "bc" -> -1.5)
    val got = Unigram.encodeWords(docs, "text", v, 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("abc", "a bc", 2L), ("ab", "ab", 1L)))
  }

  test("EM oracle unroll bound covers the fixtures with headroom, guard is loud") {
    // the EM oracle's DP is position-unrolled to MaxOracleWordLen CTEs;
    // the ENGINE is unbounded, so the only failure mode is losing
    // oracle coverage. Pin (a) the guard is actually in the emitted
    // SQL and (b) every committed fixture's longest token sits at
    // <= half the unroll, so corpus growth trips this test before it
    // trips the DuckDB error().
    val bound = graft.queries.TextQueries.MaxOracleWordLen
    Seq("unigram_em_vocab", "unigram_em2_vocab").foreach { q =>
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains(s"max(len(word)) > $bound"), s"$q guard missing")
      assert(sql.contains("error("), s"$q guard must be loud")
      // the unroll really is `bound` positions deep (round-1 DP steps)
      (1 to bound).foreach(i => assert(sql.contains(s"s1_$i AS MATERIALIZED")))
      assert(!sql.contains(s"s1_${bound + 1} "))
    }
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val docs = Tables.documents(spark, d)
      val maxLen = graft.ops.Bpe.wordCounts(docs, "text")
        .agg(max(length($"word"))).head().getInt(0)
      assert(maxLen * 2 <= bound,
        s"$d max word length $maxLen leaves < 2x headroom under $bound — " +
          "raise MaxOracleWordLen before the fixture outgrows the oracle")
    }
  }
}
