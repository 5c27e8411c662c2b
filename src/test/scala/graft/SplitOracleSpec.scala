package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Split

/** Guards for the exact split oracles (split_recursive /
  * split_token_pack): their DuckDB side re-derives chunk boundaries
  * from single-space word arithmetic, so the query entries restrict
  * both engines to documents where that arithmetic is exact. These
  * tests pin the two facts the oracles lean on: the restriction is a
  * no-op on the shipped corpus (every document participates), and the
  * engine's splitter output on such documents is exactly the
  * closed-form the oracle computes.
  */
class SplitOracleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def singleSpacePredicateKeepsAll(dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    val kept = docs
      .filter(length($"text") > 0)
      .filter(!$"text".rlike("[\\n\\t\\r]|  |^ | $"))
      .filter(array_max(transform(split($"text", " "), w => length(w))) <= 60)
      .count()
    assert(kept == docs.count(),
      s"corpus shape changed under $dir: the split oracles' single-space " +
        "precondition no longer covers every document — re-derive the oracles")
  }

  test("single-space precondition covers the whole corpus (sf0.001 and sf0.01)") {
    singleSpacePredicateKeepsAll("/root/testdata/sf0.001")
    singleSpacePredicateKeepsAll("/root/testdata/sf0.01")
  }

  test("recursive splitter on single-space text = greedy packing over word atoms") {
    // hand-computable fixture: words of len 4 (atom = 5 with trailing
    // space), size 12, overlap 6 — chunk 1 packs atoms 0-1 (chars 0-10),
    // overlap re-enters at atom 1 (end 10 - start 5 = 5 <= 6)
    val text = "aaaa bbbb cccc dddd"
    val got = Split.recursive(text, size = 12, overlap = 6, seps = Seq(" "))
    assert(got.map(c => (c.idx, c.start, c.text)) == Seq(
      (0, 0, "aaaa bbbb "),
      (1, 5, "bbbb cccc "),
      (2, 10, "cccc dddd")))
  }

  test("token pack on single-space text = greedy packing over BPE costs") {
    // "the" -> th+e -> the (1 token); "qu" -> qu (1); "rest" -> r+e+s+t
    // -> re+st (2). Budget 3: chunk 0 = [the qu] (adding rest exceeds);
    // overlap 1 re-admits qu (cost 1), so chunk 1 = [qu rest]; rest
    // (cost 2) exceeds the carry budget, chunk 2 restarts at word 3.
    val text = "the qu rest the qu"
    val got = Split.tokenPack(text, maxTokens = 3, overlapTokens = 1,
      tokenizer = Split.BpeTokenizer)
    assert(Split.BpeTokenizer.count("the") == 1)
    assert(Split.BpeTokenizer.count("qu") == 1)
    assert(Split.BpeTokenizer.count("rest") == 2)
    assert(got.map(c => (c.idx, c.start, c.text)) == Seq(
      (0, 0, "the qu"),
      (1, 4, "qu rest"),
      (2, 12, "the qu")))
  }
}
