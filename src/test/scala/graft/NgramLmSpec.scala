package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NgramLm

/** Hand-computed Stupid Backoff scores over a two-sentence count corpus:
  * counts — a:2 b:2 c:1 d:1 (N=6); "a b":2 "b c":1 "b d":1; "a b c":1
  * "a b d":1.
  */
class NgramLmSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val counts = NgramLm.gramCounts(
    Seq("a b c", "a b d").toDF("text"), "text", maxN = 3).cache()

  private def score(texts: (Long, String)*): Map[Long, (Long, Long, Option[Double])] =
    NgramLm.scoreStupidBackoff(texts.toDF("doc_id", "text"), "doc_id", "text", counts)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap

  test("gramCounts: exact per-order counts, space-joined grams") {
    val got = counts.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (1, "a") -> 2L, (1, "b") -> 2L, (1, "c") -> 1L, (1, "d") -> 1L,
      (2, "a b") -> 2L, (2, "b c") -> 1L, (2, "b d") -> 1L,
      (3, "a b c") -> 1L, (3, "a b d") -> 1L))
  }

  test("fully-seen document: unigram start, bigram second, trigram rest") {
    val (n, z, lp) = score((1L, "a b c"))(1L)
    assert(n == 3L && z == 0L)
    val want = math.log(2.0 / 6) + math.log(2.0 / 2) + math.log(1.0 / 2)
    assert(math.abs(lp.get - want) < 1e-12)
  }

  test("OOV token zeroes through the whole backoff chain and is counted") {
    val (n, z, lp) = score((1L, "a b z"))(1L)
    assert(n == 3L && z == 1L)
    val want = math.log(2.0 / 6) + math.log(2.0 / 2) // z contributes nothing
    assert(math.abs(lp.get - want) < 1e-12)
  }

  test("unseen context backs off with the alpha penalty at each level") {
    val (n, z, lp) = score((1L, "c a b"))(1L)
    assert(n == 3L && z == 0L)
    // i=1 'c': 1/6; i=2 'c a' unseen → 0.4·(2/6); i=3 'c a b' unseen,
    // bigram 'a b' seen → 0.4·(2/2)
    val want = math.log(1.0 / 6) + math.log(0.4 * (2.0 / 6)) + math.log(0.4 * (2.0 / 2))
    assert(math.abs(lp.get - want) < 1e-12)
  }

  test("all-OOV document: zero positive scores → null logprob, full zero count") {
    val (n, z, lp) = score((1L, "x y"))(1L)
    assert(n == 2L && z == 2L && lp.isEmpty)
  }

  test("empty and whitespace-only documents emit no row") {
    assert(score((1L, ""), (2L, "   "), (3L, "a")).keySet == Set(3L))
  }

  test("partitioning invariance") {
    val df = Seq((1L, "a b c"), (2L, "c a b"), (3L, "a b z")).toDF("doc_id", "text")
    val a = NgramLm.scoreStupidBackoff(df.repartition(7), "doc_id", "text", counts)
      .orderBy("doc_id").collect().toSeq
    val b = NgramLm.scoreStupidBackoff(df.repartition(1), "doc_id", "text", counts)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
