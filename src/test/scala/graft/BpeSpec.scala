package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** [[Bpe]] against a naive in-memory reference implementation of
  * Sennrich-style BPE (overlapping pair counts, argmax with (count desc,
  * pair asc) tiebreak, left-to-right non-overlapping merge application).
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def refApply(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def refLearn(words: Map[String, Long], n: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var st: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to n if !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, syms) <- st; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
        learned += ((a, b, c))
        st = st.map { case (w, syms) => w -> refApply(syms, a, b) }
      }
    }
    (learned.toSeq, st)
  }

  private val fixture = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L, "aaaa" -> 1L)
  private def fixtureDf = fixture.toSeq.toDF("word", "cnt")

  test("learnMerges matches the naive reference, merge by merge and symbol by symbol") {
    val (refMerges, refState) = refLearn(fixture, 5)
    val (merges, syms) = Bpe.learnMerges(fixtureDf, nMerges = 5)
    assert(merges.map(m => (m.a, m.b, m.freq)) == refMerges)
    assert(merges.map(_.iteration) == (1 to merges.size))
    val got = syms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    assert(got == refState)
  }

  test("overlapping runs merge left-to-right non-overlapping") {
    val (merges, syms) = Bpe.learnMerges(Seq(("aaa", 7L)).toDF("word", "cnt"), 1)
    // pair (a,a) counted twice per occurrence (overlapping), weight 7 each
    assert(merges == Seq(Bpe.Merge(1, "a", "a", 14L)))
    assert(syms.collect()(0).getSeq[String](2) == Seq("aa", "a"))
  }

  test("exhaustion: fewer learnable merges than requested stops early") {
    val (merges, syms) = Bpe.learnMerges(Seq(("ab", 3L)).toDF("word", "cnt"), 3)
    assert(merges == Seq(Bpe.Merge(1, "a", "b", 3L)))
    assert(syms.collect()(0).getSeq[String](2) == Seq("ab"))
  }

  test("segment applies a learned merge table in order to new words") {
    val (merges, _) = Bpe.learnMerges(fixtureDf, nMerges = 4)
    val newWords = Seq("lowest", "wider", "aaaaa").toDF("word")
    val got = Bpe.segment(newWords, "word", merges, checkpointEvery = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val want = Seq("lowest", "wider", "aaaaa").map { w =>
      w -> merges.foldLeft(w.map(_.toString).toVector) { (s, m) => refApply(s, m.a, m.b) }
    }.toMap
    assert(got == want)
  }

  test("segment: empty and null words become empty symbol arrays, not [\"\",\"\"]") {
    val (merges, _) = Bpe.learnMerges(fixtureDf, 1)
    val got = Bpe.segment(
        Seq(Some(""), Option.empty[String], Some("ab")).toDF("word"),
        "word", merges)
      .collect().map(r => Option(r.getString(0)) -> r.getSeq[String](1).toVector)
      .toMap
    assert(got(Some("")) == Vector.empty)
    assert(got(None) == Vector.empty)
    assert(got(Some("ab")).mkString == "ab")
  }

  test("wordCounts: whitespace words, exact occurrence counts, empty tokens dropped") {
    val docs = Seq((1L, "x y  y"), (2L, "  "), (3L, "y")).toDF("doc_id", "text")
    val got = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 1L, "y" -> 3L))
  }
}
