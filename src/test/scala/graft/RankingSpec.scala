package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Testbed

/** Hand-computed oracle for [[Testbed.rankingMetrics]]: every metric on a
  * four-query fixture covering hits at mixed ranks, a single-relevant
  * query, a query with no qrels at all, and a relevant doc just past the
  * k cutoff. The closed forms are evaluated by hand below (log2 via
  * math.log(x)/math.log(2), the same fold order as the plan).
  */
class RankingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def lg2(x: Double): Double = math.log(x) / math.log(2)

  // run: (query, doc, rank); q6's only row sits past the k cutoff
  private lazy val run = Seq(
    ("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
    ("q2", "x", 1), ("q2", "y", 2), ("q2", "z", 3),
    ("q3", "m", 1), ("q3", "n", 2),
    ("q4", "r", 1), ("q4", "s", 2), ("q4", "t", 3), ("q4", "u", 4),
    ("q6", "zz", 4)
  ).toDF("qid", "doc", "rank")

  // qrels: q1 → {a, c, d, e}; q2 → {y} (duplicated row must collapse);
  // q3 → none; q4 → {u} but u sits at rank 4 > k; q5 has qrels but NO
  // run rows at all; q6's run rows are all past k
  private lazy val qrels = Seq(
    ("q1", "a"), ("q1", "c"), ("q1", "d"), ("q1", "e"),
    ("q2", "y"), ("q2", "y"),
    ("q4", "u"),
    ("q5", "p"), ("q6", "zz")
  ).toDF("qid", "doc")

  private lazy val out = Testbed.rankingMetrics(run, qrels, "qid", "doc", "rank", k = 3)
    .collect().map(r => r.getString(0) -> r).toMap

  test("hits at mixed ranks: every metric matches the hand computation") {
    val r = out("q1")
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L) // n_rel, hits
    assert(math.abs(r.getDouble(3) - 2.0 / 3) < 1e-12)       // precision
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-12)           // recall
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12)           // rr (hit at 1)
    val dcg = 1.0 / lg2(2) + 1.0 / lg2(4)
    val idcg = 1.0 / lg2(2) + 1.0 / lg2(3) + 1.0 / lg2(4)
    assert(math.abs(r.getDouble(6) - dcg / idcg) < 1e-12)    // ndcg
    assert(math.abs(r.getDouble(7) - (1.0 + 2.0 / 3) / 3) < 1e-12) // ap
  }

  test("single relevant doc at rank 2; duplicate qrel rows collapse") {
    val r = out("q2")
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)           // recall
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12)           // rr
    // dcg = 1/log2(3); idcg = 1 (one relevant) → ndcg = 1/log2(3)
    assert(math.abs(r.getDouble(6) - 1.0 / lg2(3)) < 1e-12)
    assert(math.abs(r.getDouble(7) - 0.5) < 1e-12)           // ap = (1/2)/1
  }

  test("no qrels → all-zero metrics, not nulls or NaN") {
    val r = out("q3")
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    (3 to 7).foreach(i => assert(r.getDouble(i) == 0.0))
  }

  test("relevant doc past the k cutoff counts as a miss") {
    val r = out("q4")
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0 &&
      r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0)
  }

  test("failed-retrieval queries emit all-zero rows instead of vanishing") {
    // q5: in qrels, retriever returned nothing; q6: retrieved, but only
    // past the k cutoff — both must drag the macro averages down
    val r5 = out("q5")
    assert(r5.getLong(1) == 1L && r5.getLong(2) == 0L)
    (3 to 7).foreach(i => assert(r5.getDouble(i) == 0.0))
    val r6 = out("q6")
    assert(r6.getLong(1) == 1L && r6.getLong(2) == 0L)
    (3 to 7).foreach(i => assert(r6.getDouble(i) == 0.0))
  }

  test("summary macro-averages every metric over the run's queries") {
    val m = Testbed.rankingMetrics(run, qrels, "qid", "doc", "rank", k = 3)
    val s = Testbed.rankingSummary(m).collect()(0)
    assert(s.getLong(0) == 6L)
    val perQ = out.values.toSeq
    def mean(i: Int): Double = perQ.map(_.getDouble(i)).sum / perQ.size
    assert(math.abs(s.getDouble(2) - mean(4)) < 1e-12) // mean_recall
    assert(math.abs(s.getDouble(3) - mean(5)) < 1e-12) // mrr
    assert(math.abs(s.getDouble(4) - mean(6)) < 1e-12) // mean_ndcg
    assert(math.abs(s.getDouble(5) - mean(7)) < 1e-12) // map
  }

  test("bleu: hand-computed precisions, brevity penalty, clipping, degenerate rows") {
    val pairs = Seq(
      (1L, "the cat sat", "the cat sat"),                  // identical
      (2L, "the cat sat", "the cat sat on the mat"),       // short cand: BP
      (3L, "the the the the", "the cat"),                  // clipping → p2 = 0
      (4L, "", "the cat"),                                 // empty cand
      (5L, "dog", "the cat")                               // 1 token: no bigrams
    ).toDF("id", "cand", "ref")
    val out = Testbed.bleu(pairs, "id", "cand", "ref", maxN = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(1L) == ((3L, 3L, 1.0, 1.0, 1.0)))
    val b2 = out(2L)
    assert(b2._3 == 1.0 && b2._4 == 1.0)
    assert(math.abs(b2._5 - math.exp(1.0 - 6.0 / 3)) < 1e-12)  // BP = e^-1
    val b3 = out(3L)
    assert(b3._3 == 0.25 && b3._4 == 0.0 && b3._5 == 0.0)      // clip(the)=1 of 4
    assert(out(4L) == ((0L, 2L, 0.0, 0.0, 0.0)))
    val b5 = out(5L)
    assert(b5._3 == 0.0 && b5._4 == 0.0 && b5._5 == 0.0)       // dog unseen
  }

  test("rougeN: hand-computed recall/precision/F1 incl. degenerate rows") {
    val pairs = Seq(
      (1L, "the cat sat", "the cat sat on the mat"), // cand bigrams ⊆ ref
      (2L, "the the the", "the cat"),                // clip: overlap 0 bigrams
      (3L, "", "the cat"),                           // empty cand
      (4L, "a b", "")                                // empty ref
    ).toDF("id", "cand", "ref")
    val out = Testbed.rougeN(pairs, "id", "cand", "ref", n = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // 1: cand {the cat, cat sat} both in ref (5 ref bigrams):
    //    p = 2/2, r = 2/5, f1 = 2·1·0.4/1.4
    val b1 = out(1L)
    assert(b1._1 == 2L && b1._2 == 5L && b1._3 == 2L)
    assert(b1._4 == 1.0 && b1._5 == 0.4)
    assert(math.abs(b1._6 - 2.0 * 1.0 * 0.4 / 1.4) < 1e-12)
    // 2: cand {the the ×2}, ref {the cat} → overlap 0, all rates 0
    assert(out(2L) == ((2L, 1L, 0L, 0.0, 0.0, 0.0)))
    assert(out(3L) == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
    assert(out(4L) == ((1L, 0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("chrF: hand-computed per-order F2, whitespace stripped, degenerate rows") {
    val pairs = Seq(
      (1L, "ab cd", "abcd"),   // identical after stripping → chrF = 1
      (2L, "ab", "zz"),        // zero overlap at every order
      (3L, "", "abc")          // empty candidate
    ).toDF("id", "cand", "ref")
    val out = Testbed.chrF(pairs, "id", "cand", "ref", maxN = 2, beta = 2.0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // 1: stripped both "abcd": P=R=1 at both orders → F=1, chrF=1
    assert(out(1L) == ((4L, 4L, 1.0)))
    assert(out(2L) == ((2L, 2L, 0.0)))
    assert(out(3L) == ((0L, 3L, 0.0)))
    // asymmetric: cand "ab", ref "abab": order1 P=1, R=2/4; order2
    // cand {ab} clip 1 of 1, ref {ab,ba,ab} → R=1/3
    val a = Testbed.chrF(Seq((9L, "ab", "abab")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2, beta = 2.0).collect()(0).getDouble(3)
    def f2(p: Double, r: Double) = 5.0 * p * r / (4.0 * p + r)
    assert(math.abs(a - (f2(1.0, 0.5) + f2(1.0, 1.0 / 3)) / 2) < 1e-12)
  }

  test("partitioning invariance: 1-partition and 7-partition inputs agree") {
    val a = Testbed.rankingMetrics(run.repartition(1), qrels.repartition(7),
      "qid", "doc", "rank", k = 3).orderBy("qid").collect().toSeq
    val b = Testbed.rankingMetrics(run.repartition(7), qrels.repartition(1),
      "qid", "doc", "rank", k = 3).orderBy("qid").collect().toSeq
    assert(a == b)
  }
}
