package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Contrastive

class ContrastiveSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // anchor 1 (label A) at the x-axis; corpus: same-label near and far,
  // wrong-label at decreasing similarity, and a null-label near-dup
  private lazy val anchors = Seq(
    (1L, Seq(1f, 0f), Some("A"))
  ).toDF("qid", "qemb", "qlabel")
  private lazy val corpus = Seq(
    (10L, Seq(0.9f, 0.1f), Some("A")),  // positive, nearest
    (11L, Seq(0.5f, 0.5f), Some("A")),  // positive, farther
    (20L, Seq(0.95f, 0.05f), Some("B")), // hardest negative
    (21L, Seq(0.6f, 0.4f), Some("B")),   // second negative
    (22L, Seq(0f, 1f), Some("C")),       // easy negative
    (30L, Seq(1f, 0f), None: Option[String]) // null label: excluded everywhere
  ).toDF("vec_id", "embedding", "label")

  test("hard negatives: wrong-label only, similarity-ranked, null labels excluded") {
    val got = Contrastive.hardNegatives(anchors, corpus,
        "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 3)
      .orderBy($"rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 20L), (2, 21L), (3, 22L)))
  }

  test("positives: same-label only, nearest first, null labels excluded") {
    val got = Contrastive.positives(anchors, corpus,
        "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 2)
      .orderBy($"rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 10L), (2, 11L)))
  }

  test("triples: nearest positive × top-k negatives; anchors without a leg drop") {
    val got = Contrastive.triples(anchors, corpus,
        "qid", "qemb", "qlabel", "vec_id", "embedding", "label", negK = 2)
      .orderBy($"neg_rank").collect()
      .map(r => (r.getLong(r.fieldIndex("pos_id")),
        r.getInt(r.fieldIndex("neg_rank")), r.getLong(r.fieldIndex("neg_id"))))
    assert(got.toSeq == Seq((10L, 1, 20L), (10L, 2, 21L)))
    // an anchor whose label matches nothing has no positive leg → drops
    val lonely = Seq((2L, Seq(1f, 0f), Some("Z"))).toDF("qid", "qemb", "qlabel")
    assert(Contrastive.triples(lonely, corpus,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label", negK = 2).count() == 0)
  }

  test("k bounds both legs") {
    val one = Contrastive.hardNegatives(anchors, corpus,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 1)
    assert(one.count() == 1 && one.head().getLong(2) == 20L)
  }
}
