package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pool

/** Embedding mean-pooling: element-wise mean, unit-norm contract,
  * null handling, and the zero-vector guard.
  */
class PoolSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("meanPool: element-wise mean then unit norm") {
    val df = Seq(
      (1, Array(1f, 0f)), (1, Array(0f, 1f)),
      (2, Array(2f, 0f))).toDF("k", "emb")
    val got = Pool.meanPool(df, "k", "emb", dim = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toList
      .sortBy(_._1)
    // group 1: mean (0.5, 0.5) → unit (1/√2, 1/√2); group 2: (2,0) → (1,0)
    val s = 1.0 / math.sqrt(2.0)
    assert(got.map(t => (t._1, t._2)) == List((1, 2L), (2, 1L)))
    assert(got.head._3.zip(Seq(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(got(1)._3 == Seq(1.0, 0.0))
  }

  test("meanPool: null embeddings excluded, zero mean left unnormalized") {
    val df = Seq(
      (1, Array(1f, -1f)), (1, Array(-1f, 1f)),
      (1, null.asInstanceOf[Array[Float]])).toDF("k", "emb")
    val got = Pool.meanPool(df, "k", "emb", dim = 2).collect().head
    assert(got.getLong(1) == 2L) // the null row never counts
    assert(got.getSeq[Double](2) == Seq(0.0, 0.0)) // zero mean: no 0/0
    val raw = Pool.meanPool(df, "k", "emb", dim = 2, unitNorm = false)
      .collect().head
    assert(raw.getSeq[Double](2) == Seq(0.0, 0.0))
  }

  test("sifEmbed: rare terms outweigh frequent ones; vectors are md5 signs") {
    // 'the' appears 8×, 'rare' once → weight(rare) > weight(the)
    val df = Seq(
      (1L, "the the the the rare"),
      (2L, "the the the the")).toDF("doc_id", "text")
    val out = Pool.sifEmbed(df, "doc_id", "text", dim = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 5L && out(2L).getLong(1) == 4L)
    // replay the construction by hand for doc 2 (only 'the'): T=9,
    // cnt(the)=8 → w = 9/(9+8000); component d = ±w per md5 parity
    val t = 9.0
    val w = t / (t + 8000.0)
    def sign(term: String, d: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sif:$term:$d".getBytes("UTF-8"))
      val nibble = (md(0) >> 4) & 0xf
      if (nibble % 2 == 0) 1.0 else -1.0
    }
    // fold sequentially exactly as the engine does (repeated addition,
    // not one multiply — last-ulp identity is the contract under test)
    def fold(contribs: Seq[Double]): Double = {
      val s = contribs.foldLeft(0.0)(_ + _)
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0 until 4).foreach { d =>
      val c = w * sign("the", d)
      assert(out(2L).getDouble(2 + d) == fold(Seq(c, c, c, c)), s"dim $d")
    }
    // doc 1 appends the rare token's contribution to the same prefix
    val wr = t / (t + 1000.0)
    (0 until 4).foreach { d =>
      val c = w * sign("the", d)
      val expect = fold(Seq(c, c, c, c, wr * sign("rare", d)))
      assert(out(1L).getDouble(2 + d) == expect, s"dim $d")
    }
  }

  test("sifEmbed: null/empty text drops out; broadcastVocab off is identical") {
    val df = Seq((1L, "a b a"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val bc = Pool.sifEmbed(df, "doc_id", "text", dim = 2).collect()
    assert(bc.map(_.getLong(0)).toSet == Set(1L)) // 2 and 3 have no tokens
    val sh = Pool.sifEmbed(df, "doc_id", "text", dim = 2, broadcastVocab = false)
    assert(sh.collect().toSeq == bc.toSeq)
  }
}
