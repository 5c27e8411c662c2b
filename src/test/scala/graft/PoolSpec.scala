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
}
