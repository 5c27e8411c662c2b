package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Testbed

/** ROUGE-L's bit-parallel LCS against a reference DP implementation,
  * plus the degenerate-side and truncation contracts.
  */
class RougeLSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def lcsDp(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  test("rougeL: bit-parallel LCS equals the classic DP on random token pairs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rows = (1L to 60L).map { i =>
      val cand = Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
      val ref = Seq.fill(rnd.nextInt(55))(vocab(rnd.nextInt(vocab.size)))
      (i, cand.mkString(" "), ref.mkString(" "), lcsDp(ref, cand))
    }
    val got = Testbed.rougeL(
        rows.map(t => (t._1, t._2, t._3)).toDF("id", "cand", "ref"),
        "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { case (id, _, _, want) =>
      assert(got(id) == want.toLong, s"pair $id")
    }
  }

  test("rougeL: empty/null sides report zeros; reference truncates at maxRef") {
    val got = Testbed.rougeL(Seq(
        (1L, "", "a b c"), (2L, null.asInstanceOf[String], "a b"),
        (3L, "a b", ""), (4L, "x y", null.asInstanceOf[String]))
        .toDF("id", "cand", "ref"), "id", "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6)))).toMap
    assert(got(1L) == ((0L, 3L, 0L, 0.0)))
    assert(got(2L) == ((0L, 2L, 0L, 0.0)))
    assert(got(3L) == ((2L, 0L, 0L, 0.0)))
    assert(got(4L) == ((2L, 0L, 0L, 0.0)))
    // a match past position maxRef of the reference cannot count
    val far = ("z " * 70).trim
    val t = Testbed.rougeL(Seq((1L, "z", far)).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxRef = 3).collect().head
    assert(t.getLong(2) == 3L && t.getLong(3) == 1L) // truncated ref, match inside
    val miss = Testbed.rougeL(
      Seq((1L, "q", "a b c q")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxRef = 3).collect().head
    assert(miss.getLong(3) == 0L, "match beyond the truncation must not count")
  }

  test("rougeL: identical texts score perfect F1") {
    val r = Testbed.rougeL(Seq((1L, "a b c d", "a b c d"))
        .toDF("id", "cand", "ref"), "id", "cand", "ref")
      .collect().head
    assert(r.getLong(3) == 4L && r.getDouble(6) == 1.0)
  }
}
