package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharNGrams, WordNGramsAll}
import graft.ops.TextAnalysis

/** The round-18 imperative gram kernels must equal the HOF compositions
  * they replaced BIT-FOR-BIT (the counting operators' statistics are the
  * gram multisets): WordNGramsAll vs transform/slice/array_join, and
  * CharNGrams vs transform/sequence/substr — over whitespace runs, empty
  * strings, null array elements, and supplementary characters.
  */
class NgramKernelSpec extends AnyFunSuite {

  private def hofWordGrams(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  private def hofCharGrams(s: org.apache.spark.sql.Column, n: Int) =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  test("wordGrams kernel == transform/slice/array_join composition, with duplicates") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq(
      "a b c d e", "a a a a", "one", "", "   ", "a  b\t c\nd",
      "x y x y x y", "\tlead tab", "trail space ", "soĺo señor",
      "emoji 😀 mid 😀 grams")
    val df = texts.toDF("t")
    for (n <- 1 to 4) {
      val toks = TextAnalysis.tokens($"t")
      val got = df.select(TextAnalysis.wordGrams(toks, n).as("g"))
        .as[Seq[String]].collect().toSeq
      val want = df.select(hofWordGrams(toks, n).as("g"))
        .as[Seq[String]].collect().toSeq
      assert(got == want, s"n=$n: $got vs $want")
    }
  }

  test("wordGrams kernel: null array elements skip like array_join") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(1).toDF("i")
      .select(array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("arr"))
    for (n <- 2 to 4) {
      val got = df.select(
          graft.functions.WordNGramsAll.wordNGramsAll($"arr", n).as("g"))
        .as[Seq[String]].collect().head
      val want = df.select(
          transform(sequence(lit(1), size($"arr") - (n - 1)),
            i => array_join(slice($"arr", i, lit(n)), " ")).as("g"))
        .as[Seq[String]].collect().head
      assert(got == want, s"n=$n: $got vs $want")
    }
  }

  test("charGrams kernel == transform/substr composition, incl. supplementary chars") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq(
      "abcdef", "aa", "a", "", "  s p ", "señor", "soĺo",
      "ab😀cd", "😀😁😂")
    val df = texts.toDF("t")
    for (n <- 1 to 3) {
      val got = df.select(TextAnalysis.charGrams($"t", n).as("g"))
        .as[Seq[String]].collect().toSeq
      val want = df.select(hofCharGrams($"t", n).as("g"))
        .as[Seq[String]].collect().toSeq
      assert(got == want, s"n=$n: $got vs $want")
    }
  }

  test("kernels guard short/null inputs exactly like the guarded compositions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, ""), (3L, "ab"))
      .toDF("id", "t")
    val g = df.select($"id",
        TextAnalysis.wordGrams(TextAnalysis.tokens($"t"), 3).as("wg"),
        TextAnalysis.charGrams($"t", 3).as("cg"))
      .orderBy($"id")
      .as[(Long, Seq[String], Seq[String])].collect()
    // null text: tokens(null) is null -> guard yields empty array
    assert(g(0)._2 == Seq.empty && g(0)._3 == Seq.empty)
    // "" tokenizes to [""] (1 token < 3) and has 2 chars < 3
    assert(g(1)._2 == Seq.empty && g(1)._3 == Seq.empty)
    assert(g(2)._2 == Seq.empty && g(2)._3 == Seq.empty)
  }
}
