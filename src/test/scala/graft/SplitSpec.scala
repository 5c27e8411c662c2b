package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Split

/** Property tests for the splitters over seeded random corpora (hand-
  * rolled generation — deterministic across runs).
  */
class SplitSpec extends AnyFunSuite {

  private val words = Array("alpha", "beta", "gamma", "d", "epsilon", "zz")
  private val seps = Array(" ", " ", " ", "\n", "\n\n")

  private def randomTexts(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { _ =>
      val len = rnd.nextInt(60)
      (0 until len).map(_ => words(rnd.nextInt(words.length)) + seps(rnd.nextInt(seps.length)))
        .mkString.trim
    }.filter(_.nonEmpty)
  }

  test("fixedWindow: offsets stride correctly and cover the text") {
    for (t <- randomTexts(80); size <- Seq(8, 15, 30); stride <- Seq(5, 15)) {
      if (stride <= size) {
        val chunks = Split.fixedWindow(t, size, stride)
        assert(chunks.head.start == 0)
        assert(chunks.map(_.idx) == chunks.indices)
        chunks.foreach(c =>
          assert(c.text == t.substring(c.start, math.min(c.start + size, t.length))))
        assert(chunks.last.start + chunks.last.text.length == t.length)
      }
    }
  }

  test("recursive: true offsets, bounded length, forward progress, full coverage") {
    for (t <- randomTexts(80); size <- Seq(10, 24, 40); overlap <- Seq(0, 5, 9)) {
      val chunks = Split.recursive(t, size, overlap)
      assert(chunks.nonEmpty)
      chunks.foreach(c => assert(t.startsWith(c.text, c.start), s"offset mismatch at ${c.start}"))
      val maxAtom = t.split("[ \n]").map(_.length + 2).foldLeft(0)(math.max)
      chunks.foreach(c => assert(c.text.length <= math.max(size, maxAtom),
        s"chunk len ${c.text.length} > max($size, $maxAtom)"))
      chunks.sliding(2).foreach {
        case Seq(a, b) => assert(b.start > a.start, "no forward progress")
        case _         =>
      }
      assert(chunks.head.start == 0)
      assert(chunks.last.start + chunks.last.text.length == t.length)
    }
  }

  test("recursive: respects paragraph boundaries when they fit") {
    val t = "first paragraph here\n\nsecond paragraph text\n\nthird one"
    val chunks = Split.recursive(t, 25, 0)
    assert(chunks.forall(_.text.length <= 25))
    assert(chunks.head.text == "first paragraph here\n\n")
  }

  test("recursive: overlap re-serves at most `overlap` trailing chars") {
    val t = ("word " * 50).trim
    val chunks = Split.recursive(t, 20, 10)
    assert(chunks.length > 3)
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        val aEnd = a.start + a.text.length
        assert(b.start <= aEnd, "chunks must not leave gaps")
        assert(aEnd - b.start <= 10, s"overlap ${aEnd - b.start} exceeds requested 10")
      case _ =>
    }
  }

  test("explode_chunks generator matches the splitter through LATERAL VIEW SQL") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.functions.ExplodeChunks.register(spark)
    Seq((1L, "aaaa bbbb cccc dddd eeee")).toDF("doc_id", "text")
      .createOrReplaceTempView("ec_docs")
    val got = spark.sql(
      """SELECT doc_id, c.chunk_idx, c.chunk_start, c.chunk_text
        |FROM ec_docs LATERAL VIEW explode_chunks(text, 10, 8) c
        |ORDER BY chunk_idx""".stripMargin)
      .as[(Long, Int, Int, String)].collect().toSeq
    val want = graft.ops.Split.fixedWindow("aaaa bbbb cccc dddd eeee", 10, 8)
      .map(c => (1L, c.idx, c.start, c.text))
    assert(got == want)
    val rec = spark.sql(
      "SELECT c.chunk_text FROM ec_docs LATERAL VIEW explode_chunks_recursive(text, 10, 2) c")
      .as[String].collect()
    assert(rec.nonEmpty && rec.forall(_.length <= 10))
    // recursive overlap >= size must fail at analysis, not per-row at runtime
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT c.chunk_text FROM ec_docs LATERAL VIEW explode_chunks_recursive(text, 10, 10) c")
        .collect()
    }
    assert(err.getMessage.contains("overlap"), err.getMessage)
  }

  test("BPE tokenizer + tokenPack: deterministic merges, chunk token counts bounded (tiktoken mode)") {
    val bpe = Split.BpeTokenizer
    assert(bpe.tokenize("the quick brown fox") == bpe.tokenize("the quick brown fox"))
    assert(bpe.bpeWord("the").mkString == "the", "subwords must reassemble the word")
    assert(bpe.bpeWord("the").length < 3, "frequent pairs must merge below char count")
    assert(bpe.bpeWord("x") == Seq("x"))
    assert(bpe.tokenize(" ").isEmpty)
    // seeded property sweep: every chunk's measured token count <= max
    // (single oversized words excepted), offsets exact, text covered to
    // the end, and the packing is deterministic
    val rnd = new scala.util.Random(13)
    val vocab = Seq("the", "thermal", "spark", "in", "under", "tiny", "question",
      "answer", "x", "internationalization", "of", "thunder")
    for (_ <- 0 until 50) {
      val words = (0 until 1 + rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.length)))
      val text = words.mkString(" ")
      val max = 1 + rnd.nextInt(12)
      val overlap = rnd.nextInt(max)
      val chunks = Split.tokenPack(text, max, overlap)
      assert(chunks.nonEmpty)
      assert(chunks == Split.tokenPack(text, max, overlap), "deterministic")
      chunks.foreach { c =>
        assert(text.substring(c.start, c.start + c.text.length) == c.text, "offset exact")
        val n = bpe.count(c.text)
        assert(n <= max || !c.text.contains(" "),
          s"chunk '${c.text}' measures $n tokens > $max")
      }
      assert(chunks.last.start + chunks.last.text.length == text.length, "covers to the end")
      assert(chunks.map(_.idx) == chunks.indices.toSeq)
      // the carried-over region between consecutive chunks must respect
      // the overlap token budget
      chunks.sliding(2).foreach {
        case Seq(prev, next) =>
          val prevEnd = prev.start + prev.text.length
          if (next.start < prevEnd) {
            val carried = bpe.count(text.substring(next.start, prevEnd))
            assert(carried <= overlap,
              s"carried '${text.substring(next.start, prevEnd)}' = $carried tokens > overlap $overlap")
          }
        case _ =>
      }
    }
    // wired through the DataFrame splitter surface
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "the question of thermal thunder under tiny spark")).toDF("doc_id", "text")
    val got = Split.chunkDocs(df, "doc_id", "text", t => Split.tokenPack(t, 6, 2))
      .select($"chunk_text").as[String].collect()
    assert(got.nonEmpty && got.forall(c => bpe.count(c) <= 6))
  }

  test("chunkDocs assigns reference-style 1-based chunk ids") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((7L, "aaaa bbbb cccc dddd")).toDF("doc_id", "text")
    val got = Split.chunkDocs(df, "doc_id", "text", t => Split.fixedWindow(t, 10, 5))
      .select($"chunk_id").as[String].collect().toSeq
    assert(got.head == "7_1")
  }
}
