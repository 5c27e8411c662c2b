package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Gazetteer

/** Aho–Corasick gazetteer matcher: the textbook automaton cases
  * (nesting, overlap, dict-suffix emission) against naive scanning.
  */
class GazetteerSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def naive(text: String, t: String): (Long, Int) = {
    val hits = (0 to text.length - t.length)
      .filter(i => text.regionMatches(i, t, 0, t.length))
    (hits.size.toLong, hits.headOption.getOrElse(-1))
  }

  test("automaton scan equals naive counting on the classic he/she/his/hers case") {
    val terms = Seq("he", "she", "his", "hers")
    val auto = Gazetteer.Automaton(terms)
    for (text <- Seq("ushers", "she sells seashells", "hehehers", "", "x")) {
      val (counts, firsts) = auto.scan(text)
      terms.zipWithIndex.foreach { case (t, i) =>
        assert((counts(i), firsts(i)) == naive(text, t),
          s"term '$t' over '$text'")
      }
    }
    // 'ushers': she@1, he@2, hers@2 — the dict-suffix closure emits ALL
    val (c, f) = auto.scan("ushers")
    assert(c.toSeq == Seq(1L, 1L, 0L, 1L) && f.toSeq == Seq(2, 1, -1, 2))
  }

  test("overlapping occurrences all count; property vs naive on random texts") {
    val auto = Gazetteer.Automaton(Seq("aa", "aba"))
    val (c, _) = auto.scan("aaaa")
    assert(c(0) == 3L, "overlapping 'aa' in 'aaaa' occurs 3 times")
    val rnd = new scala.util.Random(7)
    val terms = Seq("ab", "ba", "aab", "b", "abab")
    val a2 = Gazetteer.Automaton(terms)
    for (_ <- 0 until 50) {
      val text = (0 until rnd.nextInt(30)).map(_ => "ab" (rnd.nextInt(2))).mkString
      val (counts, firsts) = a2.scan(text)
      terms.zipWithIndex.foreach { case (t, i) =>
        assert((counts(i), firsts(i)) == naive(text, t), s"'$t' over '$text'")
      }
    }
  }

  test("matchCounts: per-(doc, term) rows, zero-hit terms absent, null text safe") {
    val df = Seq((1L, "the cat and the hat"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Gazetteer.matchCounts(df, "doc_id", "text", Seq("the", "hat", "zzz"))
      .orderBy($"doc_id", $"term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "hat", 1L, 16L), (1L, "the", 2L, 0L)))
    intercept[IllegalArgumentException] {
      Gazetteer.Automaton(Seq("a", "a"))
    }
  }

  test("gazetteer gate drives the LIVE streaming contract gate (micro-batch routing)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gazgate").toString
    // contract on the GATE's own feature column: > 2 phrase hits in any
    // surviving doc quarantines the whole micro-batch
    val rules = Seq[graft.ops.Validate.Rule](
      graft.ops.Validate.InRange("n_matches", 0.0, 2.0))
    val stored = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val gated = graft.ops.TextAnalysis.gazetteerGate(batch,
            "doc_id", "text", Seq("bad phrase"), maxPerMilleChars = 50)
          .filter(!col("drop_density"))
          .select(col("doc_id"), col("n_matches"))
        graft.streaming.IncrementalIngest.gatedBatch(
          gated, rules, s"$root/quarantine", id) { df =>
          stored ++= df.collect().map(_.getLong(0))
        }: Unit
      }.start()
    try {
      // batch 0: doc 1 = 1 hit in 54 chars (1000 < 2700 -> survives
      // density, within the contract); doc 2 = no hits -> batch clean
      stream.addData(
        (1L, "a bad phrase inside a long enough clean document body"),
        (2L, "clean text"))
      q.processAllAvailable()
      // batch 1: doc 5 = 2 hits in 20 chars (2000 > 1000) is density-
      // DROPPED at stage 1 and never reaches the contract; doc 3 = 3
      // hits in 61 chars (3000 < 3050) SURVIVES density but violates
      // the contract -> the whole surviving batch {3, 4} quarantines
      stream.addData(
        (3L, "bad phrase bad phrase bad phrase and padding padding padding"),
        (4L, "also clean"),
        (5L, "bad phrasebad phrase"))
      q.processAllAvailable()
    } finally q.stop()
    assert(stored.sorted == Seq(1L, 2L))
    val quarantined = spark.read.parquet(s"$root/quarantine/batch=1/rows")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(quarantined == Set(3L, 4L))
  }

  test("gazetteerGate: zero-hit docs report 0 and survive; density cross-multiply") {
    // doc 1: 19 chars, 'the'x2 + 'hat'x1 = 3 matches -> 1000*3 > 150*19
    //   is 3000 > 2850 -> density-dropped at 150 per-mille
    // doc 2: null text -> 0 chars, 0 matches, survives both verdicts
    // doc 3: one hit in 30 chars -> 1000 < 4500 -> survives density,
    //   still drop_any
    val df = Seq((1L, "the cat and the hat"),
      (2L, null.asInstanceOf[String]),
      (3L, "a hat somewhere in this text..")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.gazetteerGate(df, "doc_id", "text",
        Seq("the", "hat", "zzz"), maxPerMilleChars = 150)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, 19L, 3L, 2L, true, true),
      (2L, 0L, 0L, 0L, false, false),
      (3L, 30L, 1L, 1L, true, false)))
  }
}
