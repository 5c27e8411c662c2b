package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

class MojibakeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def repair(rows: String*): Seq[String] =
    rows.toDF("t").select(TextAnalysis.fixMojibake(col("t"))).as[String]
      .collect().toSeq

  private def score(s: String): Double =
    Seq(s).toDF("t").select(TextAnalysis.mojibakeScore(col("t")))
      .as[Double].collect().head

  test("latin-1-lens corruption repairs to the original; clean text untouched") {
    val orig = "café — naïve № résumé ✓ fin"
    val latin1Moji = new String(orig.getBytes("UTF-8"), "ISO-8859-1")
    assert(repair(latin1Moji) == Seq(orig))
    // clean text with real accents: low score, never rewritten
    assert(score(orig) < 5.0)
    assert(repair(orig) == Seq(orig))
  }

  test("cp1252-lens corruption (the â€™ shape) repairs via the translate fold") {
    // avoids chars whose UTF-8 bytes hit cp1252's undefined 81/8D/8F/90/9D
    val orig = "don’t — ‘quoted’ … œuvre"
    val cp1252Moji = new String(orig.getBytes("UTF-8"), "windows-1252")
    assert(cp1252Moji.contains("â€™"), s"fixture shape drifted: $cp1252Moji")
    assert(score(cp1252Moji) >= 5.0)
    assert(repair(cp1252Moji) == Seq(orig))
  }

  test("unrepairable rows pass through unchanged instead of throwing") {
    // ” (U+201D) encodes through byte 0x9D, undefined in cp1252 — the
    // JVM decoder yields U+FFFD, the byte is destroyed, no repair exists
    val destroyed = new String("a “quoted” phrase — here".getBytes("UTF-8"),
      "windows-1252")
    assert(destroyed.contains("�"))
    assert(repair(destroyed) == Seq(destroyed))
    // a high-scoring string whose recovered bytes are NOT valid UTF-8
    // (lead byte followed by a non-continuation byte after re-encode)
    val notUtf8 = "ÃÁÃÁÃÁ"
    assert(score(notUtf8) == 0.0 || repair(notUtf8) == Seq(notUtf8))
  }

  test("detector separates corrupted from clean on real-looking text") {
    val clean = "The quick brown fox jumps über the lazy dog près du café."
    val moji = new String(clean.getBytes("UTF-8"), "ISO-8859-1")
    assert(score(clean) < 5.0 && score(moji) >= 5.0)
  }

  test("empty and null are zero-score identities") {
    assert(score("") == 0.0)
    val out = Seq[Option[String]](None).toDF("t")
      .select(TextAnalysis.fixMojibake(col("t"))).collect().head
    assert(out.isNullAt(0))
  }
}
