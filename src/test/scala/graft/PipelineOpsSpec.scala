package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Testbed, TextAnalysis}

/** Round-13 training-pipeline operators: the StarCoder code gate, the
  * FIM transform, and preference-pair construction.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- code quality gate ----

  test("codeStats: minified blob, re-lined code, autogen marker, empty text") {
    val okCode = (1 to 20).map(i => s"val x$i = compute($i) + offset").mkString("\n")
    val minified = "x" * 1500 // one 1500-char line
    val artJunk = ("+-*/!@#$ " * 30).trim // low alnum fraction
    val autogen = "// AUTO-GENERATED do not edit\n" + okCode
    val rows = Seq((1L, okCode), (2L, minified), (3L, artJunk),
      (4L, autogen), (5L, ""), (6L, null.asInstanceOf[String]))
      .toDF("id", "code")
    val got = TextAnalysis.codeStats(rows, "id", "code")
      .select($"id", $"passed", $"rule_max_line", $"rule_avg_line",
        $"rule_alnum_frac", $"autogen_marker")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2, "honest multi-line code passes")
    assert(!got(2L)._2 && !got(2L)._3 && !got(2L)._4,
      "a 1500-char single line fails both line rules")
    assert(!got(3L)._2 && !got(3L)._5, "symbol art fails the alnum fraction")
    assert(!got(4L)._2 && got(4L)._6, "the autogen marker alone sinks it")
    assert(!got(5L)._2 && !got(5L)._5, "empty text fails the alnum rule")
    assert(!got(6L)._2, "null text never passes")
  }

  // ---- unicode normalization ----

  test("NFC composes marks, NFKC folds compatibility forms, nulls ride through") {
    val rows = Seq(
      (1L, "cafe\u0301"), // decomposed e + combining acute
      (2L, "caf\u00e9"), // composed: fixpoint
      (3L, "ﬁle Ａwide ⁵"), // ﬁ ligature, fullwidth A, superscript 5
      (4L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = rows.select($"id",
        TextAnalysis.nfcNormalize($"t").as("nfc"),
        TextAnalysis.nfkcNormalize($"t").as("nfkc"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got(1L) == (("caf\u00e9", "caf\u00e9")))
    assert(got(2L) == (("caf\u00e9", "caf\u00e9")))
    // NFC leaves compatibility forms; NFKC folds them
    assert(got(3L)._1 == "ﬁle Ａwide ⁵")
    assert(got(3L)._2 == "file Awide 5")
    assert(got(4L) == ((null, null)))
  }

  // ---- FIM ----

  test("fimTransform: segments reassemble to the original, rate bounds hold") {
    val docs = Tables.documents(spark, sf).limit(200).select($"doc_id", $"text")
    val out = Curation.fimTransform(docs, "doc_id", "text")
      .select($"doc_id", $"text", $"fim_applied", $"fim_text")
      .as[(Long, String, Boolean, String)].collect()
    assert(out.exists(_._3) && out.exists(!_._3), "rate 50 mixes both kinds")
    out.foreach { case (id, text, applied, fim) =>
      if (!applied) assert(fim == text)
      else {
        // PSM layout: <PRE>p<SUF>s<MID>m with p+m+s == text
        val pre = fim.indexOf("<PRE>"); val suf = fim.indexOf("<SUF>")
        val mid = fim.indexOf("<MID>")
        assert(pre == 0 && suf >= 5 && mid >= suf, s"doc $id layout: $fim")
        val p = fim.substring(5, suf)
        val s2 = fim.substring(suf + 5, mid)
        val m = fim.substring(mid + 5)
        assert(p + m + s2 == text, s"doc $id: segments must reassemble")
      }
    }
    // deterministic: same cut points on re-run
    val again = Curation.fimTransform(docs, "doc_id", "text")
      .select($"doc_id", $"fim_text").as[(Long, String)].collect().toMap
    out.foreach { case (id, _, _, fim) => assert(again(id) == fim) }
    // rate 0 and 100 are total
    assert(Curation.fimTransform(docs, "doc_id", "text", ratePct = 0)
      .filter($"fim_applied").count() == 0)
    assert(Curation.fimTransform(docs, "doc_id", "text", ratePct = 100)
      .filter(!$"fim_applied").count() == 0)
  }

  // ---- preference pairs ----

  test("preferencePairs: best vs worst per prompt, margin filter, tie determinism") {
    val cand = Seq(
      ("q1", "mediocre", 0.5), ("q1", "best", 0.9), ("q1", "worst", 0.1),
      ("q2", "same a", 0.7), ("q2", "same b", 0.7), // zero margin: dropped
      ("q3", "only", 0.4) // single candidate: zero margin, dropped
    ).toDF("qid", "answer", "score")
    val got = Testbed.preferencePairs(cand, "qid", "answer", "score")
      .as[(String, String, String, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("q1"))
    assert(got("q1")._2 == "best" && got("q1")._3 == "worst")
    assert(got("q1")._4 == 0.8 && got("q1")._5 == 3)
    // score ties inside a kept pair break on the answer string
    val tied = Seq(("q", "alpha", 1.0), ("q", "zeta", 1.0), ("q", "low", 0.0))
      .toDF("qid", "answer", "score")
    val t = Testbed.preferencePairs(tied, "qid", "answer", "score")
      .as[(String, String, String, Double, Long)].collect().head
    assert(t._2 == "zeta" && t._3 == "low")
    // margin threshold drops weak pairs
    assert(Testbed.preferencePairs(cand, "qid", "answer", "score",
      minMargin = 0.9).count() == 0)
  }
}
