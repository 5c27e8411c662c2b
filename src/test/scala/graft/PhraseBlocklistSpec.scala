package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Keyword, TextAnalysis}

/** Positional phrase search (leg-agreement plan) and the C4 blocklist
  * document gate.
  */
class PhraseBlocklistSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val docs = Seq(
    (1L, "fast merge is fast merge"),      // two occurrences
    (2L, "merge fast"),                    // reversed — no match
    (3L, "fast x merge"),                  // gap — no match
    (4L, "tail fast merge")                // one occurrence at pos 1
  ).toDF("doc_id", "text")

  test("phraseSearch: contiguous matches only, counts and first position") {
    val got = Keyword.phraseSearch(docs, "doc_id", "text", Seq("fast", "merge"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(got == List((1L, 2L, 0L), (4L, 1L, 1L)))
  }

  test("phraseSearch: repeated term needs BOTH positions (a b a)") {
    val df = Seq(
      (1L, "a b a"),       // match at 0
      (2L, "a b c a"),     // 'a' at 0 and 3, but not at 2 — no match
      (3L, "a b a b a")    // matches at 0 and 2 (overlapping)
    ).toDF("doc_id", "text")
    val got = Keyword.phraseSearch(df, "doc_id", "text", Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(got == List((1L, 1L, 0L), (3L, 2L, 0L)))
  }

  test("phraseSearch: null text and no-hit corpora return empty, not error") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "x y")).toDF("doc_id", "text")
    assert(Keyword.phraseSearch(df, "doc_id", "text", Seq("fast", "merge")).count() == 0L)
  }

  test("phraseSearchIndexed: bit-identical to the scan path, bucket-pruned") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = java.nio.file.Files.createTempDirectory("posidx").toString
    graft.ops.Keyword.buildPositionalIndex(corpus, "doc_id", "text", idx)
    val scan = graft.ops.Keyword
      .phraseSearch(corpus, "doc_id", "text", Seq("fast", "merge"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val served = graft.ops.Keyword
      .phraseSearchIndexed(spark, idx, Seq("fast", "merge"))
    assert(served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == scan)
    assert(scan.nonEmpty) // the equality must not be vacuous
    // the postings scan must carry a bucket partition filter
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "expected bucket partition pruning in:\n" + plan.take(2000))
  }

  test("phraseSearchIndexed: store stamp refuses after the store moves") {
    val root = java.nio.file.Files.createTempDirectory("posidx-store").toString
    val t = s"$root/t"
    graft.ops.VersionedStore.append(spark, t,
      Seq((1L, "fast merge here")).toDF("doc_id", "text"))
    val idx = s"$root/idx"
    graft.ops.Keyword.buildPositionalIndex(
      graft.ops.VersionedStore.read(spark, t).get, "doc_id", "text", idx,
      store = Some(t))
    // fresh: serves
    assert(graft.ops.Keyword
      .phraseSearchIndexed(spark, idx, Seq("fast", "merge"), store = Some(t))
      .count() == 1L)
    // store moves on → the stamped index must refuse
    graft.ops.VersionedStore.append(spark, t,
      Seq((2L, "fast merge again")).toDF("doc_id", "text"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Keyword
        .phraseSearchIndexed(spark, idx, Seq("fast", "merge"), store = Some(t))
        .count()
    }
    assert(e.getMessage.contains("stale"))
  }

  test("phrase index incremental fold equals rebuild; compaction refuses") {
    val root = java.nio.file.Files.createTempDirectory("posidx-inc").toString
    val t = s"$root/t"
    graft.ops.VersionedStore.append(spark, t, Seq(
      (1L, "fast merge a"), (2L, "x fast merge")).toDF("doc_id", "text"))
    val idx = s"$root/idx"
    graft.ops.Keyword.buildPositionalIndex(
      graft.ops.VersionedStore.read(spark, t).get, "doc_id", "text", idx,
      store = Some(t))
    graft.ops.VersionedStore.append(spark, t, Seq(
      (3L, "fast merge fast merge")).toDF("doc_id", "text"))
    graft.ops.Keyword.appendToPositionalIndexForStore(spark, t,
      "doc_id", "text", idx)
    val served = graft.ops.Keyword
      .phraseSearchIndexed(spark, idx, Seq("fast", "merge"), store = Some(t))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // fold must equal a fresh rebuild at the same version
    val idx2 = s"$root/idx2"
    graft.ops.Keyword.buildPositionalIndex(
      graft.ops.VersionedStore.read(spark, t).get, "doc_id", "text", idx2,
      store = Some(t))
    val rebuilt = graft.ops.Keyword
      .phraseSearchIndexed(spark, idx2, Seq("fast", "merge"), store = Some(t))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == rebuilt)
    assert(served == Set((1L, 1L, 0L), (2L, 1L, 1L), (3L, 2L, 0L)))
    // a compaction rewrites covered segments -> the fold must refuse
    graft.ops.VersionedStore.compact(spark, t)
    graft.ops.VersionedStore.append(spark, t,
      Seq((4L, "fast merge")).toDF("doc_id", "text"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Keyword.appendToPositionalIndexForStore(spark, t,
        "doc_id", "text", idx)
    }
    assert(e.getMessage.contains("pure-append"))
    // …and the stamped query path refuses the stale snapshot too — the
    // index can never silently keep serving the pre-compaction store
    intercept[Exception] {
      graft.ops.Keyword
        .phraseSearchIndexed(spark, idx, Seq("fast", "merge"), store = Some(t))
        .count()
    }
    // HEAL end-to-end: rebuild at the compacted+appended version serves
    // all four docs — the loud-rebuild path the refusal points at
    graft.ops.Keyword.buildPositionalIndex(
      graft.ops.VersionedStore.read(spark, t).get, "doc_id", "text", idx,
      store = Some(t))
    val healed = graft.ops.Keyword
      .phraseSearchIndexed(spark, idx, Seq("fast", "merge"), store = Some(t))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(healed == Set((1L, 1L, 0L), (2L, 1L, 1L), (3L, 2L, 0L), (4L, 1L, 0L)))
    // a DELETE rewrites (or drops) covered segments: the fold refuses
    // exactly like the compaction, and the post-rebuild index must NOT
    // serve the deleted doc (O(deleted) rewrite on the store side)
    graft.ops.VersionedStore.deleteByKeys(spark, t,
      Seq(3L).toDF("doc_id"), "doc_id")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Keyword.appendToPositionalIndexForStore(spark, t,
        "doc_id", "text", idx)
    }
    assert(e2.getMessage.contains("pure-append") ||
      e2.getMessage.contains("ahead of"), e2.getMessage)
    graft.ops.Keyword.buildPositionalIndex(
      graft.ops.VersionedStore.read(spark, t).get, "doc_id", "text", idx,
      store = Some(t))
    val afterDelete = graft.ops.Keyword
      .phraseSearchIndexed(spark, idx, Seq("fast", "merge"), store = Some(t))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(afterDelete == Set((1L, 1L, 0L), (2L, 1L, 1L), (4L, 1L, 0L)),
      s"deleted doc 3 must leave the served results, got $afterDelete")
  }

  test("blocklistGate: counts, ratio, and both verdicts") {
    val df = Seq(
      (1L, "clean text only"),
      (2L, "one bad word"),
      (3L, "bad bad bad bad text"),   // 4/5 blocked
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .blocklistGate(df, "doc_id", "text", Seq("bad"), maxPermille = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4), r.getBoolean(5))).sortBy(_._1).toList
    assert(got == List(
      (1L, 3L, 0L, false, false),
      (2L, 3L, 1L, true, false),   // 1/3 < 50% — ratio gate passes
      (3L, 5L, 4L, true, true),    // 4/5 > 50% — ratio gate drops
      (4L, 0L, 0L, false, false))) // null text: zero counts, both pass
  }
}
