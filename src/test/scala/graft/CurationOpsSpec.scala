package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bpe, Importance, Ivf, NgramLm, Similarity}

/** Round-8 curation operators: DSIR importance weighting, the LM
  * perplexity gate, metadata-filtered ANN, and corpus BPE encoding.
  */
class CurationOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- DSIR ----

  test("dsirLogWeights: target-like docs outrank off-target docs") {
    // target speaks only of "alpha beta"; corpus doc 1 matches it,
    // doc 2 is disjoint vocabulary, doc 3 mixes
    val corpus = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "gamma delta gamma delta"),
      (3L, "alpha delta")).toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha beta alpha"), Tuple1("beta alpha"))
      .toDF("text")
    val w = Importance.dsirLogWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"expected target-affine ordering, got $w")
    assert(w(1L) > 0 && w(2L) < 0)
  }

  test("dsirLogWeights: empty and null text score 0.0 over 0 tokens") {
    val corpus = Seq((1L, "alpha"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha")).toDF("text")
    val got = Importance.dsirLogWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(2L) == ((0L, 0.0)) && got(3L) == ((0L, 0.0)))
    assert(got.size == 3)
  }

  test("dsirLogWeights plan: λ table joins broadcast, corpus never broadcast") {
    val corpus = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val plan = Importance.dsirLogWeights(corpus, corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"λ join must broadcast the 4096-row table:\n$plan")
  }

  test("tokenBucket matches the md5-prefix hex convention, in [0, 4096)") {
    val got = Seq("hello", "", "α").toDF("t")
      .select(Importance.tokenBucket($"t")).as[Int].collect()
    // first 3 hex chars of md5: hello → 5d4 = 1492
    assert(got(0) == 0x5d4)
    assert(got.forall(b => b >= 0 && b < 4096))
  }

  test("dsirTopK: quota cut on the rounded weight with id tiebreak") {
    val corpus = (1L to 20L).map(i =>
      (i, if (i <= 10) "alpha beta" else "gamma delta")).toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha beta")).toDF("text")
    val ids = Importance.dsirTopK(corpus, target, "doc_id", "text", quota = 10)
      .select($"doc_id").as[Long].collect()
    assert(ids.toSeq == (1L to 10L), s"got ${ids.toSeq}")
  }

  // ---- perplexity filter ----

  test("perplexityFilter: fluent docs survive, OOV-chain docs drop") {
    val train = Seq("the cat sat", "the cat ran", "the dog sat").toDF("text")
    val counts = NgramLm.gramCounts(train, "text", maxN = 3)
    val docs = Seq(
      (1L, "the cat sat"),          // fully seen — low ppl
      (2L, "zz qq ww")              // all OOV — n_zero > 0, dropped
    ).toDF("doc_id", "text")
    val got = NgramLm.perplexityFilter(docs, "doc_id", "text", counts,
      maxPpl = 1e6).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.getDouble(2) > 0)
  }

  test("perplexityFilter: the cut applies to the 6dp-rounded value") {
    val train = Seq("a b c", "a b d").toDF("text")
    val counts = NgramLm.gramCounts(train, "text", maxN = 3)
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val ppl = NgramLm.perplexityFilter(docs, "doc_id", "text", counts,
      maxPpl = 1e6).head.getDouble(2)
    // survives at exactly its own rounded ppl, drops just below it
    assert(NgramLm.perplexityFilter(docs, "doc_id", "text", counts,
      maxPpl = ppl).count() == 1)
    assert(NgramLm.perplexityFilter(docs, "doc_id", "text", counts,
      maxPpl = ppl - 1e-6).count() == 0)
  }

  // ---- filtered ANN ----

  private def planted(n: Int) = (0 until n).map { i =>
    (i.toLong, Array.tabulate(4)(j => if (j == i % 4) 1f else 0f),
      if (i % 2 == 0) "en" else "de")
  }.toDF("vec_id", "embedding", "lang")

  test("searchFiltered: pre-filter returns k rows where post-filter starves") {
    val store = planted(64)
    val model = Ivf.fit(store, "vec_id", "embedding", k = 4)
    val assigned = Ivf.assign(store, "embedding", model)
    val qv = Array(1f, 0f, 0f, 0f)
    val pre = Ivf.searchFiltered(assigned, "embedding", model, qv,
      topK = 8, nProbe = model.k, predicate = $"lang" === "de")
    assert(pre.count() == 8)
    assert(pre.select($"lang").distinct().as[String].collect().toSeq == Seq("de"))
    // post-filtering the unfiltered top-8 finds mostly 'en' axis-aligned
    // vectors — fewer than k survivors
    val post = Ivf.search(assigned, "embedding", model, qv,
      topK = 8, nProbe = model.k).filter($"lang" === "de")
    assert(post.count() < 8)
  }

  test("searchFiltered at full probe equals exact filtered knn") {
    val store = planted(64)
    val model = Ivf.fit(store, "vec_id", "embedding", k = 4)
    val assigned = Ivf.assign(store, "embedding", model)
    val qv = Array(0.5f, 0.5f, 0f, 0f)
    val got = Ivf.searchFiltered(assigned, "embedding", model, qv,
        topK = 5, nProbe = model.k, predicate = $"lang" === "en")
      .select($"vec_id", $"score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = Similarity.knn(store.filter($"lang" === "en"), "embedding", qv, k = 5)
      .select($"vec_id", $"score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  // ---- BPE encode ----

  test("encodeStats: per-doc subword counts under learned merges") {
    val docs = Seq(
      (1L, "aaab aaab ab"),
      (2L, "aaab"),
      (3L, "")).toDF("doc_id", "text")
    val (merges, _) = Bpe.learnMerges(Bpe.wordCounts(docs, "text"), nMerges = 1)
    // corpus pairs: "aa" in aaab (weight 2×2 non-overlap... greedy) and
    // "ab"; merge 1 is the argmax — whatever it is, recompute expected
    // lengths from segment() itself for the fixture's vocabulary
    val lens = Bpe.segment(Seq("aaab", "ab").toDF("word"), "word", merges)
      .select($"word", size($"syms")).as[(String, Int)].collect().toMap
    val got = Bpe.encodeStats(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 2L * lens("aaab") + lens("ab"))))
    assert(got(2L) == ((1L, lens("aaab").toLong)))
    assert(got(3L) == ((0L, 0L)))
  }

  // ---- MinHash sidecar (incremental near-dup) ----

  private def tmpRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(tag).toString
    new java.io.File(p).delete()
    p
  }

  test("minhash sidecar: fold over appends equals a full rebuild") {
    import graft.ops.{Dedup, VersionedStore}
    val root = tmpRoot("ndsc-fold")
    val docs = (1L to 40L).map(i =>
      (i, s"alpha beta gamma token$i delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    VersionedStore.append(spark, s"$root/t", docs.filter($"doc_id" <= 20))
    Dedup.buildMinhashSidecarForStore(spark, s"$root/t", "doc_id", "text",
      s"$root/inc")
    VersionedStore.append(spark, s"$root/t", docs.filter($"doc_id" > 20))
    Dedup.appendToMinhashSidecar(spark, s"$root/t", "doc_id", "text", s"$root/inc")
    Dedup.buildMinhashSidecarForStore(spark, s"$root/t", "doc_id", "text",
      s"$root/full")
    val a = spark.read.parquet(s"$root/inc/bands")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$root/full/bands")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("minhash sidecar: stale check and non-pure-append history refuse") {
    import graft.ops.{Dedup, VersionedStore}
    val root = tmpRoot("ndsc-guard")
    val docs = (1L to 10L).map(i =>
      (i, s"alpha beta gamma token$i delta epsilon")).toDF("doc_id", "text")
    VersionedStore.append(spark, s"$root/t", docs.filter($"doc_id" <= 5))
    Dedup.buildMinhashSidecarForStore(spark, s"$root/t", "doc_id", "text",
      s"$root/sc")
    VersionedStore.append(spark, s"$root/t", docs.filter($"doc_id" > 5))
    // stale: the store moved but the sidecar didn't
    val e1 = intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstStore(spark, docs, "doc_id", "text",
        s"$root/t", s"$root/sc", threshold = 0.2)
    }
    assert(e1.getMessage.contains("stale"))
    // compaction rewrites covered segments: the fold must refuse
    VersionedStore.compact(spark, s"$root/t")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.appendToMinhashSidecar(spark, s"$root/t", "doc_id", "text", s"$root/sc")
    }
    assert(e2.getMessage.contains("pure-append"))
  }

  test("registered sidecar: the append seam maintains it; compaction triggers rebuild") {
    import graft.ops.{Dedup, Ingest, VersionedStore}
    val root = tmpRoot("ndsc-seam")
    val mk = (r: Range) => r.map(i =>
      (i.toLong, s"alpha beta gamma token$i delta epsilon")).toDF("doc_id", "text")
    VersionedStore.append(spark, s"$root/t", mk(1 to 10))
    Dedup.registerMinhashSidecar(spark, s"$root/t", "doc_id", "text", s"$root/sc")
    // the seam folds the appended rows — a check right after must be fresh
    Ingest.appendRespectingLayout(spark, s"$root/t", mk(11 to 20))
    val got = Dedup.nearDupAgainstStore(spark,
        Seq((99L, "alpha beta gamma token15 delta epsilon")).toDF("doc_id", "text"),
        "doc_id", "text", s"$root/t", s"$root/sc", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((99L, 15L)))
    // compaction breaks pure-append; the NEXT seam append rebuilds loudly
    VersionedStore.compact(spark, s"$root/t")
    Ingest.appendRespectingLayout(spark, s"$root/t", mk(21 to 25))
    val got2 = Dedup.nearDupAgainstStore(spark,
        Seq((98L, "alpha beta gamma token23 delta epsilon")).toDF("doc_id", "text"),
        "doc_id", "text", s"$root/t", s"$root/sc", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.toSeq == Seq((98L, 23L)))
  }

  test("nearDupAgainstStore finds planted near-dups of appended history") {
    import graft.ops.{Dedup, VersionedStore}
    val root = tmpRoot("ndsc-find")
    val docs = (1L to 30L).map(i =>
      (i, s"alpha beta gamma token$i delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    VersionedStore.append(spark, s"$root/t", docs.filter($"doc_id" <= 15))
    Dedup.buildMinhashSidecarForStore(spark, s"$root/t", "doc_id", "text",
      s"$root/sc")
    VersionedStore.append(spark, s"$root/t", docs.filter($"doc_id" > 15))
    Dedup.appendToMinhashSidecar(spark, s"$root/t", "doc_id", "text", s"$root/sc")
    // batch duplicates doc 20 — which arrived AFTER the build
    val batch = Seq((999L,
      "alpha beta gamma token20 delta epsilon zeta eta")).toDF("doc_id", "text")
    val got = Dedup.nearDupAgainstStore(spark, batch, "doc_id", "text",
        s"$root/t", s"$root/sc", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((999L, 20L, 1.0)))
  }

  test("registered sidecar: compactTable restamps O(1), check stays fresh") {
    import graft.ops.{Dedup, Ingest, VersionedStore}
    val root = tmpRoot("ndsc-restamp")
    val mk = (r: Range) => r.map(i =>
      (i.toLong, s"alpha beta gamma token$i delta epsilon")).toDF("doc_id", "text")
    VersionedStore.append(spark, s"$root/t", mk(1 to 10))
    Dedup.registerMinhashSidecar(spark, s"$root/t", "doc_id", "text", s"$root/sc")
    val bandsBefore = spark.read.parquet(s"$root/sc/bands")
      .inputFiles.toSet
    Ingest.compactTable(spark, s"$root/t")
    // the row-preserving compaction restamped — no rebuild (same band
    // files on disk), and the check serves without tripping staleness
    assert(spark.read.parquet(s"$root/sc/bands").inputFiles.toSet == bandsBefore)
    val got = Dedup.nearDupAgainstStore(spark,
        Seq((99L, "alpha beta gamma token3 delta epsilon")).toDF("doc_id", "text"),
        "doc_id", "text", s"$root/t", s"$root/sc", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((99L, 3L)))
  }

  test("registered sidecar: truncated _stats heals via LOUD rebuild at the seam") {
    import graft.ops.{Dedup, Ingest, VersionedStore}
    val root = tmpRoot("ndsc-trunc")
    val mk = (r: Range) => r.map(i =>
      (i.toLong, s"alpha beta gamma token$i delta epsilon")).toDF("doc_id", "text")
    VersionedStore.append(spark, s"$root/t", mk(1 to 10))
    Dedup.registerMinhashSidecar(spark, s"$root/t", "doc_id", "text", s"$root/sc")
    // damage the stats file to a truncated partial write
    graft.Fs.delete(spark, s"$root/sc/_stats")
    graft.Fs.writeString(spark, s"$root/sc/_stats", "3 32")
    // the next seam append must NOT fail the committed store write —
    // maintenance catches the damaged stats and rebuilds
    Ingest.appendRespectingLayout(spark, s"$root/t", mk(11 to 15))
    val got = Dedup.nearDupAgainstStore(spark,
        Seq((99L, "alpha beta gamma token13 delta epsilon")).toDF("doc_id", "text"),
        "doc_id", "text", s"$root/t", s"$root/sc", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((99L, 13L)))
  }

  test("minhash sidecar: pre-mh2-format _stats refuses loudly (no silent zero-candidate join)") {
    import graft.ops.{Dedup, VersionedStore}
    val root = tmpRoot("ndsc-premh2")
    VersionedStore.append(spark, s"$root/t", (1 to 5).map(i =>
      (i.toLong, s"alpha beta gamma token$i delta epsilon")).toDF("doc_id", "text"))
    Dedup.buildMinhashSidecarForStore(spark, s"$root/t", "doc_id", "text", s"$root/sc")
    // rewrite the stamp to the pre-format-token shape ("n hashes bands vN"):
    // such a sidecar carries BIGINT band hashes that null-join against the
    // current STRING band keys — the reader must refuse, not return 0 rows
    graft.Fs.delete(spark, s"$root/sc/_stats")
    graft.Fs.writeString(spark, s"$root/sc/_stats", "3 32 8 v1")
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstStore(spark,
        Seq((99L, "alpha beta gamma token3 delta epsilon")).toDF("doc_id", "text"),
        "doc_id", "text", s"$root/t", s"$root/sc", threshold = 0.9)
    }
    assert(e.getMessage.contains("rebuild with buildMinhashSidecarForStore"))
    assert(e.getMessage.contains("mh2"))
  }

  test("SRP sidecar: dim-mismatched batch or append refuses loudly") {
    import graft.ops.{Dedup, VersionedStore}
    val root = tmpRoot("srpdim")
    def vec(i: Int, d: Int): Array[Float] =
      Array.tabulate(d)(j => if (j == i % d) 1f else 0.1f)
    VersionedStore.append(spark, s"$root/t",
      (1 to 10).map(i => (i.toLong, vec(i, 8))).toDF("vec_id", "embedding"))
    Dedup.buildSrpSidecarForStore(spark, s"$root/t", "vec_id", "embedding",
      s"$root/sc")
    // a 16-dim batch against an 8-dim sidecar must not silently miss
    val e = intercept[IllegalArgumentException] {
      Dedup.embNearDupAgainstStore(spark,
        Seq((99L, vec(3, 16))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", s"$root/t", s"$root/sc", threshold = 0.5)
    }
    assert(e.getMessage.contains("dim"))
    // an appended segment with the wrong dim refuses in the fold too
    VersionedStore.append(spark, s"$root/t",
      (11 to 15).map(i => (i.toLong, vec(i, 16))).toDF("vec_id", "embedding"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.appendToSrpSidecar(spark, s"$root/t", "vec_id", "embedding", s"$root/sc")
    }
    assert(e2.getMessage.contains("dim"))
  }

  test("SRP sidecar: fold equals rebuild, seam maintains, stale refuses") {
    import graft.ops.{Dedup, Ingest, VersionedStore}
    val root = tmpRoot("srpsc")
    def vec(i: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == i % 8) 1f else 0.1f)
    val mk = (r: Range) => r.map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    VersionedStore.append(spark, s"$root/t", mk(1 to 10))
    Dedup.registerSrpSidecar(spark, s"$root/t", "vec_id", "embedding", s"$root/sc")
    // seam append folds; a batch duplicating appended vector 15 is found
    Ingest.appendRespectingLayout(spark, s"$root/t", mk(11 to 20))
    val got = Dedup.embNearDupAgainstStore(spark,
        Seq((99L, vec(15))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", s"$root/t", s"$root/sc", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq.contains((99L, 15L)), got.toSeq.toString)
    // fold ≡ full rebuild
    Dedup.buildSrpSidecarForStore(spark, s"$root/t", "vec_id", "embedding",
      s"$root/full")
    val a = spark.read.parquet(s"$root/sc/buckets").collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$root/full/buckets").collect().map(_.toSeq).toSet
    assert(a == b)
    // stale: an out-of-band append without maintenance refuses
    VersionedStore.append(spark, s"$root/t", mk(21 to 22))
    val e1 = intercept[IllegalArgumentException] {
      Dedup.embNearDupAgainstStore(spark, mk(1 to 2), "vec_id", "embedding",
        s"$root/t", s"$root/sc", threshold = 0.9)
    }
    assert(e1.getMessage.contains("stale"))
  }

  test("dropNearDupsAgainstStore: near-dups rejected, fresh rows pass") {
    import graft.ops.{Dedup, VersionedStore}
    val root = tmpRoot("ndsc-drop")
    val docs = (1L to 10L).map(i =>
      (i, s"alpha beta gamma token$i delta epsilon")).toDF("doc_id", "text")
    VersionedStore.append(spark, s"$root/t", docs)
    Dedup.buildMinhashSidecarForStore(spark, s"$root/t", "doc_id", "text",
      s"$root/sc")
    val batch = Seq(
      (101L, "alpha beta gamma token7 delta epsilon"), // dup of history
      (102L, "totally unrelated fresh new content here")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropNearDupsAgainstStore(spark, batch, "doc_id", "text",
        s"$root/t", s"$root/sc", threshold = 0.9)
      .select($"doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(102L))
  }

  // ---- chunk coalescing ----

  test("coalesceChunks: greedy grouping, oversized chunk isolated, order kept") {
    import graft.ops.Split
    val chunks = Seq(
      (1L, 0L, "aaaa"), (1L, 1L, "bbbb"),   // 8 ≤ 10 → group 1
      (1L, 2L, "cccc"),                     // would make 12 → group 2
      (1L, 3L, "x" * 25),                   // oversized → group 3 alone
      (1L, 4L, "dd"),                       // group 4 (after oversized flush)
      (2L, 0L, "ee")                        // other doc, group 1
    ).toDF("doc_id", "chunk_idx", "chunk_text")
    val got = Split.coalesceChunks(chunks, "doc_id", "chunk_idx", "chunk_text",
        targetChars = 10, sep = "|")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((1L, 1L)) == (("aaaa|bbbb", 2L, 8L)))
    assert(got((1L, 2L)) == (("cccc", 1L, 4L)))
    assert(got((1L, 3L)) == (("x" * 25, 1L, 25L)))
    assert(got((1L, 4L)) == (("dd", 1L, 2L)))
    assert(got((2L, 1L)) == (("ee", 1L, 2L)))
    assert(got.size == 5)
  }

  test("coalesceChunks: string/UUID doc ids keep their type and group correctly") {
    import graft.ops.Split
    val chunks = Seq(
      ("doc-a", 0L, "aaaa"), ("doc-a", 1L, "bbbb"), ("doc-a", 2L, "cccc"),
      ("7f3e-uuid-ish", 0L, "zz")
    ).toDF("doc_id", "chunk_idx", "chunk_text")
    val out = Split.coalesceChunks(chunks, "doc_id", "chunk_idx", "chunk_text",
      targetChars = 10, sep = "|")
    assert(out.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("doc-a", 1L)) == (("aaaa|bbbb", 2L, 8L)))
    assert(got(("doc-a", 2L)) == (("cccc", 1L, 4L)))
    assert(got(("7f3e-uuid-ish", 1L)) == (("zz", 1L, 2L)))
    assert(got.size == 3)
  }

  test("budgetFillMix: whole domains in quality order, partial boundary, zeros after") {
    import graft.ops.Curation
    val pd = Seq(("a", 100L, 0.9), ("b", 200L, 0.8), ("c", 300L, 0.7),
      ("d", 50L, 0.95)).toDF("dom", "n_tokens", "quality")
    val got = Curation.budgetFillMix(pd, "dom", "n_tokens", "quality", 320L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // order: d(0.95) a(0.9) b(0.8) c(0.7); waterline at 320
    assert(got == Map("d" -> 50L, "a" -> 100L, "b" -> 170L, "c" -> 0L))
    // quality ties break by domain name ascending
    val tie = Curation.budgetFillMix(
        Seq(("x", 10L, 0.5), ("w", 10L, 0.5)).toDF("dom", "n_tokens", "quality"),
        "dom", "n_tokens", "quality", 15L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(tie == Map("w" -> 10L, "x" -> 5L))
    // degenerate budgets
    val all = Curation.budgetFillMix(pd, "dom", "n_tokens", "quality", 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(all == Map("a" -> 100L, "b" -> 200L, "c" -> 300L, "d" -> 50L))
    val none = Curation.budgetFillMix(pd, "dom", "n_tokens", "quality", 0L)
      .collect().map(_.getLong(3)).toSet
    assert(none == Set(0L))
  }

  // ---- winnowing fingerprints ----

  test("winnowingFingerprints: shared substrings >= k+w-1 share a fingerprint; density bounded") {
    import graft.ops.TextAnalysis
    // docs 1 and 2 share an 8-char substring (k=5, w=4 → guarantee
    // threshold k+w−1 = 8); doc 3 is disjoint text
    val docs = Seq(
      (1L, "xxxxSHAREDOKyyyyzzzz"),
      (2L, "ppppppSHAREDOKqqqq"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "the >= k+w-1 shared substring must share a selected fingerprint")
    // selections stay within the position range and are sparse
    val doc1 = fp.filter(_._1 == 1L)
    assert(doc1.forall(t => t._2 >= 1 && t._2 <= 20 - 4))
    assert(doc1.length < 20 - 4, "winnowing must select a strict subset")
    // identical documents select identical fingerprint sets
    val twin = Seq((10L, "abcdefghijklmnop"), (11L, "abcdefghijklmnop"))
      .toDF("doc_id", "text")
    val tw = TextAnalysis.winnowingFingerprints(twin, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val g = tw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(g(10L) == g(11L))
    // below-k documents produce nothing
    assert(TextAnalysis.winnowingFingerprints(
      Seq((20L, "abc")).toDF("doc_id", "text"), "doc_id", "text").count() == 0)
  }

  test("winnowingOverlapPairs: reuse pairs surface, ubiquitous fingerprints drop") {
    import graft.ops.TextAnalysis
    // docs 1/2 share a long run; doc 3 disjoint; a gram present in ALL
    // docs ("COMMONBIT") must not connect 3 to anything at maxDf=2
    val docs = Seq(
      (1L, "COMMONBIT abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "COMMONBIT abcdefghijklmnopqrstuvwxyz9876543210"),
      (3L, "COMMONBIT zzz yyy xxx www vvv uuu ttt sss rrr")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowingFingerprints(docs, "doc_id", "text")
    val pairs = TextAnalysis.winnowingOverlapPairs(fp, "doc_id",
        maxDf = 2, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(t => (t._1, t._2)).toSet == Set((1L, 2L)),
      s"only the long shared run should pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= 2)
  }

  // ---- vocabulary JS divergence ----

  test("vocabJsDivergence: 0 for identical slices, near ln 2 for disjoint, between for mixed") {
    import graft.ops.TextAnalysis
    val same = Seq(("A", "x y z x y"), ("B", "x y z x y")).toDF("s", "text")
    val j0 = TextAnalysis.vocabJsDivergence(same, "s", "text")
      .collect().head.getDouble(2)
    assert(j0 == 0.0)
    // disjoint vocabularies approach ln 2 (smoothing keeps it below)
    val disj = Seq(("A", ("p1 " * 20000).trim), ("B", ("q1 " * 20000).trim))
      .toDF("s", "text")
    val jd = TextAnalysis.vocabJsDivergence(disj, "s", "text")
      .collect().head.getDouble(2)
    assert(jd > 0.4 && jd <= math.log(2.0) + 1e-9, s"disjoint jsd $jd")
    // a shared-vocab frequency tilt lands strictly between
    val tilt = Seq(("A", ("x " * 12000 + "y " * 4000).trim),
      ("B", ("x " * 4000 + "y " * 12000).trim)).toDF("s", "text")
    val jt = TextAnalysis.vocabJsDivergence(tilt, "s", "text")
      .collect().head.getDouble(2)
    assert(jt > 0.0 && jt < jd, s"tilt jsd $jt vs disjoint $jd")
  }

  // ---- parent-document retrieval ----

  test("parentTopK: chunk hits roll up to parents by best score") {
    import graft.ops.Similarity
    // parent 1's chunks near the query axis; parent 2 orthogonal;
    // parent 3 one strong chunk among weak ones
    val chunks = Seq(
      (10L, 1L, Array(1f, 0f)), (11L, 1L, Array(0.9f, 0.1f)),
      (20L, 2L, Array(0f, 1f)), (21L, 2L, Array(0.1f, 0.9f)),
      (30L, 3L, Array(0.8f, 0.2f)), (31L, 3L, Array(0f, 1f))
    ).toDF("chunk_id", "parent_id", "embedding")
    val got = Similarity.parentTopK(chunks, "parent_id", "embedding",
        Array(1f, 0f), kChunks = 6, kParents = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // parent 1 best (2 strong chunks), parent 3 second (its 0.8 chunk)
    assert(got.map(_._1) == Seq(1L, 3L), got.toString)
    assert(got.head._2 == 2L)
  }

  // ---- score calibration ----

  test("scoreCalibration: planted scores bin correctly with per-bin precision") {
    import graft.ops.Testbed
    // COSINE relevance = (1+s)/2: s=0.8→0.9 (bin 9 via top-edge clamp on
    // 1.0? no: 0.9*10=9), s=0.0→0.5 (bin 5), s=-0.5→0.25 (bin 2),
    // s=1.0→1.0 (clamped to bin 9)
    val run = Seq(
      (1L, 10L, 0.8), (1L, 11L, 0.0), (2L, 12L, -0.5), (2L, 13L, 1.0))
      .toDF("qid", "doc", "score")
    val qrels = Seq((1L, 10L), (2L, 12L)).toDF("qid", "doc")
    val got = Testbed.scoreCalibration(run, qrels, "qid", "doc", "score")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(9L) == ((2L, 1L, 500000L)))  // s=0.8 (hit) and s=1.0 (miss)
    assert(got(5L) == ((1L, 0L, 0L)))
    assert(got(2L) == ((1L, 1L, 1000000L)))
    assert(got.size == 3)
  }

  // ---- edit distance ----

  test("editDistance: textbook distances, null/empty conventions, rate bounds") {
    import graft.ops.Testbed
    val pairs = Seq(
      (1L, "kitten", "sitting"),           // classic 3
      (2L, "same", "same"),                // 0
      (3L, null.asInstanceOf[String], "ab"), // null cand → 2
      (4L, "", ""),                        // both empty → 0 dist, 0.0 rate
      (5L, "abcd", "")                     // empty ref → rate 1.0
    ).toDF("id", "cand", "ref")
    val got = Testbed.editDistance(pairs, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((3L, 428571L))) // micros(3/7), round-half-up
    assert(got(2L) == ((0L, 0L)))
    assert(got(3L) == ((2L, 1000000L)))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((4L, 1000000L)))
  }

  // ---- bootstrap CI ----

  test("bootstrapCi: b replicates, ~frac membership, reproducible bit for bit") {
    import graft.ops.Testbed
    val vals = (1L to 400L).map(i => (i, i.toDouble)).toDF("id", "value")
    val a = Testbed.bootstrapCi(vals, "id", "value", b = 10, sampleFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b2 = Testbed.bootstrapCi(vals, "id", "value", b = 10, sampleFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b2.toSeq)            // deterministic
    assert(a.length == 10)
    // each replicate holds ~50% of rows (binomial n=400 p=.5: ±5σ ≈ 50)
    assert(a.forall(r => r._2 > 150 && r._2 < 250), a.map(_._2).toSeq.toString)
    // replicates differ from each other (the seed varies per replicate)
    assert(a.map(_._2).distinct.length > 1 || a.map(_._3).distinct.length > 1)
  }

  // ---- SFT pair extraction ----

  test("sftPairs: one pair per assistant turn, capped oldest-dropped context") {
    import graft.ops.Chat
    val msgs = Seq(
      ("s1", 1L, "user", "q1"), ("s1", 2L, "assistant", "a1"),
      ("s1", 3L, "user", "q2"), ("s1", 4L, "assistant", "a2"),
      ("s1", 5L, "user", "q3"), ("s1", 6L, "assistant", "a3"),
      ("s2", 1L, "assistant", "opener")
    ).toDF("session", "seq", "role", "content")
    val got = Chat.sftPairs(msgs, "session", "seq", "role", "content",
        maxContextTurns = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got(("s1", 2L)) == ((1L, "user: q1", "a1")))
    assert(got(("s1", 4L)) == ((3L, "user: q1\nassistant: a1\nuser: q2", "a2")))
    // 5 prior turns capped to the most recent 3
    assert(got(("s1", 6L)) ==
      ((3L, "user: q2\nassistant: a2\nuser: q3", "a3")))
    assert(got(("s2", 1L)) == ((0L, "", "opener")))
    assert(got.size == 4)
  }

  // ---- JSONL delivery ----

  test("writeJsonlShards: shard layout, training order, parquet parity") {
    import graft.ops.Sampling
    val df = (1L to 25L).map(i => (i, s"text$i")).toDF("id", "text")
    val root = tmpRoot("jsonl")
    val nShards = Sampling.writeJsonlShards(df, "id", "e0", 10L, s"$root/j")
    assert(nShards == 3)
    val back = spark.read.json(s"$root/j")
    assert(back.count() == 25)
    // same deterministic order contract as the parquet sibling
    Sampling.writeShards(df, "id", "e0", 10L, s"$root/p")
    val a = back.select($"id", $"position", $"shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toLong))
      .sortBy(_._2)
    val b = spark.read.parquet(s"$root/p").select($"id", $"position", $"shard")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.get(2).toString.toLong)).sortBy(_._2)
    assert(a.toSeq == b.toSeq)
    // within a shard file, physical line order IS training order
    val files = new java.io.File(s"$root/j/shard=0").listFiles()
      .filter(_.getName.endsWith(".json"))
    val lines = files.flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    val positions = lines.map(l => "\"position\":(\\d+)".r
      .findFirstMatchIn(l).get.group(1).toLong)
    assert(positions.toSeq == positions.sorted.toSeq && positions.length == 10)
  }

  // ---- relative-score hybrid fusion ----

  test("relativeScoreFuse: hand-computed min-max blend with absent docs") {
    import graft.ops.Keyword
    val vec = Seq((1L, 0.9), (2L, 0.5), (3L, 0.1)).toDF("id", "score")
    val kw = Seq((2L, 10.0), (4L, 5.0)).toDF("id", "score")
    val got = Keyword.relativeScoreFuse(Seq((vec, 0.7), (kw, 0.3)), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // vec norms: 1 → 1.0, 2 → 0.5, 3 → 0.0; kw norms: 2 → 1.0, 4 → 0.0
    assert(got(1L) == 0.7)
    assert(got(2L) == 0.65) // round(0.7·0.5 + 0.3·1.0, 6)
    assert(got(3L) == 0.0)
    assert(got(4L) == 0.0)
  }

  test("relativeScoreFuse: degenerate leg (max = min) normalizes to 1.0") {
    import graft.ops.Keyword
    val flat = Seq((1L, 3.0), (2L, 3.0)).toDF("id", "score")
    val got = Keyword.relativeScoreFuse(Seq((flat, 1.0)), "id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 1.0))
  }

  // ---- memorization audit ----

  test("memorizationOverlap: planted verbatim, partial, disjoint, and short docs") {
    import graft.ops.Dedup
    val corpus = Seq((100L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (1L, "one two three four five six seven eight"), // fully memorized
      (2L, "one two three four nine ten eleven twelve"), // first 4-gram only
      (3L, "alpha beta gamma delta epsilon"),            // disjoint
      (4L, "too short")                                  // < n words
    ).toDF("doc_id", "text")
    val got = Dedup.memorizationOverlap(eval, "doc_id", "text",
        corpus, "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // overlap_ratio leaves as exact integer micros (Tables.micros)
    assert(got(1L) == ((5L, 5L, 1000000L)))
    assert(got(2L) == ((5L, 1L, 200000L)))
    assert(got(3L)._2 == 0L && got(3L)._3 == 0L)
    assert(got(4L) == ((0L, 0L, 0L)))
  }

  test("memorizationOverlap plan: corpus side never exchanges") {
    import graft.ops.Dedup
    val corpus = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val eval = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = Dedup.memorizationOverlap(eval, "doc_id", "text", corpus, "text", 4)
      .queryExecution.executedPlan.toString
    // the corpus feeds a broadcast semi-join; its branch must contain no
    // shuffle exchange before that join
    assert(plan.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$plan")
  }

  // ---- Gopher rules ----

  test("gopherRules: each rule fires on its planted violation") {
    import graft.ops.TextAnalysis
    val good = ("the quick brown fox jumped over a lazy dog " * 8).trim
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "the of short"),                        // too few words
      (3L, ("x " * 60).trim),                      // 1-char words, no stopwords
      (4L, (("the of " * 30) + "### #x " * 30).trim), // symbol-heavy
      (5L, Seq.fill(60)("- the of bullet line").mkString("\n")), // all bullets
      (6L, null.asInstanceOf[String])              // null text
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("passed"))
    assert(!r(2L).getAs[Boolean]("rule_word_count"))
    assert(!r(3L).getAs[Boolean]("rule_mean_word_len") &&
      !r(3L).getAs[Boolean]("rule_stopwords"))
    assert(!r(4L).getAs[Boolean]("rule_symbol_ratio") &&
      !r(4L).getAs[Boolean]("rule_alpha_ratio"))
    assert(!r(5L).getAs[Boolean]("rule_bullet_ratio"))
    // null text must yield DEFINITE zero counts and booleans, not NULLs
    // that unbox silently (the bleu/rougeN asymmetry fix applied here)
    assert(!r(6L).isNullAt(r(6L).fieldIndex("n_words")), "n_words must not be NULL")
    assert(!r(6L).isNullAt(r(6L).fieldIndex("passed")), "passed must not be NULL")
    assert(r(6L).getAs[Long]("n_words") == 0L && !r(6L).getAs[Boolean]("passed"))
  }

  test("gopherRules plan: single narrow projection, no shuffle") {
    import graft.ops.TextAnalysis
    val docs = Seq((1L, "the of a")).toDF("doc_id", "text")
    val plan = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rule battery must not shuffle:\n$plan")
  }

  test("encodeStats plan: vocab join is hash, never a payload sort-merge") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val (merges, _) = Bpe.learnMerges(Bpe.wordCounts(docs, "text"), nMerges = 1)
    val plan = Bpe.encodeStats(docs, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    // SHUFFLE_HASH, not broadcast: a web-crawl vocabulary is unbounded
    assert(!plan.contains("SortMergeJoin"),
      s"vocab join must not sort-merge:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"vocab join must be a hash join:\n$plan")
  }
}
