package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for the round-8 curation operators (same protocol
  * as [[ScaleProbe]]: sf0.1 vs an N× id-shifted, shingle-disjoint
  * replication on fixed cores; linear-per-shard operators should show
  * wall ≈ N×).
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()

    val docs1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text", $"lang").localCheckpoint()
    val docsN = (0 until n).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(^|\\s)", "$1s" + i + "_").as("text"), $"lang")
    }.reduce(_ union _).localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def report(op: String, r1: (Long, Double), rN: (Long, Double)): Unit =
      println(f"SCALE $op%-28s 1x: ${r1._1}%9d rows ${r1._2}%6.1f s | ${n}x: " +
        f"${rN._1}%9d rows ${rN._2}%6.1f s | rows ${rN._1.toDouble / math.max(1, r1._1)}%4.1fx time ${rN._2 / r1._2}%4.1fx")

    def dsir(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Importance.dsirLogWeights(
        d, d.filter($"lang" === "en"), "doc_id", "text")
    report("dsir_log_weights",
      time(dsir(docs1).count()), time(dsir(docsN).count()))

    def ppl(d: org.apache.spark.sql.DataFrame) = {
      val counts = graft.ops.NgramLm.gramCounts(
        d.filter($"doc_id" % 1000000 >= 10), "text", maxN = 3)
      graft.ops.NgramLm.perplexityFilter(d, "doc_id", "text", counts, maxPpl = 1e9)
    }
    report("perplexity_filter",
      time(ppl(docs1).count()), time(ppl(docsN).count()))

    report("gopher_rules",
      time(graft.ops.TextAnalysis.gopherRules(docs1, "doc_id", "text").count()),
      time(graft.ops.TextAnalysis.gopherRules(docsN, "doc_id", "text").count()))

    def bpeEnc(d: org.apache.spark.sql.DataFrame) = {
      val (merges, _) = graft.ops.Bpe.learnMerges(
        graft.ops.Bpe.wordCounts(d, "text"), nMerges = 3)
      graft.ops.Bpe.encodeStats(d, "doc_id", "text", merges)
    }
    report("bpe_encode_stats",
      time(bpeEnc(docs1).count()), time(bpeEnc(docsN).count()))

    // filtered ANN: fixed store layout per scale, full-probe search
    val emb1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding").localCheckpoint()
    val embN = (0 until n).map { i =>
      emb1.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"embedding")
    }.reduce(_ union _).localCheckpoint()
    val qv = emb1.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    def filteredSearch(e: org.apache.spark.sql.DataFrame) = {
      val withMeta = e.withColumn("lang",
        when($"vec_id" % 2 === 0, "en").otherwise("de"))
      val model = graft.ops.Ivf.fit(withMeta, "vec_id", "embedding", k = 8)
      val assigned = graft.ops.Ivf.assign(withMeta, "embedding", model)
      graft.ops.Ivf.searchFiltered(assigned, "embedding", model, qv,
        topK = 10, nProbe = 2, predicate = $"lang" === "en")
    }
    report("ann_filtered_probe2",
      time(filteredSearch(emb1).count()), time(filteredSearch(embN).count()))

    // memorization audit: eval side fixed (20 docs), corpus side scales —
    // the broadcast discipline means wall should track the corpus scan
    def memo(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.memorizationOverlap(
        docs1.filter($"doc_id" < 20), "doc_id", "text",
        d.filter($"doc_id" % 1000000 >= 20), "text", n = 4)
    report("memorization_overlap",
      time(memo(docs1).count()), time(memo(docsN).count()))

    // SFT pair extraction: per-session windows over synthetic chats
    def sft(d: org.apache.spark.sql.DataFrame) = {
      val msgs = d.select(($"doc_id" % 1000).as("session"), $"doc_id".as("seq"),
        when(expr("doc_id div 1000") % 2 === 0, "user")
          .otherwise("assistant").as("role"),
        substring($"text", 1, 40).as("content"))
      graft.ops.Chat.sftPairs(msgs, "session", "seq", "role", "content", 4)
    }
    report("sft_pairs",
      time(sft(docs1).count()), time(sft(docsN).count()))

    // chunk coalescing: 120-char fragments → ≤500-char groups, per-doc greedy
    def coal(d: org.apache.spark.sql.DataFrame) = {
      val chunks = graft.ops.Split.chunkDocs(d, "doc_id", "text",
        t => graft.ops.Split.fixedWindow(t, 120, 120))
      graft.ops.Split.coalesceChunks(chunks, "doc_id", "chunk_idx",
        "chunk_text", targetChars = 500)
    }
    report("chunk_coalesce",
      time(coal(docs1).count()), time(coal(docsN).count()))

    // edit distance: adjacent-doc pairing, pure projection
    def ed(d: org.apache.spark.sql.DataFrame) = {
      val p = d.select($"doc_id", $"text".as("ref"),
        substring($"text", 1, 120).as("cand"))
      graft.ops.Testbed.editDistance(p, "doc_id", "cand", "ref")
    }
    report("edit_distance",
      time(ed(docs1).count()), time(ed(docsN).count()))

    // bootstrap CI: 20 replicates over the corpus token counts
    def ci(d: org.apache.spark.sql.DataFrame) = {
      val v = d.select($"doc_id",
        graft.ops.TextAnalysis.tokenCount($"text").cast("double").as("value"))
      graft.ops.Testbed.bootstrapCi(v, "doc_id", "value", b = 20)
    }
    report("bootstrap_ci",
      time(ci(docs1).count()), time(ci(docsN).count()))

    // incremental near-dup: a fixed 50-doc batch checked against a
    // 1x vs Nx historical store through the maintained band sidecar —
    // the check should track the sidecar equi-join, not re-signature
    // the corpus
    def ndup(d: org.apache.spark.sql.DataFrame, tag: String) = {
      val root = java.nio.file.Files.createTempDirectory(s"ndsc-$tag").toString
      graft.ops.VersionedStore.append(spark, s"$root/t", d)
      graft.ops.Dedup.buildMinhashSidecarForStore(spark, s"$root/t",
        "doc_id", "text", s"$root/sc")
      // batch re-keys 50 docs of the store's OWN first shard, so the
      // planted near-dups exist at every scale
      val batch = d.filter($"doc_id" < 50)
        .select(($"doc_id" + 900000000L).as("doc_id"), $"text")
      graft.ops.Dedup.nearDupAgainstStore(spark, batch, "doc_id", "text",
        s"$root/t", s"$root/sc", threshold = 0.2)
    }
    report("neardup_against_store",
      time(ndup(docs1, "1x").count()), time(ndup(docsN, "nx").count()))

    // embedding near-dup against 1x vs Nx history through the SRP sidecar
    def endup(e: org.apache.spark.sql.DataFrame, tag: String) = {
      val root = java.nio.file.Files.createTempDirectory(s"srp-$tag").toString
      graft.ops.VersionedStore.append(spark, s"$root/t", e)
      graft.ops.Dedup.buildSrpSidecarForStore(spark, s"$root/t",
        "vec_id", "embedding", s"$root/sc")
      val batch = e.filter($"vec_id" < 50)
        .select(($"vec_id" + 900000000L).as("vec_id"), $"embedding")
      graft.ops.Dedup.embNearDupAgainstStore(spark, batch, "vec_id",
        "embedding", s"$root/t", s"$root/sc", threshold = 0.9)
    }
    report("embdup_against_store",
      time(endup(emb1, "1x").count()), time(endup(embN, "nx").count()))

    // DSIR selection QUALITY (not timing): a CONTENT-defined target
    // domain (the synthetic lang labels share one vocabulary, so no
    // unigram model can separate them — that's the fixture, not the
    // operator). Target = heavily "vector"-flavored docs; measure how
    // much the selection enriches that trait vs the corpus baseline.
    val trait_ = size(filter(split(trim($"text"), "\\s+"),
      t => t === "vector")) >= 3
    val nBase = docs1.filter(trait_).count().toDouble / docs1.count()
    val sel = graft.ops.Importance.dsirTopK(docs1,
      docs1.filter(trait_), "doc_id", "text", quota = 500)
    val nSel = sel.join(docs1.select($"doc_id", $"text"), "doc_id")
      .filter(trait_).count().toDouble / 500
    println(f"DSIR-QUALITY corpus trait-fraction $nBase%.3f -> selected " +
      f"$nSel%.3f (${nSel / nBase}%.1fx enrichment)")

    spark.stop()
  }
}
