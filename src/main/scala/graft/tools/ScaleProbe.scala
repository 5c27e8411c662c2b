package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence probe (not driver-run): executes the heavy operators
  * on the sf0.1 tables AND on an N× scale-up, and prints the observed
  * time/cardinality ratios, so SCALE.md's "would this survive a
  * scale-up?" claims carry measurements instead of assertions.
  *
  * The scale-up replicates each table N times with shifted ids and a
  * per-shard token prefix on text (shards share no shingles), so the
  * near-dup structure per shard matches sf0.1 exactly and the IDEAL
  * scaling is: candidates/pairs N×, wall time ≈ N× on fixed cores
  * (all operators here are linear-per-shard by design — anything
  * super-linear would surface as a ratio ≫ N).
  */
object ScaleProbe {
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
    val emb1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding").localCheckpoint()
    val docsN = (0 until n).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        // per-shard token prefix: shards share no shingles, so per-shard
        // dedup structure is exactly sf0.1's
        regexp_replace($"text", "(^|\\s)", "$1s" + i + "_").as("text"), $"lang")
    }.reduce(_ union _).localCheckpoint()
    val embN = (0 until n).map { i =>
      emb1.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"embedding")
    }.reduce(_ union _).localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def report(op: String, r1: (Long, Double), rN: (Long, Double)): Unit =
      println(f"SCALE $op%-28s 1x: ${r1._1}%9d rows ${r1._2}%6.1f s | ${n}x: " +
        f"${rN._1}%9d rows ${rN._2}%6.1f s | rows ${rN._1.toDouble / math.max(1, r1._1)}%4.1fx time ${rN._2 / r1._2}%4.1fx")

    report("dedup_exact",
      time(graft.ops.Dedup.exact(docs1, "doc_id", "text").count()),
      time(graft.ops.Dedup.exact(docsN, "doc_id", "text").count()))

    // pair generation measured alone; clustering + survivor selection
    // measured on the materialized pair set (the operator's input
    // contract — pairs are produced once and reused in a real pipeline)
    val (pairs1, tP1) = time(graft.ops.Dedup.ngramJaccardPairs(docs1, "doc_id", "text", 0.2))
    val (pairsN, tPN) = time(graft.ops.Dedup.ngramJaccardPairs(docsN, "doc_id", "text", 0.2))
    report("ngram_jaccard_pairs", (pairs1.count(), tP1), (pairsN.count(), tPN))

    report("near_dup_survivors",
      time(graft.ops.Dedup.nearDupSurvivors(docs1, "doc_id", pairs1).count()),
      time(graft.ops.Dedup.nearDupSurvivors(docsN, "doc_id", pairsN).count()))

    report("simhash_pairs",
      time(graft.ops.Dedup.simhashNearDupPairs(docs1, "doc_id", "text").count()),
      time(graft.ops.Dedup.simhashNearDupPairs(docsN, "doc_id", "text").count()))

    report("stratified_quota",
      time(graft.ops.Sampling.stratifiedQuota(docs1, "lang", "doc_id",
        Map("en" -> 400), 100).count()),
      time(graft.ops.Sampling.stratifiedQuota(docsN, "lang", "doc_id",
        Map("en" -> 400), 100).count()))

    report("decontaminate",
      time(graft.ops.Dedup.decontaminate(docs1.filter($"doc_id" % 1000000 >= 20), "doc_id",
        "text", docs1.filter($"doc_id" % 1000000 < 20), "text", 4).count()),
      time(graft.ops.Dedup.decontaminate(docsN.filter($"doc_id" % 1000000 >= 20), "doc_id",
        "text", docsN.filter($"doc_id" % 1000000 < 20), "text", 4).count()))

    // batch similarity: fixed 10-query batch, corpus grows Nx — ideal is
    // time Nx with a CONSTANT result size (top-k per query)
    val q = emb1.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
    report("similarity_join_topk",
      time(graft.ops.Similarity.similarityJoin(q, emb1.filter($"vec_id" >= 10),
        "query_id", "embedding", "vec_id", "embedding", 4).count()),
      time(graft.ops.Similarity.similarityJoin(q, embN.filter($"vec_id" % 1000000 >= 10),
        "query_id", "embedding", "vec_id", "embedding", 4).count()))

    report("repetition_stats",
      time(graft.ops.TextAnalysis.repetitionStats(docs1, "doc_id", "text").count()),
      time(graft.ops.TextAnalysis.repetitionStats(docsN, "doc_id", "text").count()))

    // ---- round-4/5 operators ----

    // bm25 wants term matches to grow with the corpus, so its scale-up
    // replicates text UNperturbed (df, postings, and avgdl all scale N×;
    // the per-shard prefix above would instead strand the query terms in
    // shard 0). Result size is constant (topK); ideal time ≈ N×.
    val docsNsame = (0 until n).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text", $"lang")
    }.reduce(_ union _).localCheckpoint()
    val terms = Seq("spark", "vector", "merge", "window")
    report("bm25_scan",
      time(graft.ops.Keyword.bm25(docs1, "doc_id", "text", terms, topK = 20).count()),
      time(graft.ops.Keyword.bm25(docsNsame, "doc_id", "text", terms, topK = 20).count()))

    // lexical index: build pays the full tokenize+explode (ideal N×);
    // the indexed query touches postings buckets + the (id, dl) join —
    // its cost should scale with matches, far below the scan path's
    val idx1 = java.nio.file.Files.createTempDirectory("lexidx1").toString
    val idxN = java.nio.file.Files.createTempDirectory("lexidxN").toString
    val (_, tB1) = time(graft.ops.Keyword.buildLexicalIndex(docs1, "doc_id", "text", idx1))
    val (_, tBN) = time(graft.ops.Keyword.buildLexicalIndex(docsNsame, "doc_id", "text", idxN))
    report("lexical_index_build", (docs1.count(), tB1), (docsNsame.count(), tBN))
    report("bm25_indexed_query",
      time(graft.ops.Keyword.bm25Indexed(spark, idx1, terms, topK = 20).count()),
      time(graft.ops.Keyword.bm25Indexed(spark, idxN, terms, topK = 20).count()))

    // as-of join: events replicate with shifted user ids (per-shard
    // timeline identical), so matches and output rows scale N× on one
    // key exchange — the plan that replaces the per-key cartesian
    val ev1 = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select($"user_id", $"event_id", $"event_type", expr("ts div 1000").as("tus"))
      .localCheckpoint()
    val evN = (0 until n).map { i =>
      ev1.select(($"user_id" + lit(i * 1000000L)).as("user_id"),
        ($"event_id" + lit(i * 100000000L)).as("event_id"), $"event_type", $"tus")
    }.reduce(_ union _).localCheckpoint()
    def asof(ev: DataFrame) = {
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"tus", $"event_id")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"tus").agg(max($"event_id").as("p_event"))
      graft.ops.AsOf.asOfJoin(clicks, purchases, "user_id", "tus",
        tolerance = Some(lit(600000000L)))
    }
    report("asof_join_tolerance",
      time(asof(ev1).count()), time(asof(evN).count()))

    // range join: per-shard point values repeat (doc_id mod shard), so a
    // fixed 100-interval set matches N× the points through the same
    // bin-count hash shuffle
    def rangeJoin(docs: DataFrame) = {
      val pts = docs.select($"doc_id", ($"doc_id" % 1000000L).cast("double").as("v"))
      val iv = spark.range(100).select($"id".as("iid"),
        ($"id" * 37 + 10).cast("double").as("lo"), ($"id" * 37 + 60).cast("double").as("hi"))
      graft.ops.RangeJoin.binned(pts, "v", iv, "lo", "hi", binWidth = 50.0)
    }
    report("range_join_binned",
      time(rangeJoin(docs1).count()), time(rangeJoin(docsN).count()))

    // k-means fit: 2 Lloyd rounds over an N× corpus — the per-element
    // aggregate update ships k×dim doubles per round regardless of
    // corpus size (rows column = corpus vectors fitted)
    report("ivf_fit",
      time { graft.ops.Ivf.fit(emb1, "vec_id", "embedding", k = 8); emb1.count() },
      time { graft.ops.Ivf.fit(embN, "vec_id", "embedding", k = 8); embN.count() })

    // batch MMR: fixed 10-query batch, corpus N× — fetch is the bounded
    // similarity join, greedy is per-query over ≤ fetchK rows (constant)
    report("mmr_batch",
      time(graft.ops.Similarity.mmrBatch(q, emb1.filter($"vec_id" >= 10),
        "query_id", "embedding", "vec_id", "embedding", k = 4, fetchK = 20).count()),
      time(graft.ops.Similarity.mmrBatch(q, embN.filter($"vec_id" % 1000000 >= 10),
        "query_id", "embedding", "vec_id", "embedding", k = 4, fetchK = 20).count()))

    // ---- round-6 operators ----

    // IVF + SQ8 composed serving: corpus N× behind the same k=8
    // clustering, single query probing nprobe=2 of 8 clusters via
    // partition pruning, int8 coarse scan, exact top-10 rescore. Rows
    // constant (k); ideal wall ≈ N× of the probed quarter — well under
    // the exhaustive path's N×. Recall@10 vs exhaustive printed
    // alongside (the approximation's other axis; a fast low-recall
    // probe is not a win).
    import java.nio.file.Files
    val qv = emb1.filter($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).toArray
    def ivfQuantStore(emb: DataFrame): String = {
      val t = Files.createTempDirectory("sp-ivfq").toString + "/t"
      graft.ops.VersionedStore.append(spark, t, emb)
      graft.ops.Ivf.indexStore(spark, t, "vec_id", "embedding", k = 8)
      graft.ops.Quantize.quantizeStore(spark, t, "embedding")
      t
    }
    val (qs1, tQB1) = time(ivfQuantStore(emb1))
    val (qsN, tQBN) = time(ivfQuantStore(embN))
    report("ivf_sq8_store_build", (emb1.count(), tQB1), (embN.count(), tQBN))
    def quantProbe(path: String): Set[Long] = {
      val model = graft.ops.Ivf.loadModel(spark, graft.ops.Ivf.modelPath(path))
      val probes = model.probeOrder(qv).take(2).toSeq
      // % 1000000: the N× shards clone the query vector at ids i*1e6 —
      // the exclusion must match exactN's or recall is understated
      val st = graft.ops.VersionedStore.read(spark, path).get
        .filter($"cluster_id".isin(probes: _*) && $"vec_id" % 1000000 =!= 0)
      graft.ops.Quantize.knnQuantizedRescore(st, "vec_id", "embedding", qv, k = 10)
        .select($"vec_id").as[Long].collect().toSet
    }
    val (hits1, tQP1) = time(quantProbe(qs1))
    val (hitsN, tQPN) = time(quantProbe(qsN))
    report("ivf_sq8_probe2of8", (hits1.size.toLong, tQP1), (hitsN.size.toLong, tQPN))
    val exact1 = graft.ops.Similarity.knn(emb1.filter($"vec_id" =!= 0),
      "embedding", qv, k = 10).select($"vec_id").as[Long].collect().toSet
    val exactN = graft.ops.Similarity.knn(embN.filter($"vec_id" % 1000000 =!= 0),
      "embedding", qv, k = 10).select($"vec_id").as[Long].collect().toSet
    println(f"SCALE ivf_sq8_recall@10          1x: ${hits1.intersect(exact1).size / 10.0}%4.2f | ${n}x: ${hitsN.intersect(exactN).size / 10.0}%4.2f (nprobe=2)")
    // the recall/cost knob: sweep nprobe on the 1× store — full probe
    // must recover the exact set (recall 1.0, the CORRECTNESS anchor)
    val model1 = graft.ops.Ivf.loadModel(spark, graft.ops.Ivf.modelPath(qs1))
    val sweep = Seq(1, 2, 4, 8).map { p =>
      val probes = model1.probeOrder(qv).take(p).toSeq
      val st = graft.ops.VersionedStore.read(spark, qs1).get
        .filter($"cluster_id".isin(probes: _*) && $"vec_id" =!= 0)
      val got = graft.ops.Quantize.knnQuantizedRescore(st, "vec_id", "embedding", qv, k = 10)
        .select($"vec_id").as[Long].collect().toSet
      f"nprobe=$p:${got.intersect(exact1).size / 10.0}%4.2f"
    }
    println(s"SCALE ivf_sq8_recall_sweep       ${sweep.mkString("  ")}")

    // The same sweep on a CLUSTERED fixture — the geometry IVF's premise
    // (locality) holds on. The near-uniform embeddings table above shows
    // the recall FLOOR (nprobe=1 ≈ 1/k); this shows the intended
    // operating point: the true neighbors share the query's cluster, so
    // small-nprobe recall is high and the advisor's imbalance thresholds
    // have an empirical healthy baseline (printed alongside).
    val (cdf0, ccenters) = Fixtures.clusteredEmbeddings(spark, k = 8,
      perCluster = 2500, dim = 32)
    val cdf = cdf0.persist()
    val ct = Files.createTempDirectory("sp-ivfclu").toString + "/t"
    graft.ops.VersionedStore.append(spark, ct, cdf)
    val cmodel = graft.ops.Ivf.indexStore(spark, ct, "vec_id", "embedding", k = 8)
    val cstore = graft.ops.VersionedStore.read(spark, ct).get.persist()
    val csweep = Seq(1, 2, 4, 8).map { p =>
      val rs = ccenters.map { q =>
        val exact = graft.ops.Similarity.knn(cdf, "embedding", q, 10)
          .select($"vec_id").as[Long].collect().toSet
        val got = graft.ops.Ivf.search(cstore, "embedding", cmodel, q, 10, nProbe = p)
          .select($"vec_id").as[Long].collect().toSet
        got.count(exact.contains) / 10.0
      }
      f"nprobe=$p:${rs.sum / rs.length}%4.2f"
    }
    val cratio = graft.ops.Ivf.imbalanceRatio(spark, ct).get
    println(s"SCALE ivf_clustered_recall_sweep ${csweep.mkString("  ")}" +
      f"  (imbalance ${cratio}%.2fx)")
    cdf.unpersist(); cstore.unpersist(): Unit

    // PQ tiers: fit is sample-bounded (ideal ≈ flat), encode is the
    // linear full-corpus pass, the residual IVF-PQ serve is bounded by
    // the probed fraction + k×overfetch rescore (ideal ≈ probed-rows
    // proportional; both sides read codes, not floats).
    val (pqm1, tPF1) = time(graft.ops.Pq.fit(emb1, "vec_id", "embedding", m = 8, ncent = 16))
    val (pqmN, tPFN) = time(graft.ops.Pq.fit(embN, "vec_id", "embedding", m = 8, ncent = 16))
    report("pq_fit_sampled", (emb1.count(), tPF1), (embN.count(), tPFN))
    val (pqe1, tPE1) = time(graft.ops.Pq.encode(emb1, "embedding", pqm1)
      .agg(sum(element_at(col("embedding_pq"), 1).cast("long"))).head().getLong(0))
    val (pqeN, tPEN) = time(graft.ops.Pq.encode(embN, "embedding", pqmN)
      .agg(sum(element_at(col("embedding_pq"), 1).cast("long"))).head().getLong(0))
    report("pq_encode", (emb1.count(), tPE1), (embN.count(), tPEN))
    def ivfPqServe(emb: DataFrame): (Long, Double) = {
      val ivf = graft.ops.Ivf.fit(emb, "vec_id", "embedding", k = 8)
      val rpq = graft.ops.Pq.fitResiduals(emb, "vec_id", "embedding", ivf, m = 8, ncent = 16)
      val enc = graft.ops.Pq.encodeResiduals(
        graft.ops.Ivf.assign(emb, "embedding", ivf), "embedding", "cluster_id", ivf, rpq)
        .localCheckpoint()
      val (rows, t) = time(graft.ops.Pq.searchIvfPq(enc, "vec_id", "embedding", qv, 10,
        ivf, rpq, nProbe = 2).count())
      (rows, t)
    }
    report("ivfpq_serve_2of8", ivfPqServe(emb1), ivfPqServe(embN))

    // Incremental lexical maintenance: the O(new docs) claim. Both
    // stores take the SAME one-shard append; only the pre-existing
    // corpus differs (1 shard vs N). Ideal time ratio ≈ 1.0× — the fold
    // tokenizes the appended segments only, never the corpus (a full
    // rebuild would be N×).
    def lexAppendMaintain(base: DataFrame): Double = {
      val st = Files.createTempDirectory("sp-lexincr").toString + "/t"
      val ix = Files.createTempDirectory("sp-lexincr-ix").toString
      graft.ops.VersionedStore.append(spark, st, base)
      graft.ops.Keyword.buildLexicalIndexForStore(spark, st, "doc_id", "text", ix)
      val extra = docs1.select(($"doc_id" + lit(900000000L)).as("doc_id"), $"text")
      graft.ops.VersionedStore.append(spark, st, extra)
      val (_, tm) = time(
        graft.ops.Keyword.appendToLexicalIndexForStore(spark, st, "doc_id", "text", ix))
      tm
    }
    val tLM1 = lexAppendMaintain(docs1.select($"doc_id", $"text"))
    val tLMN = lexAppendMaintain(docsNsame.select($"doc_id", $"text"))
    report("lexical_incr_maintain", (docs1.count(), tLM1), (docs1.count(), tLMN))

    // Hybrid RRF serving: BM25 leg + kNN leg, both top-50, fused top-10
    // — corpus N× on both legs, constant output; ideal ≈ N× (each leg is
    // a linear scan at this fixture; the indexed variants above are the
    // sub-linear serving path).
    import org.apache.spark.sql.expressions.Window
    def hybrid(docs: DataFrame, emb: DataFrame): Long = {
      val vecRank = graft.ops.Similarity.knn(emb, "embedding", qv, k = 50)
        .withColumn("rank", row_number().over(Window.partitionBy(lit(1)).orderBy($"score".desc, $"vec_id")))
        .select($"vec_id".as("doc_id"), $"rank")
      val kwRank = graft.ops.Keyword.bm25(docs, "doc_id", "text", terms, topK = 50)
        .withColumn("rank", row_number().over(Window.partitionBy(lit(1)).orderBy($"bm25".desc, $"doc_id")))
        .select($"doc_id", $"rank")
      graft.ops.Keyword.rrfFuse(Seq(vecRank, kwRank), "doc_id", "rank",
        c = 60, topK = 10).count()
    }
    report("hybrid_rrf_serving",
      time(hybrid(docs1.select($"doc_id", $"text"), emb1)),
      time(hybrid(docsNsame.select($"doc_id", $"text"), embN)))

    // Deterministic shuffle: the only new training-mix op with a global
    // exchange (range sort + the zipWithIndex count pass) — ideal N×
    report("deterministic_shuffle",
      time(graft.ops.Sampling.deterministicShuffle(
        docs1.select($"doc_id"), "doc_id", "e0").count()),
      time(graft.ops.Sampling.deterministicShuffle(
        docsN.select($"doc_id"), "doc_id", "e0").count()))

    // Sequence packing: shuffle + two-pass prefix sum — ideal N× rows
    // at ≈ N× wall (the only wide step is the shuffle's range exchange)
    def pack(docs: DataFrame) = graft.ops.Sampling.packWindows(
      docs.select($"doc_id", size(split($"text", "\\s+")).cast("long").as("tokens")),
      "doc_id", "tokens", budget = 512, seed = "e0").count()
    report("pack_sequence_windows",
      time(pack(docs1)), time(pack(docsN)))

    // Cross-corpus join: left fixed (one shard), right grows N× — ideal
    // candidates/pairs ≈ N× of the 1× cross slice, time ≈ N×
    report("crosscorpus_jaccard",
      time(graft.ops.Dedup.ngramJaccardJoin(
        docs1.select($"doc_id", $"text"), "doc_id", "text",
        docs1.select(($"doc_id" + 500000000L).as("doc_id"), $"text"), "doc_id", "text",
        0.2).count()),
      time(graft.ops.Dedup.ngramJaccardJoin(
        docs1.select($"doc_id", $"text"), "doc_id", "text",
        docsNsame.select(($"doc_id" + 500000000L).as("doc_id"), $"text"), "doc_id", "text",
        0.2).count()))

    // ---- round-7 operators ----

    // Bloom decontamination: corpus grows N×, eval set FIXED (the real
    // shape — eval suites don't grow with the corpus). The corpus-side
    // explode+filter is the only N-proportional work; the verify join
    // sees only bloom-positive survivors — ideal time ≈ N×
    report("decontaminate_bloom",
      time(graft.ops.Dedup.decontaminateBloom(
        docs1.filter($"doc_id" % 1000000 >= 20), "doc_id", "text",
        docs1.filter($"doc_id" % 1000000 < 20), "text", 4).count()),
      time(graft.ops.Dedup.decontaminateBloom(
        docsN.filter($"doc_id" % 1000000 >= 20), "doc_id", "text",
        docs1.filter($"doc_id" % 1000000 < 20), "text", 4).count()))

    // Vocabulary profile: explode + map-side partial agg + TakeOrdered —
    // the shuffle carries the vocabulary (per-shard prefixes make it
    // ≈N× here; real corpora sublinear), rows to driver stay k
    report("vocab_topk",
      time(graft.ops.TextAnalysis.vocabTopK(docs1, "text", 25).count()),
      time(graft.ops.TextAnalysis.vocabTopK(docsN, "text", 25).count()))

    // Curriculum ordering: same global range-sort + zipWithIndex shape
    // as deterministic_shuffle with the phase prefix — ideal N×
    def curriculum(docs: DataFrame) = graft.ops.Curation.curriculumOrder(
      docs.select($"doc_id", length($"text").as("len")),
      when($"len" >= 200, 0).otherwise(1), "doc_id", "e0").count()
    report("curriculum_order", time(curriculum(docs1)), time(curriculum(docsN)))

    // Quantile gate: one partial-agg job for the threshold (fixed-size
    // GK sketch at scale) + a map-side filter — ideal N×
    def qgate(docs: DataFrame) = graft.ops.Curation.filterByQuantile(
      docs.select($"doc_id", length($"text").cast("double").as("len")),
      "len", 0.5).count()
    report("quality_quantile_gate", time(qgate(docs1)), time(qgate(docsN)))

    // Copy-on-write merge: table of N× shards as N segments, updates
    // touch ONE shard's keys — the rewrite must stay ≈ CONSTANT as the
    // table grows (only detection's key-column scan grows N×). rows =
    // segments rewritten (must be 1 at both scales)
    val (_, tM1) = time {
      val root = java.nio.file.Files.createTempDirectory("scaleprobe-merge").toString + "/t"
      graft.ops.VersionedStore.append(spark, root, docs1.select($"doc_id", $"text"))
      graft.ops.VersionedStore.merge(spark, root,
        docs1.filter($"doc_id" % 50 === 0)
          .select($"doc_id", concat($"text", lit(" u")).as("text")), "doc_id")
    }
    val (rwN, tMN) = time {
      val root = java.nio.file.Files.createTempDirectory("scaleprobe-merge").toString + "/t"
      (0 until n).foreach { i =>
        graft.ops.VersionedStore.append(spark, root,
          docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text"))
      }
      // updates hit only shard 0's keys: exactly one of the n segments
      // rewrites; detection reads the key column of all n
      graft.ops.VersionedStore.merge(spark, root,
        docs1.filter($"doc_id" % 50 === 0)
          .select($"doc_id", concat($"text", lit(" u")).as("text")), "doc_id")
    }
    report("merge_one_of_n_segments", (1L, tM1), (rwN._2.toLong, tMN))

    // Incremental rollup: the fold reads the BATCH plus the per-key
    // rollup rows, never history — fold time must stay flat as the
    // already-folded history grows N× (rows = state rows, fixed by the
    // key cardinality)
    def rollupProbe(history: Int): (Long, Double) = {
      val root = java.nio.file.Files.createTempDirectory("scaleprobe-rollup")
        .toString + "/agg"
      val batch = docs1.select($"doc_id", $"lang",
        length($"text").cast("long").as("len"))
      (0 until history).foreach(i =>
        graft.ops.Rollup.maintain(spark, root,
          batch.withColumn("doc_id", $"doc_id" + lit(i * 1000000L)),
          Seq("lang"), Seq("len")): Unit)
      time(graft.ops.Rollup.maintain(spark, root, batch,
        Seq("lang"), Seq("len")))
    }
    report("rollup_fold_after_history", rollupProbe(1), rollupProbe(n))

    // Boilerplate line removal: the per-shard prefix means the planted
    // header/footers are per-shard too — heavy-set size grows with
    // shards but stays broadcast-small; time must stay ≈N×
    def withBoiler(docs: DataFrame) = docs.select($"doc_id",
      concat_ws("\n", lit("HDR"), $"text",
        concat(lit("FTR-"), ($"doc_id" % 7).cast("string"))).as("text"))
    report("boilerplate_lines",
      time(graft.ops.Curation.removeBoilerplateLines(
        withBoiler(docs1), "doc_id", "text", 100).count()),
      time(graft.ops.Curation.removeBoilerplateLines(
        withBoiler(docsN), "doc_id", "text", 100).count()))

    // Duplicated-span removal: shards share no grams (token prefixes),
    // so dup grams and covered tokens scale N× and the three digest-
    // keyed shuffles must track it linearly
    report("span_removal",
      time(graft.ops.Dedup.removeDuplicatedSpans(docs1, "doc_id", "text", 8).count()),
      time(graft.ops.Dedup.removeDuplicatedSpans(docsN, "doc_id", "text", 8).count()))

    // PageRank: synthetic fan-in graph (each doc links to doc_id/3 and
    // doc_id/7) — N× docs give N× edges and ≈N× nodes; 3 iterations of
    // join+agg must track linearly
    def prEdges(docs: DataFrame) = docs
      .select($"doc_id".as("src"), ($"doc_id" / 3).cast("long").as("dst"))
      .union(docs.select($"doc_id".as("src"), ($"doc_id" / 7).cast("long").as("dst")))
    report("pagerank_3iter",
      time(graft.ops.GraphOps.pageRank(prEdges(docs1), "src", "dst", 3).count()),
      time(graft.ops.GraphOps.pageRank(prEdges(docsN), "src", "dst", 3).count()))

    report("char_bigram_entropy",
      time(graft.ops.TextAnalysis.charBigramEntropy(docs1, "doc_id", "text").count()),
      time(graft.ops.TextAnalysis.charBigramEntropy(docsN, "doc_id", "text").count()))

    // Event analytics: shard-shifted user ids replicate the per-user
    // structure exactly, so funnel reach and cohort rows scale with the
    // user population and time must track linearly
    val fev1 = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select($"user_id", $"ts", $"event_type").localCheckpoint()
    val fevN = (0 until n).map(i =>
        fev1.select(($"user_id" + lit(i * 1000000L)).as("user_id"), $"ts", $"event_type"))
      .reduce(_ union _).localCheckpoint()
    def reach(ev: org.apache.spark.sql.DataFrame): Long =
      graft.ops.Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
        .agg(sum($"n_users")).head().getLong(0)
    report("funnel_3step",
      time(reach(fev1)), time(reach(fevN)))
    report("cohort_retention",
      time(graft.ops.Funnel.cohortRetention(fev1, "user_id", "ts").count()),
      time(graft.ops.Funnel.cohortRetention(fevN, "user_id", "ts").count()))

    // SemDeDup: k grows with the corpus (constant expected cluster
    // population — the paper's operating point); within-cluster pairwise
    // work then scales with the corpus, not its square
    val sem1 = graft.ops.Ivf.fit(emb1, "vec_id", "embedding", k = 32)
    val semN = graft.ops.Ivf.fit(embN, "vec_id", "embedding", k = 32 * n)
    report("semantic_dedup",
      time(graft.ops.Dedup.semanticDedup(emb1, "vec_id", "embedding", sem1, 0.35).count()),
      time(graft.ops.Dedup.semanticDedup(embN, "vec_id", "embedding", semN, 0.35).count()))

    // retrieval evaluation: 16-query run + label qrels; the run is the
    // batch similarity join (already probed), metrics add two id-keyed
    // aggs — must track the join's own scaling
    val lemb1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding", $"label").localCheckpoint()
    val lembN = (0 until n).map(i =>
        lemb1.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"), $"embedding", $"label"))
      .reduce(_ union _).localCheckpoint()
    def rankEval(e: DataFrame): Long = {
      // anchors from shard 0 ONLY (vec_id < 16, not id-mod — a per-shard
      // selection would grow the broadcast batch with n and measure the
      // probe's own quadratic, not the operator's scaling)
      val q = e.filter($"vec_id" < 16)
        .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"label".as("qlabel"))
      val c = e.filter($"vec_id" >= 16)
      val run = graft.ops.Similarity.similarityJoin(
        q, c, "qid", "qemb", "vec_id", "embedding", k = 10)
      val qrels = q.select($"qid", $"qlabel")
        .join(c.select($"vec_id", $"label"), $"qlabel" === $"label")
        .select($"qid", $"vec_id")
      graft.ops.Testbed.rankingMetrics(run, qrels, "qid", "vec_id", "rank", 10).count()
    }
    report("ranking_metrics", time(rankEval(lemb1)), time(rankEval(lembN)))

    report("temperature_mix",
      time(graft.ops.Sampling.temperatureMix(docs1, "lang", "doc_id", 0.5, 2000L).count()),
      time(graft.ops.Sampling.temperatureMix(docsN, "lang", "doc_id", 0.5, 2000L * n).count()))

    report("tfidf_top_terms",
      time(graft.ops.Keyword.tfidfTopTerms(docs1, "doc_id", "text", 5).count()),
      time(graft.ops.Keyword.tfidfTopTerms(docsN, "doc_id", "text", 5).count()))

    // BPE: the word table is vocabulary-sized; the shard prefixes make
    // the N× vocab genuinely N× larger, each round one agg + one map
    report("bpe_learn_3merges",
      time { val (m, s) = graft.ops.Bpe.learnMerges(
        graft.ops.Bpe.wordCounts(docs1, "text"), 3); s.count() },
      time { val (m, s) = graft.ops.Bpe.learnMerges(
        graft.ops.Bpe.wordCounts(docsN, "text"), 3); s.count() })

    // contrastive mining: fixed 16-anchor batch (shard 0 only — see
    // rankEval), corpus grows — both label-filtered scans plus two
    // k-bounded tails must stay linear
    def mine(e: DataFrame): Long = {
      val anc = e.filter($"vec_id" < 16)
        .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"label".as("qlabel"))
      graft.ops.Contrastive.triples(anc, e.filter($"vec_id" >= 16),
        "qid", "qemb", "qlabel", "vec_id", "embedding", "label", negK = 5).count()
    }
    report("contrastive_triples", time(mine(lemb1)), time(mine(lembN)))

    // Stupid Backoff: count once per corpus, score a fixed 100-doc set —
    // the count agg scales with the corpus, the probe join with the
    // score set × count-table size
    def lmScore(corpus: DataFrame): Long = {
      val counts = graft.ops.NgramLm.gramCounts(corpus, "text", 3)
      graft.ops.NgramLm.scoreStupidBackoff(
        docs1.filter($"doc_id" < 100), "doc_id", "text", counts).count()
    }
    report("ngram_lm_score", time(lmScore(docs1)), time(lmScore(docsN)))

    // BLEU: self-paired corpus (cand = 25-token prefix of the next doc)
    // — pair count scales with the corpus, each pair's work is bounded
    def bleuAll(d: DataFrame): Long = {
      val ref = d.select($"doc_id", $"text".as("ref_text"))
      val cand = d.select(($"doc_id" + lit(1L)).as("doc_id"),
        $"text".as("cand_text"))
      graft.ops.Testbed.bleu(ref.join(cand, "doc_id"),
        "doc_id", "cand_text", "ref_text", maxN = 2).count()
    }
    report("eval_bleu_pairs", time(bleuAll(docs1)), time(bleuAll(docsN)))

    // chrF explodes 6 char-gram orders per side — the heaviest of the
    // generation metrics; pair count scales with the corpus
    def chrfAll(d: DataFrame): Long = {
      val ref = d.select($"doc_id", $"text".as("ref_text"))
      val cand = d.select(($"doc_id" + lit(1L)).as("doc_id"),
        $"text".as("cand_text"))
      graft.ops.Testbed.chrF(ref.join(cand, "doc_id"),
        "doc_id", "cand_text", "ref_text", maxN = 6).count()
    }
    report("eval_chrf_pairs", time(chrfAll(docs1)), time(chrfAll(docsN)))

    // full-corpus kNN graph via the IVF-bucketed join: the query side
    // IS the corpus (unbroadcastable by design); cells grow with the
    // corpus so expected cell population stays constant and the
    // Σ|q-cell|·|c-cell| candidate work tracks the corpus
    // the model is a build artifact (fit cost is k×N and amortized —
    // measured by ivf_fit above). The corpus×corpus join's own cost
    // model is the classical IVF N^1.5: query-side assignment is N·k,
    // join work N·nProbe·N/k — balanced at k ∝ √N, so the EXPECTED
    // ratio at n× is n^1.5 (8x at n=4), not n. The probe verifies the
    // model, not a linearity the algorithm never claimed.
    val am1 = graft.ops.Ivf.fit(emb1, "vec_id", "embedding", k = 32)
    val amN = graft.ops.Ivf.fit(embN, "vec_id", "embedding",
      k = (32 * math.sqrt(n.toDouble)).round.toInt)
    def annJoin(e: DataFrame, m: graft.ops.Ivf.IvfModel): Long =
      graft.ops.Similarity.ivfJoinTopK(
        e.select($"vec_id".as("qid"), $"embedding".as("qemb")), e,
        "qid", "qemb", "vec_id", "embedding", m, nProbe = 2, k = 5).count()
    report(f"ann_join_knn(expect${math.pow(n.toDouble, 1.5)}%.0fx)",
      time(annJoin(emb1, am1)), time(annJoin(embN, amN)))

    // expectations gate: all row-level rules in one scan + one exact
    // distinct for the uniqueness rule
    def gate(d: DataFrame): Long = graft.ops.Validate.validate(d, Seq(
      graft.ops.Validate.NotNull("text"),
      graft.ops.Validate.Unique(Seq("doc_id")),
      graft.ops.Validate.MatchesRegex("lang", "^[a-z]{2}$"),
      graft.ops.Validate.MinRows(100))).count()
    report("validate_expectations", time(gate(docs1)), time(gate(docsN)))

    spark.stop()
  }
}
