package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 scaling evidence and stage profiles:
  *
  * 1. `connectedComponents` at 16× — the dedup family's only unprobed
  *    multi-round stage. Two legs isolate the two axes:
  *    (a) corpus growth at FIXED diameter (chains of 100): rounds must
  *        stay constant and wall/shuffle bytes grow ~linearly — the
  *        100 TB claim is that component resolution costs
  *        O(E · rounds), with rounds set by graph shape, not size;
  *    (b) diameter growth (one chain of n): pointer jumping keeps
  *        rounds ~O(log n) — 16× the chain should add ~2 rounds,
  *        not 15× more.
  * 2. `training_mix_e2e` stage profile (r15 bench: 4.82 → 5.83 s) —
  *    which leg (normalize+span dedup / entropy / join+split+agg)
  *    carries the regression.
  * 3. `vectorserve_batch_ladder` stage profile (6.0 s, slowest bench
  *    row) — how much is one-time store construction (append, SQ8,
  *    IVF fit, PQ fit) vs the serving call the row is named for.
  *
  * Shuffle read bytes come from a stage listener (sum over the probed
  * block), min-of-K wall because this sandbox stalls runs at random.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead +
          sc.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead): Unit
    })

    def probe(label: String)(f: => Long): Unit = {
      val samples = (1 to runs).map { _ =>
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val rows = f
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        // listener events drain async; give the bus a beat before reading
        Thread.sleep(200)
        (wall, shuffleBytes.get(), rows)
      }
      val best = samples.minBy(_._1)
      println(f"[r16] $label%-46s min ${best._1}%7.2f s  max ${samples.map(_._1).max}%7.2f s  " +
        f"shuffle ${best._2 / 1e6}%8.1f MB  rows ${best._3}  cc_rounds ${graft.ops.Dedup.lastCcRounds}")
    }

    // ---- 1. connectedComponents scaling ----
    def chainEdges(nNodes: Long, chainLen: Int) =
      spark.range(nNodes).filter(pmod($"id", lit(chainLen)) =!= (chainLen - 1))
        .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    for (scale <- Seq(1L, 4L, 16L)) {
      val n = 100000L * scale
      probe(s"cc fixed-diameter chains(100) n=$n") {
        graft.ops.Dedup.connectedComponents(chainEdges(n, 100)).count()
      }
    }
    for (scale <- Seq(1L, 4L, 16L)) {
      val n = 10000L * scale
      probe(s"cc single-chain diameter=$n") {
        graft.ops.Dedup.connectedComponents(chainEdges(n, n.toInt)).count()
      }
    }

    // ---- 2. training_mix_e2e stage profile ----
    val docs = graft.Tables.documents(spark, sfDir)
    probe("mix: normalize only") {
      docs.select($"doc_id",
        graft.functions.NormalizeText.normalizeText($"text").as("text"))
        .agg(sum(length($"text"))).collect(); docs.count()
    }
    def norm = docs.select($"doc_id",
      graft.functions.NormalizeText.normalizeText($"text").as("text"))
    probe("mix: span removal (norm+spans)") {
      graft.ops.Dedup.removeDuplicatedSpans(norm, "doc_id", "text", k = 8).count()
    }
    probe("mix: char-bigram entropy") {
      graft.ops.TextAnalysis.charBigramEntropy(norm, "doc_id", "text").count()
    }
    probe("mix: FULL training_mix_e2e") {
      graft.queries.DedupQueries.queries("training_mix_e2e")(spark, sfDir).count()
    }

    // ---- 2b. tuneEf recall curve at sf scale (the SCALE.md curve) ----
    {
      val e = graft.Tables.embeddings(spark, sfDir)
      val path = java.nio.file.Files
        .createTempDirectory("r16-tune").toString + "/ix"
      val corpus = e.filter(col("vec_id") >= 50)
      val t0 = System.nanoTime()
      graft.ops.Hnsw.build(corpus, "vec_id", "embedding", path,
        graft.ops.Hnsw.Params(m = 16, efConstruction = 100), numPartitions = 8)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val t1 = System.nanoTime()
      val (chosen, curve) = graft.ops.Hnsw.tuneEf(spark, path, q, "qid", "qv",
        k = 10, targetRecall = 0.99,
        efLadder = Seq(10, 20, 40, 80, 160, 320, 1 << 20))
      val tTune = (System.nanoTime() - t1) / 1e9
      val pts = curve.orderBy(col("ef")).collect()
        .map(r => s"ef=${r.getInt(0)}:${r.getLong(2)}us").mkString(" ")
      println(f"[r16] tuneEf sf-corpus: build ${tBuild}%.2f s, tune ${tTune}%.2f s " +
        f"(ground truth + ONE multi-ef pass), chosen ef=$chosen, curve: $pts")
    }

    // ---- 3. vectorserve ladder stage profile ----
    probe("ladder: FULL vectorserve_batch_ladder") {
      graft.queries.VectorSearch.queries("vectorserve_batch_ladder")(spark, sfDir).count()
    }
    val e = graft.Tables.embeddings(spark, sfDir)
    val table = java.nio.file.Files
      .createTempDirectory("r16-ladder").toString + "/store"
    def stage(label: String)(f: => Unit): Unit = {
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      f
      println(f"[r16] ladder stage: $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"shuffle ${shuffleBytes.get() / 1e6}%8.1f MB")
    }
    stage("append") {
      graft.ops.VersionedStore.append(spark, table,
        e.filter($"vec_id" >= 10).select($"vec_id".as("id"), $"embedding")): Unit
    }
    stage("quantizeStore (SQ8)") {
      graft.ops.Quantize.quantizeStore(spark, table, "embedding"): Unit
    }
    stage("indexStore (IVF fit k=4)") {
      graft.ops.Ivf.indexStore(spark, table, "id", "embedding", k = 4): Unit
    }
    stage("pqStore (m=8 ncent=16)") {
      graft.ops.Pq.pqStore(spark, table, "embedding", m = 8, ncent = 16): Unit
    }
    val q = e.filter($"vec_id" < 10).select($"vec_id".as("query_id"), $"embedding")
    stage("searchBatch (IvfPq route)") {
      graft.ops.VectorServe.searchBatch(spark, table, "id", "embedding",
        q, "query_id", "embedding", k = 4, nProbe = 4, overfetch = 200).count(): Unit
    }
    spark.stop()
  }
}
