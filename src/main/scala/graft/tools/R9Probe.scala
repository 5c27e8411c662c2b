package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for the round-9 operators (the [[CurationProbe]]
  * protocol: sf0.1 vs an N× id-shifted, vocab-disjoint replication on
  * fixed cores): trained hashed-logreg classifier (fit + score),
  * embedding mean-pooling, bottom-k minwise corpus sketches, and the
  * token-budget waterline.
  */
object R9Probe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
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

    val emb1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter($"embedding".isNotNull)
      .select($"vec_id", $"embedding", $"label").localCheckpoint()
    val embN = (0 until n).map { i =>
      emb1.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
        $"embedding", pmod($"label" + lit(i), lit(8)).cast("int").as("label"))
    }.reduce(_ union _).localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def report(op: String, r1: (Long, Double), rN: (Long, Double)): Unit =
      println(f"SCALE $op%-28s 1x: ${r1._1}%9d rows ${r1._2}%6.1f s | ${n}x: " +
        f"${rN._1}%9d rows ${rN._2}%6.1f s | rows ${rN._1.toDouble / math.max(1, r1._1)}%4.1fx time ${rN._2 / r1._2}%4.1fx")

    def clf(d: org.apache.spark.sql.DataFrame) = {
      val labeled = d.withColumn("y", when($"lang" === "en", 1.0).otherwise(0.0))
      val w = graft.ops.Classifier.fitLogReg(labeled, "doc_id", "text", "y",
        iters = 12, lr = 2.0)
      graft.ops.Classifier.score(d, "doc_id", "text", w)
    }
    report("classifier_fit_score",
      time(clf(docs1).count()), time(clf(docsN).count()))

    def pool(e: org.apache.spark.sql.DataFrame) =
      graft.ops.Pool.meanPool(e, "label", "embedding", dim = 64)
    report("embedding_mean_pool",
      time(pool(emb1).count()), time(pool(embN).count()))

    def bk(d: org.apache.spark.sql.DataFrame) = {
      val sig = graft.ops.Sketch.bottomkSignatures(d, "lang", "text",
        k = 256, n = 3)
      graft.ops.Sketch.bottomkJaccard(sig, "lang", k = 256)
    }
    report("bottomk_jaccard",
      time(bk(docs1).count()), time(bk(docsN).count()))

    def bfm(d: org.apache.spark.sql.DataFrame) = {
      val perDomain = d.groupBy($"lang")
        .agg(sum(graft.ops.TextAnalysis.tokenCount($"text")).as("n_tokens"),
          round(avg(graft.ops.TextAnalysis.qualityScore($"text",
            graft.ops.TextAnalysis.StopwordsEn)), 6).as("quality"))
      graft.ops.Curation.budgetFillMix(perDomain, "lang", "n_tokens",
        "quality", budget = 500000L)
    }
    report("budget_fill_mix",
      time(bfm(docs1).count()), time(bfm(docsN).count()))

    def jsd(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.vocabJsDivergence(d, "lang", "text")
    report("vocab_jsd_drift",
      time(jsd(docs1).count()), time(jsd(docsN).count()))

    def winn(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.winnowingOverlapPairs(
        graft.ops.TextAnalysis.winnowingFingerprints(d, "doc_id", "text"),
        "doc_id", maxDf = 20, minShared = 3)
    report("winnowing_pairs",
      time(winn(docs1).count()), time(winn(docsN).count()))

    def rl(d: org.apache.spark.sql.DataFrame) = {
      val pairs = d.select($"doc_id", $"text".as("ref_text"))
        .join(d.select(($"doc_id" + 1L).as("doc_id"),
          $"text".as("cand_text")), "doc_id")
      graft.ops.Testbed.rougeL(pairs, "doc_id", "cand_text", "ref_text")
    }
    report("rouge_l",
      time(rl(docs1).count()), time(rl(docsN).count()))

    spark.stop()
  }
}
