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

    spark.stop()
  }
}
