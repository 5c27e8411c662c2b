package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 scaling evidence (the [[CurationProbe]] protocol: sf0.1 vs
  * an N× replication on fixed cores):
  *
  *   - winnowing pairs, RE-FIXTURED: the r9 probe replicated by
  *     prefixing every word, which floods every winnowing window with
  *     per-replica prefix grams — the df-cap (correctly) drops them
  *     all and the probe measured nothing (0 rows at 8×). Here each
  *     replica is a per-replica CHARACTER ROTATION (`translate`), which
  *     preserves the k-gram structure inside a replica (same
  *     fingerprint df distribution, same pairs) while keeping replicas
  *     disjoint — rows must scale ≈ N×, and the probe keeps a signal.
  *   - classifier fit+score at 16× (one scale point existed);
  *   - IVF bitext mining at 16× (the new scale path; the exact miner
  *     is O(|A|·|B|) and exists as the oracle anchor only).
  */
object R10Probe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def report(op: String, nx: Int, r1: (Long, Double), rN: (Long, Double)): Unit =
      println(f"SCALE $op%-28s 1x: ${r1._1}%9d rows ${r1._2}%6.1f s | ${nx}x: " +
        f"${rN._1}%9d rows ${rN._2}%6.1f s | rows ${rN._1.toDouble / math.max(1, r1._1)}%4.1fx time ${rN._2 / r1._2}%4.1fx")

    val docs1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text", $"lang").localCheckpoint()
    // character-rotation replication: replica i maps a..z -> rotate(i)
    // (replica 0 is the original); k-gram structure survives per replica
    // rotate lower, UPPER, and digits: any class left unrotated keeps
    // its k-grams shared across replicas and inflates their df 8x
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digit = "0123456789"
    def rot(s: String, i: Int): String = s.drop(i % s.length) + s.take(i % s.length)
    val docsRot = (0 until n).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        translate($"text", lower + upper + digit,
          rot(lower, i) + rot(upper, i) + rot(digit, i)).as("text"), $"lang")
    }.reduce(_ union _).localCheckpoint()

    def winn(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.winnowingOverlapPairs(
        graft.ops.TextAnalysis.winnowingFingerprints(d, "doc_id", "text"),
        "doc_id", maxDf = 20, minShared = 3)
    report("winnowing_pairs_rot", n,
      time(winn(docs1).count()), time(winn(docsRot).count()))

    // classifier at 16x: vocab-disjoint word-prefix replication (the
    // hashed-feature space must see new features, not duplicates)
    val m = 16
    val docsP = (0 until m).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(^|\\s)", "$1s" + i + "_").as("text"), $"lang")
    }.reduce(_ union _).localCheckpoint()
    def clf(d: org.apache.spark.sql.DataFrame) = {
      val labeled = d.withColumn("y", when($"lang" === "en", 1.0).otherwise(0.0))
      val w = graft.ops.Classifier.fitLogReg(labeled, "doc_id", "text", "y",
        iters = 12, lr = 2.0)
      graft.ops.Classifier.score(d, "doc_id", "text", w)
    }
    report("classifier_fit_score", m,
      time(clf(docs1).count()), time(clf(docsP).count()))

    // IVF bitext at 16x: halves of the embeddings table as the two
    // languages; cells scale with the corpus, probes stay fixed
    val emb1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter($"embedding".isNotNull)
      .select($"vec_id", $"embedding", $"label").localCheckpoint()
    val embM = (0 until m).map { i =>
      emb1.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ union _).localCheckpoint()
    def bitext(e: org.apache.spark.sql.DataFrame, cells: Int) = {
      val a = e.filter($"label" < 4).select($"vec_id", $"embedding")
      val b = e.filter($"label" >= 4).select($"vec_id", $"embedding")
      val model = graft.ops.Ivf.fit(b, "vec_id", "embedding", k = cells)
      graft.ops.Contrastive.mineBitextIvf(a, b, "vec_id", "vec_id",
        "embedding", model, nProbe = math.min(4, cells), k = 4, minMargin = 1.0)
    }
    report("bitext_mining_ivf", m,
      time(bitext(emb1, 8).count()), time(bitext(embM, 32).count()))

    spark.stop()
  }
}
