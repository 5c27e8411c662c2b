package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for the round-9 second wave ([[CurationProbe]]
  * protocol: sf0.1 vs an N× id-shifted, vocab-disjoint replication on
  * fixed cores): SIF embeddings, positional phrase search, and the
  * blocklist gate. The media ops (dHash pairs, activity) are
  * fixture-bound codec kernels — per-row O(bytes), no corpus-scale
  * axis beyond the banded-pair join already probed via SimHash.
  *
  * Note on phrase search under vocab-disjoint replication: the
  * replicas' tokens are prefixed, so the phrase only matches the
  * original shard — match rows stay 1× while the SCANNED corpus grows
  * N×; flat wall time is the point (the filter prunes at the scan,
  * the shuffle carries only true phrase-term postings).
  */
object R9bProbe {
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
    // shard 0 keeps the ORIGINAL text so phrase matches survive (1× match
    // rows inside an N× corpus — the selective-query regime)
    val docsN = (0 until n).map { i =>
      if (i == 0) docs1
      else docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(^|\\s)", "$1s" + i + "_").as("text"), $"lang")
    }.reduce(_ union _).localCheckpoint()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def report(op: String, r1: (Long, Double), rN: (Long, Double)): Unit =
      println(f"SCALE $op%-28s 1x: ${r1._1}%9d rows ${r1._2}%6.1f s | ${n}x: " +
        f"${rN._1}%9d rows ${rN._2}%6.1f s | rows ${rN._1.toDouble / math.max(1, r1._1)}%4.1fx time ${rN._2 / r1._2}%4.1fx")

    def sif(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Pool.sifEmbed(d, "doc_id", "text", dim = 8)
    report("sif_embedding",
      time(sif(docs1).count()), time(sif(docsN).count()))

    // the N× vocab is N×|V| distinct terms — past any broadcast budget
    // at real scale, so probe the SHUFFLE_HASH vocab-join path too
    def sifSh(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Pool.sifEmbed(d, "doc_id", "text", dim = 8,
        broadcastVocab = false)
    report("sif_embedding_shuffle",
      time(sifSh(docs1).count()), time(sifSh(docsN).count()))

    def phrase(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Keyword.phraseSearch(d, "doc_id", "text", Seq("fast", "merge"))
    report("phrase_search",
      time(phrase(docs1).count()), time(phrase(docsN).count()))

    def bl(d: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.blocklistGate(d, "doc_id", "text",
        Seq("slow", "dup"), maxPermille = 50)
    report("blocklist_gate",
      time(bl(docs1).count()), time(bl(docsN).count()))

    // unigram: the vocab-disjoint replication multiplies DISTINCT words
    // by N — the worst case for the per-distinct-word Viterbi
    def uni(d: org.apache.spark.sql.DataFrame) = {
      val vocab = graft.ops.Unigram.learnVocab(
        graft.ops.Bpe.wordCounts(d, "text"), maxPieceLen = 4, vocabSize = 50)
      graft.ops.Unigram.segmentStats(d, "doc_id", "text",
        graft.ops.Unigram.vocabMap(vocab), maxPieceLen = 4)
    }
    report("unigram_segment_stats",
      time(uni(docs1).count()), time(uni(docsN).count()))

    val ev1 = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select($"event_type", $"ts").localCheckpoint()
    val evN = (0 until n).map { i =>
      ev1.select(concat($"event_type", lit("_" + i)).as("event_type"), $"ts")
    }.reduce(_ union _).localCheckpoint()
    def anom(e: org.apache.spark.sql.DataFrame) =
      graft.ops.Profile.activityAnomalies(e, "event_type", "ts",
        bucketNs = 86400L * 1000000000L)
    report("events_anomaly",
      time(anom(ev1).count()), time(anom(evN).count()))

    spark.stop()
  }
}
