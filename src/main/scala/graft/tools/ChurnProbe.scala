package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sidecar-maintenance churn probe: one long-running store lifecycle —
  * seed → register MinHash + SRP + lexical sidecars → interleaved
  * append / near-dup-check / CDC merge / keyed delete / compaction —
  * measured at a 1× and an 8× store size with a FIXED batch size.
  *
  * The claims under test (SCALE.md "sidecar churn" rows):
  *   - append-seam folds and batch near-dup checks track the BATCH, not
  *     the store (expect ~flat wall across the 8× store);
  *   - compaction restamps in O(1) when provably row-preserving
  *     (expect ~flat);
  *   - merge/delete REPLACE rows, so sidecars rebuild LOUDLY — the
  *     documented O(store) path (expect ~8×, reported, not hidden);
  *   - correctness holds through every mutation: a planted near-dup of
  *     freshly appended history is found after each phase, from both
  *     the text (MinHash) and embedding (SRP) sidecars.
  */
object ChurnProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    val base = 4 // 1x = base replicas of the sf0.1 corpus slice
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()

    val joined = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .join(graft.Tables.embeddings(spark, "/root/testdata/sf0.1"),
        $"doc_id" === $"vec_id")
      .select($"doc_id", $"text", $"embedding")
      .localCheckpoint()

    // id-shifted, shingle-disjoint, embedding-perturbed replication so
    // replicas are genuinely distinct rows
    def corpus(replicas: Int): DataFrame =
      (0 until replicas).map { i =>
        joined.select(($"doc_id" + lit(i * 10000000L)).as("doc_id"),
          regexp_replace($"text", "(^|\\s)", "$1r" + i + "_").as("text"),
          transform($"embedding", x => x + lit(i * 0.001f)).as("embedding"))
      }.reduce(_ union _).localCheckpoint()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    final case class Phase(name: String, secs: Double)

    def lifecycle(replicas: Int): Seq[Phase] = {
      val root = java.nio.file.Files.createTempDirectory(s"churn$replicas").toString
      new java.io.File(root).delete()
      val t = s"$root/t"
      val docs = corpus(replicas)
      val out = scala.collection.mutable.ArrayBuffer[Phase]()
      graft.ops.VersionedStore.append(spark, t, docs)
      out += Phase("register_build", time {
        graft.ops.Keyword.registerLexicalIndex(spark, t, "doc_id", "text", s"$root/lex")
        graft.ops.Dedup.registerMinhashSidecar(spark, t, "doc_id", "text", s"$root/mh")
        graft.ops.Dedup.registerSrpSidecar(spark, t, "doc_id", "embedding", s"$root/srp")
        graft.ops.Sketch.registerHllSidecar(spark, t, "doc_id", "text", s"$root/hll")
      })
      // fixed-size fresh batch, disjoint from every replica
      def freshBatch(tag: Int): DataFrame =
        joined.limit(2000).select(($"doc_id" + lit(900000000L + tag * 1000000L)).as("doc_id"),
          regexp_replace($"text", "(^|\\s)", "$1f" + tag + "_").as("text"),
          transform($"embedding", x => x + lit(0.7f + tag * 0.01f)).as("embedding"))
          .localCheckpoint()
      val b1 = freshBatch(1)
      out += Phase("append_fold", time {
        graft.ops.Ingest.appendRespectingLayout(spark, t, b1)
      })
      // planted dups of rows appended AFTER the sidecar build; the
      // planted slice (id % 100 == 3) is disjoint from the merge slice
      // (% 4 == 0) and the delete slice (% 100 == 1), so the planted
      // matches survive every mutation verbatim
      val planted = b1.filter($"doc_id" % 100 === 3)
        .select(($"doc_id" + 50000000L).as("doc_id"), $"text", $"embedding")
        .localCheckpoint()
      val nPlanted = planted.count()
      require(nPlanted >= 10, s"planted slice too small ($nPlanted)")
      def checkBoth(label: String): Unit = {
        val nText = graft.ops.Dedup.nearDupAgainstStore(spark, planted,
          "doc_id", "text", t, s"$root/mh", threshold = 0.9).count()
        val nEmb = graft.ops.Dedup.embNearDupAgainstStore(spark, planted,
          "doc_id", "embedding", t, s"$root/srp", threshold = 0.999).count()
        require(nText >= nPlanted && nEmb >= nPlanted,
          s"$label: planted dups missed (text=$nText emb=$nEmb of $nPlanted) — " +
            "sidecar stale or wrong")
        // the HLL sidecar must serve fresh through every phase too (a
        // stale stamp would throw; a wrong fold would drift the estimate)
        val est = graft.ops.Sketch.estimateFromSidecar(spark, t, s"$root/hll")
          .collect().head.getDouble(0)
        require(est > 0, s"$label: HLL estimate degenerate ($est)")
      }
      out += Phase("neardup_check", time { checkBoth("post-append") })
      out += Phase("merge_rebuild", time {
        val updates = b1.filter($"doc_id" % 4 === 0)
          .select($"doc_id", concat($"text", lit(" edited")).as("text"), $"embedding")
        graft.ops.Ingest.mergeRespectingLayout(spark, t, updates, "doc_id")
      })
      out += Phase("check_after_merge", time { checkBoth("post-merge") })
      out += Phase("delete_rebuild", time {
        graft.ops.Ingest.deleteKeysRespectingLayout(spark, t,
          b1.filter($"doc_id" % 100 === 1).select($"doc_id"), "doc_id")
      })
      out += Phase("compact_restamp", time {
        graft.ops.Ingest.compactTable(spark, t)
      })
      out += Phase("append_after_churn", time {
        graft.ops.Ingest.appendRespectingLayout(spark, t, freshBatch(2))
      })
      out += Phase("final_check", time { checkBoth("post-churn") })
      out.toSeq
    }

    val r1 = lifecycle(base)
    val rN = lifecycle(base * mult)
    r1.zip(rN).foreach { case (a, b) =>
      println(f"CHURN ${a.name}%-20s 1x: ${a.secs}%6.1f s | ${mult}x: ${b.secs}%6.1f s | ratio ${b.secs / a.secs}%5.2fx")
    }
    spark.stop()
  }
}
