package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 scaling evidence: the IVF k ∝ √N rule, AUTO-APPLIED.
  *
  * Round 10's bitext probe scaled k by hand (8 → 32 across a 16×
  * corpus) and measured 6.4× wall; the round-10 verdict's ask is that
  * the library itself sizes k so the cell-join family keeps that
  * sublinear shape without caller tuning. Here the whole pipeline —
  * [[graft.ops.Ivf.fitAuto]] (kForCorpus + sample-bounded Lloyd) plus
  * [[graft.ops.Contrastive.mineBitextIvf]] — is timed end-to-end at 1×
  * and 16×, nProbe fixed. Pass criterion: 16× corpus ≤ ~4× wall.
  */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toInt).getOrElse(16)
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

    val emb1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter($"embedding".isNotNull)
      .select($"vec_id", $"embedding", $"label").localCheckpoint()
    val embM = (0 until m).map { i =>
      emb1.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ union _).localCheckpoint()

    def bitextAuto(e: org.apache.spark.sql.DataFrame): (Long, Int, Double) = {
      val a = e.filter($"label" < 4).select($"vec_id", $"embedding")
      val b = e.filter($"label" >= 4).select($"vec_id", $"embedding")
      val ((model, _), tFit) = time(graft.ops.Ivf.fitAuto(b, "vec_id", "embedding"))
      val rows = graft.ops.Contrastive.mineBitextIvf(a, b, "vec_id", "vec_id",
        "embedding", model, nProbe = math.min(4, model.k), k = 4,
        minMargin = 1.0).count()
      (rows, model.k, tFit)
    }
    val ((r1, k1, f1), t1) = time(bitextAuto(emb1))
    val ((rM, kM, fM), tM) = time(bitextAuto(embM))
    println(f"SCALE bitext_mining_ivf_autok 1x: $r1%9d rows (k=$k1, fit $f1%5.1f s) $t1%6.1f s | " +
      f"${m}x: $rM%9d rows (k=$kM, fit $fM%5.1f s) $tM%6.1f s | time ${tM / t1}%4.2fx " +
      f"(pass: <= ~4x)")

    // Recall-targeted nProbe tuning on the real corpus under the
    // auto-fit model: how much of the auto-k index must a 0.95-recall
    // serving path actually probe, and what does the tuning cost?
    val corpus1 = emb1.select($"vec_id", $"embedding")
    val (am, _) = graft.ops.Ivf.fitAuto(corpus1, "vec_id", "embedding")
    val sampleQ = emb1.filter($"vec_id" % 40 === 7)
      .select($"vec_id".as("qid"), $"embedding".as("qemb"))
    val ((pTuned, curve), tTune) = time(graft.ops.Ivf.tuneNProbe(
      corpus1, "vec_id", "embedding", am, sampleQ, "qid", "qemb",
      k = 10, targetRecall = 0.95))
    val recAt = curve.filter($"n_probe" === pTuned)
      .head().getLong(2)
    println(f"SCALE tune_nprobe k=${am.k}%d sample=${sampleQ.count()}%d: " +
      f"target 0.95 -> nProbe $pTuned%d (${100.0 * pTuned / am.k}%4.1f%% of cells, " +
      f"recall ${recAt}%d us) in $tTune%5.1f s")

    // PQ encode at a PRODUCTION codebook shape (m=32 subspaces, 256
    // centroids each over the dim-64 fixture): the round-11 encode is
    // m NearestCentroids expressions; the m x ncent distance fan-out it
    // replaced would be 8192 expressions here — a planner stall, not a
    // slow plan. Timed fit + encode of the 16x corpus proves the shape
    // is usable at real PQ sizes.
    val e16 = embM.select($"vec_id", $"embedding").localCheckpoint()
    val (pq, tFitPq) = time(graft.ops.Pq.fit(e16, "vec_id", "embedding",
      m = 32, ncent = 256))
    val (nEnc, tEnc) = time(graft.ops.Pq.encode(e16, "embedding", pq)
      .selectExpr("sum(size(embedding_pq))").head().getLong(0))
    println(f"SCALE pq_encode_m32x256 16x-corpus: fit $tFitPq%6.1f s | " +
      f"encode ${e16.count()}%d rows ($nEnc%d codes) $tEnc%6.1f s")
    spark.stop()
  }
}
