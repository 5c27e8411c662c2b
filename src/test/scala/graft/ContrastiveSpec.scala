package graft
// (bitext mining spec appended at the bottom of this suite)

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Contrastive

class ContrastiveSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // anchor 1 (label A) at the x-axis; corpus: same-label near and far,
  // wrong-label at decreasing similarity, and a null-label near-dup
  private lazy val anchors = Seq(
    (1L, Seq(1f, 0f), Some("A"))
  ).toDF("qid", "qemb", "qlabel")
  private lazy val corpus = Seq(
    (10L, Seq(0.9f, 0.1f), Some("A")),  // positive, nearest
    (11L, Seq(0.5f, 0.5f), Some("A")),  // positive, farther
    (20L, Seq(0.95f, 0.05f), Some("B")), // hardest negative
    (21L, Seq(0.6f, 0.4f), Some("B")),   // second negative
    (22L, Seq(0f, 1f), Some("C")),       // easy negative
    (30L, Seq(1f, 0f), None: Option[String]) // null label: excluded everywhere
  ).toDF("vec_id", "embedding", "label")

  test("hard negatives: wrong-label only, similarity-ranked, null labels excluded") {
    val got = Contrastive.hardNegatives(anchors, corpus,
        "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 3)
      .orderBy($"rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 20L), (2, 21L), (3, 22L)))
  }

  test("positives: same-label only, nearest first, null labels excluded") {
    val got = Contrastive.positives(anchors, corpus,
        "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 2)
      .orderBy($"rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 10L), (2, 11L)))
  }

  test("triples: nearest positive × top-k negatives; anchors without a leg drop") {
    val got = Contrastive.triples(anchors, corpus,
        "qid", "qemb", "qlabel", "vec_id", "embedding", "label", negK = 2)
      .orderBy($"neg_rank").collect()
      .map(r => (r.getLong(r.fieldIndex("pos_id")),
        r.getInt(r.fieldIndex("neg_rank")), r.getLong(r.fieldIndex("neg_id"))))
    assert(got.toSeq == Seq((10L, 1, 20L), (10L, 2, 21L)))
    // an anchor whose label matches nothing has no positive leg → drops
    val lonely = Seq((2L, Seq(1f, 0f), Some("Z"))).toDF("qid", "qemb", "qlabel")
    assert(Contrastive.triples(lonely, corpus,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label", negK = 2).count() == 0)
  }

  test("k bounds both legs") {
    val one = Contrastive.hardNegatives(anchors, corpus,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 1)
    assert(one.count() == 1 && one.head().getLong(2) == 20L)
  }

  test("mineBitext: exact translation pairs mine, hubs are margin-filtered") {
    // a1 has an exact counterpart b1; h is a hub equally close to all
    // of B — its margin hovers near its neighborhood average, so a
    // high threshold keeps only the genuine pair
    val h = 0.5f
    val sideA = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(h, h, h, h))).toDF("vec_id", "embedding")
    val sideB = Seq(
      (11L, Array(1f, 0f, 0f, 0f)),
      (12L, Array(0f, 1f, 0f, 0f)),
      (13L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val mined = Contrastive.mineBitext(sideA, sideB, "vec_id", "vec_id",
        "embedding", k = 2, minMargin = 1.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(mined.map(t => (t._1, t._2)).toSeq == Seq((1L, 11L)),
      s"only the exact pair clears the margin, got ${mined.toSeq}")
    assert(mined.head._3 > 1.5)
    // at a permissive threshold the hub also surfaces (sanity that the
    // filter, not candidate generation, removed it above)
    val loose = Contrastive.mineBitext(sideA, sideB, "vec_id", "vec_id",
      "embedding", k = 2, minMargin = 1.0)
    assert(loose.count() == 2)
  }

  test("hardNegativesIvf at full probe ≡ broadcast hardNegatives; label filter precedes scoring") {
    import graft.ops.Ivf
    def vec(i: Int): Array[Float] =
      Array.tabulate(16)(j => (if (j == i % 16) 4f else 0f) + 0.01f * ((i * 7 + j) % 5))
    val rows = (1 to 60).map(i =>
      (i.toLong, vec(i), if (i % 10 == 0) None else Some("l" + (i % 3))))
      .toDF("vec_id", "embedding", "label")
    val anchors = rows.select($"vec_id".as("qid"), $"embedding".as("qemb"),
      $"label".as("qlabel"))
    val model = Ivf.fit(rows, "vec_id", "embedding", k = 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"qid", $"rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val exact = Contrastive.hardNegatives(anchors, rows,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 3)
    val ivf = Contrastive.hardNegativesIvf(anchors, rows,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label",
      model, nProbe = model.k, k = 3)
    assert(pairs(ivf) == pairs(exact))
    assert(exact.count() > 0)
    // null-label anchors and corpus rows are excluded on both paths
    assert(!pairs(ivf).exists(t => t._1 % 10 == 0 || t._3 % 10 == 0))
    // positives too
    val posIvf = Contrastive.positivesIvf(anchors, rows,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label",
      model, nProbe = model.k, k = 2)
    val posExact = Contrastive.positives(anchors, rows,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label", k = 2)
    assert(pairs(posIvf) == pairs(posExact))
    // no cartesian anywhere: candidates come from the cell equi-join
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("mineBitextIvf at full probe ≡ mineBitext bit-for-bit; plan has no cross join") {
    import graft.ops.Ivf
    // clustered sides wide enough that IVF cells are non-trivial
    def vec(i: Int): Array[Float] =
      Array.tabulate(16)(j => (if (j == i % 16) 4f else 0f) + 0.01f * ((i * 7 + j) % 5))
    val sideA = (1 to 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val sideB = (101 to 150).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val model = Ivf.fit(sideB, "vec_id", "embedding", k = 4)
    val exact = Contrastive.mineBitext(sideA, sideB, "vec_id", "vec_id",
      "embedding", k = 3, minMargin = 1.0)
    val ivf = Contrastive.mineBitextIvf(sideA, sideB, "vec_id", "vec_id",
      "embedding", model, nProbe = model.k, k = 3, minMargin = 1.0)
    // margins are ratios of unrounded neighborhood averages — the
    // full-probe contract is BIT equality, so compare the raw doubles
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"id_a").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(rows(ivf) == rows(exact))
    assert(exact.count() > 0, "fixture must actually mine pairs")
    // the scale path must candidate-generate via the cell equi-join,
    // never the |A|×|B| cross join the exact form materializes
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"IVF miner must not cross-join:\n$plan")
    // partial probe stays a subset of the candidate universe and keeps
    // the output contract (id_a unique)
    val p1 = Contrastive.mineBitextIvf(sideA, sideB, "vec_id", "vec_id",
      "embedding", model, nProbe = 1, k = 3, minMargin = 1.0)
    val ids = p1.select($"id_a").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("streaming hard negatives: live micro-batches fold ≡ one-shot batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Ivf
    implicit val sqlCtx = spark.sqlContext
    def vec(i: Int): Array[Float] =
      Array.tabulate(16)(j => (if (j == i % 16) 4f else 0f) + 0.01f * ((i * 7 + j) % 5))
    val corpusRows = (101 to 160).map(i => (i.toLong, vec(i), s"L${i % 3}"))
    val anchorRows = (1 to 30).map(i => (i.toLong, vec(i), s"L${i % 3}"))
    val corpus = corpusRows.toDF("vec_id", "embedding", "label").localCheckpoint()
    val model = Ivf.fit(corpus, "vec_id", "embedding", k = 4)
    val base = java.nio.file.Files.createTempDirectory("cstream").toString
    val (outDir, ckpt) = (s"$base/pairs", s"$base/ckpt")
    val stream = MemoryStream[(Long, Array[Float], String)]
    val q = graft.streaming.ContrastiveStream.startHardNegatives(
      stream.toDS().toDF("qid", "qemb", "qlabel"), corpus,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label",
      model, nProbe = model.k, k = 3, outDir = outDir, checkpointDir = ckpt)
    try {
      // three micro-batches in arbitrary sizes
      val (b1, rest) = anchorRows.splitAt(11)
      val (b2, b3) = rest.splitAt(7)
      Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val folded = spark.read.parquet(outDir)
    val direct = Contrastive.hardNegativesIvf(
      anchorRows.toDF("qid", "qemb", "qlabel"), corpus,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label",
      model, nProbe = model.k, k = 3)
    // stateless across batches: raw-double bit equality, full relation
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"rank", $"vec_id", $"score")
        .orderBy($"qid", $"rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(folded) == rows(direct))
    assert(folded.count() == 30L * 3, "every anchor mined in exactly one batch")
    // replay idempotence: a crash-replayed micro-batch overwrites its
    // own partition instead of appending a duplicate copy (the plain
    // append sink measurably 2x'd replayed anchors)
    graft.streaming.ContrastiveStream.mineBatch(
      anchorRows.take(11).toDF("qid", "qemb", "qlabel"), corpus,
      "qid", "qemb", "qlabel", "vec_id", "embedding", "label",
      model, nProbe = model.k, k = 3, metric = "COSINE",
      outDir = outDir, batchId = 0L)
    val replayed = spark.read.parquet(outDir)
    assert(rows(replayed) == rows(direct), "replay must not duplicate pairs")
  }
}
