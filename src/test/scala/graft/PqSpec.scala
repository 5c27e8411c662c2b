package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ingest, Ivf, Pq, Similarity, VersionedStore}

/** Product quantization: the PQ/IVF-PQ serving tier (ops/Pq.scala).
  * The approximation is configuration — with a corpus-covering coarse
  * cut the pipeline must EQUAL exact knn on every metric (the same
  * pin-to-exact contract as the SQ8 and IVF full-probe paths); the ADC
  * algebra is additionally checked numerically against driver-side
  * reconstruction, since a silently wrong LUT would still pass the
  * full-overfetch equality (rescore hides coarse ordering errors there).
  */
class PqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding").cache()
  private lazy val qv: Array[Float] =
    emb.filter($"vec_id" === 0).head().getSeq[Float](1).toArray
  private lazy val corpus = emb.filter($"vec_id" =!= 0)

  test("PQ fit is deterministic; encode emits m byte codes; nulls yield null codes") {
    val m1 = Pq.fit(corpus, "vec_id", "embedding", m = 8, ncent = 16)
    val m2 = Pq.fit(corpus, "vec_id", "embedding", m = 8, ncent = 16)
    // centroid-wise tolerance, not fingerprint equality: the Lloyd
    // step's avg() merges partials in shuffle-arrival order, so two fits
    // can differ in final ulps under concurrent load. The anchored
    // queries are immune by construction (corpus-covering cut + exact
    // rescore), but a bit-equality assertion here would flake.
    m1.codebooks.zip(m2.codebooks).foreach { case (b1, b2) =>
      b1.zip(b2).foreach { case (c1, c2) =>
        c1.zip(c2).foreach { case (x1, x2) =>
          assert(math.abs(x1 - x2) < 1e-5f, "same data, same seed, same model")
        }
      }
    }
    assert(m1.m == 8 && m1.ncent == 16 && m1.dsub == 8 && m1.dim == 64)
    val enc = Pq.encode(corpus, "embedding", m1)
    assert(enc.select(size($"embedding_pq")).distinct().as[Int].collect().toSeq == Seq(8))
    val withNull = Seq((1L, Some(Seq.fill(64)(0.5f))), (2L, None))
      .toDF("vec_id", "embedding")
    val encN = Pq.encode(withNull, "embedding", m1)
    assert(encN.filter($"vec_id" === 2 && $"embedding_pq".isNull).count() == 1)
  }

  test("PQ coarse+rescore with corpus-covering overfetch equals exact knn on every metric") {
    val model = Pq.fit(corpus, "vec_id", "embedding", m = 8, ncent = 16)
    val enc = Pq.encode(corpus, "embedding", model).cache()
    try for (metric <- Seq("COSINE", "DOT_PRODUCT", "EUCLIDEAN_DISTANCE")) {
      val exact = Similarity.knn(corpus, "embedding", qv, 10, metric)
        .select($"vec_id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
      val got = Pq.knnPqRescore(enc, "vec_id", "embedding", qv, 10, model,
          metric, overfetch = 200)
        .select($"vec_id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
      assert(got == exact, s"$metric: full-overfetch PQ rescore must equal exact knn")
    } finally { enc.unpersist(): Unit }
  }

  test("residual IVF-PQ at full probe + corpus overfetch equals exact knn on every metric") {
    val ivf = Ivf.fit(corpus, "vec_id", "embedding", k = 4)
    val model = Pq.fitResiduals(corpus, "vec_id", "embedding", ivf, m = 8, ncent = 16)
    val enc = Pq.encodeResiduals(Ivf.assign(corpus, "embedding", ivf),
      "embedding", "cluster_id", ivf, model).cache()
    try for (metric <- Seq("COSINE", "DOT_PRODUCT", "EUCLIDEAN_DISTANCE")) {
      val exact = Similarity.knn(corpus, "embedding", qv, 10, metric)
        .select($"vec_id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
      val got = Pq.searchIvfPq(enc, "vec_id", "embedding", qv, 10, ivf, model,
          nProbe = 4, metric = metric, overfetch = 200)
        .select($"vec_id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
      assert(got == exact, s"$metric: full-probe full-overfetch IVF-PQ must equal exact knn")
    } finally { enc.unpersist(): Unit }
  }

  test("ADC approx scores equal driver-side reconstruction scores (plain and residual)") {
    val model = Pq.fit(corpus, "vec_id", "embedding", m = 8, ncent = 16)
    val enc = Pq.encode(corpus, "embedding", model)
    // plain path: recon = decode(codes)
    val plain = Pq.coarseCandidates(enc, "vec_id", "embedding", qv, 25, "DOT_PRODUCT", model)
      .join(enc.select($"vec_id", $"embedding_pq".as("codes")), "vec_id")
      .select($"vec_id", $"__approx", $"codes").collect()
    assert(plain.length == 25)
    plain.foreach { r =>
      val codes = r.getSeq[Byte](2)
      val rec = codes.zipWithIndex.flatMap { case (c, j) => model.codebooks(j)(c + 128) }
      val want = rec.zip(qv).map { case (a, b) => a.toDouble * b }.sum
      assert(math.abs(r.getDouble(1) - want) < 1e-6,
        s"vec ${r.getLong(0)}: ADC ${r.getDouble(1)} != recon $want")
    }
    // residual path: recon = centroid(cluster) + decode(codes); check
    // all three metric formulas including the per-cluster LUT algebra
    val ivf = Ivf.fit(corpus, "vec_id", "embedding", k = 4)
    val rModel = Pq.fitResiduals(corpus, "vec_id", "embedding", ivf, m = 8, ncent = 16)
    val rEnc = Pq.encodeResiduals(Ivf.assign(corpus, "embedding", ivf),
      "embedding", "cluster_id", ivf, rModel)
    val qvN = math.sqrt(qv.map(v => v.toDouble * v).sum)
    for (metric <- Seq("COSINE", "DOT_PRODUCT", "EUCLIDEAN_DISTANCE")) {
      val rows = Pq.coarseResidualCandidates(rEnc, "vec_id", "embedding", "cluster_id",
          qv, 25, metric, ivf, rModel)
        .join(rEnc.select($"vec_id", $"embedding_pq".as("codes"), $"cluster_id".as("cl")), "vec_id")
        .select($"vec_id", $"__approx", $"codes", $"cl").collect()
      rows.foreach { r =>
        val codes = r.getSeq[Byte](2)
        val cl = r.getInt(3)
        val rec = codes.zipWithIndex
          .flatMap { case (c, j) => rModel.codebooks(j)(c + 128) }
          .zip(ivf.centroids(cl)).map { case (a, b) => a.toDouble + b }
        val dot = rec.zip(qv).map { case (a, b) => a * b }.sum
        val want = metric match {
          case "DOT_PRODUCT" => dot
          case "COSINE" =>
            val rn = math.sqrt(rec.map(v => v * v).sum)
            if (rn == 0.0 || qvN == 0.0) 0.0 else dot / (rn * qvN)
          case _ =>
            math.sqrt(rec.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        assert(math.abs(r.getDouble(1) - want) < 1e-6,
          s"$metric vec ${r.getLong(0)}: ADC ${r.getDouble(1)} != recon $want")
      }
    }
  }

  test("PQ coarse scan never reads the float column; IVF-PQ coarse also prunes partitions") {
    val model = Pq.fit(corpus, "vec_id", "embedding", m = 8, ncent = 16)
    val dir = Files.createTempDirectory("pqstore").toString + "/emb"
    Pq.encode(emb, "embedding", model).write.parquet(dir)
    val store = spark.read.parquet(dir)
    val plan = Pq.coarseCandidates(store, "vec_id", "embedding", qv, 40, "COSINE", model)
      .queryExecution.executedPlan.toString
    val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty && schemas.forall(!_.contains("embedding:array<float>")),
      s"PQ coarse must scan codes only:\n$plan")
    // residual layout: cluster-partitioned store, probe prunes partitions
    val ivf = Ivf.fit(emb, "vec_id", "embedding", k = 4)
    val rModel = Pq.fitResiduals(emb, "vec_id", "embedding", ivf, m = 8, ncent = 16)
    val ivfpqDir = Files.createTempDirectory("ivfpq").toString + "/emb"
    Pq.encodeResiduals(Ivf.assign(emb, "embedding", ivf), "embedding", "cluster_id", ivf, rModel)
      .write.partitionBy("cluster_id").parquet(ivfpqDir)
    val rStore = spark.read.parquet(ivfpqDir)
    val probes = ivf.probeOrder(qv).take(2).toSeq
    val rPlan = Pq.coarseResidualCandidates(
        rStore.filter($"cluster_id".isin(probes: _*)), "vec_id", "embedding",
        "cluster_id", qv, 40, "COSINE", ivf, rModel)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster_id".r.findFirstIn(rPlan).isDefined,
      s"IVF-PQ probe must prune partitions:\n$rPlan")
    assert(rPlan.linesIterator.filter(_.contains("ReadSchema"))
      .forall(!_.contains("embedding:array<float>")),
      s"the pruned ADC scan must stay float-free:\n$rPlan")
  }

  test("model save/load round-trips; tampering fails the fingerprint") {
    val model = Pq.fit(corpus, "vec_id", "embedding", m = 4, ncent = 8)
    val path = Files.createTempDirectory("pqmodel").toString + "/_pq_model"
    Pq.saveModel(spark, path, model)
    val back = Pq.loadModel(spark, path)
    assert(back.fingerprint == model.fingerprint)
    assert(back.m == 4 && back.ncent == 8 && back.dsub == 16)
    val text = graft.Fs.readString(spark, path)
    val lines = text.split("\n")
    val tampered = (lines(0) +: lines(1).split(" ").updated(0, "9.9").mkString(" ")
      +: lines.drop(2)).mkString("\n")
    graft.Fs.writeString(spark, path, tampered)
    val err = intercept[IllegalArgumentException] { Pq.loadModel(spark, path) }
    assert(err.getMessage.contains("fingerprint"))
  }

  test("pqStore encodes a versioned store in place; the append seam maintains codes") {
    val table = Files.createTempDirectory("pqvs").toString + "/store"
    val rows = corpus.limit(100).select($"vec_id".as("id"), $"embedding")
    VersionedStore.append(spark, table, rows)
    val model = Pq.pqStore(spark, table, "embedding", m = 8, ncent = 16)
    assert(graft.Fs.exists(spark, Pq.markerPath(table)))
    val live = VersionedStore.read(spark, table).get
    assert(live.columns.contains("embedding_pq"))
    assert(live.filter($"embedding_pq".isNull).count() == 0)
    // bare rows through the seam must come out encoded (strict union survives)
    val more = corpus.filter($"vec_id" >= 400).limit(50).select($"vec_id".as("id"), $"embedding")
    val n = Ingest.appendRespectingLayout(spark, table, more)
    assert(n == 50)
    val after = VersionedStore.read(spark, table).get
    assert(after.count() == 150 && after.filter($"embedding_pq".isNull).count() == 0)
    // the maintained store serves: full-overfetch equality against exact
    // knn over the same 150 rows
    val exact = Similarity.knn(after.select($"id", $"embedding"), "embedding", qv, 5)
      .select($"id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
    val got = Pq.knnPqRescore(after, "id", "embedding", qv, 5,
        Pq.loadModel(spark, Pq.modelPath(table)), overfetch = 100)
      .select($"id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
    assert(got == exact)
  }

  test("pqStore on an IVF-indexed table goes residual; the seam maintains residual codes") {
    val table = Files.createTempDirectory("ivfpqvs").toString + "/store"
    val rows = corpus.limit(100).select($"vec_id".as("id"), $"embedding")
    VersionedStore.append(spark, table, rows)
    val ivf = Ivf.indexStore(spark, table, "id", "embedding", k = 4)
    Pq.pqStore(spark, table, "embedding", m = 8, ncent = 16): Unit
    assert(Pq.readMarker(spark, table).contains(Pq.PqMarker("embedding", residual = true)),
      "an IVF-layout store must get residual codes")
    // bare rows through the seam: assigned AND residual-encoded
    val more = corpus.filter($"vec_id" >= 400).limit(50).select($"vec_id".as("id"), $"embedding")
    assert(Ingest.appendRespectingLayout(spark, table, more) == 50)
    val after = VersionedStore.read(spark, table).get
    assert(after.count() == 150 && after.filter($"embedding_pq".isNull).count() == 0)
    assert(after.columns.contains("cluster_id"), "IVF layout survives the PQ rewrite")
    // the composed store serves through searchIvfPq: full probe +
    // corpus-covering cut must equal exact knn over the 150 live rows
    val pq = Pq.loadModel(spark, Pq.modelPath(table))
    val exact = Similarity.knn(after.select($"id", $"embedding"), "embedding", qv, 5)
      .select($"id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
    val got = Pq.searchIvfPq(after, "id", "embedding", qv, 5, ivf, pq,
        nProbe = ivf.k, overfetch = 100)
      .select($"id", round($"score", 9).as("s")).as[(Long, Double)].collect().toSeq
    assert(got == exact, "residual codes + full probe + rescore must equal exact knn")
    // and the residual codes actually reconstruct better than the cell
    // centroid alone: decoded residual norm is below the raw residual
    // norm for most rows (the codebook carries in-cell information)
    val sample = after.select($"id", $"embedding", $"embedding_pq", $"cluster_id")
      .limit(30).collect()
    val improved = sample.count { r =>
      val v = r.getSeq[Float](1).toArray
      val codes = r.getSeq[Byte](2).toArray
      val cl = r.getInt(3)
      val resid = v.zip(ivf.centroids(cl)).map { case (a, b) => (a - b).toDouble }
      val rec = codes.zipWithIndex.flatMap { case (c, j) => pq.codebooks(j)(c + 128) }
      val errQ = resid.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      val errZ = resid.map(a => a * a).sum
      errQ < errZ
    }
    assert(improved > sample.length / 2,
      s"residual codes should beat the zero-code baseline; improved $improved/${sample.length}")
  }

  test("batch IVF-PQ equals the per-query path at every metric and probe setting") {
    val ivf = Ivf.fit(corpus, "vec_id", "embedding", k = 4)
    val model = Pq.fitResiduals(corpus, "vec_id", "embedding", ivf, m = 8, ncent = 16)
    val enc = Pq.encodeResiduals(Ivf.assign(corpus, "embedding", ivf),
      "embedding", "cluster_id", ivf, model).cache()
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding").cache()
    try {
      for (metric <- Seq("COSINE", "DOT_PRODUCT", "EUCLIDEAN_DISTANCE");
           np <- Seq(2, 4); of <- Seq(4, 200)) {
        val batch = Pq.searchIvfPqBatch(queries, enc, "qid", "embedding",
            "vec_id", "embedding", ivf, model, topK = 5, nProbe = np,
            metric = metric, overfetch = of)
          .select($"qid", $"rank", $"vec_id", round($"score", 9).as("s"))
          .as[(Long, Int, Long, Double)].collect().toSeq.sorted
        val singles = queries.collect().flatMap { r =>
          val qid = r.getLong(0)
          val qv2 = r.getSeq[Float](1).toArray
          Pq.searchIvfPq(enc, "vec_id", "embedding", qv2, 5, ivf, model,
              nProbe = np, metric = metric, overfetch = of)
            .select($"vec_id", round($"score", 9).as("s")).as[(Long, Double)]
            .collect().zipWithIndex
            .map { case ((cid, s), i) => (qid, i + 1, cid, s) }
        }.toSeq.sorted
        assert(batch == singles, s"$metric np=$np of=$of: batch must equal per-query")
      }
      // one composed plan: partition pruning on the probed union AND a
      // codes-only scan feeding the coarse stage (floats appear only in
      // the rescore scan)
      val dir = Files.createTempDirectory("pq-batch-plan").toString + "/emb"
      enc.write.partitionBy("cluster_id").parquet(dir)
      val plan = Pq.searchIvfPqBatch(queries, spark.read.parquet(dir),
          "qid", "embedding", "vec_id", "embedding", ivf, model,
          topK = 5, nProbe = 2, overfetch = 4)
        .queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cluster_id".r.findFirstIn(plan).isDefined,
        s"batch coarse must prune partitions:\n$plan")
      assert(plan.linesIterator.filter(_.contains("ReadSchema"))
        .exists(!_.contains("embedding:array<float>")),
        s"the coarse scan must be codes-only:\n$plan")
    } finally { enc.unpersist(); queries.unpersist(): Unit }
  }
}
