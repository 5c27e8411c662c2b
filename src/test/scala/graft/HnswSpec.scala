package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Hnsw

/** Per-partition HNSW: full-ef exactness, small-ef recall on planted
  * clusters, deterministic rebuilds, connectivity of the serialized
  * graph, and the single-vector serving path.
  */
class HnswSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i).toDouble
      nx += a(i).toDouble * a(i); ny += b(i).toDouble * b(i)
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  private lazy val corpus: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (0L until 500L).map(i => i -> Array.fill(16)(rnd.nextFloat() - 0.5f))
  }
  private lazy val corpusDf = corpus.map { case (i, v) => (i, v.toSeq) }
    .toDF("vec_id", "embedding")

  test("full-ef search equals brute force across multiple partition graphs") {
    val path = java.nio.file.Files.createTempDirectory("hnsw1").toString + "/ix"
    Hnsw.build(corpusDf, "vec_id", "embedding", path,
      Hnsw.Params(m = 8, efConstruction = 32), numPartitions = 4)
    val rnd = new scala.util.Random(11)
    val queries = (0 until 5).map(q =>
      (q.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val got = Hnsw.searchBatch(spark, path,
        queries.map { case (q, v) => (q, v.toSeq) }.toDF("qid", "qv"),
        "qid", "qv", k = 10, ef = Int.MaxValue)
      .select($"qid", $"rank", $"vec_id", $"sim")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq)
    queries.foreach { case (qid, qv) =>
      val exact = corpus.map { case (i, v) => (i, cosRef(qv, v)) }
        .sortBy { case (i, s) => (-s, i) }.take(10)
      assert(got(qid) == exact, s"query $qid full-ef must equal brute force")
    }
  }

  test("small-ef recall: planted clusters are found with ef far below corpus size") {
    val rnd = new scala.util.Random(3)
    val centers = (0 until 5).map(_ => Array.fill(16)(rnd.nextFloat() - 0.5f))
    val planted = (0L until 1000L).map { i =>
      val c = centers((i % 5).toInt)
      i -> c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    }
    val path = java.nio.file.Files.createTempDirectory("hnsw2").toString + "/ix"
    Hnsw.build(planted.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, Hnsw.Params(m = 12, efConstruction = 64),
      numPartitions = 2)
    // query at each center: the beam at ef=40 over 500-node graphs must
    // recover >= 9 of the true top-10
    centers.zipWithIndex.foreach { case (c, ci) =>
      val exact = planted.map { case (i, v) => (i, cosRef(c, v)) }
        .sortBy { case (i, s) => (-s, i) }.take(10).map(_._1).toSet
      val got = Hnsw.search(spark, path, c, k = 10, ef = 40)
        .select($"vec_id").as[Long].collect().toSet
      val recall = exact.intersect(got).size
      assert(recall >= 9, s"center $ci recall $recall/10 at ef=40")
    }
  }

  test("dot-product and euclidean metrics: full-ef equals brute force under each score") {
    def dotRef(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
    def eucRef(a: Array[Float], b: Array[Float]): Double =
      -math.sqrt(a.indices.map(i =>
        (a(i).toDouble - b(i).toDouble) * (a(i).toDouble - b(i).toDouble)).sum)
    val rnd = new scala.util.Random(17)
    val qv = Array.fill(16)(rnd.nextFloat() - 0.5f)
    for ((metric, ref) <- Seq(
        "DOT_PRODUCT" -> dotRef _, "EUCLIDEAN_DISTANCE" -> eucRef _)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"hnsw-$metric").toString + "/ix"
      Hnsw.build(corpusDf, "vec_id", "embedding", path,
        Hnsw.Params(m = 8, efConstruction = 32, metric = metric),
        numPartitions = 3)
      val got = Hnsw.search(spark, path, qv, k = 10, ef = Int.MaxValue)
        .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
      val exact = corpus.map { case (i, v) => (i, ref(qv, v)) }
        .sortBy { case (i, s) => (-s, i) }.take(10)
      assert(got == exact, s"$metric full-ef must equal brute force")
    }
  }

  test("adversarial ties: identical vectors and zero vectors — full-ef still exact, ties to lower id") {
    val dup = Array(0.5f, 0.5f, 0.1f, 0f)
    val adversarial: Seq[(Long, Array[Float])] =
      (0L until 50L).map(i => i -> dup.clone()) ++        // one big tie class
      (50L until 55L).map(i => i -> Array(0f, 0f, 0f, 0f)) ++ // zero norm
      Seq(60L -> Array(1f, 0f, 0f, 0f), 61L -> Array(0f, 1f, 0f, 0f))
    val df = adversarial.map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("hnswtie").toString + "/ix"
    Hnsw.build(df, "vec_id", "embedding", path,
      Hnsw.Params(m = 4, efConstruction = 8), numPartitions = 2)
    val q = Array(0.4f, 0.6f, 0f, 0f)
    val got = Hnsw.search(spark, path, q, k = 10, ef = Int.MaxValue)
      .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
    val exact = adversarial.map { case (i, v) => (i, cosRef(q, v)) }
      .sortBy { case (i, s) => (-s, i) }.take(10)
    assert(got == exact,
      "full-ef must equal brute force with (score desc, id asc) tie-break " +
        "even when the corpus is one giant tie class plus zero vectors")
  }

  test("build is deterministic: two builds serialize identical graphs") {
    val root = java.nio.file.Files.createTempDirectory("hnsw3").toString
    Hnsw.build(corpusDf, "vec_id", "embedding", s"$root/a",
      Hnsw.Params(m = 6, efConstruction = 24), numPartitions = 3)
    Hnsw.build(corpusDf, "vec_id", "embedding", s"$root/b",
      Hnsw.Params(m = 6, efConstruction = 24), numPartitions = 3)
    def dump(p: String) = spark.read.parquet(Hnsw.graphPath(p))
      .select($"pid", $"ord", $"level", $"neighbors", $"vec_id")
      .orderBy($"pid", $"ord")
      .collect().map(_.toString).toSeq
    assert(dump(s"$root/a") == dump(s"$root/b"))
  }

  test("serialized level-0 graph: every node DIRECTED-reachable from the search entry (full-ef precondition)") {
    val path = java.nio.file.Files.createTempDirectory("hnsw4").toString + "/ix"
    Hnsw.build(corpusDf, "vec_id", "embedding", path,
      Hnsw.Params(m = 2, efConstruction = 4), numPartitions = 3) // aggressive pruning
    val rows = spark.read.parquet(Hnsw.graphPath(path))
      .select($"pid", $"ord", $"level", $"neighbors").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getSeq[scala.collection.Seq[Int]](3)))
    rows.groupBy(_._1).foreach { case (pid, nodes) =>
      val adj0 = nodes.map(n => n._2 -> n._4.head.toSet).toMap
      // the search entry: max level, lowest ord on ties — and beam
      // search follows OUT-links only, so the reach check must be
      // DIRECTED from the entry (pruning evicts backlinks; the
      // symmetrization step is what makes this hold)
      val entry = nodes.maxBy(n => (n._3, -n._2))._2
      // serialized adjacency must be symmetric at level 0
      adj0.foreach { case (u, vs) =>
        vs.foreach(v => assert(adj0(v).contains(u),
          s"partition $pid: level-0 edge $u->$v has no reverse edge"))
      }
      val seen = collection.mutable.Set(entry)
      val stack = collection.mutable.Stack(entry)
      while (stack.nonEmpty) {
        val c = stack.pop()
        adj0(c).foreach(n => if (!seen.contains(n)) { seen += n; stack.push(n) })
      }
      assert(seen.size == nodes.size,
        s"partition $pid: only ${seen.size}/${nodes.size} nodes reachable from entry $entry")
    }
  }

  test("append lands new segment graphs; full-ef over old+new equals brute force over the union") {
    val path = java.nio.file.Files.createTempDirectory("hnsw6").toString + "/ix"
    val (first, second) = corpus.splitAt(300)
    Hnsw.build(first.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, Hnsw.Params(m = 8, efConstruction = 32),
      numPartitions = 2)
    Hnsw.append(second.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, numPartitions = 2)
    // old graphs untouched (segment immutability), new pids disjoint
    val pids = spark.read.parquet(Hnsw.graphPath(path))
      .select($"pid").distinct().as[Int].collect().sorted.toSeq
    assert(pids == Seq(0, 1, 2, 3))
    val rnd = new scala.util.Random(13)
    val qv = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val got = Hnsw.search(spark, path, qv, k = 10, ef = Int.MaxValue)
      .select($"vec_id", $"sim").as[(Long, Double)].collect().toSeq
    val exact = corpus.map { case (i, v) => (i, cosRef(qv, v)) }
      .sortBy { case (i, s) => (-s, i) }.take(10)
    assert(got == exact, "full-ef over old+new segments must equal brute force")
  }

  test("IVF x HNSW: full-probe full-ef equals brute force; partial probe is a subset with identical scores") {
    import graft.ops.Ivf
    val path = java.nio.file.Files.createTempDirectory("hnsw7").toString + "/ix"
    val model = Ivf.fit(corpusDf, "vec_id", "embedding", k = 6)
    Hnsw.buildIvf(corpusDf, "vec_id", "embedding", model, path,
      Hnsw.Params(m = 8, efConstruction = 32))
    // pid space = cell ids, cells contiguous per graph
    val pids = spark.read.parquet(Hnsw.graphPath(path))
      .select($"pid").distinct().as[Int].collect().toSet
    assert(pids.subsetOf((0 until model.k).toSet) && pids.nonEmpty)
    val rnd = new scala.util.Random(23)
    val queries = (0 until 4).map(q =>
      (q.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val qDf = queries.map { case (q, v) => (q, v.toSeq) }.toDF("qid", "qv")
    def run(nProbe: Int, ef: Int) =
      Hnsw.searchBatchProbed(spark, path, qDf, "qid", "qv", k = 10,
          ef = ef, model, nProbe)
        .select($"qid", $"rank", $"vec_id", $"sim")
        .as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    val full = run(model.k, Int.MaxValue)
    queries.foreach { case (qid, qv) =>
      val exact = corpus.map { case (i, v) => (i, cosRef(qv, v)) }
        .sortBy { case (i, s) => (-s, i) }.take(10)
      assert(full(qid) == exact, s"query $qid: full probe+ef must be exact")
    }
    // partial probe: pruning changes RECALL, never a surviving score —
    // every returned (id, sim) carries the true exact score
    val byId = corpus.toMap
    val partial = run(2, Int.MaxValue)
    queries.foreach { case (qid, qv) =>
      assert(partial(qid).nonEmpty)
      partial(qid).foreach { case (id, sim) =>
        assert(sim == cosRef(qv, byId(id)),
          s"query $qid id $id: probed score must be the exact score")
      }
    }
  }

  test("registered hnsw sidecar stays fresh through the real append seam; merges rebuild; stale probes refuse") {
    import graft.ops.{Ingest, VersionedStore}
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("hnswseam").toString
    val table = s"$root/t"
    val side = s"$root/g"
    def mk(r: Range) = r.map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    VersionedStore.append(spark, table, mk(0 until 120))
    graft.ops.Hnsw.registerHnswSidecar(spark, table, "vec_id", "embedding", side)
    // the append seam folds the batch in as new segment graphs
    Ingest.appendRespectingLayout(spark, table, mk(120 until 200))
    val q = Seq((0L, mk(5 to 5).select($"embedding").as[Seq[Float]].head()))
      .toDF("qid", "qv")
    def served() = graft.ops.Hnsw.searchHnswSidecar(spark, table, side,
        q, "qid", "qv", k = 1000, ef = Int.MaxValue)
      .select($"vec_id").as[Long].collect().toSet
    assert(served() == (0L until 200L).toSet,
      "full-ef sidecar serve must cover every ingested row after the fold")
    // a merge REPLACES rows — the fold refuses and the seam rebuilds;
    // the rebuilt graph serves the post-merge truth
    Ingest.mergeRespectingLayout(spark, table,
      mk(150 until 260), "vec_id")
    assert(served() == (0L until 260L).toSet,
      "post-merge rebuild must serve the merged store")
    // a stale sidecar (store moved without maintenance) refuses loudly
    VersionedStore.append(spark, table, mk(260 until 270))
    val e = intercept[IllegalArgumentException] { served() }
    assert(e.getMessage.contains("stale"))
  }

  test("append after buildIvf with empty trailing cells lands at pid >= model.k; partial probe still searches it") {
    import graft.ops.Ivf
    val path = java.nio.file.Files.createTempDirectory("hnswfloor").toString + "/ix"
    val model = Ivf.fit(corpusDf, "vec_id", "embedding", k = 8)
    // keep only rows of the three lowest cells — cells 3..7 stay EMPTY,
    // so the graph parquet's max pid sits BELOW model.k; a max(pid)+1
    // append base would land the new segment INSIDE the cell range and
    // partial probe would silently prune it
    val lowCells = Ivf.assign(corpusDf, "embedding", model)
      .filter($"cluster_id" < 3).drop("cluster_id")
    assert(lowCells.count() > 0, "fixture needs occupied low cells")
    Hnsw.buildIvf(lowCells, "vec_id", "embedding", model, path,
      Hnsw.Params(m = 8, efConstruction = 32))
    val maxCellPid = spark.read.parquet(Hnsw.graphPath(path))
      .agg(max($"pid")).as[Int].head()
    assert(maxCellPid < model.k, "fixture must leave trailing cells empty")
    val extraVec = Array.fill(16)(0.9f)
    val extra = Seq((9001L, extraVec.toSeq)).toDF("vec_id", "embedding")
    Hnsw.append(extra, "vec_id", "embedding", path, numPartitions = 1)
    val appendedPids = spark.read.parquet(Hnsw.graphPath(path))
      .filter($"vec_id" === 9001L).select($"pid").as[Int].collect().toSeq
    assert(appendedPids.nonEmpty && appendedPids.forall(_ >= model.k),
      s"appended segment pids $appendedPids must clear the cell ceiling ${model.k}")
    // the guarantee that motivated the floor: a 1-cell probe must STILL
    // see the appended row (appended segments are always searched)
    val q = Seq((1L, extraVec.toSeq)).toDF("qid", "qv")
    val got = Hnsw.searchBatchProbed(spark, path, q, "qid", "qv",
        k = 1, ef = Int.MaxValue, model, nProbe = 1)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == Seq(9001L),
      "the appended vector must be found under partial probe")
  }

  test("tuneEf: chosen ef meets the target on planted clusters; cap rung is exact; curve is consistent") {
    val rnd = new scala.util.Random(19)
    val centers = (0 until 5).map(_ => Array.fill(16)(rnd.nextFloat() - 0.5f))
    val planted = (0L until 1000L).map { i =>
      val c = centers((i % 5).toInt)
      i -> c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    }
    val path = java.nio.file.Files.createTempDirectory("hnswtune").toString + "/ix"
    Hnsw.build(planted.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, Hnsw.Params(m = 12, efConstruction = 64),
      numPartitions = 2)
    val q = centers.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("qid", "qv")
    val ladder = Seq(8, 40, 1 << 20)
    val (chosen, curveDf) = Hnsw.tuneEf(spark, path, q, "qid", "qv",
      k = 10, targetRecall = 0.9, efLadder = ladder)
    val curve = curveDf.orderBy($"ef").as[(Int, Long, Long)].collect().toSeq
    val tgtM = Hnsw.targetMicros(0.9)
    assert(curve.map(_._1) == ladder, "one curve row per ladder rung, sorted")
    assert(curve.last._3 == 1000000L,
      "cap rung >= partition size is exact (full-ef theorem)")
    assert(ladder.contains(chosen))
    val recallAtChosen = curve.find(_._1 == chosen).get._3
    assert(recallAtChosen >= tgtM, s"chosen ef=$chosen recall_micros $recallAtChosen")
    // minimality: every ladder rung BELOW the chosen one missed the target
    assert(curve.filter(_._1 < chosen).forall(_._3 < tgtM),
      "chosen must be the smallest rung meeting the target")
    // independent recheck through the public API
    val truth = graft.ops.Similarity.similarityJoin(q,
        planted.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding"),
        "qid", "qv", "vec_id", "embedding", 10, "COSINE")
      .select($"qid", $"vec_id")
    val rehits = Hnsw.searchBatch(spark, path, q, "qid", "qv", 10, chosen)
      .join(truth, Seq("qid", "vec_id")).count()
    assert(curve.find(_._1 == chosen).get._2 == rehits,
      "curve hit count must match an independent searchBatch at the chosen ef")
  }

  test("tuneSidecarEf persists a measured operating point; default serve uses it; a moved store refuses until re-tuned") {
    import graft.ops.{Ingest, VersionedStore}
    val root = java.nio.file.Files.createTempDirectory("hnswtunecfg").toString
    val table = s"$root/store"; val gpath = s"$root/graph"
    val df = corpus.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
    VersionedStore.append(spark, table, df.filter($"vec_id" < 400))
    graft.ops.Hnsw.registerHnswSidecar(spark, table, "vec_id", "embedding", gpath)
    val (ef, curve) = Hnsw.tuneSidecarEf(spark, table, gpath,
      k = 5, targetRecall = 0.9, efLadder = Seq(8, 32, 1 << 20), maxSample = 32)
    assert(Hnsw.tunedEf(spark, table, gpath).contains(ef))
    assert(curve.count() == 3)
    val q = Seq((1L, corpus.head._2.toSeq)).toDF("qid", "qv")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select($"qid", $"rank", $"vec_id").as[(Long, Int, Long)].collect().toSeq
    // default (ef = 0) ≡ asking for the tuned width explicitly
    assert(rows(Hnsw.searchHnswSidecar(spark, table, gpath, q, "qid", "qv", 5)) ==
      rows(Hnsw.searchHnswSidecar(spark, table, gpath, q, "qid", "qv", 5, ef)))
    // the store moves through the production seam: the sidecar folds
    // (serve itself stays legal at an explicit ef) but the MEASURED
    // operating point no longer applies — tuned default refuses loudly
    Ingest.appendRespectingLayout(spark, table, df.filter($"vec_id" >= 400)): Unit
    assert(rows(Hnsw.searchHnswSidecar(spark, table, gpath, q, "qid", "qv",
      5, ef = 1 << 20)).nonEmpty)
    val err = intercept[IllegalArgumentException] {
      Hnsw.searchHnswSidecar(spark, table, gpath, q, "qid", "qv", 5)
    }
    assert(err.getMessage.contains("re-run tuneSidecarEf"))
    // re-tuning restores the default path over the grown index
    val (ef2, _) = Hnsw.tuneSidecarEf(spark, table, gpath,
      k = 5, targetRecall = 0.9, efLadder = Seq(8, 32, 1 << 20), maxSample = 32)
    assert(rows(Hnsw.searchHnswSidecar(spark, table, gpath, q, "qid", "qv", 5)) ==
      rows(Hnsw.searchHnswSidecar(spark, table, gpath, q, "qid", "qv", 5, ef2)))
  }

  test("oversized partition refuses loudly; damaged params refuse") {
    val path = java.nio.file.Files.createTempDirectory("hnsw5").toString + "/ix"
    Hnsw.build(corpusDf, "vec_id", "embedding", path,
      Hnsw.Params(m = 4, efConstruction = 8), numPartitions = 2)
    graft.Fs.delete(spark, Hnsw.paramsPath(path))
    graft.Fs.writeString(spark, Hnsw.paramsPath(path), "{\"broken\": true}")
    val e = intercept[IllegalStateException] {
      Hnsw.search(spark, path, corpus.head._2, k = 3, ef = 10).collect()
    }
    assert(e.getMessage.contains("damaged"))
  }
}
