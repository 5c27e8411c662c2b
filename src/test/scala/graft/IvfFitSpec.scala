package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorMean

/** The dim-scalable k-means fit seam: [[graft.functions.VectorMean]]
  * (one aggregate expression, 2·dim-double buffer) must be BIT-IDENTICAL
  * to the dim-wide `avg(col[i])` fan-out it replaced in [[Ivf.fit]] —
  * same double sums, same per-element null skipping on ragged arrays,
  * same NULL for empty positions — and must keep the planner healthy at
  * production embedding dims where the fan-out meant thousands of
  * aggregate expressions per Lloyd round.
  */
class IvfFitSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("VectorMean equals the avg-expression fan-out bit for bit (ragged + null cases)") {
    val dim = 5
    val rows = Seq(
      (0, Seq[java.lang.Float](1.1f, 2.2f, 3.3f, 4.4f, 5.5f)),
      (0, Seq[java.lang.Float](0.3f, null, 1.7f, 2.9f, 0.1f)),   // null element
      (0, Seq[java.lang.Float](9.9f, 8.8f, 7.7f)),               // short array
      (1, Seq[java.lang.Float](0.25f, 0.5f, 0.75f, 1.0f, 1.25f)),
      (1, null.asInstanceOf[Seq[java.lang.Float]]),              // null array
      (2, Seq[java.lang.Float](null, null, null, null, null))    // all-null
    ).toDF("cluster_id", "emb")
      .withColumn("emb", col("emb").cast("array<float>"))

    // get() (NULL out of bounds) rather than getItem (ANSI error on the
    // short array) — the null-tolerant access whose avg-skip semantics
    // VectorMean reproduces
    val fanout = rows.groupBy($"cluster_id")
      .agg(avg(get(col("emb"), lit(0))).as("m0"),
        (1 until dim).map(i => avg(get(col("emb"), lit(i))).as(s"m$i")): _*)
      .collect()
      .map(r => r.getInt(0) -> (1 to dim).map(i =>
        if (r.isNullAt(i)) None else Some(r.getDouble(i))))
      .toMap

    val vm = rows.groupBy($"cluster_id")
      .agg(VectorMean.vectorMean(col("emb"), dim).as("mean"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Any](1).map {
        case d: java.lang.Double => Some(d.doubleValue())
        case _ => None
      })
      .toMap

    assert(vm.keySet == fanout.keySet)
    vm.keySet.foreach { c =>
      assert(vm(c) == fanout(c), s"cluster $c: ${vm(c)} vs ${fanout(c)}")
      // bit-for-bit, not epsilon: the doubles must be identical
      vm(c).zip(fanout(c)).foreach {
        case (Some(a), Some(b)) =>
          assert(java.lang.Double.doubleToRawLongBits(a) ==
            java.lang.Double.doubleToRawLongBits(b), s"cluster $c ulp drift")
        case (a, b) => assert(a == b)
      }
    }
  }

  test("Ivf.fit at dim 1024 stays a single aggregate expression and converges") {
    val dim = 1024
    val k = 4
    val rnd = new scala.util.Random(11)
    // 4 well-separated blobs so the fit is deterministic and checkable
    val rows = (0 until 200).map { i =>
      val c = i % k
      val v = Array.tabulate(dim)(j =>
        (if (j % k == c) 10f else 0f) + rnd.nextFloat() * 0.01f)
      (i.toLong, v)
    }.toDF("id", "emb")
    val model = graft.ops.Ivf.fit(rows, "id", "emb", k, iters = 2)
    assert(model.k == k && model.centroids.head.length == dim)
    // every point lands with its blob: assignment is pure and total
    val assigned = graft.ops.Ivf.assign(rows, "emb", model)
      .groupBy($"cluster_id").count().collect()
    assert(assigned.length == k, "no cluster collapsed")
    assert(assigned.map(_.getLong(1)).sum == 200L)
    // the Lloyd-mean aggregation is ONE expression — the plan must not
    // enumerate per-dim aggregates (the fan-out printed m0..m1023)
    val plan = rows.groupBy(lit(1))
      .agg(VectorMean.vectorMean(col("emb"), dim).as("mean"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("vector_mean"))
    assert(!plan.contains("m512"), "no per-dim aggregate fan-out in the plan")
  }

  test("NearestCentroids ≡ the (sqrt-dist, cid) struct order it replaced (property)") {
    // brute replica of the array_min/array_sort-over-(d, cid)-structs
    // selection: Double.compare total order (NaN last), cid tiebreak
    def brute(x: Array[Float], cents: Array[Array[Float]], n: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, i) =>
        var s = 0.0; var j = 0
        val m = math.min(x.length, c.length)
        while (j < m) { val d = x(j).toDouble - c(j).toDouble; s += d * d; j += 1 }
        (math.sqrt(s), i)
      }.sortWith { case ((d1, i1), (d2, i2)) =>
        val c = java.lang.Double.compare(d1, d2)
        c < 0 || (c == 0 && i1 < i2)
      }.take(n).map(_._2).toSeq
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 30) {
      val dim = 1 + rnd.nextInt(6)
      // spans the 16-width cutover: narrow trials take the linear
      // min-scan, wide ones the argsort — both must match brute
      val k = 1 + rnd.nextInt(if (trial % 2 == 0) 9 else 40)
      // small integer coordinates force frequent exact distance TIES;
      // an occasional NaN coordinate exercises the NaN-last order
      def v(): Array[Float] = Array.fill(dim)(
        if (trial % 7 == 3 && rnd.nextInt(10) == 0) Float.NaN
        else rnd.nextInt(3).toFloat)
      val cents = Array.fill(k)(v())
      val rows = (0 until 20).map(i => (i.toLong, v())).toDF("id", "emb")
      val n = 1 + rnd.nextInt(k)
      val got = rows.select($"id", graft.functions.VectorFunctions
          .nearestCentroids($"emb", cents, n).as("r"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val embs = rows.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      embs.foreach { case (id, e) =>
        assert(got(id) == brute(e, cents, n), s"trial $trial id $id")
      }
    }
    // null input row yields null (the assign/probe null contract)
    val withNull = Seq((1L, Array(1f, 2f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "emb")
    val r = withNull.select(graft.functions.VectorFunctions
      .nearestCentroids($"emb", Array(Array(0f, 0f)), 1)).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }

  test("kForCorpus: sqrt rule, floor 2, cap, and monotonicity") {
    import graft.ops.Ivf.kForCorpus
    assert(kForCorpus(0) == 2)
    assert(kForCorpus(1) == 2)
    assert(kForCorpus(4) == 2)
    assert(kForCorpus(100) == 10)
    assert(kForCorpus(10000) == 100)
    // 16x the corpus = 4x the centroids — the rule the cell-join
    // family's sublinear claim rests on (cells stay ≈√N-sized)
    assert(kForCorpus(16L * 10000) == 4 * kForCorpus(10000))
    assert(kForCorpus(1L << 50) == 4096, "planner cap binds")
    assert(kForCorpus(1L << 50, maxK = 64) == 64)
    intercept[IllegalArgumentException](kForCorpus(10, maxK = 1))
  }

  test("tuneNProbe: recall curve is cumulative-exact, chosen width meets the target") {
    // 4 tight blobs; each query sits BETWEEN its own blob and the next
    // (offset toward blob (c+1)%4), so its exact top-k straddles two
    // cells and nProbe=1 cannot reach full recall
    val rnd = new scala.util.Random(5)
    def pt(c: Int, eps: Float): Array[Float] =
      Array.tabulate(8)(j => (if (j == c * 2) 10f else 0f) + eps)
    // blobs of 5 < k = 10, so every query's exact top-10 MUST straddle
    // its home cell and the neighbor it leans toward
    val corpus = (0 until 20).map { i =>
      (i.toLong, pt(i % 4, rnd.nextFloat() * 0.01f))
    }.toDF("id", "emb")
    val queries = (0 until 8).map { i =>
      val c = i % 4
      val v = pt(c, 0.005f)
      v(((c + 1) % 4) * 2) += 6f
      (1000L + i, v)
    }.toDF("qid", "qemb")
    val model = graft.ops.Ivf.fit(corpus, "id", "emb", k = 4)
    val (p, curveDf) = graft.ops.Ivf.tuneNProbe(corpus, "id", "emb", model,
      queries, "qid", "qemb", k = 10, targetRecall = 1.0)
    val curve = curveDf.orderBy($"n_probe").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // monotone, full probe = exactly 1.0 (in exact micros), and the
    // straddle forces p > 1
    assert(curve.length == 4)
    assert(curve.sliding(2).forall(w => w(0)._2 <= w(1)._2))
    assert(curve.last._3 == 1000000L)
    assert(p > 1, s"straddling queries must need more than one probe (got $p)")
    assert(curve(p - 1)._3 >= 1000000L && (p == 1 || curve(p - 2)._3 < 1000000L),
      "chosen width is the SMALLEST meeting the target")
    // the tuned width really delivers: the cell join at p recovers the
    // exact top-k pair set bit-for-bit under the same tiebreak
    val exact = graft.ops.Similarity.similarityJoin(queries, corpus,
      "qid", "qemb", "id", "emb", 10)
    val ivf = graft.ops.Similarity.ivfJoinTopK(queries, corpus,
      "qid", "qemb", "id", "emb", model, nProbe = p, k = 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs(ivf) == pairs(exact))
    // a looser target picks a narrower probe
    val (pLoose, _) = graft.ops.Ivf.tuneNProbe(corpus, "id", "emb", model,
      queries, "qid", "qemb", k = 10, targetRecall = 0.5)
    assert(pLoose <= p)
    intercept[IllegalArgumentException](graft.ops.Ivf.tuneNProbe(
      corpus, "id", "emb", model, queries, "qid", "qemb", 10, 0.0))
  }

  test("fitAuto: sizes k by the rule, samples the Lloyd phase, deterministic") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (i.toLong, Array.tabulate(8)(j => rnd.nextFloat() + (if (i % 3 == j) 5f else 0f)))
    }.toDF("id", "emb")
    val (m1, n1) = graft.ops.Ivf.fitAuto(rows, "id", "emb")
    assert(n1 == 400L)
    assert(m1.k == graft.ops.Ivf.kForCorpus(400)) // = 20
    // deterministic: same corpus, same model, fingerprint-stable
    val (m2, _) = graft.ops.Ivf.fitAuto(rows, "id", "emb")
    assert(m1.fingerprint == m2.fingerprint)
    // null embeddings neither count nor train
    val withNull = rows.union(Seq((9999L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "emb"))
    val (m3, n3) = graft.ops.Ivf.fitAuto(withNull, "id", "emb")
    assert(n3 == 400L && m3.fingerprint == m1.fingerprint)
    // the training set really is hash-bounded when n > 256*k: shrink
    // the cap so the bound binds, and the model must differ from the
    // full-corpus fit only via its training subset — still k centroids
    val (m4, _) = graft.ops.Ivf.fitAuto(rows, "id", "emb", maxK = 2)
    assert(m4.k == 2)
  }
}
