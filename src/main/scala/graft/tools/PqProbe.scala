package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Pq, Similarity}

/** Recall/overfetch sweep for the PQ serving tiers across three fixture
  * regimes (results recorded in SCALE.md):
  *
  *   - `uniform`: the synthetic near-uniform `embeddings` table — the
  *     adversarial case: isotropic high-dim noise, where quantization
  *     error is the same order as inter-point distance spread;
  *   - `clustered`: well-separated gaussian cells with tiny jitter — the
  *     degenerate case the residual encoding exists for (plain PQ
  *     collapses every cell to one code word);
  *   - `lowdim`: a 6-dim latent linearly embedded in 64 dims — the
  *     realistic regime (trained text embeddings have low intrinsic
  *     dimension), where PQ's premise actually holds.
  *
  * Compares plain PQ (`knnPqRescore`) and residual IVF-PQ
  * (`searchIvfPq`, nProbe=k/2) recall@10 against exact knn.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def lowdimFixture: org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(11L)
      val proj = Array.fill(6, 64)(rnd.nextGaussian() * 0.5)
      (0 until 20000).map { i =>
        val z = Array.fill(6)(rnd.nextGaussian())
        (i.toLong,
          Array.tabulate(64)(dd => (0 until 6).map(l => z(l) * proj(l)(dd)).sum.toFloat).toSeq)
      }.toDF("vec_id", "embedding")
    }

    val fixtures: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "uniform" -> graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
        .select($"vec_id", $"embedding"),
      "clustered" -> Fixtures.clusteredEmbeddings(spark, k = 8, perCluster = 2500,
        dim = 32)._1,
      "lowdim" -> lowdimFixture)

    for ((name, emb0) <- fixtures) {
      val emb = emb0.cache()
      val qv = emb.filter($"vec_id" === 0).head().getSeq[Float](1).toArray
      val corpus = emb.filter($"vec_id" =!= 0)
      val ivf = Ivf.fit(corpus, "vec_id", "embedding", k = 8)
      val pqR = Pq.fitResiduals(corpus, "vec_id", "embedding", ivf, m = 8, ncent = 16)
      val encR = Pq.encodeResiduals(Ivf.assign(corpus, "embedding", ivf),
        "embedding", "cluster_id", ivf, pqR).cache()
      val pqP = Pq.fit(corpus, "vec_id", "embedding", m = 8, ncent = 16)
      val encP = Pq.encode(corpus, "embedding", pqP).cache()
      val exact = Similarity.knn(corpus, "embedding", qv, 10, "COSINE")
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      val line = Seq(2, 4, 8, 16, 32).map { of =>
        val p = Pq.knnPqRescore(encP, "vec_id", "embedding", qv, 10, pqP, "COSINE", of)
          .select($"vec_id").collect().map(_.getLong(0)).toSet
        val r = Pq.searchIvfPq(encR, "vec_id", "embedding", qv, 10, ivf, pqR,
            nProbe = 4, metric = "COSINE", overfetch = of)
          .select($"vec_id").collect().map(_.getLong(0)).toSet
        f"of=$of%-3d pq=${(exact & p).size}%2d/10 ivfpq=${(exact & r).size}%2d/10"
      }.mkString("  ")
      println(f"PQSWEEP $name%-10s $line")
      encR.unpersist(); encP.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
