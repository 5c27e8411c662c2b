package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Ivf, Pq}

/** Batch-vs-loop cost of the residual IVF-PQ serve: 16 queries through
  * ONE searchIvfPqBatch scan vs 16 searchIvfPq calls (min of 3 each).
  */
object PqBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding").localCheckpoint()
    val ivf = Ivf.fit(emb, "vec_id", "embedding", k = 8)
    val pq = Pq.fitResiduals(emb, "vec_id", "embedding", ivf, m = 8, ncent = 16)
    val enc = Pq.encodeResiduals(Ivf.assign(emb, "embedding", ivf),
      "embedding", "cluster_id", ivf, pq).localCheckpoint()
    val queries = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("qid"), $"embedding").localCheckpoint()
    val qvs = queries.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def time(f: => Long): Double = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    }
    val tBatch = time(Pq.searchIvfPqBatch(queries, enc, "qid", "embedding",
      "vec_id", "embedding", ivf, pq, topK = 10, nProbe = 2).count())
    val tLoop = time(qvs.map { case (_, qv) =>
      Pq.searchIvfPq(enc, "vec_id", "embedding", qv, 10, ivf, pq, nProbe = 2).count()
    }.sum)
    println(f"PQBATCH batch16=$tBatch%.2f s  loop16=$tLoop%.2f s  speedup=${tLoop / tBatch}%.1fx")
    spark.stop()
  }
}
