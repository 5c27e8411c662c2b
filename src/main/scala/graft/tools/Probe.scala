package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main: drives the public library surface end-to-end
  * against real data/files — used by the verification workflow, not by
  * the driver. Currently: streaming incremental ingest, multimodal
  * binary pipeline, IVF partition pruning.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.{Ivf, Multimodal, Similarity}
    import graft.streaming.IncrementalIngest
    import graft.embed.HashEmbedder
    import java.nio.file.{Files, Paths}

    // --- streaming incremental ingest on real files ---
    val in = Files.createTempDirectory("probe-stream").toString
    val store = Files.createTempDirectory("probe-sstore").toString + "/chunks"
    val ckpt = Files.createTempDirectory("probe-ckpt").toString
    Files.writeString(Paths.get(in, "b1.json"),
      """{"doc_id":1,"text":"alpha beta gamma"}""" + "\n" + """{"doc_id":2,"text":"delta epsilon zeta"}""")
    val q = IncrementalIngest.start(spark, in, store, HashEmbedder(16), 64, 0, ckpt)
    q.processAllAvailable()
    println("STREAM batch1 rows: " + spark.read.parquet(store).count())
    Files.writeString(Paths.get(in, "b2.json"),
      """{"doc_id":3,"text":"alpha beta gamma"}""" + "\n" + """{"doc_id":4,"text":"eta theta iota"}""")
    q.processAllAvailable()
    println("STREAM batch2 rows (dup content skipped): " + spark.read.parquet(store).count())
    q.stop()

    // --- multimodal binary pipeline ---
    val media = Files.createTempDirectory("probe-media").toString
    Files.write(Paths.get(media, "a.img"), Array.tabulate[Byte](256)(i => i.toByte))
    Files.write(Paths.get(media, "b.img"), Array.fill[Byte](64)(3))
    val feats = Multimodal.extractFeatures(Multimodal.readMediaDir(spark, media, "image"),
      Multimodal.FakeDecoder(16))
    feats.show(5, truncate = 40)

    // --- IVF partition pruning visible in the plan ---
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 8)
    val dir = Files.createTempDirectory("probe-ivf").toString + "/store"
    Ivf.writePartitioned(emb, "embedding", model, dir)
    val qv = emb.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0).toArray
    val pruned = Ivf.search(spark.read.parquet(dir), "embedding", model, qv, 10, nProbe = 2)
    pruned.queryExecution.executedPlan.collectLeaves().foreach(l =>
      println("IVF SCAN: " + l.toString.linesIterator.find(_.contains("cluster_id")).getOrElse(l.toString.take(120))))
    val exact = Similarity.knn(emb.select($"vec_id", $"embedding"), "embedding", qv, 10)
      .select($"vec_id").as[Long].collect().toSet
    val got = pruned.select($"vec_id").as[Long].collect().toSet
    println(s"IVF nProbe=2 recall@10 = ${got.intersect(exact).size}/10")
    spark.stop()
  }
}
