package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main: drives the public library surface end-to-end
  * (ingest → store → RAG answer → testbed evaluation) against the real
  * test data — used by the verification workflow, not by the driver.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.{Chat, Ingest, Testbed}
    import graft.embed.HashEmbedder

    val dir = java.nio.file.Files.createTempDirectory("probe-store").toString
    val cfg = Ingest.StoreConfig("probe", "hash-64", 200, 40)
    val embedder = HashEmbedder(64)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    val r1 = Ingest.ingest(spark, docs, "doc_id", "text", dir, cfg, embedder)
    println(s"INGEST-1: $r1")
    val r2 = Ingest.ingest(spark, docs, "doc_id", "text", dir, cfg, embedder)
    println(s"INGEST-2 (idempotent): $r2")
    println("CATALOG: " + Ingest.listStores(spark, dir).collect().mkString)

    val store = Ingest.readStore(spark, dir, cfg).get
      .withColumn("num_id", xxhash64($"id"))
    val ans = Chat.answer(spark, "merge batch table join", store,
      "num_id", "text", "embedding", embedder, topK = 4)
    println(s"RAG: relevant=${ans.relevant} nDocs=${ans.retrievedIds.size} answer='${ans.answer}'")
    println(s"RAG context head: ${ans.context.take(80)}")

    val qa = Seq(
      Testbed.QaRecord("what words appear", "merge tables often", "ctx", "t1"),
      Testbed.QaRecord("tell me about", "zzzznotindata", "ctx", "t2")
    ).toDF()
    val report = Testbed.evaluate(qa,
      q => Chat.answer(spark, q, store, "num_id", "text", "embedding", embedder).context.take(200),
      Testbed.keywordJudge)
    println("EVAL overall: " + Testbed.overall(report).collect().mkString)
    println("EVAL by topic: " + Testbed.byTopic(report).collect().mkString(", "))
    spark.stop()
  }
}
