package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main: drives the public library surface end-to-end
  * against real data/files — used by the verification workflow, not by
  * the driver. Currently: review-fix drives (string-keyed RAG store,
  * sequential history cleaning, short-doc minhash, metadata-less
  * testsets, IVF narrow assign plan).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.{Chat, Dedup, Ingest, Ivf, Testbed}
    import graft.embed.HashEmbedder
    import java.nio.file.{Files, Paths}

    // RAG answer over the md5-string-keyed store (no synthetic ids)
    val dir = Files.createTempDirectory("probe-rag").toString
    val cfg = Ingest.StoreConfig("probe", "hash-64", 200, 40)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Ingest.ingest(spark, docs, "doc_id", "text", dir, cfg, HashEmbedder(64))
    val store = Ingest.readStore(spark, dir, cfg).get
    val ans = Chat.answer(spark, "merge batch table join", store, "id", "text", "embedding", HashEmbedder(64))
    println(s"RAG-STRING-ID: relevant=${ans.relevant} ids=${ans.retrievedIds.map(_.take(8)).mkString(",")} q='${ans.question}' rq='${ans.rewrittenQuery}'")

    // non-identity rewriter preserves the original question
    val rewriter = new Chat.ChatModel {
      def rewrite(q: String, h: Seq[String]): String = q + " rewritten"
      def generate(s: String, c: String, q: String): String = s"ans($q)"
    }
    val ans2 = Chat.answer(spark, "original q", store, "id", "text", "embedding", HashEmbedder(64), model = rewriter)
    println(s"REWRITE: question='${ans2.question}' rewritten='${ans2.rewrittenQuery}'")

    // sequential pop semantics on consecutive tools
    val par = Seq(("p", 0L, "human", "q"), ("p", 1L, "ai", "call"),
      ("p", 2L, "tool", "r1"), ("p", 3L, "tool", "r2")).toDF("session", "seq", "role", "content")
    Chat.cleanHistory(par, useHistory = true, sysPrompt = "sys").show(false)

    // minhash with short (shingle-less) docs must not blow up or pair them
    val shorties = (0L until 50L).map(i => (i, "hi")) ++ Seq((100L, "a b c d e f g"), (101L, "a b c d e f g"))
    val pairs = Dedup.minhashNearDupPairs(shorties.toDF("doc_id", "text"), "doc_id", "text", 0.5)
    println("MINHASH short-doc pairs: " + pairs.collect().mkString(", "))

    // metadata-less testset JSON reads with default topic
    val ts = Files.createTempDirectory("probe-ts").toString
    Files.writeString(Paths.get(ts, "qa.jsonl"),
      """{"question":"q1","reference_answer":"a1","reference_context":"c1"}""")
    Testbed.readTestset(spark, ts + "/qa.jsonl").show(false)

    // IVF assign is narrow: no Exchange in the plan
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val model = Ivf.fit(emb, "vec_id", "embedding", 8)
    val assignPlan = Ivf.assign(emb, "embedding", model).queryExecution.executedPlan.toString
    println("IVF-ASSIGN exchanges: " + "Exchange".r.findAllIn(assignPlan).length)
    spark.stop()
  }
}
