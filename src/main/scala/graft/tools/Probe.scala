package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main: drives the public library surface end-to-end
  * against real data/files — used by the verification workflow, not by
  * the driver. Currently: testset upsert + evaluation sinks, chunk JSON
  * round trip, V9 response assembly.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.{Chat, Ingest, Testbed}
    import java.nio.file.Files

    val base = Files.createTempDirectory("probe-tb").toString

    // S18: upsert, then re-upsert the same tid with different content
    val qa1 = Seq(Testbed.QaRecord("what is a join", "join combines tables", "c", "sql")).toDF()
    val qa2 = Seq(
      Testbed.QaRecord("what is a scan", "scan reads data", "c", "sql"),
      Testbed.QaRecord("what is a sort", "sort orders rows", "c", "sql")).toDF()
    Testbed.upsertTestset(spark, s"$base/testsets", "tid-A", "first", qa1)
    Testbed.upsertTestset(spark, s"$base/testsets", "tid-A", "first-v2", qa2)
    val ts = spark.read.parquet(s"$base/testsets")
    println("UPSERT rows after replace: " + ts.count() + " names=" +
      ts.select("name").distinct().as[String].collect().mkString(","))

    // S19: evaluate + append evaluation
    val report = Testbed.evaluate(qa2.select($"question", $"reference_answer", $"reference_context", $"topic"),
      q => s"surely ${q.split(" ").last} works", Testbed.keywordJudge)
    val eid = Testbed.appendEvaluation(spark, s"$base/evals", s"$base/reports", "tid-A", report)
    println("EVAL row: " + spark.read.parquet(s"$base/evals").collect().mkString)
    println("REPORT rows: " + spark.read.parquet(s"$base/reports").count() + " eid=" + eid)

    // S13 -> S9 chunk JSON round trip
    Ingest.writeChunksJson(Seq(("k1", "round trip text", Map("s" -> "v"))).toDF("id", "text", "metadata"),
      s"$base/chunks")
    println("CHUNK-JSON back: " + graft.sources.DocumentSources.readChunksJson(spark, s"$base/chunks")
      .select("text").as[String].head())

    // V9 response assembly
    val ans = Chat.RagAnswer("q words here", "q words here", "an answer", "ctx a\n\nctx b", Seq(1L), relevant = true)
    println("V9: " + Chat.toResponse(ans, "template", 1723400000L))
    println("V9 max_tokens: " + Chat.toResponse(ans, "template", 0L, "MAX_TOKENS").choices.head.finish_reason)
    spark.stop()
  }
}
