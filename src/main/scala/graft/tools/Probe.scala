package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main: drives the public library surface end-to-end —
  * used by the verification workflow, not by the driver. Currently:
  * review-fix batch (session-state removal, explode_chunks validation,
  * hierarchy paths, dedup join strategy).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("=== 1. SessionState: reset removes state; next message starts fresh ===")
    locally {
      import graft.streaming.SessionState
      import graft.streaming.SessionState.Msg
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Msg]
      val q = SessionState.track(stream.toDS())
        .writeStream.format("memory").queryName("probe_sess").outputMode("append").start()
      stream.addData(Msg("a", 1, "human", "q1"), Msg("a", 2, "ai", "a1"))
      q.processAllAvailable()
      stream.addData(Msg("a", 3, "reset", ""))
      q.processAllAvailable()
      stream.addData(Msg("a", 4, "human", "fresh"))
      q.processAllAvailable()
      spark.table("probe_sess").orderBy("lastSeq").show(false)
      q.stop()
    }

    println("=== 2. explode_chunks: analysis-time rejection of bad literals ===")
    graft.functions.ExplodeChunks.register(spark)
    Seq("hello world this is a chunking probe").toDF("text").createOrReplaceTempView("probe_docs")
    println("good call rows: " + spark.sql(
      "SELECT c.* FROM probe_docs LATERAL VIEW explode_chunks(text, 10, 8) c").count())
    for (bad <- Seq(
        "explode_chunks(text, 0, 0)",
        "explode_chunks(text, CAST(4294967336 AS BIGINT), 150)",
        "explode_chunks(text, CAST(NULL AS INT), 2)")) {
      try {
        spark.sql(s"SELECT c.* FROM probe_docs LATERAL VIEW $bad c").count()
        println(s"UNEXPECTED PASS: $bad")
      } catch {
        case e: Exception =>
          println(s"rejected [$bad]: " + e.getMessage.linesIterator.next().take(140))
      }
    }

    println("=== 3. Hierarchy.buildPaths on a 5-deep chain (localCheckpoint loop) ===")
    val t0 = System.nanoTime()
    val hier = Seq((1, Option.empty[Int], "root"), (2, Some(1), "a"), (3, Some(2), "b"),
      (4, Some(3), "c"), (5, Some(4), "d"), (6, Some(1), "e")).toDF("id", "parent", "name")
    graft.ops.Hierarchy.buildPaths(hier, "id", "parent", "name").orderBy("id")
      .select("id", "path").show(false)
    println(f"buildPaths wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    println("=== 4. minhash candidate verify join: no forced broadcast of pair set ===")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val plan = graft.ops.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    val hinted = plan.linesIterator.filter(_.contains("BroadcastHashJoin")).size
    println(s"pairs result rows: " +
      graft.ops.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.5).count())
    println(s"BroadcastHashJoin nodes in plan (AQE-chosen ok, none forced): $hinted")
    spark.stop()
  }
}
