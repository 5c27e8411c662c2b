package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main: drives the public library surface end-to-end —
  * used by the verification workflow, not by the driver. Currently:
  * stateful streaming session history (flatMapGroupsWithState).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.SessionState
    import graft.streaming.SessionState.Msg
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Msg]
    val q = SessionState.track(stream.toDS())
      .writeStream.format("memory").queryName("probe_sess").outputMode("append").start()
    stream.addData(Msg("a", 1, "human", "q1"), Msg("a", 2, "ai", "a1"), Msg("b", 1, "human", "x"))
    q.processAllAvailable()
    stream.addData(Msg("a", 3, "tool", "r"), Msg("b", 2, "reset", ""))
    q.processAllAvailable()
    println("SESSION UPDATES:")
    spark.table("probe_sess").orderBy("session", "lastSeq").show(false)
    q.stop()
    spark.stop()
  }
}
