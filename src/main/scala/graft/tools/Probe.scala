package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main: drives the public library surface end-to-end —
  * used by the verification workflow, not by the driver. Currently:
  * the explode_chunks SQL generator over the real documents table.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ExplodeChunks.register(spark)
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").createOrReplaceTempView("docs")
    spark.sql(
      """SELECT doc_id, c.chunk_idx, c.chunk_start, substr(c.chunk_text, 1, 30) AS head
        |FROM docs LATERAL VIEW explode_chunks(text, 200, 150) c
        |WHERE doc_id < 2 ORDER BY doc_id, chunk_idx""".stripMargin).show(false)
    println("TOTAL CHUNKS via SQL: " + spark.sql(
      "SELECT count(*) FROM docs LATERAL VIEW explode_chunks(text, 200, 150) c").head.getLong(0))
    // error path: non-literal size must fail analysis cleanly
    try spark.sql("SELECT c.* FROM docs LATERAL VIEW explode_chunks(text, doc_id, 10) c").collect()
    catch { case e: Exception => println("TYPECHECK-ERR: " + e.getMessage.take(120)) }
    spark.stop()
  }
}
