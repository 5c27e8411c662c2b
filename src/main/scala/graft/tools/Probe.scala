package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main: drives the public library surface end-to-end —
  * used by the verification workflow, not by the driver. Currently:
  * document-frequency pruning in ngramJaccardPairs (timing + result
  * equality vs the driver-checked output).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.2).count()
      println(f"ngram_jaccard sf0.1 run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    }
    spark.stop()
  }
}
