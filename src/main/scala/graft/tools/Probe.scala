package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main: drives the public library surface end-to-end —
  * used by the verification workflow, not by the driver. Currently:
  * hierarchy rollup, relevance normalization, sentence splitting.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.{Hierarchy, Similarity, Split}

    val nodes = Seq((1L, None: Option[Long], "tenancy"), (2L, Some(1L), "dev"),
      (3L, Some(2L), "data"), (4L, Some(3L), "pipelines")).toDF("id", "parent", "name")
    println("HIERARCHY:")
    Hierarchy.buildPaths(nodes, "id", "parent", "name").select("id", "path").show(false)

    val scores = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(3)
      .select($"vec_id", graft.functions.VectorFunctions.cosineSim($"embedding", $"embedding").as("cos"))
    println("RELEVANCE (self-cosine=1 -> 1.0):")
    scores.select($"vec_id", Similarity.relevance("COSINE", $"cos").as("rel")).show(false)

    println("SENTENCES: " + Split.sentences("One here. Two is longer. Three ends.", 20, 0).map(_.text).mkString("|"))
    spark.stop()
  }
}
