package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe main for end-to-end verification of the public API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0).toArray
    val out = e.filter($"vec_id".isin(1,2,3)).select($"vec_id",
      cosineSim($"embedding", typedlit(q)).as("cos"),
      dotProduct($"embedding", typedlit(q)).as("dot"),
      euclidean($"embedding", typedlit(q)).as("euc")).orderBy($"vec_id")
    out.show(false)
    out.explain("formatted")
    val z = Seq((Array(0f,0f), Array(1f,2f)), (Array(1f,2f,3f), Array(1f,2f))).toDF("a","b")
    z.select(cosineSim($"a",$"b").as("cos"), dotProduct($"a",$"b").as("dot"), euclidean($"a",$"b").as("euc")).show(false)
    try spark.range(1).select(cosineSim($"id",$"id")).collect()
    catch { case ex: Exception => println("TYPECHECK-ERR: " + ex.getMessage.take(150)) }
    // hash embedder through public trait
    val emb = graft.embed.HashEmbedder(dim = 8)
    println("embed('key agg row') = " + emb.embed("key agg row").mkString(","))
    println("embed deterministic: " + (emb.embed("key agg row").toSeq == emb.embed("key agg row").toSeq))
    println("embed('') = " + emb.embed("").mkString(","))
    spark.stop()
  }
}
