package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/classloading/file-index so the first measured query
    // doesn't absorb session startup
    spark.range(100000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a broken query must surface in the JSON (err + sentinel -1
      // timing), never masquerade as a plausible wall-clock number
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that persist reuse-boundaries would otherwise pin cache
      // across all queries and skew later timings
      spark.catalog.clearCache()
      (name, if (err.isDefined) -1.0 else dt, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + Jsons.escape(e) + "\""
    }.mkString("{", ",", "}")
    val total = results.map { case (_, v, _) => math.max(v, 0.0) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
