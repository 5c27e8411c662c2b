package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused min-of-K re-measure of ngramJaccardPairs scaling: the full
  * ScaleProbe is single-shot, and this sandbox stalls individual runs
  * 10-100x at random — a suspicious ratio needs min-of-K + process-CPU
  * before it is believed (the Bench.scala methodology).
  */
object JaccardScaleCheck {
  def main(args: Array[String]): Unit = {
    val n = 4
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val docs1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text").localCheckpoint()
    val docsN = (0 until n).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(^|\\s)", "$1s" + i + "_").as("text"))
    }.reduce(_ union _).localCheckpoint()
    def minOfK(label: String, df: org.apache.spark.sql.DataFrame): Double = {
      val samples = (1 to runs).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        val rows = graft.ops.Dedup.ngramJaccardPairs(df, "doc_id", "text", 0.2).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        spark.catalog.clearCache(); System.gc()
        (wall, cpu, rows)
      }
      val best = samples.minBy(_._1)
      println(f"JSC $label: min ${best._1}%6.2f s (cpu/wall ${best._2 / best._1}%4.1f) " +
        f"max ${samples.map(_._1).max}%6.2f s rows ${best._3}")
      best._1
    }
    val t1 = minOfK("1x", docs1)
    val tN = minOfK(s"${n}x", docsN)
    println(f"JSC ratio: ${tN / t1}%4.2f (ideal <= $n)")
    spark.stop()
  }
}
