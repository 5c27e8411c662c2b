package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main: drives the public library surface end-to-end —
  * used by the verification workflow, not by the driver. Currently:
  * bucketed co-located join and salted aggregation/join equivalence.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("probe-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.Layout

    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select($"o_orderkey", $"o_custkey")
    val l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    Layout.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Layout.writeBucketed(l, "b_lines", "o_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Layout.bucketedJoin(spark, "b_orders", "b_lines", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    println("BUCKETED: rows=" + joined.count()
      + " bucketedScan=" + plan.contains("Bucketed: true")
      + " shuffles=" + "Exchange hashpartitioning".r.findAllIn(plan).length)

    val plain = l.groupBy($"o_orderkey").count().count()
    val salted = Layout.saltedSumCount(l, "o_orderkey", $"l_quantity".cast("long"), 4).count()
    println(s"SALTED-AGG groups: plain=$plain salted=$salted")
    println("SALTED-JOIN rows: plain=" + l.join(o, "o_orderkey").count()
      + " salted=" + Layout.saltedJoin(l, o, "o_orderkey", 4).count())
    spark.stop()
  }
}
