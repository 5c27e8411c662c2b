package graft.tools

/** One-off probe: dump readHtmlSections over the committed fixtures so
  * the oracle literals can be pinned exactly.
  */
object HtmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("html-probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    graft.sources.DocumentSources
      .readHtmlSections(spark, "/root/repo/fixtures/html/*.html")
      .orderBy("doc_id", "section_idx")
      .collect()
      .foreach { r =>
        println(s"ROW|${r.getString(0)}|${r.getInt(1)}|${r.getString(2)}|${r.getString(3)}")
      }
    spark.stop()
  }
}
