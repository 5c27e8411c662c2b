package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for the Aho–Corasick gazetteer: per-document cost
  * must be flat in DICTIONARY size (the automaton claim) and linear in
  * corpus size. Protocol: sf0.1 docs × {10, 2000}-term dictionaries
  * (terms = the corpus's own most frequent words — worst case: they
  * actually hit), then 8× corpus at the 2000-term dictionary.
  */
object GazetteerProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()

    val docs1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text").localCheckpoint()
    val docs8 = (0 until 8).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"), $"text")
    }.reduce(_ union _).localCheckpoint()
    // dictionary = distinct 3-word PHRASES of the corpus itself (the
    // realistic gazetteer shape, and the worst case: every entry hits).
    // The corpus vocabulary is only ~31 distinct WORDS — a word-level
    // dictionary silently truncates and the flat-in-|terms| claim
    // would be measured on 31 entries, not 2000.
    val vocab = docs1
      .select(explode(expr(
        "transform(sequence(1, greatest(size(split(trim(text), '\\\\s+')) - 2, 1))," +
          " i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i, 3)))")).as("p"))
      .filter(length($"p") > 0).distinct().orderBy($"p").limit(2000)
      .collect().map(_.getString(0)).toSeq
    require(vocab.length == 2000,
      s"dictionary must really hold 2000 phrases, got ${vocab.length}")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def run(d: org.apache.spark.sql.DataFrame, nTerms: Int) =
      time(graft.ops.Gazetteer.matchCounts(d, "doc_id", "text",
        vocab.take(nTerms)).count())
    val (r10, t10) = run(docs1, 10)
    val (r2k, t2k) = run(docs1, 2000)
    val (r8x, t8x) = run(docs8, 2000)
    println(f"SCALE gazetteer dict=${vocab.length} 1x/10t: $r10%9d rows $t10%6.1f s | " +
      f"1x/2000t: $r2k%9d rows $t2k%6.1f s (terms 200x, time ${t2k / t10}%4.1fx) | " +
      f"8x/2000t: $r8x%9d rows $t8x%6.1f s (time ${t8x / t2k}%4.1fx)")
    spark.stop()
  }
}
