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

    // Constant-factor A/B on REALISTIC (>= 1 KB) documents: fixture
    // docs are ~100 chars, which hides the per-character transition
    // cost behind per-row overhead. Inflate each doc to >= 1 KB (text
    // repeated 16x — same match structure, 16x the characters), then
    // drive the SAME automaton semantics through (a) the shipped
    // dense sorted-array traversal and (b) a probe-local Map[Char,Int]
    // traversal (the pre-round-11 representation), single-threaded on
    // the driver so the comparison is pure per-char cost.
    val texts1k = docs1
      .select(concat_ws(" ", expr("array_repeat(text, 16)")).as("text"))
      .collect().map(_.getString(0))
    val totalChars = texts1k.map(_.length.toLong).sum
    require(totalChars >= 1024L * texts1k.length,
      s"inflated docs must average >= 1 KB, got ${totalChars / texts1k.length}")
    val auto = graft.ops.Gazetteer.Automaton(vocab)
    val boxed = new MapAutomaton(vocab)
    def timeScan(f: String => Long): (Long, Double) = {
      var acc = 0L
      val t0 = System.nanoTime()
      texts1k.foreach(t => acc += f(t))
      (acc, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths before measuring (JIT)
    texts1k.take(200).foreach { t => auto.scanHits(t); boxed.scanMatches(t) }
    val (hitsDense, tDense) = timeScan(t => auto.scanHits(t).map(_._2).sum)
    val (hitsMap, tMap) = timeScan(boxed.scanMatches)
    require(hitsDense == hitsMap,
      s"dense and map traversals must agree: $hitsDense vs $hitsMap")
    println(f"SCALE gazetteer-dense 1KB-docs chars=$totalChars%d " +
      f"matches=$hitsDense%d dense: $tDense%6.2f s " +
      f"(${totalChars / tDense / 1e6}%5.1f Mchar/s) | map: $tMap%6.2f s " +
      f"(${totalChars / tMap / 1e6}%5.1f Mchar/s) | speedup ${tMap / tDense}%4.2fx")
    spark.stop()
  }

  /** Probe-local reference: the pre-round-11 `Map[Char, Int]`-per-node
    * Aho–Corasick traversal, kept ONLY to measure the dense rewrite's
    * constant-factor win. Returns the total match count (the cheap
    * reduction both scans share).
    */
  final class MapAutomaton(terms: Seq[String]) {
    private val gotoB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    private val emitB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    terms.zipWithIndex.foreach { case (t, ti) =>
      var s = 0
      t.foreach { c =>
        s = gotoB(s).getOrElseUpdate(c, {
          gotoB += scala.collection.mutable.Map.empty[Char, Int]
          emitB += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoB.length - 1
        })
      }
      emitB(s) += ti
    }
    private val fail = new Array[Int](gotoB.length)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      gotoB(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoB(r).foreach { case (c, s) =>
          queue += s
          var f = fail(r)
          while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
          fail(s) = if (gotoB(f).contains(c) && gotoB(f)(c) != s) gotoB(f)(c) else 0
          emitB(s) ++= emitB(fail(s))
        }
      }
    }
    private val gotoMap: Array[Map[Char, Int]] = gotoB.map(_.toMap).toArray
    private val emitCount: Array[Int] = emitB.map(_.length).toArray

    def scanMatches(text: String): Long = {
      var s = 0
      var i = 0
      var n = 0L
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotoMap(s).contains(c)) s = fail(s)
        s = gotoMap(s).getOrElse(c, 0)
        n += emitCount(s)
        i += 1
      }
      n
    }
  }
}
