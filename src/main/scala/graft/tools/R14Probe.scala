package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 scaling evidence:
  *
  * 1. PSL-backed registered domain ([[graft.ops.Psl]]) — the rule sets
  *    compile to literal InSet probes over the last 1-4 host labels,
  *    so 16× hosts on a fixed core budget must be ≈16× work with a
  *    small fixed floor (no shuffle, no UDF, no join). The host mix
  *    deliberately hits every rule class (exact-2, exact-3, wildcard,
  *    exception, IPv4, default).
  * 2. PNG compressed text chunks ([[graft.sources.PngMeta]]) — the
  *    zTXt/iTXt inflate path is a per-file bounded kernel under the
  *    1 MiB bomb cap; throughput is measured per-chunk single-threaded
  *    (the binaryFile scan adds file parallelism at corpus scale).
  * 3. Trained language ID at THIRTY languages — round 14 tripled the
  *    profile breadth (10 → 30 langs, 12 scripts); the classify shape
  *    (broadcast profiles, per-doc kernel, two map-side-combinable
  *    aggs) must stay flat per-row at 16× docs, and the serving-path
  *    kernel ([[graft.ops.LangId.classifyMapSide]]) shuffle-free.
  */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- 1. PSL registered domain at 16x ----
    def hosts(n: Long) = spark.range(n).select(
      when($"id" % 6 === 0, concat(lit("www.blog.site"), $"id" % 997, lit(".com")))
        .when($"id" % 6 === 1, concat(lit("news.example"), $"id" % 997, lit(".com.au")))
        .when($"id" % 6 === 2, concat(lit("x"), $"id" % 997, lit(".foo.kawasaki.jp")))
        .when($"id" % 6 === 3, concat(lit("sub"), $"id" % 997, lit(".city.kawasaki.jp")))
        .when($"id" % 6 === 4, lit("192.168.4.1"))
        .otherwise(concat(lit("a.b.example"), $"id" % 997, lit(".zz")))
        .as("host"))
    def psl(n: Long): Long =
      hosts(n).select(graft.ops.Psl.registeredDomain($"host").as("d"))
        .filter($"d".endsWith(".com.au")).count()
    val plan = hosts(1000)
      .select(graft.ops.Psl.registeredDomain($"host").as("d"))
      .queryExecution.executedPlan.toString
    require(!plan.contains("Exchange") && !plan.toLowerCase.contains("udf"),
      s"PSL derivation must stay a pure narrow expression:\n$plan")
    psl(100000) // warm
    val (p1c, p1) = time(psl(1000000L))
    val (p16c, p16) = time(psl(16000000L))
    println(f"[psl] 1M hosts: $p1%.2f s ($p1c com.au); 16M: $p16%.2f s " +
      f"($p16c); per-row ratio ${p16 / p1 / 16}%.2fx; plan shuffle-free")

    // ---- 2. PNG compressed text-chunk inflate throughput ----
    def pngWithZtxt(seed: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        def be32(v: Long): Unit = {
          out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
          out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
        }
        be32(data.length.toLong)
        val tb = tag.getBytes("US-ASCII")
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        be32(crc.getValue)
        out.toByteArray
      }
      val text = (s"provenance record $seed: " + ("lorem ipsum " * 400))
        .getBytes("ISO-8859-1")
      val d = new java.util.zip.Deflater()
      d.setInput(text); d.finish()
      val zb = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) zb.write(buf, 0, d.deflate(buf))
      d.end()
      sig ++ chunk("zTXt", "Comment".getBytes("ISO-8859-1") ++
        Array[Byte](0, 0) ++ zb.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }
    val pngs = (0 until 2000).map(pngWithZtxt).toArray
    pngs.take(50).foreach(graft.sources.PngMeta.parse) // warm
    val (nTags, tPng) = time(pngs.map(graft.sources.PngMeta.parse(_).length).sum)
    val totalMb = pngs.map(_.length.toLong).sum / 1e6
    val inflatedMb = 2000L * (22 + 12 * 400) / 1e6
    println(f"[pngmeta] 2000 zTXt PNGs ($totalMb%.1f MB compressed, " +
      f"$inflatedMb%.1f MB inflated): $nTags tags in $tPng%.2f s " +
      f"(${inflatedMb / tPng}%.0f MB/s inflated, single-threaded)")

    // ---- 3. 30-language trained ID at 16x ----
    val profiles = graft.ops.LangId.trainProfiles(
      graft.ops.LangId.readTraining(spark,
        "/root/repo/fixtures/langid/train.jsonl"), "lang", "text")
      .localCheckpoint()
    require(profiles.count() <= 30L * graft.ops.LangId.DefaultK,
      "profile table must stay <= |langs|*K rows")
    def lang(n: Long): Long = {
      val d = spark.range(n).select($"id",
        when($"id" % 3 === 0, concat(lit("der schnelle zug fährt heute " +
          "nicht weil die strecke gesperrt wurde doc "), $"id"))
          .when($"id" % 3 === 1, concat(lit("это было тёплое лето и мы " +
            "часто ездили на электричке doc "), $"id"))
          .otherwise(concat(lit("火车清晨到达车站乘客们在站台上等候 doc "), $"id"))
          .as("text"))
      graft.ops.LangId.classify(d, "id", "text", profiles)
        .filter($"lang_pred".isin("de", "ru", "zh")).count()
    }
    lang(2000) // warm
    val (l1c, l1) = time(lang(10000))
    val (l16c, l16) = time(lang(16 * 10000))
    println(f"[langid30] 10k docs vs 30-lang profiles: $l1%.2f s ($l1c hit); " +
      f"16x: $l16%.2f s ($l16c); per-row ratio ${l16 / l1 / 16}%.2fx")
    val pmap = graft.ops.LangId.collectProfiles(profiles)
    val mp = graft.ops.LangId.classifyMapSide(
      spark.range(10000).select($"id", lit("the weather was cold doc").as("t")),
      "id", "t", pmap)
    require(!mp.queryExecution.executedPlan.toString.contains("Exchange"),
      "serving path must stay shuffle-free")
    println("[langid30] serving path (classifyMapSide): shuffle-free at 30 langs")

    spark.stop()
  }
}
