package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 scaling evidence:
  *
  * 1. Robots gate under host SKEW with the compiled build side — one
  *    mega-host carries 50% of all URLs (the realistic worst key), the
  *    robots table carries large bodies. [[graft.ops.Robots.gateUrls]]
  *    now pre-reduces bodies to per-(host, selected-group) rule
  *    structs BEFORE the join, so the build side is rules-sized and
  *    the skewed exchange never carries bodies. Probe: 1× vs 16× URLs,
  *    wall should scale ≈ linearly (flat per-row), and the compiled
  *    side must stay KB-scale per host.
  * 2. Main-content extraction throughput — [[graft.ops.MainContent]]
  *    is a per-document linear-scan kernel; 16× documents on a fixed
  *    core budget should be ≈16× work (no shuffle, no driver trips).
  * 3. Trained language ID at 16× docs — the explode→count→top-K shape
  *    ([[graft.ops.LangId.classify]]): profile side constant
  *    (broadcast), corpus side linear.
  */
object R13Probe {
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

    // ---- 1. robots gate under 50%-skew with large bodies ----
    val nHosts = 2000
    // each host's robots.txt: a 100-rule * group plus a graftbot group,
    // padded with comment bulk to ~50 KB (the body the join must NOT carry)
    val pad = ("# " + ("x" * 78) + "\n") * 600
    val robots = spark.range(nHosts).select(
      concat(lit("h"), $"id", lit(".example.com")).as("host"),
      concat(
        lit("User-agent: graftbot\nDisallow: /private\nAllow: /private/ok\n" +
          "Crawl-delay: 1\n"),
        lit((1 to 100).map(i => s"User-agent: other\nDisallow: /o$i\n")
          .mkString),
        lit(pad)).as("body"))
      .localCheckpoint()
    val bodyBytes = robots.select(sum(length($"body"))).as[Long].head()
    val compiled = graft.ops.Robots
      .compileForAgent(robots, "host", "body", "graftbot")
      .localCheckpoint()
    val compiledBytes = compiled.select(
      sum(aggregate($"__patterns", lit(0),
        (a, p) => a + length(p) + 1) + lit(16))).as[Long].head()
    println(f"[robots] body side: ${bodyBytes / 1e6}%.1f MB; " +
      f"compiled side: ${compiledBytes / 1e6}%.3f MB " +
      f"(${bodyBytes.toDouble / compiledBytes}%.0fx smaller)")

    def urls(n: Long) = spark.range(n).select(
      concat(lit("https://"),
        // 50% of URLs on host h0 — the skew key
        when($"id" % 2 === 0, lit("h0.example.com"))
          .otherwise(concat(lit("h"), $"id" % nHosts, lit(".example.com"))),
        lit("/private/"), when($"id" % 3 === 0, lit("ok/")).otherwise(lit("")),
        $"id").as("url"))
    def gateCount(n: Long): Long =
      graft.ops.Robots.gateUrls(urls(n), "url", robots, "host", "body",
        "graftbot").filter($"allowed").count()
    gateCount(50000) // warm
    val (a1, t1) = time(gateCount(200000))
    val (a16, t16) = time(gateCount(16 * 200000))
    println(f"[robots] skew-gate 200k urls: $t1%.2f s ($a1 allowed); " +
      f"16x: $t16%.2f s ($a16 allowed); per-row ratio ${t16 / t1 / 16}%.2fx")

    // ---- 2. main-content extraction throughput ----
    val chrome = "<html><head><title>t</title><script>var x=1;</script></head>" +
      "<body><nav>" + (1 to 40).map(i => s"<a href=\"/$i\">nav item $i</a>")
        .mkString(" ") + "</nav>" +
      "<main>" + (1 to 20).map(i =>
        s"<p>paragraph $i with " + ("honest content words " * 10) + "</p>")
        .mkString + "</main>" +
      "<footer>" + (1 to 10).map(i => s"<a href=\"/f$i\">footer $i</a>")
        .mkString(" ") + "</footer></body></html>"
    def docs(n: Long) = spark.range(n)
      .select($"id", concat(lit(chrome), lit(" tail "), $"id").as("html"))
    val ex = udf((h: String) => graft.ops.MainContent.extract(h))
    def mainCount(n: Long): Long =
      docs(n).select(length(ex($"html")).as("l")).filter($"l" > 0).count()
    mainCount(5000) // warm
    val (_, m1) = time(mainCount(20000))
    val (_, m16) = time(mainCount(16 * 20000))
    val mbps = 20000.0 * chrome.length / 1e6 / m1
    println(f"[maincontent] 20k pages: $m1%.2f s (${mbps}%.0f MB/s across " +
      f"32 cores); 16x: $m16%.2f s; per-row ratio ${m16 / m1 / 16}%.2fx")

    // ---- 2b. CDX indexer throughput (member boundaries + parse) ----
    def warcGz(nRecords: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(nRecords * 600)
      val body = ("<html><body>" + ("lorem ipsum dolor sit amet " * 20) +
        "</body></html>").getBytes("UTF-8")
      var i = 0
      while (i < nRecords) {
        val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
        val block = http ++ body
        val rec = (s"WARC/1.1\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://h$i.example.com/p$i\r\n" +
          s"WARC-Date: 2026-08-15T00:00:00Z\r\n" +
          s"Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8") ++
          block ++ "\r\n\r\n".getBytes("UTF-8")
        val g = new java.util.zip.GZIPOutputStream(out)
        g.write(rec); g.finish()
        i += 1
      }
      out.toByteArray
    }
    (0 until 3).foreach(_ =>
      graft.sources.WarcCodec.gzipMemberRanges(warcGz(200)))
    val arch = warcGz(4000)
    val (nm, tIdx) = time(graft.sources.WarcCodec.gzipMemberRanges(arch).length)
    println(f"[cdxindex] ${arch.length / 1e6}%.1f MB archive, $nm members: " +
      f"boundaries in $tIdx%.2f s (${arch.length / 1e6 / tIdx}%.0f MB/s " +
      "single-threaded; the binaryFile scan adds file parallelism)")

    // ---- 3. trained language ID at 16x ----
    val profiles = graft.ops.LangId.trainProfiles(
      graft.ops.LangId.readTraining(spark,
        "/root/repo/fixtures/langid/train.jsonl"), "lang", "text")
      .localCheckpoint()
    def lang(n: Long): Long = {
      val d = spark.range(n).select($"id",
        concat(lit("der schnelle zug fährt heute nicht weil die strecke " +
          "gesperrt wurde doc "), $"id").as("text"))
      graft.ops.LangId.classify(d, "id", "text", profiles)
        .filter($"lang_pred" === "de").count()
    }
    lang(2000) // warm
    val (l1c, l1) = time(lang(10000))
    val (l16c, l16) = time(lang(16 * 10000))
    println(f"[langid] 10k docs: $l1%.2f s ($l1c de); 16x: $l16%.2f s " +
      f"($l16c de); per-row ratio ${l16 / l1 / 16}%.2fx")

    spark.stop()
  }
}

