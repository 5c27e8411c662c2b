package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 scaling evidence for the crawl front door:
  *
  * 1. WARC parse throughput — [[graft.sources.WarcCodec]] over a
  *    synthetic many-record archive (the Common Crawl shape: ~1 GB
  *    files, thousands of records each; here MB-scale replicas whose
  *    RECORD COUNT scales). Parsing is per file inside the binaryFile
  *    scan, so the cluster dimension is file-parallelism; this probe
  *    pins the per-byte cost and that it's flat in record count.
  * 2. URL canonicalization throughput — [[graft.ops.UrlOps]] is pure
  *    codegen'd expressions; 16× rows should be ≈16× work on a fixed
  *    local core budget (flat per-row cost, no driver round-trips).
  */
object R12Probe {
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

    // ---- 1. WARC parse throughput (single-threaded kernel cost) ----
    def warcBytes(nRecords: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(nRecords * 1200)
      val bodyBase = ("<html><head><title>t</title></head><body>" +
        ("lorem ipsum dolor sit amet " * 30) + "</body></html>").getBytes("UTF-8")
      var i = 0
      while (i < nRecords) {
        val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
          s"Content-Length: ${bodyBase.length}\r\n\r\n").getBytes("UTF-8")
        val block = http ++ bodyBase
        val hdr = (s"WARC/1.1\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://example.com/p$i\r\n" +
          s"WARC-Date: 2026-08-15T00:00:00Z\r\n" +
          s"WARC-Record-ID: <urn:uuid:$i>\r\n" +
          s"Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8")
        out.write(hdr); out.write(block); out.write("\r\n\r\n".getBytes("UTF-8"))
        i += 1
      }
      out.toByteArray
    }
    // JIT warm
    (0 until 3).foreach(_ => graft.sources.WarcCodec.parseAll(warcBytes(500)))
    val small = warcBytes(2000)
    val big = warcBytes(16 * 2000)
    val (n1, tS) = time(graft.sources.WarcCodec.parseAll(small).length)
    val (n2, tB) = time(graft.sources.WarcCodec.parseAll(big).length)
    val mbS = small.length / 1e6 / tS
    val mbB = big.length / 1e6 / tB
    println(f"warc parse: $n1%d recs ${small.length / 1e6}%.1f MB in $tS%.3f s " +
      f"($mbS%.0f MB/s); 16x records: $n2%d recs ${big.length / 1e6}%.1f MB " +
      f"in $tB%.3f s ($mbB%.0f MB/s) — per-byte cost ratio ${mbS / mbB}%.2f (1.0 = flat)")

    // ---- 2. URL canonicalization: 16x rows on fixed cores ----------
    val docs1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id").localCheckpoint()
    val docs16 = (0 until 16).map(i =>
        docs1.select(($"doc_id" + lit(i * 10000000L)).as("doc_id")))
      .reduce(_ union _).localCheckpoint()
    def canonCount(df: org.apache.spark.sql.DataFrame): Long = {
      val id = $"doc_id".cast("string")
      val url = concat(lit("HTTP://EXample.com:80/Docs/"), id,
        lit("?utm_source=news&b=2&a=1#frag"))
      df.select(graft.ops.UrlOps.canonicalize(url).as("c"),
          graft.ops.UrlOps.registeredDomain(graft.ops.UrlOps.host(url)).as("d"))
        .filter($"c".isNotNull && $"d" === "example.com").count()
    }
    canonCount(docs1) // plan + codegen warm
    val (c1, u1) = time(canonCount(docs1))
    val (c16, u16) = time(canonCount(docs16))
    println(f"url canonicalize: $c1%d rows in $u1%.3f s; 16x = $c16%d rows in " +
      f"$u16%.3f s — wall ratio ${u16 / u1}%.2f (≤16 = at-or-better than linear)")

    // ---- 3. robots gate: 16x URLs against a 200-host robots table ---
    val hosts = (0 until 200).map(h => (s"site$h.example.com",
      s"User-agent: graftbot\nDisallow: /private/\nAllow: /private/ok/\n" +
        s"Disallow: /*.png$$\nCrawl-delay: ${h % 9}\n"))
    val robotsDf = hosts.toDF("host", "body").localCheckpoint()
    def gateCount(df: org.apache.spark.sql.DataFrame): Long = {
      val id = $"doc_id".cast("string")
      val url = concat(lit("https://site"), pmod($"doc_id", lit(200)),
        lit(".example.com/private/"), id)
      graft.ops.Robots.gateUrls(df.select($"doc_id", url.as("url")),
          "url", robotsDf, "host", "body", "graftbot")
        .filter(!$"allowed").count()
    }
    gateCount(docs1) // warm
    val (g1, r1) = time(gateCount(docs1))
    val (g16, r16) = time(gateCount(docs16))
    println(f"robots gate: $g1%d blocked of ${5000} in $r1%.3f s; 16x = $g16%d " +
      f"blocked in $r16%.3f s — wall ratio ${r16 / r1}%.2f (≤16 = at-or-better " +
      "than linear; per-host parse amortized by the executor cache)")

    spark.stop()
  }
}
