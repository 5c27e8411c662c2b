package graft

/** Deterministic CDXJ crawl-index fixture — six captures over the
  * committed WARC fixtures' shape (two captures of one URL at
  * different timestamps, a 404, a redirect, an image, a second file),
  * byte-asserted against this generator. Run
  * `Test/runMain graft.GenCdxFixtures <dir>`.
  */
object CdxFixtures {

  private def line(surt: String, ts: String, url: String, mime: String,
                   status: Int, digest: String, length: Int, offset: Int,
                   filename: String): String =
    s"""$surt $ts {"url": "$url", "mime": "$mime", "status": "$status", """ +
      s""""digest": "$digest", "length": "$length", "offset": "$offset", """ +
      s""""filename": "$filename"}"""

  val SampleCdxj: String = Seq(
    line("com,example)/index.html", "20260801000001",
      "http://example.com/index.html", "text/html", 200,
      "sha1:AAAABBBBCCCCDDDD", 1434, 0, "sample.warc.gz"),
    line("com,example)/index.html", "20260808120000",
      "http://example.com/index.html", "text/html", 200,
      "sha1:AAAABBBBCCCCDDDE", 1461, 9220, "sample.warc.gz"),
    line("com,example)/missing", "20260801000002",
      "http://example.com/missing", "text/html", 404,
      "sha1:EEEEFFFF00001111", 312, 1434, "sample.warc.gz"),
    line("com,example)/moved", "20260801000003",
      "http://example.com/moved", "text/html", 301,
      "sha1:2222333344445555", 280, 1746, "sample.warc.gz"),
    line("com,example)/logo.png", "20260801000004",
      "http://example.com/logo.png", "image/png", 200,
      "sha1:6666777788889999", 2048, 2026, "sample.warc.gz"),
    line("org,example)/a", "20260802100000",
      "https://example.org/a", "text/plain", 200,
      "sha1:AAAA000011112222", 96, 0, "sample2.warc.gz")
  ).mkString("", "\n", "\n")

  /** Index over the COMMITTED `fixtures/warc/sample2.warc.gz` with REAL
    * member offsets/lengths (computed from the same generator bytes the
    * archive is byte-asserted against): the spec's
    * one-record-per-gzip-member layout is exactly what makes a ranged
    * fetch start at any member boundary.
    */
  def FetchCdxj: String = {
    val gz = WarcFixtures.sample2WarcGz
    val ranges = graft.sources.WarcCodec.gzipMemberRanges(gz)
    require(ranges.length == 2, "sample2.warc.gz must contain two gzip members")
    val Seq((o0, l0), (o1, l1)) = ranges
    Seq(
      line("org,example)/a", "20260802100000", "https://example.org/a",
        "text/plain", 200, "sha1:RANGEDA", l0.toInt, o0.toInt,
        "sample2.warc.gz"),
      line("org,example)/b", "20260802100001", "https://example.org/b",
        "text/html", 200, "sha1:RANGEDB", l1.toInt, o1.toInt,
        "sample2.warc.gz")
    ).mkString("", "\n", "\n")
  }

  def all: Seq[(String, String)] = Seq(
    "sample.cdxj" -> SampleCdxj,
    "fetch.cdxj" -> FetchCdxj)
}

object GenCdxFixtures {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("fixtures/cdx")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    CdxFixtures.all.foreach { case (name, text) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $dir/$name (${text.length} chars)")
    }
  }
}
