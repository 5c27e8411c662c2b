package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed batch-at-a-time inside the executors.
  *
  * The decode step is REAL for every format a stock JVM parses —
  * RIFF/WAVE PCM and 24-bpp BMP through the byte-exact pure-JVM codecs,
  * PNG/JPEG through the JDK's own `javax.imageio` readers
  * ([[CodecDecoder]] / [[graft.sources.ImageCodec]]) — and pluggable
  * behind [[MediaDecoder]] for anything else (MP3/MP4 need a codec the
  * container doesn't ship). Everything Spark-side — the schema, the
  * binaryFile source, partition sizing, the batch-shaped executor loop,
  * and the feature pipeline into the vector operators — is shared:
  * swapping decoders changes no plan shape.
  */
object Multimodal {

  /** Canonical media row schema: `(media_id, kind, bytes, meta)`. */
  val mediaSchemaDDL: String =
    "media_id STRING, kind STRING, bytes BINARY, meta MAP<STRING,STRING>"

  /** Pluggable decode/feature-extract surface. Real implementations wrap
    * a codec; the deterministic fake derives features from the raw bytes
    * so the downstream pipeline is exactly testable.
    */
  trait MediaDecoder extends Serializable {
    /** Fixed-length feature vector from one media payload. */
    def features(kind: String, bytes: Array[Byte]): Array[Float]
    /** Per-item metadata the decode would surface (dims, duration...). */
    def probe(kind: String, bytes: Array[Byte]): Map[String, String]
    def dim: Int
  }

  /** Deterministic stand-in decoder: byte-histogram features, L2-normed —
    * a stable fake with the same signature a real decoder would have.
    */
  final case class FakeDecoder(dim: Int = 32) extends MediaDecoder {
    def features(kind: String, bytes: Array[Byte]): Array[Float] = {
      val v = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { v(java.lang.Math.floorMod(bytes(i).toInt, dim)) += 1f; i += 1 }
      var norm = 0.0
      var j = 0
      while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
      if (norm > 0) { val inv = (1.0 / math.sqrt(norm)).toFloat; j = 0; while (j < dim) { v(j) *= inv; j += 1 } }
      v
    }
    def probe(kind: String, bytes: Array[Byte]): Map[String, String] =
      Map("size_bytes" -> bytes.length.toString, "kind" -> kind)
  }

  /** REAL decoder over the in-JVM codecs ([[graft.sources.WavCodec]] /
    * [[graft.sources.ImageCodec]]): `audio` payloads decode as RIFF/WAVE
    * PCM (features = `dim`-window RMS envelope), `image` as BMP (the
    * byte-exact pure-JVM parser) or PNG/JPEG (the JDK's own
    * `javax.imageio` readers — no native libraries), features = grid
    * luma scaled to [0,1], truncated/padded to `dim`. This closes the
    * decode stub for every format a stock Java 17 runtime parses;
    * other formats keep the pluggable seam. Probe metadata carries the
    * real decode facts (rate/frames/dims/sniffed format).
    */
  final case class CodecDecoder(dim: Int = 8) extends MediaDecoder {
    private def fit(vals: Array[Double]): Array[Float] = {
      val v = new Array[Float](dim)
      var i = 0
      while (i < math.min(dim, vals.length)) { v(i) = vals(i).toFloat; i += 1 }
      v
    }
    def features(kind: String, bytes: Array[Byte]): Array[Float] = kind match {
      case "audio" => fit(graft.sources.WavCodec.windowRms(bytes, dim))
      case "image" =>
        val grid = math.ceil(math.sqrt(dim.toDouble)).toInt
        fit(graft.sources.ImageCodec.gridLuma(bytes, grid).map(_ / 255.0))
      case other => throw new IllegalArgumentException(
        s"CodecDecoder handles audio|image, got $other — plug a codec for it")
    }
    def probe(kind: String, bytes: Array[Byte]): Map[String, String] = kind match {
      case "audio" if graft.sources.Mp3Codec.looksLikeMp3(bytes) =>
        // MPEG audio: STRUCTURAL probe from the frame-header walk —
        // duration/rate/layout metadata without a sample decoder
        // (features still need one; the seam stays for that)
        val i = graft.sources.Mp3Codec.probe(bytes)
        Map("format" -> "mp3", "version" -> i.version,
          "layer" -> i.layer.toString,
          "bitrate_kbps" -> i.bitrateKbps.toString,
          "sample_rate" -> i.sampleRate.toString,
          "channels" -> i.channels.toString,
          "n_frames" -> i.frames.toString,
          "duration_ms" -> i.durationMs.toString,
          "vbr" -> i.vbr.toString)
      case "audio" =>
        val i = graft.sources.WavCodec.probe(bytes)
        Map("format" -> "wav", "channels" -> i.channels.toString,
          "sample_rate" -> i.sampleRate.toString,
          "bits" -> i.bitsPerSample.toString,
          "n_frames" -> i.nFrames.toString,
          "duration_ms" -> i.durationMs.toString)
      case "image" =>
        val i = graft.sources.ImageCodec.probe(bytes)
        Map("width" -> i.width.toString, "height" -> i.height.toString,
          "format" -> i.format)
      case "video" =>
        // ISO BMFF: box-walk probe (brand/duration/track inventory)
        val i = graft.sources.Mp4Codec.probe(bytes)
        Map("format" -> "mp4", "brand" -> i.brand,
          "duration_ms" -> i.durationMs.toString,
          "n_tracks" -> i.tracks.length.toString,
          "tracks" -> i.tracks.map(t =>
            s"${t.handler}:${t.codec}:${t.durationMs}").mkString(","))
      case other => throw new IllegalArgumentException(
        s"CodecDecoder handles audio|image|video, got $other")
    }
  }

  /** Read a directory of media files as the canonical schema via Spark's
    * binaryFile source (one row per file; files >
    * `spark.sql.files.maxPartitionBytes` stay one row — binary payloads
    * are opaque).
    */
  def readMediaDir(spark: SparkSession, dir: String, kind: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("media_id"),
        lit(kind).as("kind"),
        col("content").as("bytes"),
        map(lit("length"), col("length").cast("string"),
          lit("mtime"), col("modificationTime").cast("string")).as("meta"))

  /** Decode + feature-extract, batch-shaped: `mapPartitions` so a real
    * decoder can amortize model/codec init per partition (the Scala
    * analog of a pandas batch UDF). Output keeps the input columns minus
    * bytes, plus `features ARRAY<FLOAT>` and the probe metadata.
    */
  def extractFeatures(df: DataFrame, decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "media_id STRING, kind STRING, features ARRAY<FLOAT>, probe MAP<STRING,STRING>")
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select("media_id", "kind", "bytes").mapPartitions { it =>
      // per-partition decoder init happens here in a real implementation
      it.map { r =>
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        org.apache.spark.sql.Row(r.getString(0), kind,
          decoder.features(kind, bytes).toSeq, decoder.probe(kind, bytes))
      }
    }(enc)
  }

  /** Frame/segment sampling plumbing: split a payload into fixed-size
    * byte segments (the real version samples frames/windows) — one row
    * per segment with its index, ready for per-segment feature extract.
    */
  def sampleSegments(df: DataFrame, segmentBytes: Int): DataFrame = {
    require(segmentBytes > 0)
    val seg = udf((bytes: Array[Byte]) =>
      bytes.grouped(segmentBytes).zipWithIndex.map { case (b, i) => (i, b) }.toSeq)
    df.withColumn("__seg", explode(seg(col("bytes"))))
      .select(col("media_id"), col("kind"),
        col("__seg._1").cast("long").as("segment_idx"), col("__seg._2").as("segment_bytes"))
  }

  /** Bridge into the text/vector pipeline: media features are first-class
    * vectors for [[Similarity]] / [[Dedup.embeddingNearDupPairs]].
    */
  def featureColumn(df: DataFrame): Column = col("features")

  /** Perceptual image near-dup pairs: 64-bit difference hashes
    * ([[graft.sources.ImageCodec.dHash64]] — gradient-direction bits that
    * survive re-encoding/resizing/brightness shifts, computed identically
    * for BMP, PNG, and JPEG payloads so near-dups match ACROSS formats —
    * a lossless re-encode is Hamming 0) matched through the
    * SimHash banded pigeonhole ([[Dedup.hamming64Pairs]]): candidates
    * come from an equi-join on (band, bits), NEVER all-pairs, and the
    * Hamming verify on the few candidates is exact. Returns
    * `(id_a, id_b, hamming)` with `id_a < id_b`.
    *
    * The decode is a per-row JVM kernel (a UDF by necessity — codecs
    * aren't expressions); it runs ONCE per image inside the projection
    * that feeds the banding, so the bytes never shuffle — only
    * (id, 64-bit hash) rows do.
    */
  def imageDHashPairs(df: DataFrame, idCol: String, bytesCol: String,
                      maxHamming: Int = 10, bands: Int = 16): DataFrame = {
    val dhash = udf((b: Array[Byte]) => graft.sources.ImageCodec.dHash64(b))
    Dedup.hamming64Pairs(
      df.select(col(idCol).as("id"), dhash(col(bytesCol)).as("h")),
      maxHamming, bands)
  }

  /** Audio perceptual near-dup pairs over the band-energy fingerprint
    * ([[graft.sources.WavCodec.fingerprint64]] — Haitsma–Kalker-shape,
    * exactly volume-invariant): same banded-LSH equi-join machinery as
    * [[imageDHashPairs]] (pigeonhole-complete at `bands > maxHamming`,
    * never all-pairs), so re-encoded / re-leveled audio dedups like
    * re-encoded images do — the multimodal corpus's third dedup family
    * next to text MinHash and image dHash.
    */
  def audioFingerprintPairs(df: DataFrame, idCol: String, bytesCol: String,
                            maxHamming: Int = 8, bands: Int = 16): DataFrame = {
    val fp = udf((b: Array[Byte]) => graft.sources.WavCodec.fingerprint64(b))
    Dedup.hamming64Pairs(
      df.select(col(idCol).as("id"), fp(col(bytesCol)).as("h")),
      maxHamming, bands)
  }

  /** Per-file audio activity segmentation over the RMS envelope
    * ([[graft.sources.WavCodec.activity]]) — the silence-trimming /
    * dead-air-drop gate of an audio-corpus pipeline. One narrow
    * projection, decode once per row, no shuffle.
    */
  def audioActivity(df: DataFrame, idCol: String, bytesCol: String,
                    windows: Int, threshold: Double): DataFrame = {
    require(windows >= 1)
    val act = udf((b: Array[Byte]) => {
      val (n, a, run, first) = graft.sources.WavCodec.activity(b, windows, threshold)
      (n, a, run, first)
    })
    df.select(col(idCol), act(col(bytesCol)).as("__a"))
      .select(col(idCol),
        col("__a._1").cast("long").as("n_windows"),
        col("__a._2").cast("long").as("n_active"),
        col("__a._3").cast("long").as("longest_run"),
        col("__a._4").cast("long").as("first_active"))
      // n_active/n_windows is an exact integer ratio: pure-Long micros
      // (round-half-up), never round(double, n) on an exact ratio
      .withColumn("active_ratio_micros",
        expr("CAST((2*1000000*n_active + n_windows) DIV (2*n_windows) AS BIGINT)"))
  }
}
