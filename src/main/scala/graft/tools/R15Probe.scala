package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 scaling evidence:
  *
  * 1. PPJoin exact n-gram Jaccard at 16× (extends the round-5 4× probe):
  *    the rarest-first prefix index bounds the candidate join, so 16×
  *    salted-disjoint corpora (no cross-replica pairs possible) should
  *    scale near-linearly in wall — pinning the exact leg's curve, with
  *    min-of-K + process-CPU because this sandbox stalls runs at random.
  * 2. HNSW build + batch search ([[graft.ops.Hnsw]]): build is one
  *    mapPartitions pass (per-partition sequential insert, partitions in
  *    parallel), search is per-partition beam + global top-k window.
  *    16× vectors on a fixed partition count grows per-graph size 16× —
  *    build should scale near-linearly (the efC beam bounds per-insert
  *    work; the log factor is in graph hops, not distance counts), and
  *    small-ef batch search should grow sublinearly in corpus size
  *    (beam size is ef-bound, not corpus-bound).
  */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    def minOfK2(label: String)(f: => Long): (Long, Double) = {
      val samples = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        (wall, rows)
      }
      val best = samples.minBy(_._1)
      println(f"[r15] $label: min ${best._1}%7.2f s max ${samples.map(_._1).max}%7.2f s rows ${best._2}")
      (best._2, best._1)
    }

    def minOfK[A](label: String)(f: => Long): Double = {
      val samples = (1 to runs).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        val rows = f
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        spark.catalog.clearCache(); System.gc()
        (wall, cpu, rows)
      }
      val best = samples.minBy(_._1)
      println(f"[r15] $label: min ${best._1}%7.2f s (cpu/wall ${best._2 / best._1}%4.1f) " +
        f"max ${samples.map(_._1).max}%7.2f s rows ${best._3}")
      best._1
    }

    // ---- 1. PPJoin exact jaccard 1x vs 16x ----
    val docs1 = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text").localCheckpoint()
    def salted(n: Int) = (0 until n).map { i =>
      docs1.select(($"doc_id" + lit(i * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(^|\\s)", "$1s" + i + "_").as("text"))
    }.reduce(_ union _).localCheckpoint()
    val docs16 = salted(16)
    val t1 = minOfK("ppjoin 1x (5k docs)") {
      graft.ops.Dedup.ngramJaccardPairs(docs1, "doc_id", "text", 0.2).count()
    }
    val t16 = minOfK("ppjoin 16x (80k docs)") {
      graft.ops.Dedup.ngramJaccardPairs(docs16, "doc_id", "text", 0.2).count()
    }
    println(f"[r15] ppjoin wall ratio at 16x: ${t16 / t1}%5.2f (ideal <= 16)")

    // ---- 2. HNSW build + batch search 1x vs 16x ----
    def vecs(n: Long) = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64($"id" * 64 + j), lit(1000)).cast("float") / 500.0f) - 1.0f)
        .cast("array<float>").as("embedding"))
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("r15hnsw").toString
    val v1 = vecs(20000); val v16 = vecs(320000)
    val q = vecs(100).withColumnRenamed("vec_id", "qid")
      .withColumnRenamed("embedding", "qv").localCheckpoint()
    val b1 = minOfK("hnsw build 1x (20k, 8 parts)") {
      graft.ops.Hnsw.build(v1, "vec_id", "embedding", s"$root/a",
        graft.ops.Hnsw.Params(m = 8, efConstruction = 64), numPartitions = 8)
      spark.read.parquet(graft.ops.Hnsw.graphPath(s"$root/a")).count()
    }
    val b16 = minOfK("hnsw build 16x (320k, 8 parts)") {
      graft.ops.Hnsw.build(v16, "vec_id", "embedding", s"$root/b",
        graft.ops.Hnsw.Params(m = 8, efConstruction = 64), numPartitions = 8)
      spark.read.parquet(graft.ops.Hnsw.graphPath(s"$root/b")).count()
    }
    println(f"[r15] hnsw build wall ratio at 16x: ${b16 / b1}%5.2f (ideal <= 16)")
    val s1 = minOfK("hnsw search 1x (100 q, ef=64)") {
      graft.ops.Hnsw.searchBatch(spark, s"$root/a", q, "qid", "qv",
        k = 10, ef = 64).count()
    }
    val s16 = minOfK("hnsw search 16x (100 q, ef=64)") {
      graft.ops.Hnsw.searchBatch(spark, s"$root/b", q, "qid", "qv",
        k = 10, ef = 64).count()
    }
    println(f"[r15] hnsw search wall ratio at 16x corpus: ${s16 / s1}%5.2f " +
      "(beam is ef-bound: expect << 16)")

    // ---- 3. semantic decontamination (one expression, no shuffle) ----
    // fixed 1k-vector eval matrix; corpus 1x vs 16x — per-row work is
    // |eval| multiply-adds inside one codegen'd kernel, so wall must be
    // ~linear in corpus with a fixed floor
    val evalVecs = vecs(1000).collect()
      .map(_.getSeq[Float](1).toArray)
    def decon(n: Long): Long =
      graft.ops.Dedup.semanticContamination(vecs(n), "embedding",
          evalVecs, threshold = 0.9)
        .filter(col("leaked")).count()
    decon(10000) // warm
    val (d1c, d1) = minOfK2("semdecon 1x (50k x 1k eval)") { decon(50000) }
    val (d16c, d16) = minOfK2("semdecon 16x (800k x 1k eval)") { decon(800000) }
    println(f"[r15] semantic decon wall ratio at 16x: ${d16 / d1}%5.2f " +
      f"(ideal <= 16; leaked $d1c -> $d16c)")
    spark.stop()
  }
}
