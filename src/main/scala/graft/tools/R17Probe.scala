package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 scaling evidence: `Sampling.lengthBucketBatches` at 16×.
  *
  * The plan's one wide op is `row_number() OVER (PARTITION BY
  * bucket_len ORDER BY md5(key))` — one reducer per bucket BY DESIGN
  * (the per-bucket fill sequence is inherently bucket-local), with a
  * documented per-shard planning contract for 100 TB. Two legs
  * isolate the two shapes:
  *
  * 1. MIXED lengths (tokens = 1 + id % 512, quantum 64 → 8 buckets):
  *    the production shape — 8 reducers share the window; wall and
  *    shuffle bytes should grow ~linearly from 1× to 16×.
  * 2. SINGLE-BUCKET worst case (every row the same length → ONE
  *    bucket, ONE reducer sorts everything): the adversarial shape
  *    the per-shard contract exists for — measure where the
  *    single-reducer sort actually cracks on serving-class row
  *    volumes, so SCALE.md can state the measured boundary instead
  *    of an assumption.
  *
  * Rows are planning-sized (key + token count, ~16 B), so 16× here is
  * a row-count scale probe, not an IO probe. Min-of-K wall because
  * this sandbox stalls runs at random; shuffle read bytes from a
  * stage listener.
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Tables.bootstrap(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead +
          sc.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead): Unit
    })

    def probe(label: String)(f: => Long): Unit = {
      val samples = (1 to runs).map { _ =>
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val rows = f
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        Thread.sleep(200)
        (wall, shuffleBytes.get(), rows)
      }
      val best = samples.minBy(_._1)
      println(f"[r17] $label%-40s min ${best._1}%7.2f s  max ${samples.map(_._1).max}%7.2f s  " +
        f"shuffle ${best._2 / 1e6}%8.1f MB  rows ${best._3}")
    }

    val base = 1L << 20
    // the result is consumed with a full-plan action: count() after an
    // agg over batch_id forces the window AND the downstream batch
    // bookkeeping a planner would read, not just the row count
    def plan(n: Long, tokensExpr: String): Long =
      graft.ops.Sampling.lengthBucketBatches(
          spark.range(n).select(col("id").as("key"),
            expr(tokensExpr).as("tok")),
          "key", "tok", quantum = 64, budget = 512)
        .groupBy(col("bucket_len"), col("batch_id"))
        .agg(count(lit(1)).as("n"), max(col("waste")).as("w"))
        .count()

    for (mult <- Seq(1L, 4L, 16L)) {
      probe(s"mixed 8-bucket ${mult}x (${base * mult} rows)") {
        plan(base * mult, "1 + id % 512")
      }
    }
    for (mult <- Seq(1L, 4L, 16L)) {
      probe(s"single-bucket worst ${mult}x (${base * mult} rows)") {
        plan(base * mult, "256")
      }
    }

    // ---- round-17 ops at 16×: fingerprint / weighted sample / diff ----
    def synth(n: Long) = spark.range(n).select(col("id"),
      expr("CAST(id % 37 AS STRING)").as("s"),
      expr("1 + id % 512").as("w"))
    for (mult <- Seq(1L, 16L)) {
      val n = base * mult
      probe(s"datasetFingerprint ${mult}x (${n} rows)") {
        // read the fingerprint VALUE: a bare count() over a global agg
        // lets Catalyst drop the aggregate expressions entirely
        val r = graft.ops.Profile
          .datasetFingerprint(synth(n), Seq("id", "s", "w")).head()
        if (r.getLong(1) != 0L || r.getLong(2) != 0L) 1L else 0L
      }
      probe(s"weightedSample k=1000 ${mult}x (${n} rows)") {
        graft.ops.Sampling.weightedSample(synth(n), "id", "w", 1000, "p17")
          .count()
      }
      probe(s"datasetDiff near-equal ${mult}x (${n} rows)") {
        // right side differs in 100 rows — the near-equal audit shape
        graft.ops.Profile.datasetDiff(synth(n),
          synth(n).filter(col("id") >= 100), Seq("id", "s", "w")).count()
      }
    }

    // ---- fingerprint ledger maintenance: O(batch), not O(store) ----
    // the incremental claim measured: appending a CONSTANT 64k batch
    // to a 1-segment store vs a 16-segment/16x store must cost ~the
    // same wall (the seam fingerprints only the new segment; the
    // ledger read is segment-count rows, not corpus rows) — while the
    // from-scratch rebuild the ledger replaces scales with the corpus
    val cols = Seq("id", "s", "w")
    def mkStore(label: String, segments: Int): String = {
      val t = java.nio.file.Files.createTempDirectory(s"r17fp$label")
        .toString + "/store"
      (0 until segments).foreach { b =>
        graft.ops.VersionedStore.append(spark, t,
          synth(base).withColumn("id", col("id") + lit(b * base)))
      }
      graft.ops.Profile.registerFingerprintSidecar(spark, t, cols,
        s"$t/../fp")
      t
    }
    val small = mkStore("S", 1)
    val big = mkStore("B", 16)
    val batchN = 64L << 10
    var off = 1L << 40
    for ((label, t) <- Seq("1-seg store" -> small, "16-seg store" -> big)) {
      probe(s"ledger append 64k batch onto $label") {
        val b = synth(batchN).withColumn("id", col("id") + lit(off))
        off += batchN
        graft.ops.Ingest.appendRespectingLayout(spark, t, b).toLong
      }
    }
    probe("ledger full rebuild on 16-seg store (contrast)") {
      graft.ops.Profile.buildFingerprintSidecarForStore(spark, big, cols,
        s"$big/../fp")
      1L
    }
  }
}
