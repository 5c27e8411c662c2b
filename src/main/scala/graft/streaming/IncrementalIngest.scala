package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.embed.{EmbedText, Embedder}
import graft.ops.Split

/** Incremental ingest as a Structured Streaming job (SURVEY.md §2.8).
  *
  * The reference has no data-stream processing — it makes re-running the
  * batch pipeline idempotent via the S15 anti-join. The streaming rebuild
  * keeps exactly that contract: new document files landing in a directory
  * are split/embedded incrementally, and each micro-batch merges into the
  * store through the same content-keyed anti-join (foreachBatch), so
  * replays and overlapping files cannot duplicate rows.
  *
  * At scale this is the standard continuous-ingest shape: the narrow
  * split/embed work distributes per file-partition; only the anti-join
  * shuffles, keyed on the content id.
  */
object IncrementalIngest {

  /** Start a streaming ingest from `inputDir` (json lines with doc_id,
    * text) into `storePath`. Returns the query; callers drive it with
    * `processAllAvailable()` in tests or let the trigger run it.
    */
  def start(spark: SparkSession, inputDir: String, storePath: String,
            embedder: Embedder, chunkSize: Int, chunkOverlap: Int,
            checkpointDir: String): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING")
    val stream = spark.readStream.schema(schema).json(inputDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, storePath, embedder, chunkSize, chunkOverlap)
      }
      .start()
  }

  /** Streaming WARC ingest: watch a crawl drop directory for arriving
    * `.warc` / `.warc.gz` files (the shape crawlers actually deliver —
    * one ~1 GB archive at a time), extract documents with the SAME
    * transform as the batch front door
    * ([[graft.sources.DocumentSources.warcDocumentsFromBinary]] — so
    * stream ≡ batch by construction), and merge each micro-batch into
    * the versioned store through the dedup anti-join. File-granular
    * micro-batches: an archive is parsed exactly once, and the store's
    * manifest publishes complete batch boundaries.
    */
  def startWarcIngest(spark: SparkSession, inputDir: String, storePath: String,
                      embedder: Embedder, chunkSize: Int, chunkOverlap: Int,
                      checkpointDir: String): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    spark.readStream.format("binaryFile").schema(schema).load(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = graft.sources.DocumentSources.warcDocumentsFromBinary(batch)
        mergeBatch(docs, storePath, embedder, chunkSize, chunkOverlap)
      }
      .start()
  }

  /** Streaming CDX index maintenance: as `.warc.gz` archives land in
    * the drop directory, each is indexed by the SAME member-boundary
    * kernel as the batch indexer
    * ([[graft.sources.DocumentSources.indexWarcGzFromBinary]] —
    * stream ≡ batch by construction) and the rows append to a
    * versioned store — the crawl's index stays current as archives
    * arrive, so ranged fetches ([[graft.sources.DocumentSources
    * .fetchWarcRecords]]) never wait on a batch re-index. An archive
    * is indexed exactly once (file-granular micro-batches); the
    * store's manifest publishes complete batch boundaries.
    */
  def startWarcIndexing(spark: SparkSession, inputDir: String,
                        indexStorePath: String,
                        checkpointDir: String): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    spark.readStream.format("binaryFile").schema(schema).load(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = graft.sources.DocumentSources.indexWarcGzFromBinary(batch)
        if (!rows.isEmpty)
          graft.ops.VersionedStore.append(spark, indexStorePath, rows): Unit
      }
      .start()
  }

  /** Data-contract gate per micro-batch: every arriving batch is
    * validated against `rules` ([[graft.ops.Validate]] — the same
    * single-scan fold the batch gate uses); a CLEAN batch flows to
    * `process`, a violating batch is quarantined (rows + report written
    * under `quarantineDir/batch=<id>`) and NEVER reaches the store —
    * the streaming promotion gate a continuous corpus drop needs, with
    * the failed drop preserved byte-for-byte for the operator to
    * inspect and replay. The two quarantine writes are separate jobs, so
    * a `_QUARANTINED` marker is written only after BOTH land — a rows
    * dir without the marker is a detectable partial quarantine (a crash
    * between the writes), not a complete drop.
    *
    * The per-batch work is one validation aggregate over the batch plus
    * `process` itself; the quarantine path touches only bad batches.
    */
  def gatedBatch(batch: DataFrame, rules: Seq[graft.ops.Validate.Rule],
                 quarantineDir: String, batchId: Long)
                (process: DataFrame => Unit): Boolean = {
    if (batch.isEmpty) return true
    val report = graft.ops.Validate.validate(batch, rules)
      .localCheckpoint() // one validation pass, reused for check + write
    val clean = report.filter(!col("passed")).isEmpty
    if (clean) process(batch)
    else {
      batch.write.mode("overwrite")
        .parquet(s"$quarantineDir/batch=$batchId/rows")
      report.write.mode("overwrite")
        .parquet(s"$quarantineDir/batch=$batchId/report")
      graft.Fs.writeString(batch.sparkSession,
        s"$quarantineDir/batch=$batchId/_QUARANTINED", "")
    }
    clean
  }

  /** One micro-batch: split → content key → dedup → embed → anti-join
    * against the store → append. Same semantics as the batch
    * [[graft.ops.Ingest.ingest]].
    */
  private[streaming] def mergeBatch(batch: DataFrame, storePath: String,
                                    embedder: Embedder, chunkSize: Int,
                                    chunkOverlap: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val chunks = Split.chunkDocs(batch, "doc_id", "text",
        t => Split.recursive(t, chunkSize, chunkOverlap))
      .withColumn("id", Split.contentKey(col("chunk_text")))
      .select(col("id"), col("chunk_text").as("text"),
        map(lit("source"), col("doc_id").cast("string"),
          lit("chunk_id"), col("chunk_id")).as("metadata"))
      .dropDuplicates("id")
      .withColumn("embedding", EmbedText.embedText(col("text"), embedder))
    // each micro-batch publishes through the versioned manifest: readers
    // querying the store mid-stream see complete batch boundaries, never
    // a half-committed append, and a batch whose anti-join leaves nothing
    // publishes no manifest version. The layout-respecting append keeps
    // an IVF-indexed store cluster-partitioned as the stream grows it.
    val toAppend = graft.ops.VersionedStore.read(spark, storePath) match {
      // SHUFFLE_HASH: build on the bare store ids, stream the wide
      // chunk rows — see Ingest.ingest (payload-sort cliff)
      case Some(st) =>
        chunks.join(st.select("id").hint("SHUFFLE_HASH"), Seq("id"), "left_anti")
      case None => chunks
    }
    graft.ops.Ingest.appendRespectingLayout(spark, storePath, toAppend): Unit
  }

  /** Start a CDC (changelog) stream into a versioned store: each
    * micro-batch is collapsed to last-write-wins per key (`seqCol` is
    * the changelog's own order — a Kafka offset, a source LSN) and
    * applied as a layout-respecting copy-on-write upsert; rows whose
    * `deleteFlagCol` is true are tombstones and apply as a keyed
    * delete. The table-in-a-changelog shape: replays, retries, and
    * out-of-order arrivals WITHIN a batch resolve by sequence, and each
    * micro-batch lands as one (or two, with deletes) atomic manifest
    * versions — a reader mid-stream sees complete batches only, and
    * time travel replays the table as of any batch.
    *
    * Scale: the per-key last-wins window partitions by key (no global
    * window); upserts and tombstones flow through
    * [[graft.ops.Ingest.mergeRespectingLayout]] /
    * [[graft.ops.Ingest.deleteKeysRespectingLayout]], so only the
    * segments containing affected keys rewrite, per batch.
    */
  /** Auto-maintenance policy for a long-lived CDC stream: every `every`
    * micro-batches, consult [[graft.ops.Ingest.layoutAdvisory]] and —
    * only when it advises — compact, then vacuum down to
    * `retainVersions` time-travel-readable versions (`graceMs` guards
    * in-flight snapshot readers). Without this, a months-long changelog
    * accrues a segment and a manifest per batch and the listing costs
    * eventually dominate the data.
    */
  case class CdcMaintenance(every: Int = 100, retainVersions: Int = 24,
                            graceMs: Long = 60L * 60 * 1000,
                            maxSegments: Int = 64,
                            minAvgFileBytes: Long = 32L << 20) {
    require(every > 0 && retainVersions >= 1)
  }

  def startCdc(spark: SparkSession, inputDir: String, storePath: String,
               schema: org.apache.spark.sql.types.StructType, keyCol: String,
               seqCol: String, checkpointDir: String,
               deleteFlagCol: Option[String] = None,
               maintenance: Option[CdcMaintenance] = None): StreamingQuery = {
    val stream = spark.readStream.schema(schema).json(inputDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCdcBatch(batch, storePath, keyCol, seqCol, deleteFlagCol)
        // keyed to the stream's own batchId so maintenance cadence
        // survives restarts (the checkpoint replays ids, not wall time)
        maintenance.foreach { m =>
          if (batchId > 0 && batchId % m.every == 0) maintainCdcTable(spark, storePath, m)
        }
      }
      .start()
  }

  private[graft] def maintainCdcTable(spark: SparkSession, storePath: String,
                                      m: CdcMaintenance): Unit =
    graft.ops.Ingest.layoutAdvisory(spark, storePath, m.maxSegments, m.minAvgFileBytes)
      .filter(_.compactionAdvised)
      .foreach { adv =>
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"CDC maintenance at ${adv.table}: ${adv.liveSegments} segments, " +
            s"${adv.dataFiles} files averaging ${adv.avgFileBytes}B — compacting")
        graft.ops.Ingest.compactTable(spark, storePath): Unit
        graft.ops.VersionedStore.vacuum(spark, storePath, m.graceMs,
          m.retainVersions): Unit
      }

  private[graft] def applyCdcBatch(batch: DataFrame, storePath: String,
                                       keyCol: String, seqCol: String,
                                       deleteFlagCol: Option[String]): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // last-write-wins per key within the batch; a TIE at the winning
    // sequence is a malformed changelog (the final state of that key is
    // ambiguous) — raise instead of picking silently. The raise rides
    // ON the surviving row (count of rank-1 rows, evaluated after the
    // row_number filter), so no predicate reordering can skip it; ties
    // below the winner are harmless and ignored.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    // localCheckpoint: the windowed last-write frame feeds the upsert
    // AND the tombstone leg, and each leg's merge/delete re-executes its
    // input several times (emptiness probe, detection semi-join,
    // rewrite) — without the pin every re-execution re-runs the window
    // over the raw batch. Materializing here also fires the tied-seq
    // raise exactly once, BEFORE any store mutation — the
    // refusal-leaves-store-untouched contract, now structural.
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .withColumn("__ntop",
        sum(when(rank().over(w) === 1, 1).otherwise(0)).over(wKey))
      .filter(col("__rn") === 1)
      .withColumn(keyCol, when(col("__ntop") === 1, col(keyCol))
        .otherwise(raise_error(lit(s"CDC batch carries a tied $seqCol for a " +
          s"$keyCol — the changelog's final state for that key is ambiguous"))))
      .drop("__rn", "__ntop")
      .localCheckpoint()
    deleteFlagCol match {
      case Some(f) =>
        val ups = latest.filter(!coalesce(col(f), lit(false))).drop(f, seqCol)
        val dels = latest.filter(coalesce(col(f), lit(false))).select(col(keyCol))
        if (!ups.isEmpty)
          graft.ops.Ingest.mergeRespectingLayout(spark, storePath, ups, keyCol): Unit
        if (!dels.isEmpty)
          graft.ops.Ingest.deleteKeysRespectingLayout(
            spark, storePath, dels, keyCol): Unit
      case None =>
        graft.ops.Ingest.mergeRespectingLayout(
          spark, storePath, latest.drop(seqCol), keyCol): Unit
    }
  }

  /** Streaming exact dedup with BOUNDED state: drop re-occurrences of
    * `keyCol` arriving within the watermark delay through Spark's state
    * store, instead of anti-joining the full historical table every
    * micro-batch. In a continuous ingest the two compose: this absorbs
    * the common case (duplicates arriving close together — retries,
    * re-delivered files) with O(keys within the watermark) state, and
    * the store anti-join in [[mergeBatch]] stays the cross-restart /
    * long-range backstop. At 100 TB the distinction is what keeps the
    * state store from growing with all-time history.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String, keyCol: String,
                           watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Watermarked stream-stream equi-join with a bounded event-time gap —
    * the streaming enrichment shape (e.g. raw events joined to the
    * document-ingest stream that produced them). Both sides carry a
    * watermark and the join condition carries the ±`maxGap` time-range
    * constraint, which is what lets Spark EVICT join state once the
    * watermark passes: without it, each side's state store grows with
    * all-time history and a 100 TB continuous join eventually dies. With
    * it, state is O(rows within watermark + gap) per side.
    *
    * `joinType` supports "inner" and the watermark-mandatory outer
    * variants ("leftOuter"/"rightOuter"); unmatched outer rows are
    * emitted only after the watermark passes their eviction horizon —
    * the streaming-correct semantics, asserted live in ScaleOpsSpec.
    * Column names must be disjoint across the two sides (the usual
    * Spark join contract; rename before joining).
    */
  def joinStreamsWithinGap(left: DataFrame, leftKey: String, leftTs: String,
                           right: DataFrame, rightKey: String, rightTs: String,
                           watermark: String, maxGap: String,
                           joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val gap = expr(s"INTERVAL $maxGap")
    val cond = col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) - gap &&
      col(rightTs) <= col(leftTs) + gap
    l.join(r, cond, joinType)
  }

  /** Watermarked per-window HLL registers over a stream — the
    * bounded-state distinct-count monitor (unique users/tokens/keys per
    * window on an unbounded stream): state is ≤ 256 register rows per
    * OPEN window whatever the cardinality, evicted once the watermark
    * passes. The registers are [[graft.ops.Sketch]]'s md5-portable
    * construction, so a window's streamed registers are row-identical
    * to the batch [[graft.ops.Sketch.hllRegisters]] over that window's
    * rows (asserted live in ScaleOpsSpec) and estimate through the same
    * [[graft.ops.Sketch.hllEstimate]].
    */
  def windowedHllRegisters(events: DataFrame, tsCol: String, valueCol: String,
                           windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .filter(col(valueCol).isNotNull)
      .select(window(col(tsCol), windowLen).as("window"),
        graft.ops.Sketch.registerCol(col(valueCol)).as("register"),
        graft.ops.Sketch.rhoCol(col(valueCol)).as("__rho"))
      .groupBy(col("window"), col("register"))
      .agg(max(col("__rho")).as("rho"))

  /** Watermarked per-window hashed-vocabulary distribution over a
    * document stream — the streaming leg of the corpus drift monitor:
    * state is ≤4096 bucket rows per OPEN window whatever the vocabulary
    * (the [[windowedHllRegisters]] boundedness argument), evicted at
    * the watermark. Buckets are the [[graft.ops.Importance.tokenBucket]]
    * md5 construction via [[graft.ops.TextAnalysis.vocabBuckets]]'s
    * definition, so a closed window's streamed rows are row-identical
    * to the batch distribution over the same rows, and feed
    * [[graft.ops.TextAnalysis.jsdToReference]] directly (window as the
    * slice key) to score drift against a broadcast reference.
    */
  def windowedVocabBuckets(docs: DataFrame, tsCol: String, textCol: String,
                           windowLen: String, watermark: String): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .select(window(col(tsCol), windowLen).as("window"),
        explode(filter(graft.ops.TextAnalysis.tokens(col(textCol)),
          t => length(t) > 0)).as("__tok"))
      .withColumn("__b", graft.ops.Importance.tokenBucket(col("__tok")))
      .groupBy(col("window"), col("__b"))
      .agg(count(lit(1)).as("__c"))

  /** Windowed event aggregation over a stream — the watermark/tumbling-
    * window shape (§2.8's Spark mapping), exposed for the events table:
    * per (window, event_type) counts and exact value cents.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String, windowLen: String,
                          watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
}
