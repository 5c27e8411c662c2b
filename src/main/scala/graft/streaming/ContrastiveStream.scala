package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Contrastive, Ivf}

/** Streaming contrastive mining: anchors arrive append-only (the
  * continuously-ingested side of a training-set build), the corpus is
  * a STATIC IVF-indexed relation. Each anchor's hard-negative top-k
  * depends only on that anchor and the static corpus — the op is
  * STATELESS across batches, so the union of per-batch results EQUALS
  * the one-shot batch run (fold ≡ batch; ContrastiveSpec pins it
  * bit-for-bit, and the `hard_negatives_stream` query pins it against
  * the exact-replay oracle).
  *
  * Why foreachBatch and not a pure streaming plan: the cell fan-out
  * and the stream-static equi-join ARE stateless streaming operators,
  * but the per-anchor top-k needs a rank window, which Structured
  * Streaming forbids on the unbounded stream. Inside foreachBatch the
  * batch is bounded, so [[Contrastive.hardNegativesIvf]] runs
  * UNCHANGED — the same plan the batch path compiles, including the
  * SHUFFLE_HASH cell join and the bounded-rank tail.
  */
object ContrastiveStream {

  /** Start mining hard negatives for every arriving anchor, appending
    * `(anchor id, rank, corpus id, score)` parquet to `outDir`. The
    * anchor stream must carry `(anchorIdCol, anchorEmbCol,
    * anchorLabelCol)`; `corpus` is the static side and should already
    * be the live rows of an [[Ivf.indexStore]]-indexed table so its
    * cell assignment matches `model` (the same fingerprint contract as
    * every probed search). Returns the query; tests drive it with
    * `processAllAvailable()`.
    */
  def startHardNegatives(anchors: DataFrame, corpus: DataFrame,
                         anchorIdCol: String, anchorEmbCol: String,
                         anchorLabelCol: String,
                         corpusIdCol: String, corpusEmbCol: String,
                         corpusLabelCol: String,
                         model: Ivf.IvfModel, nProbe: Int, k: Int,
                         outDir: String, checkpointDir: String,
                         metric: String = "COSINE"): StreamingQuery =
    anchors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mineBatch(batch, corpus, anchorIdCol, anchorEmbCol, anchorLabelCol,
          corpusIdCol, corpusEmbCol, corpusLabelCol, model, nProbe, k,
          metric, outDir, batchId)
      }
      .start()

  /** The per-micro-batch body, shared with the batch-defined replay
    * (the `hard_negatives_stream` query): mine the batch's anchors
    * against the static corpus and land the pairs under the batch's
    * OWN partition via dynamic partition overwrite — a replayed
    * micro-batch (crash after the data commit, before the streaming
    * checkpoint records it) overwrites its partition instead of
    * appending a duplicate copy, which is what keeps the accumulated
    * artifact equal to the one-shot batch run (the fold ≡ batch
    * contract; a plain append sink would silently 2× replayed
    * anchors). An empty batch writes nothing (foreachBatch fires on
    * empty triggers too).
    */
  def mineBatch(batch: DataFrame, corpus: DataFrame,
                anchorIdCol: String, anchorEmbCol: String,
                anchorLabelCol: String,
                corpusIdCol: String, corpusEmbCol: String,
                corpusLabelCol: String,
                model: Ivf.IvfModel, nProbe: Int, k: Int,
                metric: String, outDir: String, batchId: Long): Unit =
    if (!batch.isEmpty)
      Contrastive.hardNegativesIvf(batch, corpus,
          anchorIdCol, anchorEmbCol, anchorLabelCol,
          corpusIdCol, corpusEmbCol, corpusLabelCol,
          model, nProbe, k, metric)
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outDir)
}
