package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** One-call vector serving over a maintained [[VersionedStore]] table:
  * reads the table's sidecars ([[Ivf.modelPath]], [[Pq.markerPath]],
  * [[Quantize.markerPath]]) and dispatches to the cheapest serving
  * path the layouts support — the user asks for neighbors, the store's
  * own maintenance history decides how they are found. Every path ends
  * in exact scoring of the returned rows, and every path inherits its
  * layer's guard rails (model-fingerprint checks, staleness refusal),
  * so upgrading a store in place (indexStore, quantizeStore, pqStore)
  * upgrades its serving without a caller change.
  */
object VectorServe {

  /** The dispatch decision, exposed for tests/operability. */
  sealed trait Route
  object Route {
    /** Residual IVF-PQ: partition-pruned cells, codes-only ADC, rescore. */
    case object IvfPq extends Route
    /** Plain PQ codes over the whole table, rescore. */
    case object PqOnly extends Route
    /** IVF partitions probed, SQ8 coarse inside them, rescore. */
    case object IvfSq8 extends Route
    /** SQ8 coarse over the whole table, rescore. */
    case object Sq8Only extends Route
    /** IVF partition pruning, exact scoring inside probed cells. */
    case object IvfExact extends Route
    /** Exact brute-force scan. */
    case object Exact extends Route
  }

  /** The route [[search]] will take for `table` as laid out right now.
    * A residual PQ marker whose IVF model is gone (out-of-band
    * deletion) is a corrupted layout: the codes are meaningless without
    * the centroids they are residuals against, so serving them as
    * plain codes would be silently wrong — refuse loudly instead, the
    * same contract the append seam applies.
    */
  def route(spark: SparkSession, table: String): Route = {
    val ivf = graft.Fs.exists(spark, Ivf.modelPath(table))
    val pq = Pq.readMarker(spark, table)
    val sq8 = graft.Fs.exists(spark, Quantize.markerPath(table))
    pq match {
      case Some(mk) if mk.residual && !ivf =>
        throw new IllegalStateException(
          s"store $table carries residual PQ codes but no ${Ivf.modelPath(table)} — " +
            "the codes are undecodable without the IVF centroids; restore the model " +
            "or re-run Pq.pqStore")
      case Some(mk) if mk.residual => Route.IvfPq
      case Some(_)                 => Route.PqOnly
      case None if sq8 && ivf      => Route.IvfSq8
      case None if sq8             => Route.Sq8Only
      case None if ivf             => Route.IvfExact
      case None                    => Route.Exact
    }
  }

  /** Top-k rows of `table` nearest `queryVec`, output `(idCol, score)`
    * scored exactly — the [[Similarity.knn]] contract — via [[route]].
    * `nProbe` bounds the probed cells on IVF layouts (clamped to the
    * model's k); the default `nProbe = 0` means "the store's TUNED
    * width" — the [[Ivf.tuneStore]]-persisted operating point when the
    * sidecar exists (stale-model configs refuse loudly, the
    * fingerprint contract), else the conservative 2. `overfetch`
    * bounds the coarse candidate cut on the quantized layouts. With
    * `nProbe` and `overfetch` covering the corpus every route equals
    * exact knn (the pin-to-exact contract the fixture queries and
    * specs ride on).
    */
  def search(spark: SparkSession, table: String, idCol: String, embCol: String,
             queryVec: Array[Float], k: Int, metric: String = "COSINE",
             nProbe: Int = 0, overfetch: Int = 8): DataFrame = {
    require(nProbe >= 0, s"nProbe: 0 = tuned-or-default, else explicit (got $nProbe)")
    val store = VersionedStore.read(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no store at $table"))
    def width(ivf: Ivf.IvfModel): Int = math.min(
      if (nProbe > 0) nProbe
      else Ivf.tunedNProbe(spark, table, ivf).getOrElse(2), ivf.k)
    val hits = route(spark, table) match {
      case Route.IvfPq =>
        val ivf = Ivf.loadModel(spark, Ivf.modelPath(table))
        Ivf.requireModelMatch(spark, table, ivf)
        val pq = Pq.loadModel(spark, Pq.modelPath(table))
        Pq.searchIvfPq(store, idCol, embCol, queryVec, k, ivf, pq,
          nProbe = width(ivf), metric = metric, overfetch = overfetch)
      case Route.PqOnly =>
        val pq = Pq.loadModel(spark, Pq.modelPath(table))
        Pq.knnPqRescore(store, idCol, embCol, queryVec, k, pq, metric, overfetch)
      case Route.IvfSq8 =>
        val ivf = Ivf.loadModel(spark, Ivf.modelPath(table))
        Ivf.requireModelMatch(spark, table, ivf)
        val probes = ivf.probeOrder(queryVec).take(width(ivf)).toSeq
        Quantize.knnQuantizedRescore(
          store.filter(col("cluster_id").isin(probes: _*)),
          idCol, embCol, queryVec, k, metric, overfetch)
      case Route.Sq8Only =>
        Quantize.knnQuantizedRescore(store, idCol, embCol, queryVec, k, metric, overfetch)
      case Route.IvfExact =>
        val ivf = Ivf.loadModel(spark, Ivf.modelPath(table))
        Ivf.search(store, embCol, ivf, queryVec, k,
          nProbe = width(ivf), metric = metric,
          storePath = Some(table))
      case Route.Exact =>
        Similarity.knn(store.select(col(idCol), col(embCol)), embCol, queryVec, k, metric)
    }
    hits.select(col(idCol), col("score"))
  }

  /** Batch [[search]]: every query row's top-k against `table` in the
    * fewest scans the store's layout supports — the evaluation-shaped
    * workload (a RAG testset retrieving for every question at once).
    * Same dispatch, same guard rails, same tuned-width default as the
    * single-query path; every route pairs the corpus scan with the
    * BOUNDED broadcast query batch instead of rescanning per query
    * (IVF layouts additionally prune to the union of probed cells).
    * Output `(queryIdCol, rank, idCol, score)`, scored exactly. At
    * covering settings every route equals the exact batch join — the
    * same pin-to-exact contract as [[search]].
    */
  def searchBatch(spark: SparkSession, table: String,
                  idCol: String, embCol: String,
                  queries: DataFrame, queryIdCol: String, queryEmbCol: String,
                  k: Int, metric: String = "COSINE",
                  nProbe: Int = 0, overfetch: Int = 8): DataFrame = {
    require(nProbe >= 0, s"nProbe: 0 = tuned-or-default, else explicit (got $nProbe)")
    val store = VersionedStore.read(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no store at $table"))
    def width(ivf: Ivf.IvfModel): Int = math.min(
      if (nProbe > 0) nProbe
      else Ivf.tunedNProbe(spark, table, ivf).getOrElse(2), ivf.k)
    val hits = route(spark, table) match {
      case Route.IvfPq =>
        val ivf = Ivf.loadModel(spark, Ivf.modelPath(table))
        Ivf.requireModelMatch(spark, table, ivf)
        val pq = Pq.loadModel(spark, Pq.modelPath(table))
        Pq.searchIvfPqBatch(queries, store, queryIdCol, queryEmbCol,
          idCol, embCol, ivf, pq, topK = k, nProbe = width(ivf),
          metric = metric, overfetch = overfetch)
      case Route.PqOnly =>
        val pq = Pq.loadModel(spark, Pq.modelPath(table))
        Pq.knnPqRescoreBatch(queries, store, queryIdCol, queryEmbCol,
          idCol, embCol, pq, topK = k, metric = metric, overfetch = overfetch)
      case Route.IvfSq8 =>
        val ivf = Ivf.loadModel(spark, Ivf.modelPath(table))
        Quantize.searchBatch(queries, store, queryIdCol, queryEmbCol,
          idCol, embCol, topK = k, metric = metric, overfetch = overfetch,
          ivf = Some((ivf, width(ivf))), storePath = Some(table))
      case Route.Sq8Only =>
        Quantize.searchBatch(queries, store, queryIdCol, queryEmbCol,
          idCol, embCol, topK = k, metric = metric, overfetch = overfetch)
      case Route.IvfExact =>
        val ivf = Ivf.loadModel(spark, Ivf.modelPath(table))
        Ivf.searchBatch(queries, store, queryIdCol, queryEmbCol, idCol, embCol,
          ivf, topK = k, nProbe = width(ivf), metric = metric,
          storePath = Some(table))
      case Route.Exact =>
        Similarity.similarityJoin(queries, store, queryIdCol, queryEmbCol,
          idCol, embCol, k, metric)
    }
    hits.select(col(queryIdCol), col("rank"), col(idCol), col("score"))
  }
}
