package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A13 hierarchy rollup (reference: OCI compartment id→parent walk
  * building '/'-joined full paths, `src/server/utils/oci.py:117-130`,
  * done driver-side in Python over a small listing).
  *
  * Spark shape: iterative broadcast self-join — each round extends every
  * node's known prefix by one ancestor level, terminating when no row
  * still has an unresolved parent (or at `maxDepth`, the cycle guard).
  * Hierarchies are small dimensions; each round broadcasts only
  * `(id, name, parent)`.
  */
object Hierarchy {

  /** Returns `df` plus a `path` column: '/'-joined names from the root
    * to the node. `parentCol` null means root. Cycles are cut at
    * `maxDepth` levels.
    */
  def buildPaths(df: DataFrame, idCol: String, parentCol: String, nameCol: String,
                 maxDepth: Int = 32): DataFrame = {
    val base = df.select(
      col(idCol).as("__id"), col(parentCol).as("__parent"), col(nameCol).as("__name"))
    val lookup = broadcast(base.select(
      col("__id").as("__aid"), col("__parent").as("__aparent"), col("__name").as("__aname")))

    // Each round is materialized via localCheckpoint (eager): the next
    // round's join reads the previous round's result once, instead of
    // re-executing the whole accumulated join chain per iteration (O(d)
    // joins total, not O(d²), and the logical plan stays one level deep
    // for the analyzer). The remaining-work probe rides the checkpoint
    // action as an observed metric — one job per level, not two.
    def checkpointCounting(df: DataFrame): (DataFrame, Long) = {
      val obs = new org.apache.spark.sql.Observation()
      val out = df.observe(obs, count(col("__next")).as("n")).localCheckpoint()
      (out, obs.get("n").asInstanceOf[Long])
    }
    var (cur, remaining) = checkpointCounting(
      base.withColumn("path", col("__name")).withColumn("__next", col("__parent")))
    var depth = 0
    while (remaining > 0 && depth < maxDepth) {
      val (next, n) = checkpointCounting(
        cur.join(lookup, cur("__next") === lookup("__aid"), "left")
          .select(
            col("__id"), col("__parent"), col("__name"),
            when(col("__aname").isNotNull, concat(col("__aname"), lit("/"), col("path")))
              .otherwise(col("path")).as("path"),
            col("__aparent").as("__next")))
      cur = next
      remaining = n
      depth += 1
    }
    df.join(
      cur.select(col("__id").as(s"__join_$idCol"), col("path")),
      col(idCol) === col(s"__join_$idCol"))
      .drop(s"__join_$idCol")
  }
}
