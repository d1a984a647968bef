package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on plain DataFrames — the same
  * loop-with-lineage-cut discipline as plans/Recursion (localCheckpoint
  * per round, no RDD API, no GraphX dependency).
  *
  * Scale shape per iteration: one shuffle keyed by edge source (join
  * ranks onto edges) and one keyed by destination (contribution sum) —
  * both map-side combined. Ranks are one row per node; edges dominate
  * and are reused across iterations, so at 100 TB the edge table is
  * the thing to pre-partition (or bucket) on src.
  *
  * CROSS-ENGINE FLOAT DISCIPLINE (oracle parity, same as p10/p15):
  * per-edge contribution rank/outdeg is a single double division
  * (identical on both engines), but SUMS of doubles are partition-
  * order-dependent — so contributions are CAST to DECIMAL(30,15)
  * before the aggregate (exact, order-free) and back to DOUBLE after.
  */
object Graph {

  /** `iters` rounds of damped PageRank over a DIRECTED edge list
    * (src, dst) — pass both directions for an undirected graph.
    * Returns (node, rank) with uniform 1/N initialization.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) is loop-invariant: materialize ONCE so each
    // iteration pays one join + one aggregation, not a degree
    // recompute. This is the artifact to persist BUCKETED by src on a
    // real cluster — the rank join's exchange then disappears from
    // every round.
    val ewd = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = ewd
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          (col("r") / col("outdeg")).cast("decimal(30,15)").as("c"))
        .groupBy("node")
        .agg(sum("c").as("csum"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("csum").cast("double"), lit(0.0)))
            .as("r"))
        .localCheckpoint() // cut the per-iteration lineage growth
    }
    ranks
  }
}
