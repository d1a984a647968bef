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
    *
    * `checkpointEvery` bounds lineage depth: rounds between cuts run
    * as ONE fused DAG (a per-round eager localCheckpoint is a full
    * materialization job each iteration — pure fixed cost when the
    * loop is short). Plan growth per round is linear (join + agg), so
    * a handful of rounds per cut is safe; the cut exists so a 50-round
    * run doesn't hand Catalyst a 50-deep plan or a 100-stage retry
    * lineage. Same discipline GraphFrames applies via its
    * checkpointInterval.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85, checkpointEvery: Int = 5): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) is loop-invariant: materialize ONCE so each
    // iteration pays one join + one aggregation, not a degree
    // recompute. This is the artifact to persist BUCKETED by src on a
    // real cluster — the rank join's exchange then disappears from
    // every round.
    // hash-partition by src BEFORE the lineage cut: LogicalRDD keeps
    // the partitioning, so every iteration's rank join exchanges ONLY
    // the (node, rank) side — the edge table never reshuffles. This is
    // the localCheckpoint analogue of persisting the edge table
    // bucketed by src on a real cluster.
    val ewd = e.join(deg, Seq("src"))
      .repartition(col("src")).localCheckpoint()
    // derive the node set from the ALREADY-MATERIALIZED edge table
    // (inner join with deg drops no rows — every src has a degree), so
    // the upstream edge derivation runs exactly once, not once per
    // consumer
    val nodes = ewd.select(col("src").as("node"))
      .union(ewd.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    for (i <- 1 to iters) {
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
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint() // periodic lineage cut
    }
    ranks
  }
}
