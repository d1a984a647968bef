package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional grouping reports — the generalization of
  * `Hierarchy.rollupReport` beyond linear hierarchies (the reference
  * stops at ROLLUP, aggregation_example.sql:308-348; SURVEY §2.5 notes
  * CUBE as the natural next step).
  *
  * All variants plan as ONE Expand + partial/final hash aggregation —
  * a single shuffle regardless of how many grouping sets are produced
  * (2^n for CUBE). Expand multiplies map-side rows by the set count
  * BEFORE partial aggregation combines them, so the shuffled volume is
  * (distinct keys × sets), not (input rows × sets) — the shape that
  * holds at 100 TB. For very high set counts on very wide keys, the
  * alternative is re-aggregating a pre-aggregated base; Spark's Expand
  * wins while sets ≤ ~2^4, which is the practical range.
  */
object GroupingOps {

  /** CUBE over `keys` with GROUPING-based labels: every key column is
    * emitted as COALESCE(key, 'ALL') plus a `grouping_id` bitmask
    * column dispatching which of the 2^n sets a row belongs to.
    * String keys only (the label domain must absorb 'ALL').
    */
  def cubeReport(df: DataFrame, keys: Seq[String],
      namedAggs: Seq[(String, Column)]): DataFrame = {
    val aggs = namedAggs.map { case (n, c) => c.as(n) } :+
      grouping_id(keys.map(col): _*).cast("long").as("grouping_set_id")
    df.cube(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys.map(k => coalesce(col(k), lit("ALL")).as(k)) ++
        namedAggs.map(_._1).map(col) :+ col("grouping_set_id"): _*)
  }

  /** Explicit GROUPING SETS — only the requested sets are produced
    * (CUBE minus the sets nobody reads: at scale, skipping a set skips
    * its shuffled partials entirely). `sets` are index lists into
    * `keys`; the empty list is the grand total.
    */
  def groupingSetsReport(df: DataFrame, keys: Seq[String],
      sets: Seq[Seq[Int]], namedAggs: Seq[(String, Column)]): DataFrame = {
    val aggs = namedAggs.map { case (n, c) => c.as(n) } :+
      grouping_id(keys.map(col): _*).cast("long").as("grouping_set_id")
    df.groupingSets(sets.map(_.map(i => col(keys(i)))), keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys.map(k => coalesce(col(k), lit("ALL")).as(k)) ++
        namedAggs.map(_._1).map(col) :+ col("grouping_set_id"): _*)
  }
}
