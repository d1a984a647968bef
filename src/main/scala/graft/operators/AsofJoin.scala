package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row whose
  * timestamp is ≤ the left row's, within the same key. Spark has no
  * native ASOF JOIN (DuckDB does, which is what the oracle uses);
  * composing one from existing operators, the scalable shape is the
  * UNION-MERGE, not a range join:
  *
  *   tag both sides → union → ONE shuffle on the key → sort within
  *   partition by (ts, side) → carry the most recent right payload
  *   forward with last(_, ignoreNulls) over a running window → keep
  *   left rows.
  *
  * Cost: one exchange + one per-partition sort, O(n log n) per key
  * group — a naive inequality join is O(left×right) per key and plans
  * as a broadcast-nested-loop. Right rows sort BEFORE left rows at
  * equal timestamps, so the match is inclusive (right.ts ≤ left.ts),
  * matching DuckDB ASOF semantics. Rows with no earlier right match
  * keep NULL payloads (ASOF LEFT JOIN).
  *
  * Contract: `rightCols` must be unambiguous after prefixing; callers
  * dedupe the right side to one row per (key, ts) — under ties the
  * "latest" row is otherwise engine-dependent in every ASOF
  * implementation.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(keys.contains)
    val l2 = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_ats"), lit(1).as("_side")) ++
        leftPayload.map(col) ++
        rightCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(prefix + c)): _*)
    val r2 = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_ats"), lit(0).as("_side")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(l2.unionByName(r2)) { (df, c) =>
      df.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }
    carried.where(col("_side") === 1).drop("_ats", "_side")
  }
}
