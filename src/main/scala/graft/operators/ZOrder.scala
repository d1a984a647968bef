package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimensional data skipping.
  *
  * Sorting a 100 TB fact table by ONE key gives parquet min/max
  * row-group pruning on that key only; a 2-d box predicate then scans
  * every row group for the second dimension. Interleaving the bits of
  * both keys makes row groups cover small (x, y) rectangles, so BOTH
  * dimensions prune — the standard lakehouse layout trick (z-ordering)
  * expressed as plain Spark: compute the key, range-partition + sort by
  * it at write time. Nothing engine-specific is needed at read time;
  * the parquet reader's ordinary min/max stats on the ORIGINAL columns
  * do the skipping (proven in ZOrderSpec).
  *
  * The bit spread is the classic shift/mask ladder (no loops, no HOFs
  * — stays inside whole-stage codegen, unlike an `aggregate(sequence)`
  * formulation, and is expressible verbatim in any engine with integer
  * bit ops, which is what makes q39's oracle portable). Inputs are
  * masked to 16 bits: two 16-bit dims → one 32-bit z key.
  */
object ZOrder {

  /** Spread the low 16 bits of `c`: bit i moves to position 2i. */
  private def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(65535L))                                         // 0xFFFF
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(16711935L))         // 0x00FF00FF
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(252645135L))        // 0x0F0F0F0F
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(858993459L))        // 0x33333333
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(1431655765L))                // 0x55555555
  }

  /** Interleaved 32-bit Morton key of two 16-bit dimensions. */
  def zkey16(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Cluster `df` into `files` z-ordered parquet files at `path`:
    * range-partition on the z key (each output file covers one compact
    * z range = one (x, y) rectangle), sort within partitions so
    * row-group stats stay tight, drop the key — the layout, not the
    * column, is the product.
    */
  def writeClustered(df: DataFrame, x: Column, y: Column,
      files: Int, path: String): Unit =
    df.withColumn("__z", zkey16(x, y))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
