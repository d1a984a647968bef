package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.sources.Tables

/** Z-order layout: key correctness against a bit-twiddling reference,
  * and the actual data-skipping payoff — parquet row-group pruning via
  * ordinary min/max stats on the ORIGINAL columns, measured from the
  * scan's numOutputRows (rows materialized from surviving row groups,
  * before the residual filter).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def referenceZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zkey16 matches the per-bit interleave reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L), (70000L, 3L))
    val got = pts.toDF("x", "y")
      .select(ZOrder.zkey16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val expect = pts.map { case (x, y) => referenceZ(x & 65535L, y & 65535L) }
    assert(got.toSeq == expect, "zkey16 disagrees with the reference interleave")
  }

  /** Rows the scan materializes (post row-group pruning, pre residual
    * filter) for a 2-d box predicate over the given layout. The box is
    * wide on the first dim and narrow on the second — the regime where
    * a single-key sort is nearly useless (it prunes only via the wide
    * dim) and interleaving pays; when the FIRST dim is the narrow one,
    * single-key layout legitimately wins (z-order spends bits on both
    * dims) — the documented trade-off, not a bug.
    */
  private def scannedRows(path: String): Long = {
    val q = spark.read.parquet(path)
      .filter(col("l_partkey") >= 1 && col("l_partkey") <= 120 &&
        col("l_suppkey") === 3)
      .agg(count(lit(1)))
    q.collect()
    val scans = allScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no FileSourceScanExec found")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  /** Collect scans through AQE wrappers (the adaptive root and its
    * materialized query stages hide children from a plain collect).
    */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  test("z-ordered layout prunes row groups on a 2-d box; single-key sort does not") {
    val base = Files.createTempDirectory("zorder").toString
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()

    // layout A: natural order (no clustering) — every file spans the
    // full key range, nothing prunes
    li.repartition(64).write.mode("overwrite").parquet(s"$base/flat")
    // layout B: single-key sort on l_partkey — partkey prunes, suppkey
    // cannot (every file still spans all suppliers)
    li.repartitionByRange(64, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$base/bypart")
    // layout C: z-ordered on (partkey, suppkey) — both dims prune
    ZOrder.writeClustered(li, col("l_partkey"), col("l_suppkey"), 64, s"$base/z")

    val flat = scannedRows(s"$base/flat")
    val byPart = scannedRows(s"$base/bypart")
    val z = scannedRows(s"$base/z")

    info(s"scanned rows — flat: $flat, partkey-sorted: $byPart, z-ordered: $z (total $total)")
    assert(flat == total, s"flat layout should scan everything, got $flat of $total")
    assert(byPart < flat, "single-key sort should prune on the sorted dim")
    assert(z < flat, "z-order should prune")
    // the z payoff: the second dimension prunes too, so the 2-d box
    // reads strictly less than the single-key layout
    assert(z < byPart,
      s"z-ordered scan ($z rows) should beat single-key layout ($byPart rows)")
  }
}
