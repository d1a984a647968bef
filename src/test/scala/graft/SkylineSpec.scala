package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CoreQueries

/** q48's two-phase skyline vs the brute-force dominance definition.
  * The production oracle (DuckDB) replays the sweep as one global
  * window — a different decomposition but the same algorithm family —
  * so the spec is where the O(n²) NOT-EXISTS ground truth is pinned.
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frontierBrute(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filterNot { case (id, pr, sz) =>
      pts.exists { case (id2, pr2, sz2) =>
        id2 != id && pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Int)], buckets: Int): Set[Long] = {
    val df = pts.toDF("p_partkey", "p_retailprice", "p_size")
      .withColumn("p_name", concat(lit("part"), col("p_partkey")))
      .repartition(4)
    CoreQueries.skyline(df, buckets).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
  }

  test("skyline == brute-force NOT-EXISTS on seeded random points (with duplicates and price ties)") {
    val rnd = new scala.util.Random(42)
    // 300 points over a deliberately SMALL value grid so price ties,
    // size ties, and exact duplicate points all occur
    val pts = (1L to 300L).map(i =>
      (i, (rnd.nextInt(20) * 25).toDouble / 100.0, rnd.nextInt(15)))
    val expected = frontierBrute(pts)
    assert(expected.nonEmpty && expected.size < pts.size)
    assert(run(pts, buckets = 32) == expected)
  }

  test("exact duplicate frontier points are BOTH kept (neither dominates the other)") {
    val pts = Seq((1L, 1.0, 10), (2L, 1.0, 10), (3L, 2.0, 5), (4L, 0.5, 1))
    // 3 is dominated by 1/2 (cheaper AND bigger); 4 survives (cheapest)
    assert(frontierBrute(pts) == Set(1L, 2L, 4L))
    assert(run(pts, buckets = 8) == Set(1L, 2L, 4L))
  }

  test("bucket count never changes the result (algebraic merge property)") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 200L).map(i =>
      (i, rnd.nextInt(1000).toDouble / 10.0, rnd.nextInt(50)))
    val one = run(pts, buckets = 1)
    assert(run(pts, buckets = 32) == one)
    assert(one == frontierBrute(pts))
  }
}
