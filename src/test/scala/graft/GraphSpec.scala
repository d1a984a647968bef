package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: star center dominates, ranks sum to ~1") {
    // undirected star 0-1, 0-2, 0-3, 0-4 (both directions passed)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 10).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 5)
    assert(r(0L) > r(1L) * 2, s"center should dominate: $r")
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.size == 1, s"leaves equal: $r")
    val total = r.values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"ranks sum to 1, got $total")
  }

  test("pageRank: periodic lineage cuts do not change the fixpoint") {
    // same 7 rounds computed as one fused DAG vs cut every 2 rounds —
    // the decimal contribution sums are order-free, so the results
    // must be bit-identical, not merely close
    val rnd = new scala.util.Random(7)
    val e = (1 to 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2).distinct
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    def run(ck: Int) = Graph.pageRank(edges, iters = 7, checkpointEvery = ck)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(run(2) === run(100))
  }

  test("pageRank: symmetric regular graph stays uniform") {
    // 4-cycle (regular, symmetric): uniform 0.25 is the fixpoint.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 5).collect().map(_.getDouble(1))
    assert(r.forall(x => math.abs(x - 0.25) < 1e-12), s"uniform: ${r.toSeq}")
  }
}
