package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof join picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "lts", "name")
    val right = Seq((1L, 8L, "a"), (1L, 20L, "b"), (1L, 25L, "c"), (2L, 9L, "z"))
      .toDF("k", "rts", "payload")
    val out = AsofJoin.asofJoin(left, right, keys = Seq("k"),
      leftTs = "lts", rightTs = "rts", rightCols = Seq("payload", "rts"))
      .select("k", "lts", "asof_payload", "asof_rts")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.get(3)))).toSet
    assert(out == Set(
      (1L, 10L, Some("a"), Some(8L)),   // latest right ≤ 10 is ts 8
      (1L, 25L, Some("c"), Some(25L)),  // equal ts matches (inclusive)
      (2L, 5L, None, None)))            // no right row at or before 5
  }

  test("asof join is one exchange on the key (union-merge, no range join)") {
    val left = Seq((1L, 10L, "p")).toDF("k", "lts", "name")
    val right = Seq((1L, 8L, "a")).toDF("k", "rts", "payload")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("payload"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"asof must not plan as a range/nested-loop join:\n$plan")
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size >= 1 &&
      !plan.contains("SortMergeJoin"), s"expected union + window on k:\n$plan")
  }
}
