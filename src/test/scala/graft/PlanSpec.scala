package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.HierarchyQueries

/** Physical-plan hygiene: the properties that keep these operators
  * viable at 100 TB, asserted on the actual executed plans.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("closure report broadcasts the closure dim (no sort-merge on the fact side)") {
    val rep = graft.operators.Hierarchy.closureReport(
      HierarchyQueries.facts(spark, dir),
      HierarchyQueries.closureDim(spark, dir),
      col("fact_key"),
      Seq("n" -> count(lit(1))))
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("minhash pair generation is a bucket equi-join, never cartesian") {
    val pairs = graft.operators.Dedup.minhashPairs(
      graft.sources.Tables.documents(spark, dir), minEst = 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs dedup is forbidden:\n$plan")
  }

  test("ngram jaccard pair generation is an inverted-index join, never cartesian") {
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      graft.sources.Tables.documents(spark, dir))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs dedup is forbidden:\n$plan")
  }

  test("parquet scan prunes columns for narrow projections") {
    val df = graft.sources.Tables.lineitem(spark, dir)
      .select("l_returnflag").groupBy("l_returnflag").count()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_returnflag:string>"),
      s"expected pruned ReadSchema:\n$scan")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = graft.sources.Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.contains("EqualTo(o_orderstatus,F)"),
      s"expected pushed filter:\n$scan")
  }
}
