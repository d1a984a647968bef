package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg
import graft.functions.TopKAgg.{Scored, TopBuf}
import graft.sources.Tables

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("reduce keeps the k best with deterministic ties and merge is order-insensitive") {
    val agg = new TopKAgg.TopK(3)
    val rows = Seq(Scored(5, 9), Scored(5, 2), Scored(7, 1), Scored(1, 1), Scored(7, 8))
    val sequential = rows.foldLeft(agg.zero)(agg.reduce)
    assert(sequential.rows === Seq(Scored(7, 1), Scored(7, 8), Scored(5, 2)))
    val (l, r) = rows.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged === sequential)
    // fast path: a row worse than the current k-th leaves the buffer as-is
    assert(agg.reduce(sequential, Scored(0, 0)) eq sequential)
  }

  test("aggregator result equals the window-rank form") {
    val docs = Tables.documents(spark, dir)
    val viaAgg = docs.groupBy("lang")
      .agg(TopKAgg.topK(4)(col("n_chars"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top.rows")))
      .select(col("lang"), col("col.id").as("doc_id"),
        (col("pos") + 1).as("rk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = docs
      .select(col("lang"), col("doc_id"), row_number().over(w).as("rk"))
      .where(col("rk") <= 4)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("aggregation is partial: both partial and final stages appear in the plan") {
    val df = Tables.documents(spark, dir).groupBy("lang")
      .agg(TopKAgg.topK(3)(col("n_chars"), col("doc_id")).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
  }
}
