package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.Tutorial
import graft.operators.Hierarchy

/** Golden tests against the reference tutorial dataset
  * (reference: aggregation_example.sql; expected values derived from
  * its seed data :18-53,:220-298 and golden CSV results/
  * product_reporting_dim_table_contents.csv — compared on natural
  * keys, never on generated uuids).
  */
class HierarchySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val nodes = Tutorial.productNodes(spark)
  private lazy val dim = Hierarchy.buildReportingDim(nodes, 3).localCheckpoint(true)
  private lazy val closure = Hierarchy.buildClosureDim(dim).localCheckpoint(true)

  test("reporting dim: 7 rows, correct levels and flags") {
    val rows = dim.select("node_natural_key", "node_name", "level_number",
      "is_root", "is_leaf").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4)))
      .toSet
    assert(rows == Set(
      (0, "All Products", 1, true, false),
      (10, "Produce", 2, false, false),
      (20, "Candy", 2, false, false),
      (101, "Spinach", 3, false, true),
      (102, "Tomatoes", 3, false, true),
      (201, "Hershey Bar", 3, false, true),
      (202, "Nerds", 3, false, true)))
  }

  test("reporting dim: node_sort_order is a valid deterministic DFS order") {
    val ordered = dim.orderBy("node_sort_order")
      .select("node_natural_key").collect().map(_.getInt(0)).toSeq
    // zero-padded natural-key path ⇒ Produce(10) before Candy(20)
    assert(ordered == Seq(0, 10, 101, 102, 20, 201, 202))
  }

  test("reporting dim: level columns hold the ancestor path, NULL below depth") {
    val spinach = dim.filter(col("node_name") === "Spinach").collect().head
    assert(spinach.getAs[Int]("level_1_node_natural_key") == 0)
    assert(spinach.getAs[Int]("level_2_node_natural_key") == 10)
    assert(spinach.getAs[Int]("level_3_node_natural_key") == 101)
    val root = dim.filter(col("node_name") === "All Products").collect().head
    assert(root.isNullAt(root.fieldIndex("level_2_node_natural_key")))
    assert(root.isNullAt(root.fieldIndex("level_3_node_natural_key")))
  }

  test("closure dim: 17 pairs = 7 self + 6 depth-1 + 4 depth-2") {
    assert(closure.count() == 17)
    assert(closure.filter(col("net_level") === 0).count() == 7)
    assert(closure.filter(col("net_level") === 1).count() == 6)
    assert(closure.filter(col("net_level") === 2).count() == 4)
    // every (ancestor, descendant) pair appears exactly once
    assert(closure.groupBy("ancestor_node_natural_key", "descendant_node_natural_key")
      .count().filter(col("count") > 1).isEmpty)
  }

  test("closure report: All Products row matches reference-derivable totals") {
    val facts = Tutorial.salesFacts(spark, nodes)
    val aggs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "sum_sales" -> sum(col("sales_amount")).cast("double"),
      "sum_units" -> sum(col("unit_quantity")).cast("double"),
      "n_cust" -> countDistinct(col("customer_id")),
      "n_facts" -> count(lit(1)))
    val rep = Hierarchy.closureReport(facts, closure, col("product_id"), aggs)
    val top = rep.orderBy("ancestor_node_sort_order").collect().head
    assert(top.getAs[Double]("sum_sales") == 33.0)
    assert(top.getAs[Double]("sum_units") == 24.0)
    assert(top.getAs[Long]("n_cust") == 5L)
    assert(top.getAs[Long]("n_facts") == 8L)
  }

  test("rollup report equals closure report on all shared levels") {
    val facts = Tutorial.salesFacts(spark, nodes)
    val aggs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "sum_sales" -> sum(col("sales_amount")).cast("double"),
      "n_cust" -> countDistinct(col("customer_id")),
      "n_facts" -> count(lit(1)))
    val ro = Hierarchy.rollupReport(facts, dim, col("product_id"), aggs, 3)
      .select("product_node_name", "sum_sales", "n_cust", "n_facts")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    val cl = Hierarchy.closureReport(facts, closure, col("product_id"), aggs)
      .select("product_node_name", "sum_sales", "n_cust", "n_facts")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(ro == cl)
  }

  test("closure report row equals direct subtree aggregate (Candy)") {
    val facts = Tutorial.salesFacts(spark, nodes)
    val aggs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "sum_sales" -> sum(col("sales_amount")).cast("double"),
      "n_cust" -> countDistinct(col("customer_id")))
    val rep = Hierarchy.closureReport(facts, closure, col("product_id"), aggs)
    val candy = rep.filter(col("product_node_name").endsWith("Candy")).collect().head
    // Candy subtree = Hershey Bar (3+15, Phil+Lottie) + Nerds (5, Kalie)
    assert(candy.getAs[Double]("sum_sales") == 23.0)
    assert(candy.getAs[Long]("n_cust") == 3L)
  }
}
