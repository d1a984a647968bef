package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.fixtures.Tutorial
import graft.operators.Hierarchy

/** Reference-parity queries on the tutorial's own dataset (7 hierarchy
  * nodes, 8 fact rows — reference: aggregation_example.sql:18-53,
  * :220-298). The oracle SQL is fully self-contained (VALUES CTEs), so
  * DuckDB recomputes the same semantics from scratch: recursive
  * dimension build, closure build, ROLLUP report, closure report.
  *
  * Sort order: deterministic zero-padded natural-key path (SURVEY.md
  * W1) on BOTH sides, replacing the reference's uuid-dependent
  * struct-render ordering (aggregation_example.sql:184,186).
  */
object TutorialQueries {

  /** Shared oracle prelude: nodes, derived attrs, recursive walk, dim. */
  private val nodesSql =
    """WITH RECURSIVE product_nodes(node_natural_key, node_name, level_name, parent_natural_key) AS (
      |  VALUES (0, 'All Products', 'Total Products', CAST(NULL AS INTEGER)),
      |         (10, 'Produce', 'Category', 0),
      |         (101, 'Spinach', 'UPC', 10),
      |         (102, 'Tomatoes', 'UPC', 10),
      |         (20, 'Candy', 'Category', 0),
      |         (201, 'Hershey Bar', 'UPC', 20),
      |         (202, 'Nerds', 'UPC', 20)
      |), nodes_temp AS (
      |  SELECT n.*,
      |         (n.parent_natural_key IS NULL) AS is_root,
      |         (n.node_natural_key NOT IN (SELECT parent_natural_key FROM product_nodes WHERE parent_natural_key IS NOT NULL)) AS is_leaf
      |  FROM product_nodes n
      |), walk AS (
      |  SELECT node_natural_key, node_name, level_name, parent_natural_key, is_root, is_leaf,
      |         1 AS level_number,
      |         lpad(CAST(node_natural_key AS VARCHAR), 12, '0') AS path_key,
      |         [{node_natural_key: node_natural_key, node_name: node_name, level_name: level_name, level_number: 1}] AS jpath,
      |         node_natural_key AS level_1_node_natural_key, node_name AS level_1_node_name, level_name AS level_1_level_name,
      |         CAST(NULL AS INTEGER) AS level_2_node_natural_key, CAST(NULL AS VARCHAR) AS level_2_node_name, CAST(NULL AS VARCHAR) AS level_2_level_name,
      |         CAST(NULL AS INTEGER) AS level_3_node_natural_key, CAST(NULL AS VARCHAR) AS level_3_node_name, CAST(NULL AS VARCHAR) AS level_3_level_name
      |    FROM nodes_temp WHERE parent_natural_key IS NULL
      |  UNION ALL
      |  SELECT c.node_natural_key, c.node_name, c.level_name, c.parent_natural_key, c.is_root, c.is_leaf,
      |         p.level_number + 1,
      |         p.path_key || '/' || lpad(CAST(c.node_natural_key AS VARCHAR), 12, '0'),
      |         array_append(p.jpath, {node_natural_key: c.node_natural_key, node_name: c.node_name, level_name: c.level_name, level_number: p.level_number + 1}),
      |         p.level_1_node_natural_key, p.level_1_node_name, p.level_1_level_name,
      |         CASE WHEN p.level_number + 1 = 2 THEN c.node_natural_key ELSE p.level_2_node_natural_key END,
      |         CASE WHEN p.level_number + 1 = 2 THEN c.node_name ELSE p.level_2_node_name END,
      |         CASE WHEN p.level_number + 1 = 2 THEN c.level_name ELSE p.level_2_level_name END,
      |         CASE WHEN p.level_number + 1 = 3 THEN c.node_natural_key ELSE p.level_3_node_natural_key END,
      |         CASE WHEN p.level_number + 1 = 3 THEN c.node_name ELSE p.level_3_node_name END,
      |         CASE WHEN p.level_number + 1 = 3 THEN c.level_name ELSE p.level_3_level_name END
      |    FROM nodes_temp c JOIN walk p ON c.parent_natural_key = p.node_natural_key
      |), dim AS (
      |  SELECT w.*, CAST(ROW_NUMBER() OVER (ORDER BY path_key ASC) AS BIGINT) AS node_sort_order FROM walk w
      |)""".stripMargin

  private val closureSql =
    """, closure AS (
      |  SELECT node_natural_key AS ancestor_node_natural_key, node_name AS ancestor_node_name, level_name AS ancestor_level_name,
      |         level_number AS ancestor_level_number, is_root AS ancestor_is_root, is_leaf AS ancestor_is_leaf, node_sort_order AS ancestor_node_sort_order,
      |         node_natural_key AS descendant_node_natural_key, node_name AS descendant_node_name, level_name AS descendant_level_name,
      |         level_number AS descendant_level_number, is_root AS descendant_is_root, is_leaf AS descendant_is_leaf, node_sort_order AS descendant_node_sort_order
      |    FROM dim
      |  UNION ALL
      |  SELECT p.ancestor_node_natural_key, p.ancestor_node_name, p.ancestor_level_name, p.ancestor_level_number,
      |         p.ancestor_is_root, p.ancestor_is_leaf, p.ancestor_node_sort_order,
      |         c.node_natural_key, c.node_name, c.level_name, c.level_number, c.is_root, c.is_leaf, c.node_sort_order
      |    FROM dim c JOIN closure p ON c.parent_natural_key = p.descendant_node_natural_key
      |)""".stripMargin

  private val factsSql =
    """, sales_facts(product_name, customer_id, date_id, unit_quantity, sales_amount) AS (
      |  VALUES ('Hershey Bar', 'Phil', DATE '2022-01-01', CAST(1 AS DECIMAL(18,3)), CAST(3.00 AS DECIMAL(18,3))),
      |         ('Hershey Bar', 'Lottie', DATE '2022-01-02', CAST(5 AS DECIMAL(18,3)), CAST(15.00 AS DECIMAL(18,3))),
      |         ('Nerds', 'Kalie', DATE '2022-01-02', CAST(2 AS DECIMAL(18,3)), CAST(5.00 AS DECIMAL(18,3))),
      |         ('Tomatoes', 'Phil', DATE '2022-01-02', CAST(2 AS DECIMAL(18,3)), CAST(2.00 AS DECIMAL(18,3))),
      |         ('Spinach', 'Popeye', DATE '2022-01-03', CAST(10 AS DECIMAL(18,3)), CAST(5.00 AS DECIMAL(18,3))),
      |         ('Spinach', 'Brutus', DATE '2022-01-04', CAST(1 AS DECIMAL(18,3)), CAST(0.50 AS DECIMAL(18,3))),
      |         ('Spinach', 'Lottie', DATE '2022-01-04', CAST(1 AS DECIMAL(18,3)), CAST(0.50 AS DECIMAL(18,3))),
      |         ('Spinach', 'Phil', DATE '2022-01-05', CAST(2 AS DECIMAL(18,3)), CAST(2.00 AS DECIMAL(18,3)))
      |), facts AS (
      |  SELECT n.node_natural_key AS product_id, f.customer_id, f.date_id, f.unit_quantity, f.sales_amount
      |    FROM sales_facts f JOIN product_nodes n ON f.product_name = n.node_name
      |)""".stripMargin

  private val dimOutputCols = Seq(
    "node_natural_key", "node_name", "level_name", "level_number",
    "is_root", "is_leaf", "node_sort_order") ++
    (1 to 3).flatMap(i => Seq(s"level_${i}_node_natural_key",
      s"level_${i}_node_name", s"level_${i}_level_name"))

  // -- Spark-side builders, materialized once per session (the Spark
  // analogue of the reference's CTAS dims, aggregation_example.sql:86,351).

  private def nodes(s: SparkSession): DataFrame =
    graft.sources.SessionCache.getOrElseUpdate(s, "t_nodes")(
      Tutorial.productNodes(s))

  private def reportingDim(s: SparkSession): DataFrame =
    graft.sources.SessionCache.getOrElseUpdate(s, "t_reporting")(
      Hierarchy.buildReportingDim(nodes(s), levels = 3).localCheckpoint(true))

  private def closureDim(s: SparkSession): DataFrame =
    graft.sources.SessionCache.getOrElseUpdate(s, "t_closure")(
      Hierarchy.buildClosureDim(reportingDim(s)).localCheckpoint(true))

  private def reportAggs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "sum_sales_amount" -> sum(col("sales_amount")).cast("double"),
    "sum_unit_quantity" -> sum(col("unit_quantity")).cast("double"),
    "distinct_customer_count" -> countDistinct(col("customer_id")),
    "count_of_fact_records" -> count(lit(1)))

  val all: Seq[QueryDef] = Seq(
    // The tutorial's node ids are uuid() defaults (reference
    // aggregation_example.sql:3-4, SURVEY P9) — non-deterministic by
    // design — so the struct-parity columns here are the ID-FREE
    // projections of node_json / node_json_path (the deterministic
    // fields the reference structs carry beyond the ids); h1 checks
    // the full structs where ids are natural keys.
    QueryDef("t1_reporting_dim",
      nodesSql +
        """
          |SELECT node_natural_key, node_name, level_name, level_number, is_root, is_leaf, node_sort_order,
          |       CAST(to_json({node_natural_key: node_natural_key, node_name: node_name, level_name: level_name,
          |         is_root: is_root, is_leaf: is_leaf, level_number: level_number, node_sort_order: node_sort_order}) AS VARCHAR) AS node_json,
          |       CAST(to_json(jpath) AS VARCHAR) AS node_json_path,
          |       level_1_node_natural_key, level_1_node_name, level_1_level_name,
          |       level_2_node_natural_key, level_2_node_name, level_2_level_name,
          |       level_3_node_natural_key, level_3_node_name, level_3_level_name
          |FROM dim ORDER BY node_sort_order""".stripMargin) { (s, _) =>
      reportingDim(s)
        .withColumn("node_json", to_json(struct(
          col("node_natural_key"), col("node_name"), col("level_name"),
          col("is_root"), col("is_leaf"), col("level_number"),
          col("node_sort_order")), Map("ignoreNullFields" -> "false")))
        .withColumn("node_json_path", to_json(
          transform(col("node_json_path"), p => struct(
            p.getField("node_natural_key").as("node_natural_key"),
            p.getField("node_name").as("node_name"),
            p.getField("level_name").as("level_name"),
            p.getField("level_number").as("level_number"))),
          Map("ignoreNullFields" -> "false")))
        .select((dimOutputCols ++ Seq("node_json", "node_json_path")).map(col): _*)
        .orderBy("node_sort_order")
    },

    QueryDef("t2_closure_dim",
      nodesSql + closureSql +
        """
          |SELECT ancestor_node_natural_key, ancestor_node_name, ancestor_level_name, ancestor_level_number,
          |       ancestor_is_root, ancestor_is_leaf, ancestor_node_sort_order,
          |       descendant_node_natural_key, descendant_node_name, descendant_level_name, descendant_level_number,
          |       descendant_is_root, descendant_is_leaf, descendant_node_sort_order,
          |       descendant_level_number - ancestor_level_number AS net_level
          |FROM closure ORDER BY ancestor_node_sort_order, descendant_node_sort_order""".stripMargin) { (s, _) =>
      closureDim(s)
        .orderBy("ancestor_node_sort_order", "descendant_node_sort_order")
    },

    QueryDef("t3_rollup_report",
      nodesSql + factsSql +
        """, ra AS (
          |  SELECT CASE WHEN GROUPING(d.level_3_node_natural_key) = 0 THEN d.level_3_node_natural_key
          |              WHEN GROUPING(d.level_2_node_natural_key) = 0 THEN d.level_2_node_natural_key
          |              WHEN GROUPING(d.level_1_node_natural_key) = 0 THEN d.level_1_node_natural_key END AS product_node_key,
          |         CAST(SUM(f.sales_amount) AS DOUBLE) AS sum_sales_amount,
          |         CAST(SUM(f.unit_quantity) AS DOUBLE) AS sum_unit_quantity,
          |         COUNT(DISTINCT f.customer_id) AS distinct_customer_count,
          |         COUNT(*) AS count_of_fact_records
          |    FROM facts f JOIN dim d ON f.product_id = d.node_natural_key
          |   GROUP BY ROLLUP (d.level_1_node_natural_key, d.level_2_node_natural_key, d.level_3_node_natural_key)
          |  HAVING NOT GROUPING(d.level_1_node_natural_key) = 1
          |)
          |SELECT lpad('-', (d.level_number - 1) * 7, '-') || d.level_name AS product_level_name,
          |       lpad('-', (d.level_number - 1) * 7, '-') || d.node_name AS product_node_name,
          |       ra.sum_sales_amount, ra.sum_unit_quantity, ra.distinct_customer_count, ra.count_of_fact_records,
          |       d.node_sort_order
          |  FROM ra JOIN dim d ON ra.product_node_key = d.node_natural_key
          | ORDER BY d.node_sort_order""".stripMargin) { (s, _) =>
      val facts = Tutorial.salesFacts(s, nodes(s))
      Hierarchy.rollupReport(facts, reportingDim(s), col("product_id"),
        reportAggs, levels = 3)
    },

    QueryDef("t4_closure_report",
      nodesSql + closureSql + factsSql +
        """
          |SELECT lpad('-', (c.ancestor_level_number - 1) * 7, '-') || c.ancestor_level_name AS product_level_name,
          |       lpad('-', (c.ancestor_level_number - 1) * 7, '-') || c.ancestor_node_name AS product_node_name,
          |       CAST(SUM(f.sales_amount) AS DOUBLE) AS sum_sales_amount,
          |       CAST(SUM(f.unit_quantity) AS DOUBLE) AS sum_unit_quantity,
          |       COUNT(DISTINCT f.customer_id) AS distinct_customer_count,
          |       COUNT(*) AS count_of_fact_records,
          |       c.ancestor_node_sort_order
          |  FROM facts f JOIN closure c ON f.product_id = c.descendant_node_natural_key
          | GROUP BY c.ancestor_node_name, c.ancestor_level_name, c.ancestor_level_number, c.ancestor_node_sort_order
          | ORDER BY c.ancestor_node_sort_order""".stripMargin) { (s, _) =>
      val facts = Tutorial.salesFacts(s, nodes(s))
      Hierarchy.closureReport(facts, closureDim(s), col("product_id"), reportAggs)
    })
}
