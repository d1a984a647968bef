package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.Tables

/** Graph analytics over relationship structure derived from the star
  * schema — the "who trades with whom" graph (customer↔supplier via
  * shared orders). Complements the connected-components machinery
  * (d10/d11) with a weighted-importance fixpoint.
  */
object GraphQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- damped PageRank, 3 fixed iterations ----
    // Nodes: customers (2k) and suppliers (2k+1) that share at least
    // one order; edges symmetric. The oracle replays the identical
    // 3 rounds as chained CTEs — every constant CAST to DOUBLE and
    // every contribution SUM routed through DECIMAL(30,15), so ranks
    // are bit-identical and the basis-point floor is hash-stable.
    // (1-d)/N is written as literal subtraction on BOTH engines:
    // 1.0 - 0.85 is 0.15000000000000002 in IEEE, not 0.15.
    QueryDef("g1_pagerank",
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), sym AS (
        |  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
        |), nodes AS (
        |  SELECT DISTINCT src AS node FROM sym
        |), nn AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
        |), deg AS (
        |  SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src
        |), r0 AS (
        |  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r FROM nodes
        |), r1 AS (
        |  SELECT nodes.node,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE) * CAST(coalesce(SUM(CAST(r0.r / deg.outdeg AS DECIMAL(30,15))), 0) AS DOUBLE) AS r
        |  FROM nodes LEFT JOIN sym ON sym.dst = nodes.node
        |    LEFT JOIN deg ON deg.src = sym.src
        |    LEFT JOIN r0 ON r0.node = sym.src
        |  GROUP BY nodes.node
        |), r2 AS (
        |  SELECT nodes.node,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE) * CAST(coalesce(SUM(CAST(r1.r / deg.outdeg AS DECIMAL(30,15))), 0) AS DOUBLE) AS r
        |  FROM nodes LEFT JOIN sym ON sym.dst = nodes.node
        |    LEFT JOIN deg ON deg.src = sym.src
        |    LEFT JOIN r1 ON r1.node = sym.src
        |  GROUP BY nodes.node
        |), r3 AS (
        |  SELECT nodes.node,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE) * CAST(coalesce(SUM(CAST(r2.r / deg.outdeg AS DECIMAL(30,15))), 0) AS DOUBLE) AS r
        |  FROM nodes LEFT JOIN sym ON sym.dst = nodes.node
        |    LEFT JOIN deg ON deg.src = sym.src
        |    LEFT JOIN r2 ON r2.node = sym.src
        |  GROUP BY nodes.node
        |)
        |SELECT node, CAST(floor(CAST(1000000000 AS DOUBLE) * r) AS BIGINT) AS rank_bp
        |FROM r3 ORDER BY rank_bp DESC, node LIMIT 50""".stripMargin) { (s, dir) =>
      val e0 = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      Graph.pageRank(sym, iters = 3, damping = 0.85, symmetric = true)
        .select(col("node"),
          floor(lit(1000000000.0) * col("r")).cast("long").as("rank_bp"))
        .orderBy(col("rank_bp").desc, col("node"))
        .limit(50)
    })
}
