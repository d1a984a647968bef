package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.Tables

/** Graph analytics over relationship structure derived from the star
  * schema — the "who trades with whom" graph (customer↔supplier via
  * shared orders). Complements the connected-components machinery
  * (d10/d11) with a weighted-importance fixpoint.
  *
  * CROSS-ENGINE FLOAT DISCIPLINE (both queries): per-edge
  * contributions are a single double division, contribution SUMS are
  * routed through DECIMAL(30,15) (exact, order-free), and every
  * constant is written as the same literal arithmetic the Spark side
  * constant-folds — IEEE 1.0 − 0.85 is 0.15000000000000002, not 0.15
  * — so ranks are bit-identical across engines.
  */
object GraphQueries {

  /** The shared trade graph: customers (2k) and suppliers (2k+1) that
    * share at least one order; both edge directions present.
    */
  private def tradeEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e0 = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Edge list + degree + node count, shared by both oracles. */
  private val oracleGraph =
    """WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), sym AS MATERIALIZED (
      |  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
      |), deg AS MATERIALIZED (
      |  SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src
      |), nn AS (
      |  SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS n FROM sym
      |)""".stripMargin

  /** One UNSCALED round (r' = (1−d)/N + d·Σ r/outdeg) as a chained
    * CTE — the recurrence Graph.pageRankConverged runs. The graph is
    * symmetric, so every node has in-edges and the inner join loses
    * nothing (the operator's dangling-zeros union adds exact DECIMAL
    * zeros — bit-identical).
    */
  private def unscaledRound(prev: String, out: String): String =
    s""", $out AS MATERIALIZED (
       |  SELECT sym.dst AS node,
       |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
       |      + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST($prev.r / deg.outdeg AS DECIMAL(30,15))) AS DOUBLE) AS r
       |  FROM sym JOIN deg ON deg.src = sym.src
       |  JOIN $prev ON $prev.node = sym.src
       |  GROUP BY sym.dst
       |)""".stripMargin

  /** One SCALE-FREE round (s' = (1−d) + d·Σ s/outdeg; s = N·rank) —
    * the recurrence Graph.pageRankSymmetric runs.
    */
  private def scaledRound(prev: String, out: String): String =
    s""", $out AS MATERIALIZED (
       |  SELECT sym.dst AS node,
       |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
       |      + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST($prev.s / deg.outdeg AS DECIMAL(30,15))) AS DOUBLE) AS s
       |  FROM sym JOIN deg ON deg.src = sym.src
       |  JOIN $prev ON $prev.node = sym.src
       |  GROUP BY sym.dst
       |)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---- damped PageRank, 3 fixed iterations ----
    // Scale-free iteration (s = N·rank, divided by N once at the end
    // — see Graph.pageRankSymmetric): three jobs, one exchange per
    // round, no driver-side count, round 1 straight off the edge
    // table (s⁰ ≡ 1 needs no rank join). The oracle replays the
    // identical arithmetic round by round.
    QueryDef("g1_pagerank",
      oracleGraph +
        """, s1 AS (
          |  SELECT sym.dst AS node,
          |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
          |      + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST(CAST(1 AS DOUBLE) / deg.outdeg AS DECIMAL(30,15))) AS DOUBLE) AS s
          |  FROM sym JOIN deg ON deg.src = sym.src
          |  GROUP BY sym.dst
          |)""".stripMargin +
        scaledRound("s1", "s2") + scaledRound("s2", "s3") +
        """
          |SELECT node, CAST(floor(CAST(1000000000 AS DOUBLE) * (s / (SELECT n FROM nn))) AS BIGINT) AS rank_bp
          |FROM s3 ORDER BY rank_bp DESC, node LIMIT 50""".stripMargin) { (s, dir) =>
      Graph.pageRankSymmetric(tradeEdges(s, dir), iters = 3, damping = 0.85)
        .select(col("node"),
          floor(lit(1000000000.0) * col("r")).cast("long").as("rank_bp"))
        .orderBy(col("rank_bp").desc, col("node"))
        .limit(50)
    },

    // ---- damped PageRank, iterated to a convergence tolerance ----
    // The loop-control path, correctness-gated: pageRankConverged
    // stops at the first 3-round block boundary where
    // max |rank − rank_prev_block| < tol. The oracle replays every
    // round to maxIters as chained CTEs, reproduces the block
    // deltas, picks the same first-converged boundary k*, and
    // returns that iteration's ranks plus iters_run = k* — so the
    // stopping decision itself is hash-checked, not just the ranks.
    QueryDef("g2_pagerank_converged", {
      val rounds = unscaledRound("r0", "r1") +
        (2 to 12).map(i => unscaledRound(s"r${i - 1}", s"r$i")).mkString
      oracleGraph +
        """, r0 AS MATERIALIZED (
          |  SELECT DISTINCT src AS node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r FROM sym
          |)""".stripMargin +
        rounds +
        """, deltas AS (
          |  SELECT 3 AS k, MAX(abs(r3.r - r0.r)) AS delta FROM r3 JOIN r0 ON r3.node = r0.node
          |  UNION ALL
          |  SELECT 6, MAX(abs(r6.r - r3.r)) FROM r6 JOIN r3 ON r6.node = r3.node
          |  UNION ALL
          |  SELECT 9, MAX(abs(r9.r - r6.r)) FROM r9 JOIN r6 ON r9.node = r6.node
          |  UNION ALL
          |  SELECT 12, MAX(abs(r12.r - r9.r)) FROM r12 JOIN r9 ON r12.node = r9.node
          |), kstar AS (
          |  SELECT coalesce(MIN(k), 12) AS k FROM deltas WHERE delta < CAST(0.003 AS DOUBLE)
          |), allr AS (
          |  SELECT 3 AS k, node, r FROM r3 UNION ALL SELECT 6, node, r FROM r6
          |  UNION ALL SELECT 9, node, r FROM r9 UNION ALL SELECT 12, node, r FROM r12
          |)
          |SELECT node,
          |  CAST(floor(CAST(1000000000 AS DOUBLE) * r) AS BIGINT) AS rank_bp,
          |  CAST((SELECT k FROM kstar) AS INT) AS iters_run
          |FROM allr WHERE k = (SELECT k FROM kstar)
          |ORDER BY rank_bp DESC, node LIMIT 50""".stripMargin
    }) { (s, dir) =>
      Graph.pageRankConverged(tradeEdges(s, dir), tol = 0.003,
          maxIters = 12, damping = 0.85, checkEvery = 3,
          // tradeEdges feeds both directions — the symmetric prepare
          // skips the node-set union/materialization and the per-round
          // dangling-zeros union (bit-identical: exact DECIMAL zeros)
          symmetric = true)
        .select(col("node"),
          floor(lit(1000000000.0) * col("r")).cast("long").as("rank_bp"),
          col("iters_run").cast("int").as("iters_run"))
        .orderBy(col("rank_bp").desc, col("node"))
        .limit(50)
    },

    // ---- exact triangle counting (degree-ordered orientation) ----
    // The trade graph above is BIPARTITE (customers ⋈ suppliers), so
    // it is triangle-free by construction; triangles live on the
    // supplier CO-OCCURRENCE graph — suppliers fulfilling high-volume
    // line items (l_quantity ≥ 45, a pushed-down scan predicate) of
    // the same order. The operator orients each edge from its
    // lower-(degree, id) endpoint and counts each triangle once at
    // its lowest-rank corner (O(m^{3/2}) wedge volume, hub-safe —
    // Graph.triangleCounts); the oracle counts the same triangles
    // with the textbook three-way self-join on a < b < c, a shape
    // that is only viable at oracle scale. Counts are integers, so
    // the comparison is exact.
    QueryDef("g3_triangle_count",
      """WITH su AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem WHERE l_quantity >= 45
        |), e AS (
        |  SELECT DISTINCT x.sk AS a, y.sk AS b
        |  FROM su x JOIN su y ON x.ok = y.ok AND x.sk < y.sk
        |), tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), corners AS (
        |  SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri
        |)
        |SELECT node AS suppkey, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM corners GROUP BY node
        |ORDER BY n_tri DESC, suppkey LIMIT 50""".stripMargin) { (s, dir) =>
      val su = Tables.lineitem(s, dir)
        .where(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = su.select(col("ok"), col("sk").as("a"))
        .join(su.select(col("ok"), col("sk").as("b")), Seq("ok"))
        .where(col("a") < col("b"))
        .select("a", "b").distinct()
      Graph.triangleCounts(edges)
        .select(col("node").as("suppkey"), col("n_tri"))
        .orderBy(col("n_tri").desc, col("suppkey"))
        .limit(50)
    })
}
