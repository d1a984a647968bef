package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** The relational operator surface (SURVEY.md §2.2-2.7) exercised on
  * the TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Numeric parity discipline (see QueryDef scaladoc): exact decimal
  * aggregation, DOUBLE only at the end; divisions in double after;
  * counts BIGINT; deterministic ORDER BY everywhere.
  *
  * Scale notes per query are in each entry's comment; the common rules:
  * dims (region/nation/part/customer) broadcast, fact-side shuffles
  * only for aggregation keys, filters/pruning pushed to the parquet
  * scan by Catalyst.
  */
object CoreQueries {

  private val dec18_2 = DecimalType(18, 2)
  private val dec12_2 = DecimalType(12, 2)
  private val dec4_2 = DecimalType(4, 2)

  /** orders enriched with geography for the cube/grouping-sets reports:
    * all three dims broadcast (they stay dim-sized at any sf).
    */
  private def cubeBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))

  val all: Seq[QueryDef] = Seq(

    // ---- q01: TPC-H Q1-shaped pricing summary (A1 A3 A7 P7 O2) ----
    // One shuffle (groupBy); filter + column pruning reach the scan.
    QueryDef("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val ep = col("l_extendedprice").cast(dec12_2)
      val disc = (lit(1) - col("l_discount")).cast(dec4_2)
      val tax = (lit(1) + col("l_tax")).cast(dec4_2)
      Tables.lineitem(s, dir)
        // raw-column comparison (≡ to_date(l_shipdate) <= 1999-12-31) so
        // the predicate pushes to the parquet scan; a to_date() wrapper
        // would block pushdown
        .filter(col("l_shipdate") < lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec18_2)).cast("double").as("sum_qty"),
          sum(ep).cast("double").as("sum_base_price"),
          sum(ep * disc).cast("double").as("sum_disc_price"),
          sum(ep * disc * tax).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- q02: filter + projection + top-k (P1 P3 P4 O1 O4) ----
    // Sort+limit plans as TakeOrderedAndProject — no full sort at scale.
    QueryDef("q02_filter_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          // dates travel as ISO strings: parquet date32 vs DuckDB DATE
          // compare type-ambiguously through pandas
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ---- q03: CASE WHEN bucketing (P5 P8) ----
    QueryDef("q03_case_buckets",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS price_bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY price_bucket""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("price_bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("price_bucket")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec18_2)).cast("double").as("sum_price"))
        .orderBy("price_bucket")
    },

    // ---- q04: broadcast dim join + agg (J1) ----
    QueryDef("q04_join_agg",
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(DISTINCT l_partkey) AS distinct_parts,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(col("l_quantity").cast(dec18_2)).cast("double").as("sum_qty"),
          countDistinct(col("l_partkey")).as("distinct_parts"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },

    // ---- q05: star-schema multi-join (J1-J4 shape) ----
    // lineitem⋈orders shuffles on the key; customer/nation/region broadcast.
    QueryDef("q05_star_join",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(col("l_extendedprice").cast(dec12_2) *
            (lit(1) - col("l_discount")).cast(dec4_2)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // ---- q06: left-semi join / IN-subquery (P6 J7) ----
    QueryDef("q06_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- q07: left-anti join / NOT EXISTS ----
    QueryDef("q07_anti_join",
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // ---- q08: ROLLUP + GROUPING outside the hierarchy module (A4 A5) ----
    QueryDef("q08_rollup_region",
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal,
        |  COUNT(*) AS n_customers,
        |  CAST(GROUPING(r_name) AS INTEGER) AS g_region,
        |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_region, g_nation, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("c_acctbal").cast(dec12_2)).cast("double").as("sum_acctbal"),
          count(lit(1)).as("n_customers"),
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("n_name")).cast("int").as("g_nation"))
        .orderBy(col("g_region"), col("g_nation"),
          col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    // ---- q09: partitioned window ranking (W2) ----
    QueryDef("q09_window_rank",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    // ---- q10: exact distinct aggregation (A2) ----
    QueryDef("q10_distinct_agg",
      """SELECT c_nationkey,
        |  COUNT(DISTINCT c_mktsegment) AS n_segments,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_nationkey")
        .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(dec12_2)).cast("double").as("sum_acctbal"))
        .orderBy("c_nationkey")
    },

    // ---- q11: uncorrelated scalar subquery (J5) ----
    // Spark shape: single-row aggregate cross-joined (broadcast) into the
    // filter — the distributed equivalent of a scalar subquery.
    QueryDef("q11_scalar_subquery",
      """SELECT COUNT(*) AS n_above,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_above
        |FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val avgDf = orders.agg(
        (sum(col("o_totalprice").cast(dec18_2)).cast("double") / count(lit(1)))
          .as("avg_price"))
      orders.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
        .agg(count(lit(1)).as("n_above"),
          sum(col("o_totalprice").cast(dec18_2)).cast("double").as("sum_above"))
    },

    // ---- q12: UNION / INTERSECT / EXCEPT (O5 O6) ----
    QueryDef("q12_set_ops",
      """SELECT o_custkey FROM (
        |  SELECT * FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    UNION
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        |  EXCEPT
        |  SELECT * FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'))
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val a = orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val b = orders.filter(col("o_orderpriority") === "2-HIGH").select("o_custkey")
      a.union(b).distinct().except(a.intersect(b)).orderBy("o_custkey")
    },

    // ---- q13: SELECT * EXCLUDE ≡ .drop (P2) ----
    QueryDef("q13_exclude_cols",
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).drop("c_acctbal").orderBy("c_custkey")
    },

    // ---- q14: string functions (F1 F2 F3) ----
    QueryDef("q14_string_funcs",
      """SELECT n_nationkey,
        |  lpad('-', (n_nationkey % 5) * 2, '-') || upper(n_name) AS indented_name,
        |  replace(n_name, '_', '-') AS dashed_name,
        |  substring(n_name, 1, 3) AS name3,
        |  CAST(length(n_name) AS BIGINT) AS name_len
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      Tables.nation(s, dir).select(
        col("n_nationkey"),
        concat(expr("lpad('-', (n_nationkey % 5) * 2, '-')"),
          upper(col("n_name"))).as("indented_name"),
        regexp_replace(col("n_name"), "_", "-").as("dashed_name"),
        substring(col("n_name"), 1, 3).as("name3"),
        length(col("n_name")).cast("long").as("name_len"))
        .orderBy("n_nationkey")
    },

    // ---- q15: date truncation + monthly aggregation (F5) ----
    QueryDef("q15_monthly_revenue",
      """SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("order_month",
          date_format(trunc(to_date(col("o_orderdate")), "month"), "yyyy-MM-dd"))
        .groupBy("order_month")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec18_2)).cast("double").as("revenue"))
        .orderBy("order_month")
    },

    // ---- q16: struct/array construction + 1-based access (F6 F7 F8 F9) ----
    // The Spark side genuinely builds the struct path and extracts from
    // it; the oracle states the equivalent flat result.
    QueryDef("q16_struct_array",
      """SELECT n_nationkey, r_name AS region_name, n_name AS nation_name,
        |  CAST(2 AS INTEGER) AS path_len, CAST(NULL AS VARCHAR) AS beyond_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val joined = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      val path = array_append(
        array(struct(col("r_name").as("nm"), lit("region").as("kind"))),
        struct(col("n_name").as("nm"), lit("nation").as("kind")))
      joined.select(
        col("n_nationkey"),
        element_at(path, 1).getField("nm").as("region_name"),
        element_at(path, 2).getField("nm").as("nation_name"),
        size(path).as("path_len"),
        try_element_at(path, lit(3)).getField("nm").as("beyond_name"))
        .orderBy("n_nationkey")
    },

    // ---- q24: CUBE over 3 keys = 2^3 grouping sets (A4 generalized) ----
    // grouping_set_id is Spark's grouping_id bit order (first key =
    // most significant); the oracle reconstructs the same bitmask from
    // DuckDB's per-column GROUPING().
    QueryDef("q24_cube_report",
      """SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
        |  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(4*GROUPING(r_name) + 2*GROUPING(n_name) + GROUPING(o_orderpriority) AS BIGINT) AS grouping_set_id
        |FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, n_name, o_orderpriority)
        |ORDER BY grouping_set_id, r_name, n_name, o_orderpriority""".stripMargin) { (s, dir) =>
      graft.operators.GroupingOps.cubeReport(
        cubeBase(s, dir), Seq("r_name", "n_name", "o_orderpriority"),
        Seq("n_orders" -> count(lit(1)),
          "revenue" -> sum(col("o_totalprice").cast(dec18_2)).cast("double")))
        .orderBy("grouping_set_id", "r_name", "n_name", "o_orderpriority")
    },

    // ---- q25: explicit GROUPING SETS — only the requested sets ----
    QueryDef("q25_grouping_sets",
      """SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(2*GROUPING(r_name) + GROUPING(o_orderpriority) AS BIGINT) AS grouping_set_id
        |FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())
        |ORDER BY grouping_set_id, r_name, o_orderpriority""".stripMargin) { (s, dir) =>
      graft.operators.GroupingOps.groupingSetsReport(
        cubeBase(s, dir), Seq("r_name", "o_orderpriority"),
        Seq(Seq(0, 1), Seq(0), Seq()),
        Seq("n_orders" -> count(lit(1)),
          "revenue" -> sum(col("o_totalprice").cast(dec18_2)).cast("double")))
        .orderBy("grouping_set_id", "r_name", "o_orderpriority")
    },

    // ---- q19: global window / deterministic global ordering (W1 O3) ----
    QueryDef("q19_global_rownum",
      """SELECT n_name, CAST(ROW_NUMBER() OVER (ORDER BY n_name ASC NULLS LAST) AS BIGINT) AS sort_order
        |FROM nation ORDER BY sort_order""".stripMargin) { (s, dir) =>
      Tables.nation(s, dir)
        .withColumn("sort_order",
          row_number().over(Window.orderBy(col("n_name").asc_nulls_last)).cast("long"))
        .select("n_name", "sort_order")
        .orderBy("sort_order")
    },

    // ---- q20: correlated scalar-aggregate subquery (TPC-H Q17) ----
    // Backfills the q-board's numbering hole with the one core
    // subquery shape the board lacked: a scalar aggregate CORRELATED
    // to the outer row (q11's scalar subquery is uncorrelated, q06's
    // IN is a semi-join). TPC-H Q17: revenue from small-quantity
    // orders, where "small" for each row means "below 1/5 of that
    // PART's average quantity". Spark-first decorrelation: filter
    // part to the brand (tiny → broadcast), semi-reduce lineitem to
    // the surviving parts with that one broadcast join, then compute
    // the per-part aggregate AND apply the per-row test on the same
    // exchange with a partkey-partitioned window — the classic
    // decorrelated form's second fact scan and self-join never
    // happen. Float discipline: l_quantity is integral, so
    //   qty < 0.2 * avg(qty)  ⟺  5 * qty * cnt < sum_qty
    // — every comparison BIGINT-exact on both engines (no 0.2 double
    // product whose last ulp could flip a row); the only division is
    // the final display /7.0, one double op on an exact decimal sum.
    QueryDef("q20_small_qty_revenue",
      """WITH sel AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#4'
        |), stats AS (
        |  SELECT l_partkey, qty, price,
        |    SUM(qty) OVER (PARTITION BY l_partkey) AS sum_qty,
        |    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
        |  FROM sel
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(COALESCE(SUM(price), 0) AS DOUBLE) AS revenue,
        |  CAST(COALESCE(SUM(price), 0) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM stats WHERE 5 * qty * cnt < sum_qty""".stripMargin) { (s, dir) =>
      val selParts = Tables.part(s, dir)
        .where(col("p_brand") === "Brand#4")
        .select(col("p_partkey"))
      val sel = Tables.lineitem(s, dir)
        .join(broadcast(selParts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          col("l_extendedprice").cast(dec12_2).as("price"))
      val wp = Window.partitionBy("l_partkey")
      sel
        .withColumn("sum_qty", sum("qty").over(wp))
        .withColumn("cnt", count(lit(1)).over(wp))
        .where(lit(5L) * col("qty") * col("cnt") < col("sum_qty"))
        .agg(count(lit(1)).as("n_items"),
          coalesce(sum("price"), lit(0).cast(dec12_2)).cast("double")
            .as("revenue"))
        .select(col("n_items"), col("revenue"),
          (col("revenue") / lit(7.0)).as("avg_yearly"))
    },

    // ---- q40: FULL OUTER join of two aggregates ----
    // Nations with high-balance customers vs high-balance suppliers:
    // the supplier side is sparse (most nations lack one), so genuine
    // one-sided rows exercise the outer semantics; counts stay NULL
    // (not coalesced) to pin NULL-vs-0 behavior across engines. Both
    // inputs aggregate BEFORE the join — outer-joining raw tables and
    // aggregating after would break the null-extension semantics and
    // shuffle far more rows.
    QueryDef("q40_full_outer",
      """WITH c AS (
        |  SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
        |  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
        |), s AS (
        |  SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp
        |  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
        |)
        |SELECT coalesce(c.k, s.k) AS nationkey, c.n_cust, s.n_supp
        |FROM c FULL OUTER JOIN s ON c.k = s.k
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).where(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
      val sp = Tables.supplier(s, dir).where(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          col("n_cust"), col("n_supp"))
        .orderBy("nationkey")
    },

    // ---- q44: bilateral volume shipping (TPC-H Q7 shape) ----
    // Revenue flowing between two specific nations, split by direction
    // and ship year. The two nation dims broadcast with their name
    // filters PUSHED (each side prunes to one key before the join);
    // lineitem⋈orders is the only shuffle; the year comes from the
    // raw timestamp (no to_date wrapper — keeps the scan pushable).
    QueryDef("q44_volume_shipping",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val n1 = broadcast(Tables.nation(s, dir)
        .where(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, dir)
        .where(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("l_extendedprice").cast(dec12_2) *
            (lit(1) - col("l_discount")).cast(dec4_2)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ---- q45: national market share within a region (TPC-H Q8 shape) ----
    // NATION_3 suppliers' share of all revenue to EUROPE customers per
    // order year, in exact basis points: volumes ride as BIGINT
    // ten-thousandths (DECIMAL(17,4)·10⁴ — integer-exact in both
    // engines, no double-sum drift in the ratio), so the share is an
    // integer division, not a float. Same one-shuffle star shape as
    // q05/q44; the CASE runs scan-side before the aggregate.
    QueryDef("q45_market_share",
      """WITH base AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT) AS vol4,
        |    CASE WHEN sn.n_name = 'NATION_3'
        |         THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT)
        |         ELSE 0 END AS nat4
        |  FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation cn ON c_nationkey = cn.n_nationkey
        |    JOIN region ON cn.n_regionkey = r_regionkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'EUROPE'
        |)
        |SELECT o_year, CAST(SUM(nat4) AS BIGINT) AS nation_vol4,
        |  CAST(SUM(vol4) AS BIGINT) AS total_vol4,
        |  CAST((10000 * SUM(nat4)) // SUM(vol4) AS BIGINT) AS share_bp
        |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
      val cn = broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey")))
      val sn = broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val eu = broadcast(Tables.region(s, dir).where(col("r_name") === "EUROPE")
        .select("r_regionkey"))
      val vol4 = (col("l_extendedprice").cast(dec12_2) *
        (lit(1) - col("l_discount")).cast(dec4_2) * lit(10000)).cast("long")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(cn, col("c_nationkey") === col("c_nk"))
        .join(eu, col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(sn, col("s_nationkey") === col("s_nk"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          vol4.as("vol4"),
          when(col("supp_nation") === "NATION_3", vol4).otherwise(lit(0L)).as("nat4"))
        .groupBy("o_year")
        .agg(sum("nat4").as("nation_vol4"), sum("vol4").as("total_vol4"))
        .select(col("o_year"), col("nation_vol4"), col("total_vol4"),
          expr("(10000 * nation_vol4) div total_vol4").as("share_bp"))
        .orderBy("o_year")
    },

    // ---- q47: bloom-filter pre-shuffle semi-join prune ----
    // The runtime row-level filter a 100 TB shuffle join needs when
    // the dim key-set is too big to broadcast as ROWS but fits as
    // BITS: build a bloom over the filtered supplier keys (one-pass
    // mergeable aggregate, functions/Bloom.scala), collect the blob
    // (control-plane: 16 KiB here; a few MiB even for 10⁷ keys),
    // probe it SCAN-SIDE with the native codegen expression so the
    // exchange only carries probable matches, then run the EXACT
    // semi join (deliberately SHUFFLE_HASH — modeling the at-scale
    // plan where the dim outgrows a broadcast; on a broadcast-able
    // dim the prune is redundant, not wrong). False positives die in
    // the real join; false negatives are impossible — the bloom
    // changes shuffle BYTES, never results, which is why the oracle
    // is a plain IN-subquery.
    QueryDef("q47_bloom_semi",
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(month(l_shipdate) AS BIGINT) AS l_month,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_suppkey IN (
        |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_4')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.functions.BloomMightContain.register(s)
      val suppKeys = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .where(col("n_name") === "NATION_4").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").cast("long").as("sk"))
      val blob = suppKeys
        .agg(graft.functions.Bloom.bloomAgg(col("sk"), 1 << 17, 7).as("b"))
        .head.getAs[Array[Byte]](0)
      Tables.lineitem(s, dir)
        .where(call_function("bloom_might_contain",
          lit(blob), col("l_suppkey").cast("long")))
        .join(suppKeys.hint("shuffle_hash"),
          col("l_suppkey").cast("long") === col("sk"), "left_semi")
        .groupBy(year(col("l_shipdate")).cast("long").as("l_year"),
          month(col("l_shipdate")).cast("long").as("l_month"))
        .agg(sum(col("l_extendedprice").cast(dec12_2) *
            (lit(1) - col("l_discount")).cast(dec4_2)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("l_year", "l_month")
    },

    // ---- q48: Pareto frontier (2-d skyline) ----
    // Parts not dominated on (minimize p_retailprice, maximize
    // p_size): A dominates B iff price_A <= price_B AND size_A >=
    // size_B with at least one strict. The naive form is an O(n^2)
    // NOT-EXISTS self-join; the scalable form used here is the
    // sort-sweep: ordered by (price ASC, size DESC), a row is
    // dominated iff the running max of size over STRICTLY PRECEDING
    // rows exceeds its size (a larger-size predecessor at price <=
    // mine), or the running max over STRICTLY CHEAPER prices reaches
    // its size (equal size at a lower price). Both maxima are one
    // window pass — O(n log n), no self-join.
    //
    // 100 TB shape: skyline is ALGEBRAIC — skyline(A ∪ B) =
    // skyline(skyline(A) ∪ skyline(B)) — so phase 1 runs the sweep
    // per hash bucket (32 PARALLEL windows, no global sort of the
    // fact table), and phase 2 re-runs it once on the union of local
    // skylines, which is frontier-sized (O(log n) expected for
    // independent dims), not corpus-sized. The single-partition
    // window exists only in phase 2 over that tiny survivor set.
    // The oracle replays the sweep as one global window (a different
    // decomposition); the ScalaTest spec pins both against the
    // brute-force NOT-EXISTS definition at fixture scale.
    QueryDef("q48_pareto_frontier",
      """WITH p AS (
        |  SELECT p_partkey, p_name, p_retailprice, p_size FROM part
        |), o AS (
        |  SELECT p.*, MAX(p_size) OVER (
        |    ORDER BY p_retailprice, p_size DESC, p_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm
        |  FROM p
        |), pm AS (
        |  SELECT p_retailprice AS pr, MAX(p_size) AS ms FROM p GROUP BY 1
        |), cl AS (
        |  SELECT pr, MAX(ms) OVER (
        |    ORDER BY pr ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cml
        |  FROM pm
        |)
        |SELECT o.p_partkey, o.p_name, o.p_retailprice,
        |  CAST(o.p_size AS BIGINT) AS p_size
        |FROM o JOIN cl ON o.p_retailprice = cl.pr
        |WHERE (o.cm IS NULL OR o.cm <= o.p_size)
        |  AND (cl.cml IS NULL OR cl.cml < o.p_size)
        |ORDER BY o.p_retailprice, o.p_partkey""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir)
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
      CoreQueries.skyline(p, buckets = 32)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
          col("p_size").cast("long").as("p_size"))
        .orderBy("p_retailprice", "p_partkey")
    })

  /** One sort-sweep dominance pass: rows of `p` (needs p_retailprice,
    * p_size, p_partkey) surviving within each bucket-group (global
    * when bucketCol is a constant). See q48's comment for the
    * dominated-iff derivation.
    */
  private def sweep(p: org.apache.spark.sql.DataFrame,
      bucketCol: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val b = p.withColumn("bk", bucketCol)
    val w = Window.partitionBy("bk")
      .orderBy(col("p_retailprice"), col("p_size").desc, col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // strictly-cheaper running max: per-price group max, then the
    // same preceding-rows cummax over the (bucket-local) price list
    val pm = b.groupBy("bk", "p_retailprice").agg(max("p_size").as("ms"))
    val wl = Window.partitionBy("bk").orderBy("p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cl = pm.withColumn("cml", max("ms").over(wl))
      .select(col("bk").as("bk2"), col("p_retailprice").as("pr"), col("cml"))
    b.withColumn("cm", max("p_size").over(w))
      .join(cl, col("bk") === col("bk2") && col("p_retailprice") === col("pr"))
      .where((col("cm").isNull || col("cm") <= col("p_size")) &&
        (col("cml").isNull || col("cml") < col("p_size")))
      .drop("bk", "bk2", "pr", "cm", "cml")
  }

  /** Two-phase distributed skyline: bucketed local sweeps, then one
    * global sweep over the frontier-sized survivor union.
    */
  def skyline(p: org.apache.spark.sql.DataFrame, buckets: Int)
      : org.apache.spark.sql.DataFrame =
    sweep(sweep(p, pmod(col("p_partkey"), lit(buckets))), lit(0))
}
