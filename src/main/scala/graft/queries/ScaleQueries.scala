package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Skew
import graft.sources.Tables

/** Workload breadth + skew-resilience: TPC-H-shaped reporting queries
  * and the salted two-stage aggregation (oracle = the plain aggregate,
  * because salting must be result-identical).
  */
object ScaleQueries {

  private val dec12_2 = DecimalType(12, 2)
  private val dec18_2 = DecimalType(18, 2)
  private val dec4_2 = DecimalType(4, 2)

  val all: Seq[QueryDef] = Seq(

    // ---- TPC-H Q3 shape: shipping priority ----
    QueryDef("q17_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date, o_orderpriority
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      val cutoff = lit("1998-01-01 00:00:00").cast("timestamp_ntz")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > cutoff)
        .join(Tables.orders(s, dir).filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast(dec12_2) *
          (lit(1) - col("l_discount")).cast(dec4_2)).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },

    // ---- TPC-H Q18 shape: large-volume customers (HAVING) ----
    QueryDef("q18_big_spenders",
      """SELECT c_custkey, c_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 1500000
        |ORDER BY total_spend DESC, c_custkey LIMIT 50""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec18_2)).as("spend_dec"))
        .where(col("spend_dec") > 1500000)
        .select(col("c_custkey"), col("c_name"), col("n_orders"),
          col("spend_dec").cast("double").as("total_spend"))
        .orderBy(col("total_spend").desc, col("c_custkey"))
        .limit(50)
    },

    // ---- salted two-stage aggregation (skew path) ----
    // The oracle is the PLAIN aggregate: salting must be exactly
    // result-preserving or it is wrong.
    QueryDef("q21_salted_agg",
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n_rows,
        |  MIN(value) AS min_value,
        |  MAX(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Skew.saltedSumCount(Tables.events(s, dir), Seq("event_type"), "value")
        .select("event_type", "sum_value", "n_rows", "min_value", "max_value")
        .orderBy("event_type")
    },

    // ---- partition-pruned scan over a date-partitioned warehouse ----
    // The Spark side reads orders re-materialized partitionBy(o_month)
    // and filters on the partition key, so only the 1997 directories
    // are scanned (PartitionFilters — asserted in ScaleSpec). The
    // oracle recomputes from the flat table; results must be identical.
    QueryDef("q23_partition_pruning",
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE)::VARCHAR AS o_month_start,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY o_month_start""".stripMargin) { (s, dir) =>
      graft.sources.Warehouse.ordersByMonth(s, dir)
        .filter(col("o_month") >= "1997-01" && col("o_month") <= "1997-12")
        .groupBy("o_month")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec18_2)).cast("double").as("revenue"))
        .select(concat(col("o_month"), lit("-01")).as("o_month_start"),
          col("n_orders"), col("revenue"))
        .orderBy("o_month_start")
    },

    // ---- two-stage exact distinct (non-additive skew path) ----
    // Same contract as q21: the oracle is the plain COUNT(DISTINCT);
    // the decomposition must be exactly result-preserving.
    QueryDef("q22_salted_distinct",
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Skew.saltedDistinct(Tables.events(s, dir), Seq("event_type"), "user_id")
        .orderBy("event_type")
    },

    // ---- TPC-H Q5 shape: local-supplier volume (6-table join) ----
    // The deepest join tree in the engine: fact⋈fact (lineitem⋈orders,
    // the one genuinely shuffled join) with every dimension broadcast
    // and filters pushed below the joins. The c_nationkey = s_nationkey
    // "local supplier" predicate makes customer a real join (not a
    // semi-join) — its nationkey participates in the supplier join
    // condition. At 100 TB the same plan holds: orders/lineitem
    // shuffle on orderkey once, customer/supplier/nation/region stay
    // broadcast (they grow ~100× slower than the facts in TPC-H-like
    // schemas), so no extra exchange appears as sf scales.
    QueryDef("q37_local_supplier_volume",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val lo = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
      val hi = lit("1998-01-01 00:00:00").cast("timestamp_ntz")
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"), "left_semi")
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations.select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast(dec12_2) *
          (lit(1) - col("l_discount")).cast(dec4_2)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- z-order (Morton) clustering key ----
    // The multi-dimensional layout key behind ZOrder.writeClustered
    // (see operators/ZOrder scaladoc + ZOrderSpec's row-group-skipping
    // proof): bit-interleave two 16-bit dims with the shift/mask
    // ladder — pure integer arithmetic, whole-stage-codegen'd, and
    // written with the SAME ladder in the oracle so the key is checked
    // bit-for-bit. Declared over a bounded slice; the layout writer is
    // exercised in the spec (a write is not a query result).
    QueryDef("q39_zorder_key",
      """WITH a AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(l_partkey AS BIGINT) & 65535 AS x, CAST(l_suppkey AS BIGINT) & 65535 AS y
        |  FROM lineitem WHERE l_orderkey < 400
        |), b AS (
        |  SELECT *, (x | (x << 8)) & 16711935 AS x1, (y | (y << 8)) & 16711935 AS y1 FROM a
        |), c AS (
        |  SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2, (y1 | (y1 << 4)) & 252645135 AS y2 FROM b
        |), d AS (
        |  SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3, (y2 | (y2 << 2)) & 858993459 AS y3 FROM c
        |), e AS (
        |  SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4, (y3 | (y3 << 1)) & 1431655765 AS y4 FROM d
        |)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  x4 | (y4 << 1) AS zkey
        |FROM e ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 400)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.operators.ZOrder.zkey16(col("l_partkey"), col("l_suppkey")).as("zkey"))
        .orderBy("zkey", "l_orderkey", "l_linenumber")
    },

    // ---- salted skew join (proactive hot-key spreading) ----
    // lineitem⋈supplier through Skew.saltedJoin: the fact side salts
    // on row content (key + entropy cols), the dim side replicates ×8, the join
    // runs as a sort-merge on (l_suppkey, _salt) — a hot supplier's
    // rows land on 8 reducers instead of 1. The oracle is the PLAIN
    // join + aggregate: salting must be invisible in the result.
    // (Supplier is broadcast-sized HERE; the merge hint forces the
    // shuffle-join plan this operator exists for — plan asserted in
    // ScaleSpec.)
    QueryDef("q35_salted_join",
      """SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
      Skew.saltedJoin(
        Tables.lineitem(s, dir).select("l_suppkey", "l_quantity"),
        Tables.supplier(s, dir)
          .withColumnRenamed("s_suppkey", "l_suppkey")
          .select("l_suppkey", "s_nationkey"),
        Seq("l_suppkey"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec12_2)).cast("double").as("sum_qty"))
        .orderBy("s_nationkey")
    },

    // ---- TPC-H Q21 shape: the sole-late-supplier blame report ----
    // "Suppliers who were the ONLY late shipper on a multi-supplier
    // order" — the classic multi-correlated query (Q21 is EXISTS +
    // NOT EXISTS over the same fact). Instead of two correlated
    // probes, the engine computes per-(order, supplier) lateness ONCE
    // (fact-keyed aggregate) and derives the per-order supplier/late
    // counts with an unordered window over the SAME order-key
    // partitioning — no second aggregate, no self-join, no recompute
    // of the fact subtree. The explicit repartition on l_orderkey
    // makes one exchange serve the (ok, sk) aggregate AND the window
    // (ok alone clusters both), so the fact is exchanged exactly once
    // before the final dim-sized supplier rollup. Lateness compares
    // exact epoch microseconds (ship > order + 90d) so both engines
    // agree bit-for-bit.
    QueryDef("q42_sole_late_supplier",
      """WITH per AS (
        |  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
        |    MAX(CASE WHEN epoch_us(l.l_shipdate) >
        |      epoch_us(o.o_orderdate) + 7776000000000 THEN 1 ELSE 0 END) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY l.l_orderkey, l.l_suppkey
        |), stats AS (
        |  SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late
        |  FROM per GROUP BY ok
        |)
        |SELECT p.sk AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM per p JOIN stats s ON p.ok = s.ok
        |WHERE p.late = 1 AND s.n_late = 1 AND s.n_supp >= 2
        |GROUP BY p.sk ORDER BY numwait DESC, suppkey LIMIT 25""".stripMargin) { (s, dir) =>
      val per = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          col("l_shipdate"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey").as("ok"), col("o_orderdate")), Seq("ok"))
        .repartition(col("ok"))
        .groupBy("ok", "sk")
        // NTZ→timestamp cast is the identity on the stored micros under
        // the UTC session (same normalization contract as Tables.events)
        .agg(max(when(
          unix_micros(col("l_shipdate").cast("timestamp")) >
            unix_micros(col("o_orderdate").cast("timestamp"))
              + lit(7776000000000L), 1)
          .otherwise(0)).as("late"))
      // Unordered whole-partition window: ok-partitioning is already
      // in place, so this is a sort within partitions, not a shuffle.
      val w = org.apache.spark.sql.expressions.Window.partitionBy("ok")
      per
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum(col("late")).over(w))
        .where(col("late") === 1 && col("n_late") === 1 && col("n_supp") >= 2)
        .groupBy(col("sk").as("suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("suppkey"))
        .limit(25)
    },

    // ---- MERGE INTO / upsert semantics as a relational plan ----
    // The warehouse maintenance op the CTAS family (S5, q23, q36)
    // leads to: fold a late-arriving batch (orders from 2001) into
    // the persisted per-customer summary dim built from history,
    // update-matched / insert-new, with the per-row action recorded —
    // the audit column a production MERGE writes to its log. Shape:
    // ONE fact scan feeds both aggregates (the filters partition it),
    // then a key-hash FULL OUTER join of dim-sized aggregates;
    // coalesce arithmetic is codegen'd. At 100 TB the base side is
    // the bucketed persisted dim (no exchange), the delta batch is
    // small → AQE broadcasts it, and the action flag makes the
    // update idempotency auditable. DECIMAL sums keep both engines
    // bit-exact; the NTZ cutoff literal follows q42's UTC contract.
    QueryDef("q43_merge_upsert",
      """WITH base AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'
        |  GROUP BY o_custkey
        |), delta AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |  GROUP BY o_custkey
        |)
        |SELECT COALESCE(b.o_custkey, d.o_custkey) AS o_custkey,
        |  CAST(COALESCE(b.n_orders, 0) + COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(b.total, 0) + COALESCE(d.total, 0) AS DOUBLE) AS total_spend,
        |  CASE WHEN b.o_custkey IS NULL THEN 'insert'
        |       WHEN d.o_custkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN delta d ON d.o_custkey = b.o_custkey
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val cutoff = lit("2001-01-01").cast("timestamp")
      val orders = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("od"),
          col("o_totalprice").cast(dec18_2).as("p"))
      def summarize(f: Column): DataFrame = orders.where(f)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum("p").as("total"))
      val base = summarize(col("od") < cutoff)
      val delta = summarize(col("od") >= cutoff)
        .select(col("o_custkey").as("d_custkey"),
          col("n_orders").as("d_n"), col("total").as("d_total"))
      base.join(delta, col("d_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("o_custkey"), col("d_custkey")).as("ck"),
          (coalesce(col("n_orders"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("total"), lit(0).cast(dec18_2))
            + coalesce(col("d_total"), lit(0).cast(dec18_2)))
            .cast("double").as("total_spend"),
          when(col("o_custkey").isNull, "insert")
            .when(col("d_custkey").isNull, "keep")
            .otherwise("update").as("action"))
        .withColumnRenamed("ck", "o_custkey")
        .orderBy("o_custkey")
    },

    // ---- sketch-backed rollup distinct (the 100 TB cube pattern) ----
    // COUNT(DISTINCT) over rollup levels is the classic cube killer:
    // exact distinct at every level re-shuffles every distinct value
    // per level. The scale pattern: sketch ONCE at the finest grain —
    // KMV bottom-k signatures per (event_type, day) — then derive
    // every coarser level by merging the tiny signatures (k longs per
    // leaf), never touching the rows again. Because the bottom-k set
    // is a semilattice, the merged signature is BIT-IDENTICAL to
    // sketching the coarse level directly — `merged_eq_direct`
    // asserts exactly that array equality per level against freshly
    // built direct sketches, and `within_tol` bounds the estimate
    // against the exact count (k = 256 → ~6% expected error; 30%
    // asserted). The oracle recomputes the exact distinct counts and
    // expects both flags TRUE — a broken merge, a non-canonical
    // signature, or an estimator drift all hash-mismatch.
    QueryDef("q46_sketch_rollup",
      """SELECT 'all' AS level, 'ALL' AS key,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
        |  TRUE AS merged_eq_direct, TRUE AS within_tol
        |FROM events
        |UNION ALL
        |SELECT 'type' AS level, event_type AS key,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
        |  TRUE AS merged_eq_direct, TRUE AS within_tol
        |FROM events GROUP BY event_type
        |ORDER BY level, key""".stripMargin) { (s, dir) =>
      import graft.functions.KmvSketch
      val k = 256
      // estimate from a canonical signature, relationally (no UDF):
      // size < k → exact size; else (k-1) / unit(last), unit mapping
      // the unsigned 64-bit hash into (0,1]. 2^64 = 1.8446744073709552e19.
      def estOf(sig: Column): Column =
        when(size(sig) < k, size(sig).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            ((when(element_at(sig, -1) >= 0,
                element_at(sig, -1).cast("double"))
              .otherwise(element_at(sig, -1).cast("double")
                + lit(1.8446744073709552e19)) + lit(1.0))
              / lit(1.8446744073709552e19)))
      val ev = Tables.events(s, dir).select(
        col("event_type"), expr("ts div 86400000000000").as("day_id"),
        col("user_id"), xxhash64(col("user_id")).as("h"))
      // ONE row-level pass builds the leaf sketches (and, for the
      // contract check only, the per-level direct sketches + exacts —
      // production would stop at `leaf` and persist it).
      val leaf = ev.groupBy("event_type", "day_id")
        .agg(KmvSketch.signature(k)(col("h")).as("sig"))
        .localCheckpoint()
      val typeMerged = leaf.groupBy("event_type")
        .agg(KmvSketch.mergeSignatures(k)(col("sig")).as("msig"))
        .localCheckpoint() // reused by the 'all' rollup: merge-of-merges
      val allMerged = typeMerged
        .agg(KmvSketch.mergeSignatures(k)(col("msig")).as("msig"))
      val typeDirect = ev.groupBy("event_type")
        .agg(KmvSketch.signature(k)(col("h")).as("dsig"),
          countDistinct(col("user_id")).as("exact_distinct"))
      val allDirect = ev
        .agg(KmvSketch.signature(k)(col("h")).as("dsig"),
          countDistinct(col("user_id")).as("exact_distinct"))
      def contract(merged: DataFrame, direct: DataFrame, level: String,
          keyCol: Option[String]): DataFrame = {
        val joined = keyCol match {
          case Some(c) => merged.join(direct, Seq(c))
            .withColumn("key", col(c))
          case None => merged.crossJoin(direct) // 1 x 1
            .withColumn("key", lit("ALL"))
        }
        joined.select(lit(level).as("level"), col("key"),
          col("exact_distinct"),
          (col("msig") === col("dsig")).as("merged_eq_direct"),
          (abs(estOf(col("msig")) - col("exact_distinct"))
            <= lit(0.30) * col("exact_distinct")).as("within_tol"))
      }
      contract(allMerged, allDirect, "all", None)
        .unionByName(contract(typeMerged, typeDirect, "type",
          Some("event_type")))
        .orderBy("level", "key")
    },

    // ---- sketch-backed rollup PERCENTILES (q46's quantile sibling) ----
    // The other 100 TB cube statistic: p50/p90 spend per event type AND
    // overall, from MRL quantile sketches built once at the finest
    // grain — the 'all' level merges the per-type FINISHED states
    // (merge-of-merges), never re-touching rows. Contract asserted
    // IN the result (q46 discipline): n_match proves exact weight
    // conservation through every merge (a dropped or double-merged
    // leaf breaks it), pXX_tol pins each sketch estimate inside the
    // ±2.5% rank window of the exact sorted data. The exact columns
    // (quantile_disc convention, rank ceil(q·n) 1-based) are the
    // audit side the oracle recomputes; production stops at the
    // sketch. Estimator + weight checks run as scan-side HOFs over
    // the sketch state (QuantileSketch.quantileExpr) — no UDF in the
    // read path.
    QueryDef("q50_pctl_rollup",
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |)
        |SELECT 'all' AS level, 'ALL' AS key,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_cents,
        |  CAST(quantile_disc(cents, 0.9) AS BIGINT) AS p90_cents,
        |  TRUE AS n_match, TRUE AS p50_tol, TRUE AS p90_tol
        |FROM ev
        |UNION ALL
        |SELECT 'type' AS level, event_type AS key,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_cents,
        |  CAST(quantile_disc(cents, 0.9) AS BIGINT) AS p90_cents,
        |  TRUE AS n_match, TRUE AS p50_tol, TRUE AS p90_tol
        |FROM ev GROUP BY event_type
        |ORDER BY level, key""".stripMargin) { (s, dir) =>
      import graft.functions.QuantileSketch
      val k = 256
      val eps = 0.025
      val ev = Tables.events(s, dir).select(col("event_type"),
        expr("ts div 86400000000000").as("day_id"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val leaf = ev.groupBy("event_type", "day_id")
        .agg(QuantileSketch.sketch(k)(col("cents")).as("sk"))
        .localCheckpoint()
      val typeMerged = leaf.groupBy("event_type")
        .agg(QuantileSketch.mergeSketches(k)(col("sk")).as("msk"))
        .localCheckpoint() // reused by the 'all' merge-of-merges
      val allMerged = typeMerged
        .agg(QuantileSketch.mergeSketches(k)(col("msk")).as("msk"))
      // exact audit side (production stops at the sketches above)
      val typeExact = ev.groupBy("event_type")
        .agg(sort_array(collect_list(col("cents"))).as("vals"),
          count(lit(1)).as("n_rows"))
      val allExact = ev
        .agg(sort_array(collect_list(col("cents"))).as("vals"),
          count(lit(1)).as("n_rows"))
      def exactQ(q: Double): Column = // quantile_disc = rank ceil(q·n)
        expr(s"element_at(vals, CAST(greatest(1, ceil($q * n_rows)) AS INT))")
      def tolFlag(q: Double): Column = {
        val est = expr(QuantileSketch.quantileExpr("msk", "n_rows", q))
        val lo = expr(s"element_at(vals, CAST(greatest(1, ceil(($q - $eps) * n_rows)) AS INT))")
        val hi = expr(s"element_at(vals, CAST(least(n_rows, ceil(($q + $eps) * n_rows)) AS INT))")
        est >= lo && est <= hi
      }
      def contract(merged: DataFrame, exact: DataFrame, level: String,
          keyCol: Option[String]): DataFrame = {
        val joined = keyCol match {
          case Some(c) => merged.join(exact, Seq(c)).withColumn("key", col(c))
          case None => merged.crossJoin(exact).withColumn("key", lit("ALL"))
        }
        joined.select(lit(level).as("level"), col("key"),
          col("n_rows"),
          exactQ(0.5).as("p50_cents"), exactQ(0.9).as("p90_cents"),
          (expr(QuantileSketch.totalWeightExpr("msk")) === col("n_rows"))
            .as("n_match"),
          tolFlag(0.5).as("p50_tol"), tolFlag(0.9).as("p90_tol"))
      }
      contract(allMerged, allExact, "all", None)
        .unionByName(contract(typeMerged, typeExact, "type",
          Some("event_type")))
        .orderBy("level", "key")
    })
}
