package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Round-4 analytic breadth: window-function families beyond
  * ROW_NUMBER (SURVEY §2.6 W2), distributed statistical moments,
  * PIVOT/UNPIVOT reshaping, and a bucketed range join — all oracle-
  * checked against DuckDB on the same parquet.
  *
  * Scale notes common to the file:
  *  - Statistical moments (mean/variance/stddev/correlation) are
  *    computed from EXACT decimal power sums (n, Σx, Σx², Σxy) — a
  *    single partial-aggregation pass, order-independent, mergeable
  *    across 1000 executors — then combined in double at the end.
  *    Spark's builtin `stddev`/`corr` stream doubles and are
  *    partition-order-dependent; power sums are the scalable AND
  *    oracle-exact form.
  *  - The range join buckets the time axis so the probe is an
  *    equi-join on (key, bucket) — never a broadcast-nested-loop over
  *    an inequality, which is the 100 TB killer for interval joins.
  */
object AnalyticsQueries {

  private val dec12_2 = DecimalType(12, 2)
  private val dec4_2 = DecimalType(4, 2)
  private val dec17_4 = DecimalType(17, 4)
  private val dec18_2 = DecimalType(18, 2)

  val all: Seq[QueryDef] = Seq(

    // ---- W2: lag/lead/first_value/ntile/running frame ----
    // Per-customer order timeline: previous/next order price, first
    // order date, running spend (UNBOUNDED PRECEDING..CURRENT ROW),
    // spend quartile within the customer. Bounded to o_custkey < 100
    // (~1k rows at sf0.01) so the compare stays small; the window is
    // partitioned by customer — the scalable shape (one hash shuffle,
    // no global sort).
    QueryDef("q26_window_analytics",
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  LAG(o_totalprice) OVER w AS prev_total,
        |  LEAD(o_totalprice) OVER w AS next_total,
        |  CAST(CAST(FIRST_VALUE(o_orderdate) OVER w AS DATE) AS VARCHAR) AS first_date,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        |  CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS spend_quartile
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSpend = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("bigint").as("rn"),
          lag("o_totalprice", 1).over(w).as("prev_total"),
          lead("o_totalprice", 1).over(w).as("next_total"),
          date_format(first("o_orderdate").over(w), "yyyy-MM-dd").as("first_date"),
          sum(col("o_totalprice").cast(dec18_2)).over(wRun).cast("double").as("run_total"),
          ntile(4).over(wSpend).cast("bigint").as("spend_quartile"))
        .orderBy("o_custkey", "rn")
    },

    // ---- distributed statistical moments from exact power sums ----
    // mean/var/stddev of quantity + price↔quantity correlation per
    // return flag. Formulas written CHARACTER-IDENTICAL in both
    // engines over identical integer/decimal inputs, so the IEEE
    // double results match bit-exact.
    QueryDef("q27_stats_moments",
      """WITH sums AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  sx / n AS mean_qty,
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
        |FROM sums ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val q = col("l_quantity").cast(dec12_2)
      val p = col("l_extendedprice").cast(dec12_2)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(q).cast("double").as("sx"),
          sum(q * q).cast("double").as("sxx"),
          sum(p).cast("double").as("sy"),
          sum(p * p).cast("double").as("syy"),
          sum(q * p).cast("double").as("sxy"))
        .select(col("l_returnflag"), col("n"),
          expr("sx / n").as("mean_qty"),
          expr("(sxx - sx * sx / n) / (n - 1)").as("var_qty"),
          expr("sqrt((sxx - sx * sx / n) / (n - 1))").as("stddev_qty"),
          expr("(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))")
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    // ---- PIVOT: one row per linestatus, one revenue column per flag ----
    // Spark plans pivot-with-explicit-values as a SINGLE aggregation
    // pass (no per-value scans); always pass the value list — value
    // discovery is an extra distinct job at scale.
    QueryDef("q28_pivot_returnflag",
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "A",
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "N",
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast(dec12_2)).cast("double"))
        .orderBy("l_linestatus")
    },

    // ---- UNPIVOT: wide measures → long (metric, val) rows ----
    QueryDef("q29_unpivot_measures",
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, l_extendedprice AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |) WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 500)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_quantity"), col("l_tax")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },

    // ---- bucketed range join: clicks within 10 min before purchase ----
    // Interval join expressed as an equi-join on (user_id, time
    // bucket): each purchase probes its own bucket and the previous
    // one (window ≤ bucket width), the exact range predicate filters
    // after the hash join. Each click has ONE bucket so no pair
    // double-counts. At 100 TB this stays a shuffle hash join on a
    // composite key; the naive form (equi on user + inequality) keeps
    // the hash join but degrades when few users dominate — the bucket
    // key spreads each user's clicks across time.
    QueryDef("q30_range_join",
      """SELECT p.event_id, CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        |  AND epoch_ns(c.ts) >= epoch_ns(p.ts) - 600000000000
        |  AND epoch_ns(c.ts) < epoch_ns(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val bucketNs = 600000000000L // 10 min in ns = the window width
      val ev = Tables.events(s, dir)
      // `ts div N` (integral): ts is a nanosecond epoch bigint ~1.7e18,
      // beyond double's 2^53 mantissa — float division would misbucket.
      val bucket = expr(s"ts div ${bucketNs}L")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          explode(array(bucket - 1, bucket)).as("bucket"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"), bucket.as("c_bucket"))
      purchases
        .join(clicks,
          col("user_id") === col("c_user") && col("bucket") === col("c_bucket") &&
            col("c_ts") >= col("ts") - bucketNs && col("c_ts") < col("ts"),
          "left_outer")
        .groupBy("event_id")
        .agg(count(col("c_id")).as("n_clicks"))
        .orderBy("event_id")
    },

    // ---- exact interpolated percentiles per group ----
    // Spark `percentile` and DuckDB `quantile_cont` share the
    // lower + (upper-lower)*frac definition at rank p*(n-1); over the
    // integral quantity domain the interpolated values are exact
    // binary fractions, so the doubles match. Scale honesty: exact
    // percentiles sort each group (ObjectHashAggregate with a digest
    // of all values) — at 100 TB use approx_percentile (declared
    // contract pattern: e7) unless exactness is required.
    QueryDef("q31_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_quantity, 0.9)").as("p90"))
        .orderBy("l_returnflag")
    },

    // ---- fixed-width histogram (single agg pass, no sort) ----
    // Binning by floor-division is the distribution profile that DOES
    // scale: one partial-aggregated shuffle of (bin) keys, vs exact
    // percentiles' per-group value digests.
    QueryDef("q32_histogram",
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(floor(col("o_totalprice") / 50000).cast("bigint").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec18_2)).cast("double").as("total"))
        .orderBy("bin")
    },

    // ---- SCD2 slowly-changing-dimension build ----
    // The warehouse upsert-history op: collapse each customer's order
    // stream into type-2 dimension rows — one row per RUN of equal
    // o_orderpriority values (ordered by date, orderkey tiebreak),
    // with [valid_from, valid_to) effective-date ranges and an
    // is_current flag on the open row. Two stacked windows over ONE
    // hash partitioning on o_custkey (lag to find change points,
    // lead over the change rows for the closing date): Spark plans a
    // single exchange, then per-partition sorts — no global sort, no
    // self-join, which is the shape that survives a 100 TB history
    // table. Sentinel 9999-12-31 keeps valid_to non-null so BETWEEN
    // probes work downstream.
    QueryDef("q33_scd2_dim",
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    LAG(o_orderpriority) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |), changes AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        |  FROM ordered WHERE prev IS NULL OR o_orderpriority <> prev
        |)
        |SELECT o_custkey AS custkey,
        |  CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS scd_version,
        |  o_orderpriority AS priority,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS valid_from,
        |  COALESCE(CAST(CAST(LEAD(o_orderdate) OVER w2 AS DATE) AS VARCHAR), '9999-12-31') AS valid_to,
        |  LEAD(o_orderdate) OVER w2 IS NULL AS is_current
        |FROM changes
        |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY custkey, scd_version""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .withColumn("prev", lag("o_orderpriority", 1).over(w))
        .where(col("prev").isNull || col("o_orderpriority") =!= col("prev"))
        .select(
          col("o_custkey").as("custkey"),
          row_number().over(w).cast("bigint").as("scd_version"),
          col("o_orderpriority").as("priority"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
          coalesce(date_format(lead("o_orderdate", 1).over(w), "yyyy-MM-dd"),
            lit("9999-12-31")).as("valid_to"),
          lead("o_orderdate", 1).over(w).isNull.as("is_current"))
        .orderBy("custkey", "scd_version")
    },

    // ---- q49: point-in-time join against the SCD2 dimension ----
    // The canonical temporal-warehouse enrichment q33 builds its dim
    // FOR: each lineitem picks up the customer's priority EFFECTIVE AT
    // ship date. The naive plan is an interval join (equi on custkey +
    // [valid_from, valid_to) residual) — measured 5.5 s at sf1 because
    // every fact row meets EVERY version of its customer before the
    // residual cuts (fan-out ≈ avg versions/customer). SCD2 intervals
    // are CONTIGUOUS by construction (valid_to = next valid_from), so
    // point-in-time ≡ AS-OF: union dim rows and fact probes, one
    // custkey-partitioned window takes last(priority) over (date,
    // dim-before-probe tiebreak) — one exchange+sort, ZERO fan-out
    // (1.6 s at sf1, 3.4× faster). The ORACLE keeps the interval-join
    // form — the equivalence of the two decompositions is exactly what
    // the hash compares. Dates compare as 'yyyy-MM-dd' strings —
    // lexicographic == chronological in both engines.
    QueryDef("q49_scd2_pit",
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    LAG(o_orderpriority) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |), changes AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        |  FROM ordered WHERE prev IS NULL OR o_orderpriority <> prev
        |), dim AS (
        |  SELECT o_custkey AS custkey, o_orderpriority AS priority,
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS valid_from,
        |    COALESCE(CAST(CAST(LEAD(o_orderdate) OVER w2 AS DATE) AS VARCHAR), '9999-12-31') AS valid_to
        |  FROM changes
        |  WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |), fact AS (
        |  SELECT o.o_custkey, CAST(CAST(l.l_shipdate AS DATE) AS VARCHAR) AS ship_d,
        |    CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS rev
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |)
        |SELECT d.priority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(f.rev) AS DOUBLE) AS revenue
        |FROM fact f JOIN dim d ON f.o_custkey = d.custkey
        |  AND f.ship_d >= d.valid_from AND f.ship_d < d.valid_to
        |GROUP BY d.priority ORDER BY d.priority""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val dim = Tables.orders(s, dir)
        .withColumn("prev", lag("o_orderpriority", 1).over(w))
        .where(col("prev").isNull || col("o_orderpriority") =!= col("prev"))
        .select(col("o_custkey").as("custkey"),
          col("o_orderpriority").as("priority"),
          // seq = the change row's o_orderkey: same-DATE priority
          // changes are ordered within the dim by (valid_from,
          // o_orderkey), so the later change (non-empty interval in
          // the oracle's join — the earlier gets [d, d) = empty) must
          // deterministically win the as-of window too.
          col("o_orderkey").as("seq"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
          coalesce(date_format(lead("o_orderdate", 1).over(w), "yyyy-MM-dd"),
            lit("9999-12-31")).as("valid_to"))
      val fact = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_d"),
          (col("l_extendedprice").cast(dec12_2) *
            (lit(1) - col("l_discount")).cast(dec4_2)).as("rev"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
      // as-of union-window: dim rows (kind 0) sort before same-date
      // probes (kind 1), and same-date dim ties break on seq so the
      // LATER change wins deterministically (matching the oracle,
      // where the earlier same-date version's interval is empty);
      // last(priority) is the version in effect. Probes take seq = 0 —
      // their relative order is immaterial (they contribute only NULL
      // priority to the frame).
      val unioned = dim
        .select(col("custkey"), col("valid_from").as("d"), lit(0).as("kind"),
          col("seq"), col("priority"), lit(null).cast(dec17_4).as("rev"))
        .unionByName(fact.select(col("o_custkey").as("custkey"),
          col("ship_d").as("d"), lit(1).as("kind"), lit(0L).as("seq"),
          lit(null).cast("string").as("priority"), col("rev").cast(dec17_4)))
      val wAsof = Window.partitionBy("custkey").orderBy("d", "kind", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      unioned
        .withColumn("eff", last("priority", ignoreNulls = true).over(wAsof))
        // probes only, and drop pre-first-version ships (the inner
        // interval join has no matching row for them either)
        .where(col("kind") === 1 && col("eff").isNotNull)
        .groupBy(col("eff").as("priority"))
        .agg(count(lit(1)).as("n_items"),
          sum("rev").cast("double").as("revenue"))
        .orderBy("priority")
    },

    // ---- value-RANGE window frame: trailing-30-day running spend ----
    // q26's frames are ROWS-based (physical offsets); this is the
    // RANGE form — the frame is every order within 30 DAYS, however
    // many rows that is, and same-day peers always aggregate together.
    // Both engines get the identical numeric frame by ordering on
    // epoch-days (Spark's rangeBetween needs a single numeric sort
    // key anyway). Same scale shape as any partitioned window: one
    // hash exchange on o_custkey, per-partition sort, no global sort.
    QueryDef("q34_range_frame",
      """SELECT o_custkey, o_orderkey,
        |  CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d_epoch,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, d_epoch, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("d_epoch")
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, dir)
        .where(col("o_custkey") < 200)
        .withColumn("d_epoch",
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
            .cast("bigint"))
        .select(col("o_custkey"), col("o_orderkey"), col("d_epoch"),
          sum(col("o_totalprice").cast(dec18_2)).over(w)
            .cast("double").as("spend_30d"))
        .orderBy("o_custkey", "d_epoch", "o_orderkey")
    },

    // ---- incremental aggregate maintenance (IVM merge) ----
    // The incremental-ETL op: a stored monthly-revenue STATE (partial
    // sums + counts for data before the cutoff) absorbs a new-arrivals
    // DELTA by unioning partials and re-aggregating — sums of sums,
    // sums of counts — touching only the state table and the new
    // batch, never rescanning history. The oracle is the full
    // recompute, which is exactly what the merge must equal. Decimal
    // partials make the merge order-independent; at 100 TB the delta
    // pass is the only fact scan and the state side is months-sized.
    QueryDef("q36_incremental_agg",
      """SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin) { (s, dir) =>
      val cutoff = lit("1997-07-01").cast("date")
      def partials(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("order_month",
          date_format(trunc(to_date(col("o_orderdate")), "month"), "yyyy-MM-dd"))
        .groupBy("order_month")
        .agg(count(lit(1)).as("pn"),
          sum(col("o_totalprice").cast(dec18_2)).as("psum"))
      val o = Tables.orders(s, dir)
      val state = partials(o.where(to_date(col("o_orderdate")) < cutoff))
      val delta = partials(o.where(to_date(col("o_orderdate")) >= cutoff))
      state.unionByName(delta)
        .groupBy("order_month")
        .agg(sum("pn").as("n_orders"),
          sum("psum").cast("double").as("revenue"))
        .orderBy("order_month")
    },

    // ---- rank-family window functions WITH ties ----
    // rank / dense_rank / percent_rank / cume_dist over an ordering
    // key that genuinely repeats (integral l_quantity within a return
    // flag), so gap, dense, and distribution semantics all diverge
    // from row_number and from each other — tie handling is the whole
    // point of this surface, and both engines define it identically
    // (percent_rank = (rank-1)/(n-1), cume_dist = n_peers_le/n, both
    // one exact integer division in double). Window partitions by
    // return flag: one hash exchange, per-partition sort, no global
    // sort. Output identity columns + final ORDER BY keep the compare
    // deterministic even though ranks tie.
    QueryDef("q38_rank_functions",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  CAST(RANK() OVER w AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        |  PERCENT_RANK() OVER w AS prnk,
        |  CUME_DIST() OVER w AS cdist
        |FROM lineitem WHERE l_orderkey < 800
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
        |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 800)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"),
          rank().over(w).cast("bigint").as("rnk"),
          dense_rank().over(w).cast("bigint").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
        .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    },

    // ---- windowed COUNT(DISTINCT) via the dense_rank identity ----
    // Spark's window operator rejects DISTINCT aggregates outright
    // (DuckDB runs them natively — the oracle is the native form);
    // the standard composition is max(dense_rank(key)) over the same
    // partition, exact because dense_rank's maximum IS the distinct
    // count of the ordering key. Both windows and both maxima share
    // the one l_orderkey partition, so the whole query is a single
    // exchange + in-partition sorts — no extra shuffle per distinct
    // column, and the same shape at any scale (the partition key is
    // the high-cardinality order key, never a global window).
    QueryDef("q41_window_distinct",
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_supp,
        |  CAST(COUNT(DISTINCT l_partkey) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_part
        |FROM lineitem WHERE l_shipdate >= DATE '1998-09-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val part = Window.partitionBy("l_orderkey")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-09-01").cast("date"))
        .withColumn("dr_s",
          dense_rank().over(part.orderBy("l_suppkey")))
        .withColumn("dr_p",
          dense_rank().over(part.orderBy("l_partkey")))
        .select(col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          max(col("dr_s")).over(part).cast("bigint").as("n_supp"),
          max(col("dr_p")).over(part).cast("bigint").as("n_part"))
        .orderBy("l_orderkey", "l_linenumber")
    })
}
