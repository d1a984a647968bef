package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsQueries
import graft.sources.Tables

/** Round-4 analytic operators: semantics vs straightforward Spark
  * recomputations, plus the physical-plan properties the scale story
  * rests on (the bucketed range join must hash-join, never
  * nested-loop).
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    AnalyticsQueries.all.find(_.name == name).get.fn(spark, dir)

  test("bucketed range join equals the naive inequality join") {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val naive = p.join(c,
        col("user_id") === col("cu") &&
          col("cts") >= col("ts") - 600000000000L && col("cts") < col("ts"),
        "left_outer")
      .groupBy("event_id").agg(count(col("cid")).as("n_clicks"))
    val bucketed = q("q30_range_join")
    assert(bucketed.join(naive, Seq("event_id", "n_clicks"), "full_outer")
      .filter(col("event_id").isNull || col("n_clicks").isNull).isEmpty,
      "bucketed and naive range joins disagree")
    assert(bucketed.count() === p.count())
  }

  test("bucketed range join is a hash join, never a nested loop") {
    val plan = q("q30_range_join").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi hash join on (user, bucket):\n$plan")
  }

  test("pivot with explicit values is a single aggregation pass over one scan") {
    val df = q("q28_pivot_returnflag")
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"pivot must not re-scan per value:\n$plan")
    // one partial + one final aggregate, no per-value aggregates
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs <= 4, s"expected a single partial/final aggregation pair:\n$plan")
  }

  test("stats moments match Spark's builtin estimators to 1e-9 relative") {
    val ours = q("q27_stats_moments")
      .select("l_returnflag", "mean_qty", "var_qty", "stddev_qty", "corr_qty_price")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ref = Tables.lineitem(spark, dir).groupBy("l_returnflag")
      .agg(avg("l_quantity"), var_samp("l_quantity"), stddev_samp("l_quantity"),
        corr("l_quantity", "l_extendedprice"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((flag, (m, v, sd, cr)) <- ours) {
      val (m2, v2, sd2, cr2) = ref(flag)
      def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b))
      assert(close(m, m2) && close(v, v2) && close(sd, sd2) && close(cr, cr2),
        s"$flag: ($m,$v,$sd,$cr) vs builtin ($m2,$v2,$sd2,$cr2)")
    }
  }

  test("unpivot emits 3 rows per input row with original values") {
    val n = Tables.lineitem(spark, dir).filter(col("l_orderkey") < 500).count()
    val up = q("q29_unpivot_measures")
    assert(up.count() === 3 * n)
    assert(up.groupBy("metric").count().count() === 3)
  }

  test("window analytics: running total telescopes to the partition sum") {
    val df = q("q26_window_analytics").cache()
    try {
      val last = df.groupBy("o_custkey").agg(max("rn").as("rn")).join(df, Seq("o_custkey", "rn"))
      val sums = Tables.orders(spark, dir).filter(col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("expect"))
      assert(last.join(sums, Seq("o_custkey"))
        .filter(col("run_total") =!= col("expect")).isEmpty)
    } finally df.unpersist()
  }
}
